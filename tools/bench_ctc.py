"""CTC speech-recipe training step on the real TPU chip.

BASE letter model (reference `config/experiment/speech_wav2vec2_ctc.yaml`
shapes), B=8 x 15 s LibriSpeech-like batch, bf16, rbg PRNG, full encoder
unroll. fori_loop ladder methodology (CLAUDE.md). Number recorded in
PERF.md's training table."""
import sys, time, dataclasses
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import optax
from w2v2_speaker_tpu.models.wav2vec2 import BASE_CONFIG
from w2v2_speaker_tpu.models.wav2vec2_speech import (
    Wav2Vec2SpeechConfig, Wav2Vec2SpeechModel,
)
from w2v2_speaker_tpu.train.speech_task import SpeechTask
from w2v2_speaker_tpu.data.tokenizer import CharTokenizer
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

b, n, L, V = 8, 240000, 256, 32  # 15 s, 256 target tokens, 31 letters+blank
rng = np.random.default_rng(0)
w2v2 = dataclasses.replace(
    BASE_CONFIG, dtype="bfloat16", attention_dropout=0.1, layerdrop=0.05,
    encoder_unroll=99, posconv_decomposed=False,
)
model = Wav2Vec2SpeechModel(cfg=Wav2Vec2SpeechConfig(w2v2=w2v2, vocab_size=V))
tok = CharTokenizer.build(["abcdefghijklmnopqrstuvwxyz' "])
task = SpeechTask(model=model, tokenizer=tok)
feats0 = jnp.asarray(rng.normal(0, 0.1, size=(b, n)).astype(np.float32))
labels0 = jnp.asarray(rng.integers(1, V, size=(b, L)), jnp.int32)
lab_len = jnp.full((b,), 180, jnp.int32)
variables = jax.jit(model.init)(
    {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ("params", "dropout", "masking", "layerdrop"))},
    feats0[:2],
)
state = TrainState.create(
    apply_fn=model.apply, params=variables["params"],
    tx=optax.adam(1e-4), rng=jax.random.PRNGKey(0),
)
step = make_train_step(task, mesh=None)

@jax.jit
def loop(m, st, feats):
    def body(i, carry):
        st_, f, s = carry
        bump = (1.0 + 1e-20 * s).astype(f.dtype)
        st2, metrics = step(st_, {
            "features": f * bump, "labels": labels0,
            "label_lengths": lab_len,
        })
        return (st2, f, metrics["loss"].astype(jnp.float32))
    st, _, s = jax.lax.fori_loop(0, m, body, (st, feats, 0.0))
    return s

def fresh():
    return jnp.asarray(rng.normal(0, 0.1, size=(b, n)).astype(np.float32))
float(loop(1, state, fresh()))
def once(m):
    f = fresh(); float(f.astype(jnp.float32).sum())
    t0 = time.perf_counter(); float(loop(m, state, f)); return time.perf_counter()-t0
iters = 8
t1 = min(once(iters) for _ in range(2)); t2 = min(once(2*iters) for _ in range(2))
ms = (t2-t1)/iters*1e3
sec_audio = b * 15.0
print(f"CTC train step: {ms:.2f} ms (B={b} x 15 s -> {sec_audio/(ms/1e3):.0f}x real-time training)", flush=True)

# ------------------------------------------------------------- eval path
# Jitted WER-eval forward: the same task.logits_fn the production
# make_logits_fn wraps (train/steps.py:166-186), chained in-loop since the
# ladder needs the fori_loop around it. Always measured.

@jax.jit
def eval_loop(m, st, feats):
    def body(i, carry):
        f, s = carry
        bump = (1.0 + 1e-20 * s).astype(f.dtype)
        logits, lengths = task.logits_fn(
            st.params, st.model_state, f * bump, None
        )
        return (f, logits.astype(jnp.float32).sum())
    _, s = jax.lax.fori_loop(0, m, body, (feats, 0.0))
    return s

float(eval_loop(1, state, fresh()))
def once_eval(m):
    f = fresh(); float(f.astype(jnp.float32).sum())
    t0 = time.perf_counter(); float(eval_loop(m, state, f))
    return time.perf_counter() - t0
iters = 16
t1 = min(once_eval(iters) for _ in range(2))
t2 = min(once_eval(2 * iters) for _ in range(2))
ms = (t2 - t1) / iters * 1e3
print(
    f"CTC eval forward: {ms:.2f} ms (B={b} x 15 s -> "
    f"{sec_audio/(ms/1e3):.0f}x real-time transcription)",
    flush=True,
)
