"""Attribute the train-step residual: full step vs fwd+bwd vs glue probes.

PERF.md's component budget (conv 36.9 + transformer 47.8 + pos-conv 5.8 +
adam 4.7 + dropout/layerdrop ~4 = 99.2 ms) leaves ~18 ms of the 117.6 ms
batch-66 BASE step unattributed. This probes exactly the missing pieces so
the full step is accounted component-by-component:

  loss     fwd+bwd of the complete task loss (no optimizer) — step minus
           this is adam + TrainState/metrics glue
  proj     FeatureProjection (LN + 512->768 Dense + dropout) fwd+bwd
  specaug  time-span mask sampling + masked-embed where, fwd+bwd
  tail     mean pool + FC head (768->5994) + CE + accuracy, fwd+bwd
  frame    frame-mask arithmetic (feat_extract_output_lengths + iota cmp)

Methodology as bench_train.py (the only trustworthy timing on the axon
remote-TPU transport): fori_loop-chained iterations in ONE program, fresh
input data per request, n-vs-2n differential, float() barrier, min of 3.

Usage: python tools/bench_residual.py [--batch 66] [--iters 24]
       [--only loss proj specaug tail frame] [--no-mask] [--no-dropout]
       [--zero field1,field2] [--bernoulli-dropout] [--ab-dropout]
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=66)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="subset of {step,loss,proj,specaug,tail,posconv,frame}",
    )
    ap.add_argument(
        "--no-mask", action="store_true",
        help="run step/loss without wav masks (the fixed-crop production "
        "path the 117.6 ms round-2 figure was measured on)",
    )
    ap.add_argument(
        "--no-dropout", action="store_true",
        help="zero every dropout rate + layerdrop + SpecAugment in the "
        "step/loss probes (isolates the stochastic-op cost in-program)",
    )
    ap.add_argument(
        "--zero", type=str, default=None,
        help="comma-separated Wav2Vec2Config float fields to zero for the "
        "step/loss probes (e.g. layerdrop,attention_dropout) — per-knob "
        "attribution of the stochastic-op cost",
    )
    ap.add_argument(
        "--bernoulli-dropout", action="store_true",
        help="hash_dropout=False + attention_impl='xla' for the step/loss "
        "probes: every dropout mask via jax.random.bernoulli (the "
        "pre-round-4 sampler) — A/B against the default counter-hash "
        "in one session",
    )
    ap.add_argument(
        "--ab-dropout", action="store_true",
        help="run the step probe twice in THIS process — counter-hash "
        "then bernoulli sampler — the trustworthy same-session A/B",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from w2v2_speaker_tpu.models.heads import FCHead
    from w2v2_speaker_tpu.models.masking import sample_span_mask
    from w2v2_speaker_tpu.models.wav2vec2 import (
        BASE_CONFIG,
        FeatureProjection,
        feat_extract_output_lengths,
    )
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"

    w2v2 = dataclasses.replace(
        BASE_CONFIG, dtype="bfloat16", layerdrop=0.05,
        encoder_unroll=99,  # production default (unrolled bwd, PERF.md)
    )
    if args.no_dropout:
        w2v2 = dataclasses.replace(
            w2v2, layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
            feat_proj_dropout=0.0, activation_dropout=0.0,
            mask_time_prob=0.0, mask_feature_prob=0.0,
        )
    if args.zero:
        w2v2 = dataclasses.replace(
            w2v2, **{f: 0.0 for f in args.zero.split(",")}
        )
    if args.bernoulli_dropout:
        w2v2 = dataclasses.replace(
            w2v2, hash_dropout=False, attention_impl="xla"
        )
    b = args.batch
    n = int(16000 * args.seconds)
    # conv output length for the probe shapes (149 at 3 s)
    t = int(feat_extract_output_lengths(np.asarray([n]), w2v2)[0])
    h, c = w2v2.hidden_size, w2v2.conv_dim[-1]
    rng = np.random.default_rng(0)
    print(f"batch {b} x {args.seconds}s (T={t}), BASE bf16, "
          f"iters={args.iters}")

    def fresh(shape, dtype=np.float32, scale=0.1):
        return jnp.asarray(
            (rng.normal(0, scale, size=shape)).astype(dtype)
        )

    def timed_loop(fn, label, p, *data):
        """fn(p, *data, i) -> scalar f32; chained serially via fori_loop.

        params threaded as jit arguments (never closures: remote compile
        rejects baked-in trees, HTTP 413 — CLAUDE.md trap #3)."""

        @jax.jit
        def run(m, p, *data):
            def body(i, carry):
                d0, s = carry
                out = fn(p, d0, *data[1:], i)
                bump = (1.0 + 1e-20 * out).astype(d0.dtype)
                return (d0 * bump, s + out)

            _, s = jax.lax.fori_loop(
                0, m, body, (data[0], jnp.float32(0))
            )
            return s

        def once(m, *d):
            float(d[0].astype(jnp.float32).sum())  # force upload
            t0 = time.perf_counter()
            float(run(m, p, *d))
            return time.perf_counter() - t0

        d = [fresh_like(x) for x in data]
        once(1, *d)  # compile
        t1 = min(once(args.iters, *[fresh_like(x) for x in data])
                 for _ in range(3))
        t2 = min(once(2 * args.iters, *[fresh_like(x) for x in data])
                 for _ in range(3))
        ms = (t2 - t1) / args.iters * 1e3
        print(f"  {label:44s} {ms:8.2f} ms")
        return ms

    def fresh_like(x):
        if x.dtype == jnp.bfloat16:
            return fresh(x.shape).astype(jnp.bfloat16)
        if x.dtype in (jnp.int32, jnp.int64):
            return jnp.asarray(
                rng.integers(0, 5994, x.shape).astype(np.int32)
            )
        if x.dtype == jnp.bool_:
            return jnp.ones(x.shape, bool)
        return fresh(x.shape)

    want = set(
        args.only or ["step", "loss", "proj", "specaug", "tail", "frame"]
    )
    use_mask = not args.no_mask

    # dropout-sampler A/B in ONE process (cross-session reads vary ±2%,
    # CLAUDE.md): step/loss probes run per variant, back to back
    if args.ab_dropout:
        variants = [
            ("hash", w2v2),
            ("bernoulli", dataclasses.replace(
                w2v2, hash_dropout=False, attention_impl="xla"
            )),
        ]
    else:
        variants = [("", w2v2)]

    def build(cfg_):
        model = Wav2Vec2SpeakerModel(
            cfg=Wav2Vec2SpeakerConfig(w2v2=cfg_, stat_pooling_type="mean"),
            num_speakers=5994,
        )
        task = SpeakerTask(model=model, mode="ce")
        wav0 = fresh((2, n))
        variables = jax.jit(model.init)(
            {k: jax.random.PRNGKey(i) for i, k in enumerate(
                ("params", "dropout", "pooling", "masking", "layerdrop")
            )},
            wav0, jnp.ones((2, n), bool),
        )
        return model, task, variables

    if "loss" in want or "step" in want:
        built = [(tag, *build(cfg_)) for tag, cfg_ in variants]
        model, task, variables = built[0][1:]

    if "step" in want:
        import optax

        from w2v2_speaker_tpu.train.state import TrainState
        from w2v2_speaker_tpu.train.steps import make_train_step

        for tag, model_, task_, variables_ in built:
            state = TrainState.create(
                apply_fn=model_.apply, params=variables_["params"],
                tx=optax.adam(1e-4), rng=jax.random.PRNGKey(0),
            )
            step_fn = make_train_step(task_, mesh=None)

            def full_step(st, wav, mask, labels, i, _fn=step_fn):
                b_ = {"features": wav, "labels": labels}
                if use_mask:
                    b_["mask"] = mask
                st2, metrics = _fn(st, b_)
                # scalar with a param dependence so the optimizer update
                # is live
                return metrics["loss"].astype(jnp.float32) + 1e-30 * sum(
                    x.astype(jnp.float32).sum()
                    for x in jax.tree.leaves(st2.params)
                )

            label = f"full train step ({'masked' if use_mask else 'mask-free'}"
            label += f", {tag})" if tag else ")"
            timed_loop(
                full_step, label, state,
                fresh((b, n)), jnp.ones((b, n), bool),
                jnp.asarray(rng.integers(0, 5994, b).astype(np.int32)),
            )

    if "loss" in want:
        def loss_fwd_bwd(p, wav, mask, labels, i):
            batch = {"features": wav, "labels": labels}
            if use_mask:
                batch["mask"] = mask
            key = jax.random.PRNGKey(i.astype(jnp.int32))

            def lf(p_):
                loss, aux = task.loss_fn(p_, {}, batch, key, train=True)
                # metrics assembly is part of the step being attributed
                return loss + 0.0 * aux["metrics"]["accuracy"]

            val, g = jax.value_and_grad(lf)(p)
            return val.astype(jnp.float32) + 1e-30 * sum(
                x.astype(jnp.float32).sum() for x in jax.tree.leaves(g)
            )

        timed_loop(
            loss_fwd_bwd, "task loss fwd+bwd (step minus adam)",
            variables["params"],
            fresh((b, n)), jnp.ones((b, n), bool),
            jnp.asarray(rng.integers(0, 5994, b).astype(np.int32)),
        )

    if "proj" in want:
        proj = FeatureProjection(w2v2)
        x0 = fresh((b, t, c)).astype(jnp.bfloat16)
        pp = proj.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x0[:2], train=True,
        )["params"]

        def proj_fb(p, x, i):
            def lf(p_):
                y = proj.apply(
                    {"params": p_}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(
                        i.astype(jnp.int32))},
                )
                return y.astype(jnp.float32).sum()

            val, g = jax.value_and_grad(lf)(p)
            return val + 1e-30 * sum(
                x_.astype(jnp.float32).sum() for x_ in jax.tree.leaves(g)
            )

        timed_loop(proj_fb, "feature projection fwd+bwd", pp, x0)

    if "specaug" in want:
        x0 = fresh((b, t, h)).astype(jnp.bfloat16)
        embed0 = fresh((h,))

        def spec_fb(embed, x, i):
            key = jax.random.PRNGKey(i.astype(jnp.int32))

            def lf(args_):
                x_, e_ = args_
                m = sample_span_mask(
                    key, b, t, w2v2.mask_time_prob, w2v2.mask_time_length,
                    jnp.full((b,), t),
                )
                y = jnp.where(
                    m[:, :, None], e_.astype(x_.dtype)[None, None, :], x_
                )
                return y.astype(jnp.float32).sum()

            val, g = jax.value_and_grad(lf)((x, embed))
            return val + 1e-30 * sum(
                v.astype(jnp.float32).sum() for v in jax.tree.leaves(g)
            )

        timed_loop(spec_fb, "SpecAugment time-mask fwd+bwd", embed0, x0)

    if "tail" in want:
        head = FCHead(hidden_sizes=(), num_out=5994)
        x0 = fresh((b, t, h)).astype(jnp.bfloat16)
        hp = head.init(jax.random.PRNGKey(0), x0[:2, 0])["params"]
        labels0 = jnp.asarray(rng.integers(0, 5994, b).astype(np.int32))

        def tail_fb(p, x, labels, i):
            def lf(p_):
                pooled = x.mean(axis=1)
                _, logits = head.apply({"params": p_}, pooled, train=True)
                logits = logits.astype(jnp.float32)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
                ).mean()
                acc = (jnp.argmax(logits, -1) == labels).astype(
                    jnp.float32).mean()
                return loss + 0.0 * acc

            val, g = jax.value_and_grad(lf)(p)
            return val + 1e-30 * sum(
                v.astype(jnp.float32).sum() for v in jax.tree.leaves(g)
            )

        timed_loop(
            tail_fb, "mean pool + head + CE + accuracy fwd+bwd",
            hp, x0, labels0,
        )

    if "posconv" in want:
        # both formulations in ONE session (the round-4 trace measured the
        # native grouped form at 10.8 ms inside the step vs PERF's 5.8 ms
        # isolated decomposed row — settle it back-to-back)
        from w2v2_speaker_tpu.models.wav2vec2 import PosConvEmbedding

        x0 = fresh((b, t, h)).astype(jnp.bfloat16)
        for label, decomposed in (
            ("native grouped", False), ("decomposed per-group", True)
        ):
            cfg_p = dataclasses.replace(
                w2v2, posconv_decomposed=decomposed
            )
            mod = PosConvEmbedding(cfg_p)
            pp = mod.init(jax.random.PRNGKey(0), x0[:2])["params"]

            def pc_fb(p, x, i, _mod=mod):
                def lf(p_):
                    return _mod.apply(
                        {"params": p_}, x
                    ).astype(jnp.float32).sum()

                val, g = jax.value_and_grad(lf)(p)
                return val + 1e-30 * sum(
                    v.astype(jnp.float32).sum()
                    for v in jax.tree.leaves(g)
                )

            timed_loop(pc_fb, f"pos conv fwd+bwd ({label})", pp, x0)

    if "frame" in want:
        # float carry (fori_loop needs a dtype-stable carry); validity is
        # mask > 0 as in a real [B, N] bool mask summed per row
        mask0 = jnp.abs(fresh((b, n))) + 1e-3

        def frame_fn(_p, mask, i):
            lengths = feat_extract_output_lengths(
                (mask > 0).sum(axis=-1) + i * 0, w2v2
            )
            fm = jnp.arange(t)[None, :] < lengths[:, None]
            return fm.astype(jnp.float32).sum()

        timed_loop(frame_fn, "frame-mask arithmetic", jnp.zeros(()), mask0)


if __name__ == "__main__":
    main()
