"""Training-step component profile on the real TPU chip.

Times the speaker_wav2vec2_ce training configuration (BASE + mean pooling +
CE, batch 66 x 3 s crops, bf16 compute — README.md:166-172 recipe shapes)
and its components, using the fori_loop/differential methodology from
CLAUDE.md. Supports LARGE via --size large.

  python tools/bench_train.py                # full step + components
  python tools/bench_train.py --size large --batch 32
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="base", choices=["base", "large"])
    ap.add_argument("--batch", type=int, default=66)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument(
        "--remat-policy", default="nothing",
        choices=["nothing", "dots", "dots_no_batch"],
        help="with --remat: 'dots' saves matmul outputs (recomputes only "
        "elementwise), 'dots_no_batch' saves non-batched dots only "
        "(recomputes attention einsums), 'nothing' recomputes the layer",
    )
    ap.add_argument(
        "--remat-policies", default=None,
        help="comma list from {off,nothing,dots,dots_no_batch}: time the "
        "full train step once per policy back to back in ONE process "
        "(the only comparable A/B on this transport, CLAUDE.md); 'off' "
        "is remat disabled. Replaces the plain 'step' row. A policy "
        "that OOMs prints FAIL instead of aborting the sweep.",
    )
    ap.add_argument(
        "--mu-dtype", default=None, choices=[None, "bfloat16"],
        help="adam first-moment dtype (optim.algo.mu_dtype knob A/B)",
    )
    ap.add_argument("--layerdrop", type=float, default=0.05)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="subset of {step,fwd,conv,conv_bwd,encoder,opt}",
    )
    ap.add_argument(
        "--no-mask", action="store_true",
        help="run fwd/conv components with wav_mask=None (fixed-crop path)",
    )
    ap.add_argument(
        "--dropout", type=float, default=0.1,
        help="hidden dropout for the 'encoder' component A/B",
    )
    ap.add_argument(
        "--unroll", type=int, default=99,
        help="encoder scan unroll factor (99 = full, production default)",
    )
    ap.add_argument(
        "--posconv-decomposed", action="store_true",
        help="per-group dense pos conv instead of native grouped",
    )
    args = ap.parse_args()

    import jax

    # mirror the trainer default (config/trainer/trainer.yaml: prng_impl=rbg;
    # threefry dropout-mask generation is VPU-expensive on TPU)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from w2v2_speaker_tpu.models.wav2vec2 import (
        BASE_CONFIG,
        LARGE_CONFIG,
        ConvFeatureEncoder,
    )
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState
    from w2v2_speaker_tpu.train.steps import make_train_step
    import dataclasses

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"

    w2v2 = dataclasses.replace(
        BASE_CONFIG if args.size == "base" else LARGE_CONFIG,
        dtype="bfloat16",
        layerdrop=args.layerdrop,
        remat=args.remat,
        remat_policy=args.remat_policy,
        encoder_unroll=args.unroll,
        # acc=1 production setting: native grouped pos conv (grad-safe when
        # each program computes the gradient once)
        posconv_decomposed=args.posconv_decomposed,
    )
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=w2v2, stat_pooling_type="mean"),
        num_speakers=5994,
    )
    task = SpeakerTask(model=model, mode="ce")

    b = args.batch
    n = int(16000 * args.seconds)
    rng = np.random.default_rng(0)

    def fresh_batch():
        return {
            "features": jnp.asarray(
                rng.normal(0, 0.1, size=(b, n)).astype(np.float32)
            ),
            "mask": jnp.ones((b, n), bool),
            "labels": jnp.asarray(rng.integers(0, 5994, b)),
        }

    batch0 = fresh_batch()
    init = jax.jit(model.init)
    variables = init(
        {k: jax.random.PRNGKey(i) for i, k in enumerate(
            ("params", "dropout", "pooling", "masking", "layerdrop")
        )},
        batch0["features"][:2],
        batch0["mask"][:2],
    )
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{args.size}: {n_params/1e6:.1f}M params, batch {b} x {args.seconds}s")

    tx = optax.adam(
        1e-4, mu_dtype=jnp.bfloat16 if args.mu_dtype == "bfloat16" else None
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx,
        rng=jax.random.PRNGKey(0),
    )

    def timed_loop(fn, label, iters, p):
        """fn(p, feats, mask, labels) -> scalar; chained via fori_loop.

        ``p`` is threaded as a jit ARGUMENT (never a closure — the remote
        compiler rejects programs with baked-in param trees, HTTP 413).
        """
        @jax.jit
        def run(m, p, feats, mask, labels):
            def body(i, carry):
                f, s = carry
                out = fn(p, f, mask, labels)
                bump = (1.0 + 1e-20 * out).astype(f.dtype)
                return (f * bump, s + out)

            _, s = jax.lax.fori_loop(
                0, m, body, (feats, jnp.float32(0))
            )
            return s

        bt = fresh_batch()
        float(run(1, p, bt["features"], bt["mask"], bt["labels"]))  # compile

        def once(m):
            bt = fresh_batch()
            float(bt["features"].astype(jnp.float32).sum())  # force upload
            t0 = time.perf_counter()
            float(run(m, p, bt["features"], bt["mask"], bt["labels"]))
            return time.perf_counter() - t0

        t1 = min(once(iters) for _ in range(3))
        t2 = min(once(2 * iters) for _ in range(3))
        ms = (t2 - t1) / iters * 1e3
        print(f"  {label:28s} {ms:9.2f} ms")
        return ms

    want = set(args.only or ["step", "fwd", "conv", "conv_bwd", "opt"])

    # full training step (state donated => rebuild per timing? instead keep
    # state captured and only thread features through the loop; optimizer
    # update included via explicit fold)
    def time_step(step_fn, label):
        @jax.jit
        def full_step(m, st, feats, mask, labels):
            def body(i, carry):
                st_, f, s = carry
                bump = (1.0 + 1e-20 * s).astype(f.dtype)
                b_ = {"features": f * bump, "labels": labels}
                if not args.no_mask:
                    b_["mask"] = mask
                st2, metrics = step_fn(st_, b_)
                return (st2, f, metrics["loss"].astype(jnp.float32))

            st, _, s = jax.lax.fori_loop(0, m, body, (st, feats, 0.0))
            return s

        try:
            bt = fresh_batch()
            float(full_step(
                1, state, bt["features"], bt["mask"], bt["labels"]
            ))
        except Exception as e:  # OOM (RESOURCE_EXHAUSTED) etc.
            msg = " ".join(str(e).split())[:600]
            print(f"  {label:28s}      FAIL  {msg}")
            return None

        def once(m):
            bt = fresh_batch()
            float(bt["features"].astype(jnp.float32).sum())
            t0 = time.perf_counter()
            float(full_step(m, state, bt["features"], bt["mask"], bt["labels"]))
            return time.perf_counter() - t0

        t1 = min(once(args.iters) for _ in range(3))
        t2 = min(once(2 * args.iters) for _ in range(3))
        ms = (t2 - t1) / args.iters * 1e3
        print(f"  {label:28s} {ms:9.2f} ms  ({b / ms * 1e3:.0f} utt/s)")
        return ms

    if args.remat_policies:
        # one-process remat-policy sweep: same params/state; only the model
        # wrapper (nn.remat policy) changes per row
        for policy in [p.strip() for p in args.remat_policies.split(",")]:
            w2v2_p = dataclasses.replace(
                w2v2,
                remat=policy != "off",
                remat_policy=policy if policy != "off" else "nothing",
            )
            model_p = Wav2Vec2SpeakerModel(
                cfg=Wav2Vec2SpeakerConfig(
                    w2v2=w2v2_p, stat_pooling_type="mean"
                ),
                num_speakers=5994,
            )
            task_p = SpeakerTask(model=model_p, mode="ce")
            time_step(
                make_train_step(task_p, mesh=None), f"step remat={policy}"
            )
    elif "step" in want:
        time_step(make_train_step(task, mesh=None), "train step (fwd+bwd+adam)")

    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ("dropout", "pooling", "masking", "layerdrop"))}

    use_mask = not args.no_mask

    if "fwd" in want:
        # rng key derived from traced data, never a closed-over concrete
        # key: jit would inline it as a constant and re-fetch it from the
        # device, which the remote transport can fail with an opaque
        # "TPU backend error (Internal)"
        def fwd(p, f, mask, labels):
            b_ = {"features": f, "labels": labels}
            if use_mask:
                b_["mask"] = mask
            key = jax.random.PRNGKey(labels[0].astype(jnp.int32))
            loss, _ = task.loss_fn(p, {}, b_, key, train=True)
            return loss.astype(jnp.float32)

        timed_loop(fwd, "forward only (train mode)", args.iters, state.params)

    if "conv" in want or "conv_bwd" in want:
        enc_model = ConvFeatureEncoder(w2v2)
        conv_params = jax.jit(enc_model.init)(
            jax.random.PRNGKey(0), batch0["features"][:2],
            batch0["mask"][:2]
        )["params"]

        def conv_fwd(p, f, mask, labels):
            feats = enc_model.apply(
                {"params": p}, f, mask if use_mask else None
            )
            return feats.astype(jnp.float32).sum()

        if "conv" in want:
            timed_loop(
                conv_fwd, "conv feature encoder fwd", args.iters, conv_params
            )

        if "conv_bwd" in want:
            def conv_step(cp, f, mask, labels):
                def loss(p):
                    feats = enc_model.apply(
                        {"params": p}, f, mask if use_mask else None
                    )
                    return feats.astype(jnp.float32).sum()

                g = jax.grad(loss)(cp)
                return sum(
                    x.astype(jnp.float32).sum() for x in jax.tree.leaves(g)
                )

            timed_loop(
                conv_step, "conv feature encoder fwd+bwd", args.iters,
                conv_params,
            )

    if "encoder" in want:
        # transformer encoder alone (pos conv + layers) on conv-rate frames;
        # --layerdrop/--dropout flags A/B the stochastic ops' cost
        from w2v2_speaker_tpu.models.wav2vec2 import (
            Encoder,
            feat_extract_output_lengths,
        )

        t_frames = int(feat_extract_output_lengths(n, w2v2))
        enc_cfg = dataclasses.replace(
            w2v2,
            hidden_dropout=args.dropout,
            activation_dropout=0.0,
            attention_dropout=0.0,
        )
        enc = Encoder(enc_cfg)
        h0 = jnp.asarray(
            rng.normal(0, 1, size=(b, t_frames, w2v2.hidden_size)).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)
        enc_rngs = {
            "dropout": jax.random.PRNGKey(1),
            "layerdrop": jax.random.PRNGKey(2),
        }
        enc_params = jax.jit(partial(enc.init, train=True))(
            {"params": jax.random.PRNGKey(0), **enc_rngs}, h0[:2]
        )["params"]

        def enc_fwd(p, f, mask, labels):
            y = enc.apply({"params": p}, f, train=True, rngs=enc_rngs)
            return y.astype(jnp.float32).sum()

        def enc_step(ep, f, mask, labels):
            def loss(p):
                y = enc.apply({"params": p}, f, train=True, rngs=enc_rngs)
                return y.astype(jnp.float32).sum()

            g = jax.grad(loss)(ep)
            return sum(
                x.astype(jnp.float32).sum() for x in jax.tree.leaves(g)
            )

        orig_fresh = fresh_batch

        def fresh_enc_batch():
            return {
                "features": jnp.asarray(
                    rng.normal(0, 1, size=(b, t_frames, w2v2.hidden_size))
                    .astype(np.float32)
                ).astype(jnp.bfloat16),
                "mask": jnp.ones((b, t_frames), bool),
                "labels": jnp.asarray(rng.integers(0, 5994, b)),
            }

        fresh_batch = fresh_enc_batch
        timed_loop(enc_fwd, "transformer encoder fwd", args.iters, enc_params)
        timed_loop(
            enc_step, "transformer encoder fwd+bwd", args.iters, enc_params
        )
        fresh_batch = orig_fresh

    if "opt" in want:
        grads = jax.tree.map(jnp.ones_like, params)
        opt_state = tx.init(params)

        @jax.jit
        def opt_loop(m, g, p, os):
            def body(i, carry):
                p_, os_ = carry
                up, os2 = tx.update(g, os_, p_)
                return (optax.apply_updates(p_, up), os2)

            p, os = jax.lax.fori_loop(0, m, body, (p, os))
            return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(p))

        float(opt_loop(1, grads, params, opt_state))

        def once(m):
            t0 = time.perf_counter()
            float(opt_loop(m, grads, params, opt_state))
            return time.perf_counter() - t0

        # identical args are memoized by the transport; vary m only
        t1 = min(once(args.iters), once(args.iters + 1))
        t2 = min(once(2 * args.iters), once(2 * args.iters + 1))
        print(f"  {'adam update alone':28s} {(t2 - t1) / args.iters * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
