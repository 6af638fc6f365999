"""Training-trajectory parity harness (VERDICT r4 directive 3).

The published deliverable of the reference is a *trained* EER
(reference `speaker_recognition_module.py:462-519`, `README.md:3-23`);
round 4 proved serving-path parity only. This harness compares seeded
BASE-geometry **training trajectories** between

  ref   — reference numeric semantics inside this codebase: f32 compute
          + jax.random.bernoulli dropout masks (`Wav2Vec2Config.
          hash_dropout=False` restores the nn.Dropout sampler), run on
          the host CPU like the reference's f32 PyTorch path
  prod  — this repo's production training config: bf16 compute + the
          counter-hash dropout masks (`models/wav2vec2.py:373-421`) +
          rng layerdrop, run on the real chip when available

on IDENTICAL synthetic speaker batches from IDENTICAL f32 initial
parameters (compute dtype never touches flax param dtype; a params
checksum is recorded to prove it). Because the two dropout samplers are
distribution-identical but stream-different, trajectories diverge
sample-wise by design; the parity claim is therefore *distributional*
and anchored by a seed band: a third arm (`ref_seed`) reruns the
reference semantics with a different dropout seed, and `--report`
checks that the ref↔prod gap (smoothed-loss divergence, final-loss
delta, end-state EER delta on a held-out trial set) sits within /
near the ref↔ref_seed band. An optional `f32hash` arm isolates the
dropout-sampler effect from the dtype effect.

Usage (one process per arm so each pins its own platform):
  python tools/parity_train.py --arm ref      --out /tmp/pt_ref.json
  python tools/parity_train.py --arm ref_seed --out /tmp/pt_refseed.json
  python tools/parity_train.py --arm prod     --out /tmp/pt_prod.json
  python tools/parity_train.py --report /tmp/pt_ref.json /tmp/pt_refseed.json \
      /tmp/pt_prod.json

Arms `ref`/`ref_seed`/`f32hash` force the CPU backend; `prod` runs on
the ambient backend (the real TPU under axon) with chunked dispatch
(stacked lax.scan steps) so 200 steps don't pay 200 tunnel round-trips.
Results land in PERF.md (round 5).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

SR = 16000
CROP = 12000          # 0.75 s crops keep a 1-core f32 arm under ~30 min
BATCH = 8
N_SPEAKERS = 12
TRAIN_UTTS_PER_SPK = 24
EVAL_UTTS_PER_SPK = 3
MAX_LR = 1e-4

ARMS = {
    # name: (dtype, hash_dropout, train_seed, platform)
    "ref": ("float32", False, 0, "cpu"),
    "ref_seed": ("float32", False, 1, "cpu"),
    "f32hash": ("float32", True, 0, "cpu"),
    "prod": ("bfloat16", True, 0, "ambient"),
}


def make_corpus(seed=11):
    """Learnable synthetic speakers: per-speaker 3-sine signature + noise.

    Same construction as tools/parity_onchip.py so EER is meaningful
    after a couple hundred CE steps.
    """
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(200, 3000, size=(N_SPEAKERS, 3))

    def utt(s, dur):
        t = np.arange(dur) / SR
        sig = sum(
            np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs[s]
        )
        return (0.15 * (sig + 0.5 * rng.normal(size=dur))).astype(np.float32)

    train = [
        (utt(s, CROP), s)
        for s in range(N_SPEAKERS)
        for _ in range(TRAIN_UTTS_PER_SPK)
    ]
    evals = []
    for s in range(N_SPEAKERS):
        for u in range(EVAL_UTTS_PER_SPK):
            dur = int(SR * rng.uniform(0.8, 1.6))
            evals.append((f"id{s:05d}/yt0/{u:05d}", utt(s, dur), s))
    return train, evals


def batch_stream(n_train, steps, seed=7):
    """Step -> indices, identical for every arm."""
    rng = np.random.default_rng(seed)
    return [rng.integers(0, n_train, BATCH) for _ in range(steps)]


def trial_pairs(evals):
    from w2v2_speaker_tpu.data.trials import EvaluationPair

    by_spk = {}
    for key, _, s in evals:
        by_spk.setdefault(s, []).append(key)
    pairs = []
    spks = sorted(by_spk)
    for i, spk in enumerate(spks):
        utts = by_spk[spk]
        for a in range(len(utts)):
            for b in range(a + 1, len(utts)):
                pairs.append(EvaluationPair(True, utts[a], utts[b]))
        other = by_spk[spks[(i + 1) % len(spks)]]
        for a, b in zip(utts, other):
            pairs.append(EvaluationPair(False, a, b))
    return pairs


def params_checksum(params):
    import jax

    leaves = jax.tree.leaves(params)
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.asarray(leaf, dtype=np.float32).tobytes())
    return h.hexdigest()[:16]


def run_arm(arm: str, steps: int, out: str, dispatch: int):
    dtype, hash_dropout, train_seed, platform = ARMS[arm]
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import optax

    from w2v2_speaker_tpu.data.samples import SpeakerSample
    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.objectives.schedules import one_cycle
    from w2v2_speaker_tpu.runtime.experiment import extract_embeddings
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState
    from w2v2_speaker_tpu.train.steps import make_embed_fn, make_train_step
    from w2v2_speaker_tpu.eval.metrics import calculate_eer

    real_platform = jax.devices()[0].platform
    if platform == "cpu":
        assert real_platform == "cpu", real_platform
    K = dispatch if real_platform == "tpu" else 1
    K = min(K, steps)  # smoke runs with --steps < --dispatch must not
    # round the step count down to zero (empty losses break --report)
    steps = (steps // K) * K

    train, evals = make_corpus()
    stream = batch_stream(len(train), steps)
    feats = np.stack([w for w, _ in train])
    labels = np.array([s for _, s in train], np.int64)

    cfg = Wav2Vec2Config(dtype=dtype, hash_dropout=hash_dropout)
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(
            w2v2=cfg,
            stat_pooling_type="mean",
            hidden_fc_layers_out=(),
            embedding_layer_idx=-1,
        ),
        num_speakers=N_SPEAKERS,
    )
    task = SpeakerTask(model=model, mode="ce")
    example = {
        "features": np.zeros((BATCH, CROP), np.float32),
        "mask": np.ones((BATCH, CROP), bool),
        "labels": np.zeros(BATCH, np.int64),
    }
    params, model_state = jax.jit(task.init)(jax.random.PRNGKey(0), example)
    checksum = params_checksum(params)

    tx = optax.adam(one_cycle(max_lr=MAX_LR, total_steps=steps))
    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        model_state=model_state,
        rng=jax.random.PRNGKey(100 + train_seed),
    )
    step_fn = make_train_step(task, steps_per_dispatch=K)

    losses = []
    t0 = time.time()
    for d in range(steps // K):
        idx = stream[d * K : (d + 1) * K]
        if K == 1:
            batch = {
                "features": feats[idx[0]],
                "mask": np.ones((BATCH, CROP), bool),
                "labels": labels[idx[0]],
            }
        else:
            batch = {
                "features": np.stack([feats[i] for i in idx]),
                "mask": np.ones((K, BATCH, CROP), bool),
                "labels": np.stack([labels[i] for i in idx]),
            }
        state, m = step_fn(state, batch)
        loss = np.asarray(m["loss"], np.float32).reshape(-1)
        losses.extend(float(x) for x in loss)
        done = len(losses)
        if done % 20 == 0 or done == steps:
            print(
                f"[{arm}] step {done}/{steps} loss {losses[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    # end-state EER on the held-out trial set (deterministic extraction on
    # this arm's own platform; round-4 serving parity — drift 1.08e-4,
    # dEER 0 — bridges CPU-f32 vs chip-bf16 extraction)
    samples = [
        SpeakerSample(key=k, wav=w, ground_truth=s) for k, w, s in evals
    ]
    pairs = trial_pairs(evals)
    emb = extract_embeddings(
        make_embed_fn(task), state, samples, pad_to_multiple=8000, batch_size=8
    )
    emb_map = {e.sample_id: np.asarray(e.embedding, np.float32) for e in emb}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    scores = np.clip(
        (
            np.array(
                [cos(emb_map[p.sample1_id], emb_map[p.sample2_id]) for p in pairs]
            )
            + 1.0
        )
        / 2.0,
        0.0,
        1.0,
    )
    gt = [1 if p.same_speaker else 0 for p in pairs]
    eer, _ = calculate_eer(gt, scores.tolist(), pos_label=1)

    result = {
        "arm": arm,
        "platform": real_platform,
        "dtype": dtype,
        "hash_dropout": hash_dropout,
        "train_seed": train_seed,
        "steps": steps,
        "batch": BATCH,
        "crop": CROP,
        "max_lr": MAX_LR,
        "params_checksum": checksum,
        "losses": [round(x, 5) for x in losses],
        "final_eer": round(float(eer), 6),
        "n_trials": len(pairs),
        "wall_s": round(time.time() - t0, 1),
    }
    pathlib.Path(out).write_text(json.dumps(result))
    print(json.dumps({k: v for k, v in result.items() if k != "losses"}))


def _smooth(xs, window=20):
    xs = np.asarray(xs, np.float64)
    # smoke runs shorter than the window still get a (coarser) curve —
    # 'valid' with window > len would return a zero-length array and crash
    # the report's np.max
    window = max(1, min(window, len(xs)))
    c = np.convolve(xs, np.ones(window) / window, mode="valid")
    return c


def report(paths):
    runs = {r["arm"]: r for r in (json.loads(pathlib.Path(p).read_text()) for p in paths)}
    ref = runs["ref"]
    checks = {r["params_checksum"] for r in runs.values()}
    # CPU arms share one checksum regardless of compute dtype (init params
    # are f32 either way); a TPU arm's init differs at ULP level from the
    # platform's rsqrt/normal math — the lockstep table below bounds the
    # effect of that plus bf16 directly.
    print(f"params checksums: {sorted(checks)} "
          f"(identical init: {len(checks) == 1})")
    n = min(len(r["losses"]) for r in runs.values())
    sm = {a: _smooth(r["losses"][:n]) for a, r in runs.items()}
    rows = []
    for arm, r in runs.items():
        if arm == "ref":
            continue
        gap = float(np.max(np.abs(sm[arm] - sm["ref"])))
        final = float(np.mean(r["losses"][n - 20 : n]))
        final_ref = float(np.mean(ref["losses"][n - 20 : n]))
        rows.append(
            {
                "arm": arm,
                "vs": "ref",
                "max_smoothed_loss_gap": round(gap, 4),
                "final_loss_delta": round(final - final_ref, 4),
                "eer": r["final_eer"],
                "delta_eer": round(r["final_eer"] - ref["final_eer"], 6),
            }
        )
    lockstep = None
    if "prod" in runs and "f32hash" in runs:
        # prod and f32hash share seed AND dropout masks (counter-hash is
        # platform-independent), so per-step deltas isolate bf16-vs-f32
        # numerics + TPU-vs-CPU matmul accumulation order — no smoothing.
        a = np.asarray(runs["prod"]["losses"][:n], np.float64)
        b = np.asarray(runs["f32hash"]["losses"][:n], np.float64)
        d = np.abs(a - b)
        lockstep = {
            "pair": "prod vs f32hash (pure bf16/platform effect, same masks)",
            "max_abs_dloss_first_20": round(float(d[:20].max()), 5),
            "max_abs_dloss_first_40": round(float(d[:40].max()), 5),
            "divergence_step": int(np.argmax(d > 0.1)) if bool((d > 0.1).any()) else None,
        }
    print(json.dumps({"ref_eer": ref["final_eer"], "rows": rows,
                      "lockstep": lockstep}, indent=1))
    # markdown for PERF.md
    print("\n| arm | platform | max smoothed-loss gap vs ref | final-loss Δ | EER | ΔEER |")
    print("|---|---|---|---|---|---|")
    print(
        f"| ref (f32+bernoulli, seed 0) | {ref['platform']} | — | — |"
        f" {ref['final_eer']:.4f} | — |"
    )
    for row in rows:
        r = runs[row["arm"]]
        print(
            f"| {row['arm']} ({r['dtype']}+{'hash' if r['hash_dropout'] else 'bernoulli'},"
            f" seed {r['train_seed']}) | {r['platform']} |"
            f" {row['max_smoothed_loss_gap']} | {row['final_loss_delta']:+.4f} |"
            f" {row['eer']:.4f} | {row['delta_eer']:+.4f} |"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=sorted(ARMS))
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dispatch", type=int, default=10,
                    help="steps per device dispatch on TPU (lax.scan chunk)")
    ap.add_argument("--report", nargs="+", default=None,
                    help="arm result JSONs to compare")
    args = ap.parse_args()
    if args.report:
        report(args.report)
        return
    if not args.arm:
        ap.error("--arm or --report required")
    run_arm(args.arm, args.steps, args.out or f"/tmp/pt_{args.arm}.json",
            args.dispatch)


if __name__ == "__main__":
    main()
