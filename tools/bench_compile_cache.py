"""Cold vs warm time-to-first-step with the persistent compilation cache.

The reference pays no compile tax before step 1 (eager PyTorch,
`/root/reference/src/main.py:497`); this framework pays remote XLA
compiles on every invocation unless executables persist across processes
(runtime/compile_cache.py). This harness measures exactly that workflow
cost: it runs the real `run.py` CLI twice on the SAME config and corpus
with the SAME cache directory — run 1 cold (fresh dir), run 2 warm — and
reports time-to-first-train-step and total wall clock for each.

    python tools/bench_compile_cache.py \
        [--workdir /tmp/cc_bench] [--steps 4] [--size base] [--batch 66]

The config is the shipped `+experiment=speaker_wav2vec2_ce` recipe (BASE
batch-66 x 3 s geometry by default) on a synthetic VoxCeleb-layout corpus,
including the sanity-validation and test-phase programs, so the cold run
compiles the full init + train + val + eval-bucket program set a real
invocation pays for.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SR = 16000


def build_corpus(root: pathlib.Path, n_spk=12, test_spk=3, utt_sec=3.5):
    """Synthetic VoxCeleb-layout corpus (wav/<spk>/<yt>/<utt>.wav + trial
    file) with utterances long enough for 3 s training chunks."""
    import numpy as np

    from w2v2_speaker_tpu.data.io import write_wav

    rng = np.random.default_rng(0)
    freqs = rng.uniform(200, 3500, size=(n_spk, 3))
    wav_dir = root / "wav"
    for s in range(n_spk):
        for y in range(3):
            for u in range(3):
                t = np.arange(int(SR * (utt_sec + rng.uniform(0, 0.5)))) / SR
                sig = sum(
                    np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
                    for f in freqs[s]
                )
                wav = 0.2 * (sig + 0.4 * rng.normal(size=t.shape))
                p = wav_dir / f"id{s:05d}/yt{y}/{u:05d}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                write_wav(p, wav.astype(np.float32), SR)
    test_ids = [f"id{s:05d}" for s in range(n_spk - test_spk, n_spk)]
    lines = []
    for i, spk in enumerate(test_ids):
        lines.append(f"1 {spk}/yt0/00000.wav {spk}/yt1/00001.wav")
        other = test_ids[(i + 1) % len(test_ids)]
        lines.append(f"0 {spk}/yt0/00000.wav {other}/yt1/00002.wav")
    (root / "trials.txt").write_text("\n".join(lines) + "\n")
    return wav_dir, root / "trials.txt"


STEP_RE = re.compile(r"\btrain step (\d+):")


def timed_run(overrides, cache_dir, env_extra=None, timeout_s=3600):
    """Run `python run.py <overrides>` streaming stdout; return a dict with
    time-to-first-step, total wall, and the raw tail for diagnostics."""
    import os

    env = dict(os.environ)
    env["W2V2_COMPILE_CACHE"] = str(cache_dir)
    env.update(env_extra or {})
    cmd = [sys.executable, str(REPO / "run.py"), *overrides]
    t0 = time.perf_counter()
    first_step = None
    tail = []
    proc = subprocess.Popen(
        cmd, cwd=str(REPO), env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # watchdog, not an in-loop check: the loop blocks in readline, so a
    # child hung inside a device call (tunnel trap 10) producing no output
    # would never reach an in-loop timeout test
    import threading

    timed_out = threading.Event()

    def _expire():
        timed_out.set()
        proc.kill()

    watchdog = threading.Timer(timeout_s, _expire)
    watchdog.start()
    try:
        for line in proc.stdout:
            tail.append(line.rstrip())
            if len(tail) > 80:
                tail.pop(0)
            if first_step is None and STEP_RE.search(line):
                first_step = time.perf_counter() - t0
                print(f"    first train step at {first_step:.1f}s",
                      flush=True)
        rc = proc.wait()
        if timed_out.is_set():
            raise TimeoutError(f"run exceeded {timeout_s}s")
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
    total = time.perf_counter() - t0
    return {
        "rc": rc,
        "time_to_first_step_s": first_step,
        "total_wall_s": total,
        "tail": tail,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/cc_bench")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", default="base",
                    choices=["tiny", "base", "large"])
    ap.add_argument("--batch", type=int, default=66)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--keep-cache", action="store_true",
                    help="do not wipe the cache dir (warm-only rerun)")
    args = ap.parse_args(argv)

    work = pathlib.Path(args.workdir)
    corpus_root = work / "corpus"
    cache_dir = work / "xla_cache"
    if not (corpus_root / "trials.txt").exists():
        print("building synthetic corpus ...", flush=True)
        corpus_root.mkdir(parents=True, exist_ok=True)
        build_corpus(corpus_root)
    if cache_dir.exists() and not args.keep_cache:
        shutil.rmtree(cache_dir)

    overrides = [
        "+experiment=speaker_wav2vec2_ce",
        f"network.wav2vec2_size={args.size}",
        f"data.module.data_dir={corpus_root / 'wav'}",
        f"data.module.shards_dir={work / 'shards'}",
        f"data.module.test_trial_path={corpus_root / 'trials.txt'}",
        "data.module.train_val_ratio=0.7",
        "data.module.eer_validation_pairs=12",
        "data.shards.samples_per_shard=32",
        f"data.dataloader.batch_size={args.batch}",
        "data.dataloader.test_batch_size=4",
        "data.dataloader.test_pad_to_multiple=16000",
        f"trainer.max_steps={args.steps}",
        f"trainer.val_check_interval={args.steps}",
        "trainer.log_every=1",
        f"trainer.checkpoint_dir={work / 'ckpt'}",
        "seed=3",
    ]

    results = {}
    for phase in ("cold", "warm"):
        # each phase gets a fresh checkpoint dir so the warm run replays
        # the identical from-scratch program set (resume would skip init)
        shutil.rmtree(work / "ckpt", ignore_errors=True)
        print(f"== {phase} run (cache: {cache_dir}) ==", flush=True)
        r = timed_run(overrides, cache_dir, timeout_s=args.timeout)
        if r["rc"] != 0:
            print("\n".join(r["tail"][-40:]))
            raise SystemExit(f"{phase} run failed rc={r['rc']}")
        results[phase] = {
            k: r[k] for k in ("time_to_first_step_s", "total_wall_s")
        }
        n_entries = len(list(cache_dir.iterdir())) if cache_dir.exists() \
            else 0
        results[phase]["cache_entries_after"] = n_entries
        print(f"  {phase}: first step {r['time_to_first_step_s']}, "
              f"total {r['total_wall_s']:.1f}s, "
              f"cache entries {n_entries}", flush=True)

    cold, warm = results["cold"], results["warm"]
    if cold["time_to_first_step_s"] and warm["time_to_first_step_s"]:
        results["first_step_speedup"] = round(
            cold["time_to_first_step_s"] / warm["time_to_first_step_s"], 2
        )
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
