"""validate_scores tool + lr range test."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def test_validate_scores_ok(tmp_path):
    import validate_scores as vs

    pairs = tmp_path / "pairs.txt"
    pairs.write_text("a.wav b.wav\nc.wav d.wav\n")
    scores = tmp_path / "scores.txt"
    scores.write_text("0.9 a.wav b.wav\n0.1 c.wav d.wav\n")
    assert vs.main([str(scores), str(pairs), "--zip"]) == 0
    assert (tmp_path / "scores.zip").exists()


def test_validate_scores_failures(tmp_path):
    import validate_scores as vs

    pairs = tmp_path / "pairs.txt"
    pairs.write_text("a.wav b.wav\nc.wav d.wav\n")

    bad_range = tmp_path / "s1.txt"
    bad_range.write_text("1.5 a.wav b.wav\n0.1 c.wav d.wav\n")
    with pytest.raises(ValueError, match="outside"):
        vs.validate(bad_range, pairs)

    missing = tmp_path / "s2.txt"
    missing.write_text("0.5 a.wav b.wav\n")
    with pytest.raises(ValueError, match="missing"):
        vs.validate(missing, pairs)

    dup = tmp_path / "s3.txt"
    dup.write_text("0.5 a.wav b.wav\n0.4 a.wav b.wav\n")
    with pytest.raises(ValueError, match="duplicate"):
        vs.validate(dup, pairs)


def test_lr_range_test_runs(tmp_path):
    import jax
    import numpy as np

    from w2v2_speaker_tpu.models.xvector import XVectorConfig, XVectorModel
    from w2v2_speaker_tpu.parallel.mesh import create_mesh
    from w2v2_speaker_tpu.runtime.lr_find import lr_range_test
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask

    cfg = XVectorConfig(
        in_channels=8,
        tdnn_channels=(16, 16),
        tdnn_kernel_sizes=(3, 1),
        tdnn_dilations=(1, 1),
        lin_neurons=8,
    )
    model = XVectorModel(cfg=cfg, num_speakers=4)
    task = SpeakerTask(model=model, mode="ce")
    rng = np.random.default_rng(0)

    def batches():
        while True:
            labels = rng.integers(0, 4, size=8)
            yield {
                "features": (
                    labels[:, None, None]
                    + rng.normal(size=(8, 12, 8)).astype(np.float32)
                ).astype(np.float32),
                "mask": np.ones((8, 12), bool),
                "labels": labels,
            }

    example = next(batches())
    params, mstate = task.init(jax.random.PRNGKey(0), example)
    result = lr_range_test(
        task, params, mstate, batches(), create_mesh(), num_steps=30,
        output_dir=tmp_path,
    )
    assert len(result["lr"]) == len(result["loss"])
    assert 1e-8 <= result["suggestion"] <= 1.0
    assert np.isfinite(result["loss"]).all()
    # reference lr-tune artifacts: json + figure (main.py:475-491)
    assert (tmp_path / "data.json").exists()
    # plot.png is written only when matplotlib is importable (optional dep)
    try:
        import matplotlib  # noqa: F401

        assert (tmp_path / "plot.png").exists()
    except ImportError:
        assert not (tmp_path / "plot.png").exists()


def test_batch_gradient_verification():
    import jax
    import jax.numpy as jnp

    from w2v2_speaker_tpu.models.xvector import XVectorConfig, XVectorModel
    from w2v2_speaker_tpu.runtime.debug import batch_gradient_verification
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask

    cfg = XVectorConfig(
        in_channels=8, tdnn_channels=(16, 16), tdnn_kernel_sizes=(3, 1),
        tdnn_dilations=(1, 1), lin_neurons=8,
    )
    model = XVectorModel(cfg=cfg, num_speakers=4)
    task = SpeakerTask(model=model, mode="ce")
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.normal(size=(4, 12, 8)).astype(np.float32),
        "mask": np.ones((4, 12), bool),
        "labels": rng.integers(0, 4, size=4),
    }
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    # clean model: passes
    assert batch_gradient_verification(
        lambda f, m: task.embed_fn(params, mstate, f, m),
        batch["features"],
        batch["mask"],
    )

    # leaky model: embeddings mix across the batch -> must be caught
    def leaky(f, m):
        emb = task.embed_fn(params, mstate, f, m)
        return emb + emb.mean(axis=0, keepdims=True)

    with pytest.raises(AssertionError, match="leakage"):
        batch_gradient_verification(leaky, batch["features"], batch["mask"])


def test_parity_train_report_bands(tmp_path, capsys):
    """tools/parity_train.py --report: smoothed-loss gap, final-loss delta
    and dEER per arm vs the ref arm (host-side math only)."""
    import json

    from parity_train import report

    rng = np.random.default_rng(0)
    base = 3.0 - 0.01 * np.arange(100)

    def dump(arm, seed, eer, jitter):
        p = tmp_path / f"{arm}.json"
        p.write_text(
            json.dumps(
                {
                    "arm": arm,
                    "platform": "cpu",
                    "dtype": "float32",
                    "hash_dropout": False,
                    "train_seed": seed,
                    "params_checksum": "aaaa",
                    "losses": (base + jitter * rng.normal(size=100)).tolist(),
                    "final_eer": eer,
                }
            )
        )
        return str(p)

    paths = [
        dump("ref", 0, 0.10, 0.01),
        dump("ref_seed", 1, 0.11, 0.01),
        dump("prod", 0, 0.10, 0.012),
    ]
    report(paths)
    out = capsys.readouterr().out
    assert "identical init: True" in out
    assert "max smoothed-loss gap" in out
    payload = json.loads(out[out.index("{") : out.rindex("}") + 1])
    arms = {r["arm"]: r for r in payload["rows"]}
    assert set(arms) == {"ref_seed", "prod"}
    # tiny jitter around the same trend: gaps are small, dEER as dumped
    assert arms["prod"]["max_smoothed_loss_gap"] < 0.05
    assert abs(arms["ref_seed"]["delta_eer"] - 0.01) < 1e-9


def test_bench_int8_mix_bucketing():
    """bucket_histogram mirrors extract_embeddings' sort->batch->pad."""
    from bench_int8_mix import bucket_histogram, sample_mix

    SR = 16000
    durations = np.array([4.0, 4.1, 8.0, 8.2, 12.0, 19.9])
    hist = bucket_histogram(durations, batch=2, pad_multiple=16000)
    # sorted pairs: (4.0,4.1)->pad ceil(65600/16000)=5s, (8.0,8.2)->9s,
    # (12.0,19.9)->20s
    assert hist == {5 * SR: 1, 9 * SR: 1, 20 * SR: 1}
    mix = sample_mix(256)
    assert 4.0 <= mix.min() and mix.max() <= 20.0
    assert 7.0 < mix.mean() < 10.0  # VoxCeleb1-O-like mean ~8.2 s


def test_parity_train_smooth_short_runs():
    """--report on smoke runs shorter than the smoothing window must not
    crash (window is clamped to the series length)."""
    import parity_train as pt

    s = pt._smooth([1.0, 2.0, 3.0], window=20)
    assert len(s) == 1 and np.isclose(s[0], 2.0)
    assert len(pt._smooth(np.arange(40, dtype=float), window=20)) == 21


def test_benchmark_estimator_discards_one_sided_stall():
    """median_pair_differential: a transport stall inflating one t(n)
    perturbs exactly one pair; the median keeps the clean reading (the
    BENCH_r02=2002 mechanism, PERF.md round-5 reconciliation)."""
    from w2v2_speaker_tpu.utils.benchmark import median_pair_differential

    calls = []
    # per-iteration true cost 10 ms; pair 2's t(n) suffers a +0.9 s stall
    schedule = {0: 0.0, 1: 0.0, 2: 0.9}
    pair = [0]

    def timed(m):
        calls.append(m)
        base = 0.010 * m
        if m == 64:  # t(n) side
            stall = schedule.get(pair[0], 0.0)
            pair[0] += 1
            return base + stall
        return base

    per_iter = median_pair_differential(timed, 64, pairs=3)
    assert np.isclose(per_iter, 0.010)
    # warmup of both shapes happened before the timed pairs
    assert calls[:2] == [64, 128] and len(calls) == 8


def test_benchmark_fori_forward_runs_n_iterations():
    """make_fori_forward chains a traced number of serially-dependent
    forwards in ONE program (the transport-memoization defense) and
    returns a scalar."""
    import jax.numpy as jnp

    from w2v2_speaker_tpu.utils.benchmark import make_fori_forward

    def forward(scale, w):
        return w * scale

    run = make_fori_forward(forward)
    out = run(3, jnp.asarray(2.0), jnp.ones((4,), jnp.float32))
    assert out.shape == ()
    assert np.isfinite(float(out))
