"""TPE hyperparameter search: sampler convergence + reference search-preset
composition + tiny end-to-end search through run.py (the reference's optuna
sweeper workflows, config/search/*.yaml)."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from w2v2_speaker_tpu.runtime.sweeper import TPESampler, format_override


def _objective(params):
    """Minimum at lr=1e-3, pooling='mean', wd small."""
    lr_term = (np.log10(params["optim.algo.lr"]) + 3.0) ** 2
    pool_term = 0.0 if params["network.stat_pooling_type"] == "mean" else 1.0
    wd_term = 0.5 if float(params["optim.algo.weight_decay"]) > 1e-4 else 0.0
    return lr_term + pool_term + wd_term


SPACE = {
    "optim.algo.lr": {"type": "float", "low": 1e-8, "high": 1, "log": True},
    "network.stat_pooling_type": {
        "type": "categorical",
        "choices": ["mean", "mean+std", "max", "first"],
    },
    "optim.algo.weight_decay": {
        "type": "categorical",
        "choices": [0, 1e-6, 1e-4, 1e-2],
    },
}


def _run_study(sampler_kwargs, n_trials=60, seed=0):
    s = TPESampler(SPACE, **sampler_kwargs)
    for _ in range(n_trials):
        p = s.ask()
        s.tell(p, _objective(p))
    return s.best


def test_tpe_beats_random_sampling():
    # pure-random baseline = TPE that never leaves the startup phase
    best_tpe = _run_study(dict(seed=7, n_startup_trials=12))[1]
    best_rand = _run_study(dict(seed=7, n_startup_trials=10_000))[1]
    assert best_tpe <= best_rand
    # and it actually localized the optimum basin
    params, val = _run_study(dict(seed=3, n_startup_trials=12), n_trials=80)
    # lr within ~one decade of the optimum and the right pooling category
    assert val < 1.0
    assert params["network.stat_pooling_type"] == "mean"


def test_tpe_int_dimension_and_direction():
    space = {"optim.loss.scale": {"type": "int", "low": 1, "high": 50}}
    s = TPESampler(space, seed=0, n_startup_trials=8, direction="maximize")
    for _ in range(40):
        p = s.ask()
        assert isinstance(p["optim.loss.scale"], int)
        assert 1 <= p["optim.loss.scale"] <= 50
        s.tell(p, -abs(p["optim.loss.scale"] - 37))
    best, val = s.best
    assert abs(best["optim.loss.scale"] - 37) <= 5


def test_format_override_roundtrip():
    from w2v2_speaker_tpu.runtime.config import _parse_value

    assert format_override("a.b", 3.2e-05) == "a.b=3.2e-05"
    assert _parse_value("3.2e-05") == pytest.approx(3.2e-05)
    assert format_override("optim/schedule", "tri_stage") == (
        "optim/schedule=tri_stage"
    )


def test_search_presets_compose():
    """All three reference-mirroring presets must compose with the config
    system and carry their search spaces (+ the aam preset's loss switch)."""
    from w2v2_speaker_tpu.runtime.config import load_config

    for name in ("lr_and_pooling", "lr_and_aam_loss",
                 "lr_and_schedule_search"):
        cfg = load_config(REPO / "config", "train_eval", [f"+search={name}"])
        space = cfg["search"]["search_space"]
        assert "optim.algo.lr" in space
        assert cfg["search"]["sampler"] == "tpe"
        if name == "lr_and_aam_loss":
            assert cfg["optim"]["loss"]["name"] == "aam_softmax"
            assert "optim.loss.margin" in space
        if name == "lr_and_schedule_search":
            assert space["optim/schedule"]["type"] == "categorical"


def test_end_to_end_tiny_search(tmp_path):
    """A 3-trial TPE study over the dummy recipe completes and returns the
    best objective (the reference's documented search workflow)."""
    import run as run_cli
    from tests.test_runtime import _build_corpus

    wav_dir, trials = _build_corpus(tmp_path / "corpus", n_spk=6, test_spk=2)
    objective = run_cli.main(
        [
            "-m",
            "+search=lr_and_pooling",
            "+experiment=speaker_dummy",
            "search.n_trials=3",
            "search.n_startup_trials=2",
            f"data.module.data_dir={wav_dir}",
            f"data.module.shards_dir={tmp_path / 'shards'}",
            f"data.module.test_trial_path={trials}",
            "data.module.train_val_ratio=0.7",
            "data.module.eer_validation_pairs=8",
            "data.shards.samples_per_shard=8",
            "data.dataloader.batch_size=8",
            "data.dataloader.test_batch_size=4",
            "data.dataloader.test_pad_to_multiple=8000",
            "data.pipeline.chunk_length_sec=1.0",
            "trainer=debug_trainer",
            "trainer.max_steps=3",
            "trainer.val_check_interval=3",
            f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
            "seed=5",
        ]
    )
    assert 0.0 <= objective <= 1.0
