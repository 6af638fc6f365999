"""Trainer-contract knobs (reference config/trainer/trainer.yaml:19-67):
gradient_clip_val, fast_dev_run, num_sanity_val_steps, limit_test_batches,
min_steps — VERDICT r3 directive 4."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

SR = 16000


# ------------------------------------------------------- gradient_clip_val

def _global_norm(tree):
    import jax

    return float(
        np.sqrt(
            sum(float((np.asarray(x) ** 2).sum()) for x in jax.tree.leaves(tree))
        )
    )


def test_gradient_clip_val_bounds_update_norm():
    """With SGD(lr=1, momentum=0) the update equals -grad, so the update's
    global norm must equal min(clip_val, grad_norm) (reference
    trainer.yaml:64-67 → PL Trainer(gradient_clip_val=...))."""
    from w2v2_speaker_tpu.runtime.experiment import build_optimizer

    def make_cfg(clip):
        return {
            "optim": {
                "algo": {"name": "sgd", "lr": 1.0, "momentum": 0.0},
                "schedule": {"name": "constant"},
            },
            "trainer": {"max_steps": 10, "gradient_clip_val": clip},
            "network": {},
        }

    params = {"w": np.zeros((4, 4), np.float32), "b": np.zeros(3, np.float32)}
    grads = {
        "w": np.full((4, 4), 100.0, np.float32),
        "b": np.full(3, -50.0, np.float32),
    }
    raw_norm = _global_norm(grads)
    assert raw_norm > 10

    tx = build_optimizer(make_cfg(1.5))
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    assert _global_norm(updates) == pytest.approx(1.5, rel=1e-5)
    # clipping preserves gradient direction (pure rescale)
    ratio = np.asarray(updates["w"]) / grads["w"]
    assert np.allclose(ratio, ratio.flat[0])

    # 0 (the default) means no clipping
    tx = build_optimizer(make_cfg(0))
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    assert _global_norm(updates) == pytest.approx(raw_norm, rel=1e-5)


def test_gradient_clip_composes_with_freeze_and_plateau():
    """Clip must survive the inject_hyperparams (plateau) and freeze-mask
    wrappers build_optimizer layers on top."""
    from w2v2_speaker_tpu.runtime.experiment import build_optimizer

    cfg = {
        "optim": {
            "algo": {"name": "adam", "lr": 0.1, "b1": 0.9, "b2": 0.999},
            "schedule": {"name": "reduce_on_plateau"},
        },
        "trainer": {"max_steps": 10, "gradient_clip_val": 1.0},
        "network": {},
    }
    params = {"w": np.zeros((2, 2), np.float32)}
    grads = {"w": np.full((2, 2), 1e6, np.float32)}
    tx = build_optimizer(cfg)
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    # adam normalizes magnitudes; the clipped path must stay finite and
    # bounded by lr regardless of the huge raw grad
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert np.abs(np.asarray(updates["w"])).max() <= 0.1 + 1e-6


# ------------------------------------------------------------- min_steps

def test_min_steps_suppresses_early_stop(tmp_path, capsys):
    """Early stopping fires on a flat metric but trainer.min_steps keeps the
    run alive until the floor is reached (reference trainer.yaml:19-21)."""
    import jax
    import optax

    from w2v2_speaker_tpu.models.dummy import DummyModel
    from w2v2_speaker_tpu.parallel.mesh import create_mesh
    from w2v2_speaker_tpu.runtime.experiment import _train_loop
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState

    model = DummyModel(num_speakers=4)
    rng = np.random.default_rng(0)

    def mk_batch(n=4):
        return {
            "features": rng.normal(size=(n, 400)).astype(np.float32),
            "mask": np.ones((n, 400), bool),
            "labels": np.arange(n) % 4,
        }

    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((4, 400), np.float32),
        np.ones((4, 400), bool),
    )["params"]
    task = SpeakerTask(model=model, mode="ce")
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
        rng=jax.random.PRNGKey(1),
    )
    cfg = {
        "seed": 0,
        "optim": {"algo": {"lr": 1e-3}, "schedule": {"name": "constant"}},
        "trainer": {
            "max_steps": 8,
            "min_steps": 6,
            "val_check_interval": 2,
            "accumulate_grad_batches": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_every": 1,
        },
        "callbacks": {
            "early_stopping": {
                "monitor": "val_eer", "patience": 1, "min_delta": 0.0,
            }
        },
    }

    class NullLogger:
        def log_step(self, *a, **k):
            pass

        log_eval = log_step

    def train_iter(_epoch):
        while True:
            yield mk_batch()

    mesh = create_mesh(jax.devices()[:1])
    state, _ = _train_loop(
        cfg, task, state, mesh, NullLogger(), train_iter,
        lambda s, max_batches=None: {"val_eer": 0.5},  # never improves
    )
    out = capsys.readouterr().out
    # patience 1 on a flat metric trips at the 2nd validation (step 4);
    # min_steps=6 suppresses it there, then step 6 stops for real
    assert "suppressed: min_steps=6" in out
    assert "early stopping at step 6" in out
    assert int(state.step) == 6


# ----------------------------------------------- e2e knobs through run.py

@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tests.test_runtime import _build_corpus

    return _build_corpus(tmp_path_factory.mktemp("trainer_contract_corpus"))


def _overrides(corpus, tmp_path, extra):
    from tests.test_runtime import _common_overrides

    return _common_overrides(
        corpus, tmp_path, ["+experiment=speaker_dummy"] + extra
    )


def test_fast_dev_run_smoke_no_checkpoints(corpus, tmp_path, capsys):
    """fast_dev_run=true: one train batch, one val batch, one test batch,
    no checkpoints on disk (reference trainer.yaml:50-52, PL semantics)."""
    import run as run_cli

    objective = run_cli.main(
        _overrides(
            corpus,
            tmp_path,
            # one test batch must cover the whole (tiny) test split so the
            # capped test phase still scores complete trials
            ["trainer.fast_dev_run=true", "data.dataloader.test_batch_size=32"],
        )
    )
    assert objective is not None and 0.0 <= objective <= 1.0
    out = capsys.readouterr().out
    assert "fast_dev_run: 1 train/val/test batch(es)" in out
    ckpt = tmp_path / "ckpt"
    assert not (ckpt / "last").exists()
    assert not (ckpt / "best").exists()


def test_num_sanity_val_steps_runs_before_training(corpus, tmp_path, capsys):
    """A sanity validation of N batches runs before step 1 (reference
    trainer.yaml:57-58; PL default 2, our debug_trainer pins 0)."""
    import run as run_cli

    objective = run_cli.main(
        _overrides(corpus, tmp_path, ["trainer.num_sanity_val_steps=1"])
    )
    assert 0.0 <= objective <= 1.0
    out = capsys.readouterr().out
    assert "sanity validation: 1 batch(es)" in out
    # the sanity pass happens before the first logged train step
    assert out.index("sanity validation") < out.index("step ")


def test_limit_test_batches_zero_skips_test(corpus, tmp_path, capsys):
    """limit_test_batches=0 skips the test phase like the reference's
    debug_trainer (debug_trainer.yaml:12): null objective, training ran."""
    import run as run_cli

    objective = run_cli.main(
        _overrides(corpus, tmp_path, ["trainer.limit_test_batches=0"])
    )
    assert objective is None
    assert "limit_test_batches=0: skipping the test phase" in (
        capsys.readouterr().out
    )
    # training itself still happened
    assert (tmp_path / "ckpt" / "last").exists()


def test_limit_test_batches_caps_and_filters_pairs(corpus, tmp_path):
    """limit_test_batches=N: at most N test batches are embedded and only
    trials with both sides embedded are scored."""
    import run as run_cli

    objective = run_cli.main(
        _overrides(corpus, tmp_path, ["trainer.limit_test_batches=1"])
    )
    # the synthetic trial list references the first test batch's utterances,
    # so a capped run still produces a scoreable objective
    assert objective is None or 0.0 <= objective <= 1.0


def test_limit_train_batches_caps_per_epoch_not_per_run(
    corpus, tmp_path, capsys
):
    """limit_train_batches caps batches PER EPOCH; training continues into
    later epochs until max_steps (PL semantics — the reference's
    debug_trainer pairs limit_train_batches=10 with max_epochs=1000,
    debug_trainer.yaml:10-15). Regression: the loop used to break after the
    first capped epoch, so max_steps past one epoch was unreachable."""
    import run as run_cli

    run_cli.main(
        _overrides(
            corpus,
            tmp_path,
            [
                "trainer.limit_train_batches=2",
                "trainer.max_steps=6",
                "trainer.val_check_interval=1000",
                "trainer.log_every=2",
            ],
        )
    )
    out = capsys.readouterr().out
    # three capped epochs of 2 steps each reach the 6-step target
    assert "train step 6:" in out
    # the capped epoch end still validates (epoch-cap validation)
    assert "val step 2:" in out


def test_default_trainer_exposes_reference_knobs():
    from w2v2_speaker_tpu.runtime.config import load_config

    cfg = load_config(REPO / "config", "train_eval", [])
    t = cfg["trainer"]
    assert t["gradient_clip_val"] == 0
    assert t["fast_dev_run"] is False
    assert t["num_sanity_val_steps"] == 2
    assert t["limit_test_batches"] is None
    assert t["min_steps"] is None


def _mini_loop_fixture(tmp_path, trainer_extra, val_metric=0.5,
                       epoch_len=None, callbacks=None):
    """Shared harness: DummyModel + _train_loop with a configurable
    per-epoch batch count and a constant validation metric. Returns
    (final_state, stdout-capture-free validate-call log)."""
    import jax
    import optax

    from w2v2_speaker_tpu.models.dummy import DummyModel
    from w2v2_speaker_tpu.parallel.mesh import create_mesh
    from w2v2_speaker_tpu.runtime.experiment import _train_loop
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState

    model = DummyModel(num_speakers=4)
    rng = np.random.default_rng(0)

    def mk_batch(n=4):
        return {
            "features": rng.normal(size=(n, 400)).astype(np.float32),
            "mask": np.ones((n, 400), bool),
            "labels": np.arange(n) % 4,
        }

    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((4, 400), np.float32),
        np.ones((4, 400), bool),
    )["params"]
    import jax as _jax
    task = SpeakerTask(model=model, mode="ce")
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
        rng=_jax.random.PRNGKey(1),
    )
    cfg = {
        "seed": 0,
        "optim": {"algo": {"lr": 1e-3}, "schedule": {"name": "constant"}},
        "trainer": {
            "max_steps": 100,
            "val_check_interval": 2,
            "accumulate_grad_batches": 1,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_every": 1,
            **trainer_extra,
        },
    }
    if callbacks:
        cfg["callbacks"] = callbacks

    class NullLogger:
        def log_step(self, *a, **k):
            pass

        log_eval = log_step

    def train_iter(_epoch):
        n = 0
        while epoch_len is None or n < epoch_len:
            yield mk_batch()
            n += 1

    validations = []

    def validate(s, max_batches=None):
        validations.append(int(s.step))
        return {"val_eer": val_metric}

    mesh = create_mesh(jax.devices()[:1])
    state, _ = _train_loop(
        cfg, task, state, mesh, NullLogger(), train_iter, validate
    )
    return state, validations


def test_max_epochs_caps_run(tmp_path):
    """trainer.max_epochs ends training after N exhaustions of the train
    iterator even though max_steps is far away (reference trainer.yaml:
    17-18, PL Trainer(max_epochs=...)); the capped final weights are still
    validated/checkpointed like a PL epoch end."""
    state, validations = _mini_loop_fixture(
        tmp_path,
        {"max_epochs": 2, "max_steps": 100, "val_check_interval": 100},
        epoch_len=3,
    )
    assert int(state.step) == 6  # 2 epochs x 3 batches
    # the epoch cap landed between step-interval validations: exactly one
    # final-weights validation ran, at the capped step
    assert validations == [6]


def test_min_epochs_suppresses_early_stop(tmp_path, capsys):
    """Early stopping on a flat metric is suppressed until min_epochs
    complete epochs have run (reference trainer.yaml:14-16)."""
    state, validations = _mini_loop_fixture(
        tmp_path,
        {"min_epochs": 3, "max_steps": 100},
        epoch_len=2,
        callbacks={
            "early_stopping": {
                "monitor": "val_eer", "patience": 1, "min_delta": 0.0,
            }
        },
    )
    out = capsys.readouterr().out
    # patience 1 on a flat metric trips at the 2nd validation (step 4,
    # epoch 1) and again at step 6 (epoch 2) - both under the epoch floor;
    # step 8 runs in epoch 3 and stops for real
    assert "suppressed: min_epochs=3" in out
    assert "early stopping at step 8" in out
    assert int(state.step) == 8


def test_deterministic_knob_validated_noop(corpus, tmp_path, capsys):
    """trainer.deterministic=true is accepted and documented as a no-op
    (XLA is deterministic by default); a non-bool value fails loudly
    (reference trainer.yaml:36-37)."""
    import run as run_cli

    run_cli.main(
        _overrides(corpus, tmp_path, ["trainer.deterministic=true",
                                      "eval_model=false"])
    )
    out = capsys.readouterr().out
    assert "deterministic=true: no-op on XLA backends" in out

    with pytest.raises(ValueError, match="deterministic"):
        run_cli.main(
            _overrides(corpus, tmp_path / "b",
                       ["trainer.deterministic=sometimes",
                        "eval_model=false"])
        )


def test_default_trainer_exposes_epoch_knobs():
    from w2v2_speaker_tpu.runtime.config import load_config

    cfg = load_config(REPO / "config", "train_eval", [])
    t = cfg["trainer"]
    assert t["max_epochs"] is None
    assert t["min_epochs"] is None
    assert t["deterministic"] is False


def test_epoch_counter_survives_resume(tmp_path):
    """PL persists the epoch counter in its checkpoints; a max_epochs-capped
    run relaunched with trainer.resume=true must stop immediately instead
    of training max_epochs MORE epochs (epoch rides the checkpoint index,
    train/checkpoint.py::CheckpointManager.last_epoch)."""
    trainer = {"max_epochs": 2, "max_steps": 100,
               "val_check_interval": 100}
    state, _ = _mini_loop_fixture(tmp_path, trainer, epoch_len=3)
    assert int(state.step) == 6  # 2 epochs x 3 batches

    state2, _ = _mini_loop_fixture(
        tmp_path, {**trainer, "resume": True}, epoch_len=3
    )
    assert int(state2.step) == 6, (
        "resumed run restarted epoch accounting from 0"
    )


def test_checkpoint_index_epoch_roundtrip(tmp_path):
    """save_step(epoch=) -> last_epoch() round-trips through index.json,
    and a fresh manager over the same dir reads it back."""
    import jax
    import optax

    from w2v2_speaker_tpu.models.dummy import DummyModel
    from w2v2_speaker_tpu.train.checkpoint import CheckpointManager
    from w2v2_speaker_tpu.train.state import TrainState

    model = DummyModel(num_speakers=4)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((2, 400), np.float32),
        np.ones((2, 400), bool),
    )["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
        rng=jax.random.PRNGKey(1),
    )
    mgr = CheckpointManager(tmp_path / "ck", top_k=1)
    assert mgr.last_epoch() is None
    mgr.save_step(state, {"val_eer": 0.4}, epoch=3)
    assert mgr.last_epoch() == 3
    assert CheckpointManager(tmp_path / "ck", top_k=1).last_epoch() == 3
