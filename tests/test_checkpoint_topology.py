"""Sharded-checkpoint round-trips across mesh topologies.

Save a TrainState on one mesh, restore onto a DIFFERENT device count and
onto TP-sharded placements, then take one more training step — the
multi-chip reality (pods grow/shrink between runs) the reference never
faces (SURVEY §5.4: orbax train-state persistence is this repo's
equivalent of the reference's ModelCheckpoint,
`config/callbacks/speaker_default.yaml:15-25`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.parallel.mesh import create_mesh, shard_batch
from w2v2_speaker_tpu.parallel.tp import apply_tp_sharding
from w2v2_speaker_tpu.train.checkpoint import CheckpointManager
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

from tests.test_tensor_parallel import TINY


def _build(mesh=None, tp=False, seed=0):
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )

    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=TINY, stat_pooling_type="mean"),
        num_speakers=8,
    )
    task = SpeakerTask(model=model, mode="ce")
    rng = np.random.default_rng(seed)
    batch = {
        "features": jnp.asarray(
            rng.normal(size=(8, 1600)).astype(np.float32)
        ),
        "mask": jnp.ones((8, 1600), bool),
        "labels": jnp.asarray(rng.integers(0, 8, size=8)),
    }
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    if tp:
        params = apply_tp_sharding(params, mesh)
    # adam: the round-trip must carry real optimizer moments, not just
    # params (resume fidelity)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    return task, state, batch


def _leaf_allclose(a, b, **tol):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(x)).astype(np.float32),
            np.asarray(jax.device_get(y)).astype(np.float32),
            **tol,
        )


def test_restore_onto_different_device_count(tmp_path):
    """Save after a dp=8 step, restore onto a 4-device mesh, take one more
    step — and the 2-step trajectory matches an uninterrupted dp=4 run
    (data parallelism and checkpoint topology must not change math)."""
    mesh8 = create_mesh(jax.devices())  # 8-way data parallel
    assert mesh8.shape["data"] == 8
    task, state, batch = _build()
    step8 = make_train_step(task, mesh8)
    state, _ = step8(state, shard_batch(batch, mesh8))

    ckpt = CheckpointManager(tmp_path / "ckpt", top_k=1)
    ckpt.save_step(state, {"val_eer": 0.25})

    # fresh process-equivalent: new template (different init seed so a
    # failed restore cannot silently pass), restored on a 4-device mesh
    mesh4 = create_mesh(jax.devices()[:4])
    assert mesh4.shape["data"] == 4
    task2, template, _ = _build(seed=7)
    restored = CheckpointManager(tmp_path / "ckpt", top_k=1).restore(
        template, name="last"
    )
    assert int(restored.step) == 1
    _leaf_allclose(restored.params, state.params, rtol=0, atol=0)
    _leaf_allclose(restored.opt_state, state.opt_state, rtol=0, atol=0)

    # one more step on the NEW topology...
    step4 = make_train_step(task2, mesh4)
    after4, m4 = step4(restored, shard_batch(batch, mesh4))
    assert np.isfinite(float(m4["loss"]))

    # ...and checkpointing must be TRANSPARENT: stepping the restored
    # state on the new mesh bit-matches stepping the original (live)
    # state on that same mesh
    direct, _ = step4(state, shard_batch(batch, mesh4))
    _leaf_allclose(after4.params, direct.params, rtol=0, atol=0)
    _leaf_allclose(after4.opt_state, direct.opt_state, rtol=0, atol=0)

    # the cross-topology trajectory itself agrees distributionally with an
    # uninterrupted dp=4 run: changing the data-parallel degree reorders
    # the gradient reduction, and adam's step-1 normalization amplifies
    # that float noise to ~2e-4 of parameter scale (measured: same-mesh
    # repeat is bit-exact, dp8->dp4 vs dp4->dp4 is 1.97e-4 max) — the
    # loose band pins "same training", the exact check above pins "the
    # checkpoint added nothing"
    taskc, cont, _ = _build()
    stepc = make_train_step(taskc, mesh4)
    cont, _ = stepc(cont, shard_batch(batch, mesh4))
    cont, _ = stepc(cont, shard_batch(batch, mesh4))
    _leaf_allclose(after4.params, cont.params, rtol=0, atol=5e-4)


def test_restore_with_tp_sharding_reapplied(tmp_path):
    """Save a TP-trained state (dp=4 x tp=2), restore into a fresh
    template, re-apply the TP placements to params AND optimizer moments,
    and take one more TP step — matching the pure-DP trajectory."""
    mesh_tp = create_mesh(jax.devices(), model=2)
    task, state, batch = _build(mesh_tp, tp=True)
    step_tp = make_train_step(task, mesh_tp, infer_state_sharding=True)
    state, _ = step_tp(state, shard_batch(batch, mesh_tp))

    # the saved leaves are TP-sharded jax.Arrays; orbax must gather them
    ckpt = CheckpointManager(tmp_path / "tp_ckpt", top_k=1)
    ckpt.save_step(state, {"val_eer": 0.5})

    task2, template, _ = _build(seed=11)
    restored = CheckpointManager(tmp_path / "tp_ckpt", top_k=1).restore(
        template, name="last"
    )
    # re-apply TP placements: the rules are path-based, so they shard the
    # adam mu/nu trees (same param paths under '0/mu/...') exactly like
    # the params they mirror
    restored = restored.replace(
        params=apply_tp_sharding(restored.params, mesh_tp),
        opt_state=apply_tp_sharding(restored.opt_state, mesh_tp),
    )
    qkv = restored.params["wav2vec2"]["encoder"]["layers"]["block"][
        "attention"
    ]["qkv_proj"]["kernel"]
    assert "model" in str(qkv.sharding.spec)

    after, metrics = step_tp(restored, shard_batch(batch, mesh_tp))
    assert np.isfinite(float(metrics["loss"]))

    # checkpoint transparency under TP: the restored+resharded state steps
    # bit-identically to the live TP state
    direct, _ = step_tp(state, shard_batch(batch, mesh_tp))
    _leaf_allclose(after.params, direct.params, rtol=0, atol=0)

    # and the TP trajectory agrees with pure DP up to reduction-order
    # noise amplified by two adam steps (see the dp test's band note)
    mesh_dp = create_mesh(jax.devices())
    taskc, cont, _ = _build()
    stepc = make_train_step(taskc, mesh_dp)
    cont, _ = stepc(cont, shard_batch(batch, mesh_dp))
    cont, _ = stepc(cont, shard_batch(batch, mesh_dp))
    _leaf_allclose(after.params, cont.params, rtol=0, atol=5e-4)


def test_weights_only_warm_start_from_sharded_save(tmp_path):
    """load_params (the strict=False warm-start path) reads a checkpoint
    written from sharded arrays (reference main.py:272-283)."""
    from w2v2_speaker_tpu.train.checkpoint import load_params, save_params

    mesh_tp = create_mesh(jax.devices(), model=2)
    task, state, batch = _build(mesh_tp, tp=True)
    save_params(tmp_path / "warm", state.params)

    _, template, _ = _build(seed=3)
    loaded = load_params(tmp_path / "warm", template.params)
    _leaf_allclose(loaded, state.params, rtol=0, atol=0)
