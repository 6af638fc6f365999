"""Flash attention (online-softmax) Pallas TPU kernels.

Purpose-built for the wav2vec2 encoder: full VoxCeleb utterances are up to
~2 min => ~6k frames, where materializing [heads, T, T] attention
probabilities is the HBM bottleneck (reference sidesteps the problem with
batch_size=1 eval, speaker_recognition_module.py:468-469; we batch + mask).

Design (v2, tuned for v5e):
- exp2 domain: q is pre-scaled by d^-0.5 * log2(e) once, so the kernel's
  softmax bookkeeping uses exp2 (the VPU-native transcendental) and the
  per-block `s * scale` multiply disappears.
- suffix-padding lengths instead of a dense mask: the encoder only ever
  right-pads, so validity is one int32 per row. Lengths ride the scalar-
  prefetch channel, which lets the kernel (a) skip fully-padded K blocks
  entirely — the index map clamps the block index so not even the DMA is
  issued — and (b) run interior blocks through an unmasked fast path; only
  the single boundary block pays the iota/where cost.
- grid (batch*heads, q_blocks, k_blocks), k innermost and sequential
  ("arbitrary"); running max/sum/accumulator live in VMEM scratch across k
  steps; Pallas double-buffers the K/V block DMAs automatically. Matmuls
  run at input precision (bf16 on TPU) with f32 accumulation.
- real flash backward: the forward saves the log2-domain logsumexp, and two
  kernels (dq over q blocks; dk/dv over k blocks) recompute probabilities
  blockwise — O(T) memory end to end, same block-skip logic.
- attention-prob dropout inside the kernel: a counter-hash (murmur3
  finalizer over absolute (batch*head, q, k) coordinates) generates the
  keep mask on the fly in the forward AND regenerates it bit-identically in
  both backward kernels — no [T, T] mask in HBM, so training with
  attention_dropout > 0 stays O(T) memory too.

The public entry `flash_attention` uses the kernels on TPU and reference
XLA math elsewhere (CPU tests run the kernels in interpret mode).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention",
    "flash_attention_kernel",
    "reference_attention",
    "attention_dropout_keep",
    "dropout_seed_from_rng",
]

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LANES = 128
_LOG2E = math.log2(math.e)
# tuned on v5e (PERF.md flash section): bq=1024/bk=2048 wins from T>=1024;
# below _MIN_T the grid degenerates to one block and XLA attention is faster
_BLOCK_Q = 1024
_BLOCK_K = 2048
_MIN_T = 1024


def reference_attention(
    q: jax.Array,  # [B, Tq, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,  # [B, Tk] validity
) -> jax.Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dropout_keep(seed, bh, qstart, kstart, shape, rate: float):
    """Deterministic per-element keep mask for attention-prob dropout.

    Counter-based hash (murmur3 finalizer) over the ABSOLUTE (batch*head,
    q row, k col) coordinates: the forward and both backward kernels
    regenerate bit-identical masks from (seed, coordinates) alone — no
    [T, T] mask ever exists in HBM. Pure jnp (no pltpu.prng_*), so it runs
    identically on TPU hardware and in interpret mode on CPU, and is cheap
    VPU work (~8 int ops/element).
    """
    qrow = qstart + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    kcol = kstart + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = (
        seed.astype(jnp.uint32)
        + bh.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + qrow.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + kcol.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))


def attention_dropout_keep(
    seed: jax.Array, b: int, h: int, tq: int, tk: int, rate: float
) -> jax.Array:
    """[B, H, Tq, Tk] keep mask — the SAME per-element counter-hash the
    Pallas kernel regenerates in-block (`_dropout_keep`), evaluated as
    plain XLA ops: identical seed → bit-identical mask across the kernel
    and the short-sequence XLA fallback (tested).

    Why not `jax.random.bernoulli`: at the T=149 training shape the rbg
    PRNG pass over [B, H, T, T] costs 0.391 ms per layer vs 0.108 ms for
    this hash (isolated probe), and switching EVERY dropout site to the
    hash takes the batch-66 BASE train step from 112.4 to 102.7 ms
    (same-session A/B — most of the saving is compositional: the per-site
    rbg key-derivation chains and their backward recomputation serialize
    against the matmul stream; PERF.md round-4 dropout-sampler table).
    Murmur3-finalizer avalanche makes it a valid Bernoulli(1-rate)
    sampler, exact to 2^-32 in the rate.
    """
    shape = (b * h, tq, tk)
    bh = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    qrow = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    kcol = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    x = (
        seed.astype(jnp.uint32)
        + bh * jnp.uint32(0x9E3779B1)
        + qrow * jnp.uint32(0x85EBCA77)
        + kcol * jnp.uint32(0xC2B2AE3D)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    keep = x >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return keep.reshape(b, h, tq, tk)


def dropout_seed_from_rng(rng: jax.Array) -> jax.Array:
    """[1] int32 dropout seed from a PRNG key (shared by kernel + fallback
    so both paths draw the same mask for the same key).

    Deliberately collapses the 128-bit key to a 32-bit seed: each dropout
    site's mask is still an exact Bernoulli(rate) draw, but across a
    100k-step run each site expects a couple of birthday-bound exact mask
    repeats, and two sites within a step can collide with ~2^-33
    probability per pair. Both are statistically negligible for training
    (a repeated mask is just another valid sample) — but this is a
    deviation from full-entropy jax.random streams; widen the hash input
    with a second key word if full stream independence is ever required.
    """
    return jax.random.randint(
        rng, (1,), minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32
    )


def _pow2_floor(x: int) -> int:
    return 1 << (x.bit_length() - 1)


def _compiler_params() -> dict:
    """Shared pallas_call compiler params.

    `vmem_limit_bytes` lifts the compiler's default 16 MiB scoped-vmem cap:
    the backward kernels hold several [block_q, block_k] f32 temporaries
    (s, p, dp, dz — and the dropout keep mask), which at 1024x2048 blocks
    legitimately need ~20-30 MiB of the chip's 128 MiB VMEM.
    """
    try:
        return {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        }
    except TypeError:  # older/newer API without the fields
        return {}


def _pick_blocks(t_pad: int, block_q: int, block_k: int) -> tuple[int, int, int]:
    # Clamped blocks snap DOWN to powers of two: with pow2 blocks the
    # lcm is just max(bq, bk), so t_pad never explodes. (A naive clamp to
    # t_pad produced lcm(1024, 1152) = 9216 for T=1049 — 8x padding and a
    # VMEM overflow in the dkv kernel.) Fully-padded blocks are skipped
    # without a DMA, so the residual padding is near-free.
    block_q = min(block_q, _pow2_floor(t_pad))
    block_k = min(block_k, _pow2_floor(t_pad))
    t_pad = _round_up(t_pad, math.lcm(block_q, block_k))
    return t_pad, block_q, block_k


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    len_ref,  # [B] int32 (scalar prefetch)
    seed_ref,  # [1] int32 (scalar prefetch; dropout seed)
    q_ref,  # [block_q, d]  (pre-scaled by d^-0.5 * log2(e))
    k_ref,  # [block_k, d]
    v_ref,  # [block_k, d]
    o_ref,  # [block_q, d]
    *rest,  # [lse_ref [block_q, 1] f32 if save_lse], m/l/acc scratch
    heads: int,
    block_k: int,
    save_lse: bool,
    dropout_rate: float,
):
    if save_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        (m_scr, l_scr, acc_scr), lse_ref = rest, None
    bh = pl.program_id(0)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    seq_len = len_ref[bh // heads]
    kstart = ki * block_k
    qstart = pl.program_id(1) * q_ref.shape[0]

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def update(masked: bool):
        s = jax.lax.dot_general(
            q_ref[:],
            k_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k] f32, already in log2 domain
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len - kstart, s, _NEG_INF)

        m_prev = m_scr[:, 0:1]  # [block_q, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)  # [block_q, block_k] f32
        alpha = jnp.exp2(m_prev - m_new)  # [block_q, 1]
        # softmax normalizer uses the UNdropped probabilities; dropout
        # applies to the post-softmax matrix (torch F.dropout semantics)
        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p
        if dropout_rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0], bh, qstart, kstart, p.shape, dropout_rate
            )
            pv = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            pv.astype(v_ref.dtype),
            v_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    # fully-padded q blocks do no work at all (bucketed eval pads heavily);
    # interior k blocks take the unmasked fast path; only the single k
    # boundary block pays the iota/where cost
    @pl.when((qstart < seq_len) & (kstart + block_k <= seq_len))
    def _full():
        update(masked=False)

    @pl.when(
        (qstart < seq_len)
        & (kstart < seq_len)
        & (kstart + block_k > seq_len)
    )
    def _boundary():
        update(masked=True)

    # unconditional: the last k block may itself have been skipped
    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o_ref[:] = jnp.where(
            l > 0.0, acc_scr[:] / jnp.maximum(l, 1e-37), 0.0
        ).astype(o_ref.dtype)
        if save_lse:
            # guard skipped q blocks (l == 0): lse of 0.0 keeps the
            # backward's p recompute finite; those rows are masked there
            lse_ref[:] = jnp.where(
                l > 0.0,
                m_scr[:, 0:1] + jnp.log2(jnp.maximum(l, 1e-37)),
                0.0,
            ).astype(lse_ref.dtype)


def _fwd_call(
    qs: jax.Array,  # [BH, T, d] pre-scaled
    k: jax.Array,  # [BH, T, d]
    v: jax.Array,
    lengths: jax.Array,  # [B] int32
    seed: jax.Array,  # [1] int32
    heads: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    save_lse: bool,
    dropout_rate: float,
) -> tuple[jax.Array, Optional[jax.Array]]:
    bhn, t_pad, d = qs.shape
    grid = (bhn, t_pad // block_q, t_pad // block_k)

    def q_index_map(bh, qi, ki, lens, seed_):
        return (bh, qi, 0)

    def kv_index_map(bh, qi, ki, lens, seed_):
        # clamp skipped blocks to the last valid one: no fresh DMA is issued
        # for fully-padded K/V blocks
        last = jnp.maximum(lens[bh // heads] - 1, 0) // block_k
        return (bh, jnp.minimum(ki, last), 0)

    kernel = functools.partial(
        _fwd_kernel,
        heads=heads,
        block_k=block_k,
        save_lse=save_lse,
        dropout_rate=dropout_rate,
    )
    out_specs = [
        pl.BlockSpec((None, block_q, d), q_index_map),
    ]
    out_shape = [jax.ShapeDtypeStruct((bhn, t_pad, d), qs.dtype)]
    if save_lse:
        # q rows on sublanes, unit lane dim: broadcast-ready in the backward
        out_specs.append(
            pl.BlockSpec((None, block_q, 1), q_index_map)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bhn, t_pad, 1), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), q_index_map),
            pl.BlockSpec((None, block_k, d), kv_index_map),
            pl.BlockSpec((None, block_k, d), kv_index_map),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    params = _compiler_params()

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(lengths, seed, qs, k, v)
    return (out[0], out[1]) if save_lse else (out[0], None)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
# Notation: z = (q.k) * scale are the logits; p = softmax(z). With the
# forward's log2-domain prescale qs = q * scale * log2(e) and saved
# lse = log2(sum exp2(qs.k)), probabilities recompute as p = exp2(qs.k - lse)
# blockwise. dz = p * (dp - D) with dp = dO.V^T and D_i = sum_j p_ij dp_ij
# = rowsum(dO * O). Then dq = dz @ k * scale (emitted in qs units and
# rescaled outside) and dk = dz^T @ qs / log2(e), dv = p^T @ dO.


def _bwd_dq_kernel(
    len_ref,
    seed_ref,
    qs_ref,  # [block_q, d]
    k_ref,  # [block_k, d]
    v_ref,  # [block_k, d]
    do_ref,  # [block_q, d]
    lse_ref,  # [block_q, 1]
    delta_ref,  # [block_q, 1]
    dq_ref,  # [block_q, d] out
    acc_scr,  # [block_q, d] f32
    *,
    heads: int,
    block_k: int,
    block_q: int,
    dropout_rate: float,
):
    bh = pl.program_id(0)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    seq_len = len_ref[bh // heads]
    kstart = ki * block_k
    qstart = pl.program_id(1) * block_q

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def update(masked: bool):
        s = jax.lax.dot_general(
            qs_ref[:],
            k_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len - kstart, s, _NEG_INF)
        p = jnp.exp2(s - lse_ref[:])  # [bq, bk] f32
        dp = jax.lax.dot_general(
            do_ref[:],
            v_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            # d(probs) flows only through kept entries: the fwd's mask is
            # regenerated bit-exactly from the same (seed, coords) hash
            keep = _dropout_keep(
                seed_ref[0], bh, qstart, kstart, dp.shape, dropout_rate
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
        dz = p * (dp - delta_ref[:])
        acc_scr[:] += jax.lax.dot_general(
            dz.astype(k_ref.dtype),
            k_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((qstart < seq_len) & (kstart + block_k <= seq_len))
    def _full():
        update(masked=False)

    @pl.when(
        (qstart < seq_len)
        & (kstart < seq_len)
        & (kstart + block_k > seq_len)
    )
    def _boundary():
        update(masked=True)

    @pl.when(ki == n_k - 1)
    def _finalize():
        # zero grads for padded query rows (upstream dO is already masked by
        # downstream pooling, but be exact regardless)
        row = qstart + jax.lax.broadcasted_iota(
            jnp.int32, (acc_scr.shape[0], 1), 0
        )
        dq_ref[:] = jnp.where(row < seq_len, acc_scr[:], 0.0).astype(
            dq_ref.dtype
        )


def _bwd_dkv_kernel(
    len_ref,
    seed_ref,
    qs_ref,  # [block_q, d]
    k_ref,  # [block_k, d]
    v_ref,  # [block_k, d]
    do_ref,  # [block_q, d]
    lse_ref,  # [block_q, 1]
    delta_ref,  # [block_q, 1]
    dk_ref,  # [block_k, d] out
    dv_ref,  # [block_k, d] out
    dk_scr,  # [block_k, d] f32
    dv_scr,  # [block_k, d] f32
    *,
    heads: int,
    block_k: int,
    block_q: int,
    dropout_rate: float,
):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    seq_len = len_ref[bh // heads]
    kstart = ki * block_k
    qstart = qi * block_q

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def update(masked: bool):
        s = jax.lax.dot_general(
            qs_ref[:],
            k_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len - kstart, s, _NEG_INF)
        # zero contributions from padded query rows
        rowq = qstart + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(rowq < seq_len, jnp.exp2(s - lse_ref[:]), 0.0)
        dp = jax.lax.dot_general(
            do_ref[:],
            v_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pv = p
        if dropout_rate > 0.0:
            keep = _dropout_keep(
                seed_ref[0], bh, qstart, kstart, p.shape, dropout_rate
            )
            inv = 1.0 / (1.0 - dropout_rate)
            # dv sums the DROPPED probabilities (o = dropout(p) @ v);
            # dk flows through dp only where entries were kept
            pv = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        dz = p * (dp - delta_ref[:])
        dv_scr[:] += jax.lax.dot_general(
            pv.astype(do_ref.dtype),
            do_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[:] += jax.lax.dot_general(
            dz.astype(qs_ref.dtype),
            qs_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # skip q blocks entirely beyond the valid length; mask only the k
    # boundary block (k cols beyond seq_len get zero grad)
    @pl.when((qstart < seq_len) & (kstart + block_k <= seq_len))
    def _full():
        update(masked=False)

    @pl.when(
        (qstart < seq_len)
        & (kstart < seq_len)
        & (kstart + block_k > seq_len)
    )
    def _boundary():
        update(masked=True)

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[:] = (dk_scr[:] / _LOG2E).astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_call(
    qs: jax.Array,  # [BH, T, d] pre-scaled
    k: jax.Array,
    v: jax.Array,
    do: jax.Array,  # [BH, T, d]
    lse: jax.Array,  # [BH, T, 1] f32
    delta: jax.Array,  # [BH, T, 1] f32
    lengths: jax.Array,  # [B] int32
    seed: jax.Array,  # [1] int32
    heads: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    dropout_rate: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    bhn, t_pad, d = qs.shape
    n_q, n_k = t_pad // block_q, t_pad // block_k

    params = _compiler_params()

    def q_map(bh, qi, ki, lens, seed_):
        return (bh, qi, 0)

    def kv_map(bh, qi, ki, lens, seed_):
        last = jnp.maximum(lens[bh // heads] - 1, 0) // block_k
        return (bh, jnp.minimum(ki, last), 0)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            heads=heads,
            block_k=block_k,
            block_q=block_q,
            dropout_rate=dropout_rate,
        ),
        out_shape=jax.ShapeDtypeStruct((bhn, t_pad, d), qs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bhn, n_q, n_k),
            in_specs=[
                pl.BlockSpec((None, block_q, d), q_map),
                pl.BlockSpec((None, block_k, d), kv_map),
                pl.BlockSpec((None, block_k, d), kv_map),
                pl.BlockSpec((None, block_q, d), q_map),
                pl.BlockSpec((None, block_q, 1), q_map),
                pl.BlockSpec((None, block_q, 1), q_map),
            ],
            out_specs=pl.BlockSpec((None, block_q, d), q_map),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        interpret=interpret,
        **params,
    )(lengths, seed, qs, k, v, do, lse, delta)

    # dk/dv: grid over k blocks; q innermost. q-side blocks beyond the valid
    # length are both skipped in-kernel and DMA-clamped here.
    def qd_map(bh, ki, qi, lens, seed_):
        last = jnp.maximum(lens[bh // heads] - 1, 0) // block_q
        return (bh, jnp.minimum(qi, last), 0)

    def k_map(bh, ki, qi, lens, seed_):
        return (bh, ki, 0)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            heads=heads,
            block_k=block_k,
            block_q=block_q,
            dropout_rate=dropout_rate,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bhn, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bhn, t_pad, d), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bhn, n_k, n_q),
            in_specs=[
                pl.BlockSpec((None, block_q, d), qd_map),
                pl.BlockSpec((None, block_k, d), k_map),
                pl.BlockSpec((None, block_k, d), k_map),
                pl.BlockSpec((None, block_q, d), qd_map),
                pl.BlockSpec((None, block_q, 1), qd_map),
                pl.BlockSpec((None, block_q, 1), qd_map),
            ],
            out_specs=[
                pl.BlockSpec((None, block_k, d), k_map),
                pl.BlockSpec((None, block_k, d), k_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        interpret=interpret,
        **params,
    )(lengths, seed, qs, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# layout plumbing + custom_vjp
# ---------------------------------------------------------------------------


def _prep(q, k, v, lengths, block_q, block_k):
    """[B,T,H,D] -> padded, pre-scaled [B*H,Tp,D] + layout metadata."""
    b, t, h, d = q.shape
    t_pad, block_q, block_k = _pick_blocks(_round_up(t, _LANES), block_q, block_k)
    scale = d**-0.5
    qs = q * jnp.asarray(scale * _LOG2E, q.dtype)
    if lengths is None:
        # numpy, not jnp: an eager device array would be re-fetched to host
        # when jit inlines it as a constant (transport-fragile); numpy
        # constants lower without a device->host read
        lengths = np.full((b,), t, np.int32)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        qs, k, v = jnp.pad(qs, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t_pad, d)

    return (
        to_bh(qs),
        to_bh(k),
        to_bh(v),
        jnp.minimum(lengths.astype(jnp.int32), t),
        (b, t, h, d, t_pad, block_q, block_k),
    )


def _from_bh(x, b, t, h, d, t_pad):
    return x.reshape(b, h, t_pad, d).transpose(0, 2, 1, 3)[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(
    q, k, v, lengths, seed, block_q, block_k, interpret, dropout_rate
):
    # primal (inference) path: no logsumexp output at all
    qs, kb, vb, lens, meta = _prep(q, k, v, lengths, block_q, block_k)
    b, t, h, d, t_pad, bq, bk = meta
    o, _ = _fwd_call(
        qs, kb, vb, lens, seed, h, bq, bk, interpret,
        save_lse=False, dropout_rate=dropout_rate,
    )
    return _from_bh(o, b, t, h, d, t_pad)


def _flash_fwd(
    q, k, v, lengths, seed, block_q, block_k, interpret, dropout_rate
):
    qs, kb, vb, lens, meta = _prep(q, k, v, lengths, block_q, block_k)
    b, t, h, d, t_pad, bq, bk = meta
    o, lse = _fwd_call(
        qs, kb, vb, lens, seed, h, bq, bk, interpret,
        save_lse=True, dropout_rate=dropout_rate,
    )
    return (
        _from_bh(o, b, t, h, d, t_pad),
        (qs, kb, vb, lens, seed, o, lse, meta),
    )


def _flash_bwd(block_q, block_k, interpret, dropout_rate, res, g):
    qs, kb, vb, lens, seed, o, lse, meta = res
    b, t, h, d, t_pad, bq, bk = meta
    if t_pad != t:
        g = jnp.pad(g, [(0, 0), (0, t_pad - t), (0, 0), (0, 0)])
    do = g.transpose(0, 2, 1, 3).reshape(b * h, t_pad, d)
    # D_i = rowsum(dO * O): tiny elementwise+reduce, leave it to XLA.
    # (With dropout, rowsum(dO*O) = sum_j P~ dP~ = sum_j P dP — keep==keep²
    # — so the delta trick is unchanged.)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    dqs, dk, dv = _bwd_call(
        qs, kb, vb, do, lse, delta, lens, seed, h, bq, bk, interpret,
        dropout_rate,
    )
    # dq: the kernel accumulates dz @ k; dz/dq brings one factor of scale
    # (the log2(e) prescale belongs to s, not to z = logits)
    scale = d**-0.5
    dq = _from_bh(dqs, b, t, h, d, t_pad) * jnp.asarray(scale, dqs.dtype)
    return (
        dq,
        _from_bh(dk, b, t, h, d, t_pad),
        _from_bh(dv, b, t, h, d, t_pad),
        None,
        None,
    )


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_kernel(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,  # [B, T] suffix-contiguous validity
    block_q: int = _BLOCK_Q,
    block_k: int = _BLOCK_K,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # [1] int32
) -> jax.Array:
    """Differentiable Pallas flash attention (suffix-padding masked).

    `key_mask` must be suffix-contiguous (True prefix, False padding tail) —
    the encoder's padding masks always are; validity is reduced to one
    length per row so fully-padded blocks are skipped without even a DMA.

    With `dropout_rate > 0` the kernel applies attention-prob dropout
    (torch F.dropout semantics: softmax first, then scaled Bernoulli mask)
    using a counter-hash keep mask regenerated identically in the backward
    — the [T, T] mask never materializes. `dropout_seed` [1] int32 selects
    the mask; the same seed reproduces the same mask.
    """
    lengths = None if key_mask is None else jnp.sum(
        key_mask.astype(jnp.int32), axis=1
    )
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = np.zeros((1,), np.int32)  # host constant (see _prep)
    return _flash_attention(
        q, k, v, lengths, dropout_seed, block_q, block_k, interpret,
        float(dropout_rate),
    )


def _kernel_profitable(t: int) -> bool:
    """Dispatch rule: the kernel only wins when the block-rounded compute
    stays close to the true T^2 work.

    Partially-valid boundary blocks compute their FULL block (only wholly
    invalid blocks are skipped), so at e.g. T=1049 the kernel does
    2048x2048 work for a 1049^2 problem — measured 4x slower than XLA
    there, while at aligned T>=2048 it is ~2x faster. Anchors (bf16,
    B=4, H=12, d=64, v5e): T=1049 XLA 0.22 ms / flash 0.91; T=1536 tie
    (0.92 vs 0.93); T=2048 flash 2.1x; T=6016 flash 2.0x. Threshold 1.5
    accepts T=2048/3072/aligned, rejects the tie and the blowup.
    """
    if t < _MIN_T:
        return False
    _, bq, bk = _pick_blocks(_round_up(t, _LANES), _BLOCK_Q, _BLOCK_K)
    qa = -(-t // bq) * bq  # rows of blocks actually computed
    ka = -(-t // bk) * bk
    return qa * ka <= 1.5 * t * t


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Public entry: flash kernels on TPU, reference math elsewhere.

    `bias` accepts the additive [B, 1, 1, T] padding bias the encoder builds
    (converted to a key mask). Attention-prob dropout runs inside the kernel
    (seeded from `rng`); the short-sequence/non-TPU fallback applies the
    same-semantics dropout in the XLA path (different mask bits — both are
    valid Bernoulli(1-rate) samplers).
    """
    if dropout_rate > 0.0 and rng is None:
        raise ValueError("dropout_rate > 0 requires an rng key")
    if key_mask is None and bias is not None:
        key_mask = bias[:, 0, 0, :] >= -1e30

    seed = (
        dropout_seed_from_rng(rng) if dropout_rate > 0.0 else None
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu or not _kernel_profitable(q.shape[1]):
        # short sequences (3 s training crops, short eval buckets) and
        # badly block-aligned lengths: XLA's one-shot attention wins
        if dropout_rate > 0.0:
            return _xla_dropout_attention(
                q, k, v, key_mask, dropout_rate, seed
            )
        return reference_attention(q, k, v, key_mask)
    return flash_attention_kernel(
        q, k, v, key_mask, dropout_rate=dropout_rate, dropout_seed=seed
    )


def _xla_dropout_attention(q, k, v, key_mask, dropout_rate, seed):
    """XLA attention with counter-hash prob dropout (torch F.dropout
    semantics: softmax first, then scaled Bernoulli mask). `seed` is the
    [1] int32 from `dropout_seed_from_rng`; the mask is bit-identical to
    the Pallas kernel's in-block dropout for the same seed."""
    b, tq, h, _ = q.shape
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        q.dtype
    )
    keep = attention_dropout_keep(
        seed, b, h, tq, k.shape[1], dropout_rate
    )
    probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
