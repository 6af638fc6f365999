"""Flash attention (online-softmax) Pallas TPU kernel.

Purpose-built for the wav2vec2 encoder's eval path: full VoxCeleb utterances
are up to ~2 min => ~6k frames, where materializing [heads, T, T] attention
probabilities is the HBM bottleneck. Canonical Mosaic structure: a
(batch*heads, q_blocks, k_blocks) grid with the k dimension innermost and
sequential ("arbitrary"), running max / sum / accumulator carried in VMEM
scratch across k steps — pallas double-buffers the K/V block DMAs
automatically. Matmuls run at input precision (bf16 on TPU) with f32
accumulation; softmax bookkeeping is f32.

Backward: flash's main win here is inference memory; training sequences are
3 s crops (~150 frames) where XLA attention is already optimal. So the
custom_vjp recomputes standard attention for the gradient — identical math,
O(T^2) memory only when actually training through it.

The public entry `flash_attention` uses the kernel on TPU and the reference
XLA path elsewhere (CPU tests run the kernel in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_kernel", "reference_attention"]

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LANES = 128


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


def _flash_kernel(
    q_ref,  # [block_q, d]
    k_ref,  # [block_k, d]
    v_ref,  # [block_k, d]
    mask_ref,  # [1, block_k] int32
    o_ref,  # [block_q, d]
    m_scr,  # [block_q, _LANES] f32
    l_scr,  # [block_q, _LANES] f32
    acc_scr,  # [block_q, d] f32
    *,
    sm_scale: float,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]
    k = k_ref[:]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [block_q, block_k] f32

    mask = mask_ref[0, :] != 0  # [block_k]
    s = jnp.where(mask[None, :], s, _NEG_INF)

    m_prev = m_scr[:, 0:1]  # [block_q, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # [block_q, block_k] f32
    alpha = jnp.exp(m_prev - m_new)  # [block_q, 1]

    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        out = jnp.where(l > 0.0, acc_scr[:] / jnp.maximum(l, 1e-37), 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_kernel(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,  # [B, T]
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Forward-only Pallas flash attention (padding-masked)."""
    b, t, h, d = q.shape
    block_q = min(block_q, _round_up(t, 128))
    block_k = min(block_k, _round_up(t, 128))
    t_pad = _round_up(t, max(block_q, block_k))
    sm_scale = d**-0.5

    if key_mask is None:
        key_mask = jnp.ones((b, t), dtype=bool)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])

    # [B, T, H, D] -> [B*H, T, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t_pad, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    mask_i32 = key_mask.astype(jnp.int32)[:, None, :]  # [B, 1, T]

    grid = (b * h, t_pad // block_q, t_pad // block_k)
    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale)

    params = {}
    try:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    except TypeError:  # older/newer API without the field
        params = {}

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec(
                (None, 1, block_k), lambda bh, qi, ki: (bh // h, 0, ki)
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(qb, kb, vb, mask_i32)

    out = out.reshape(b, h, t_pad, d).transpose(0, 2, 1, 3)
    return out[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, key_mask, interpret):
    return flash_attention_kernel(q, k, v, key_mask, interpret=interpret)


def _fwd(q, k, v, key_mask, interpret):
    return flash_attention_kernel(
        q, k, v, key_mask, interpret=interpret
    ), (q, k, v, key_mask)


def _bwd(interpret, res, g):
    q, k, v, key_mask = res
    # gradient via XLA recompute (training uses short sequences)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: reference_attention(q_, k_, v_, key_mask), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Public entry: flash kernel on TPU, reference math elsewhere.

    `bias` accepts the additive [B, 1, 1, T] padding bias the encoder builds
    (converted to a key mask); attention dropout is not supported in the
    kernel — callers use the XLA path when training with attention dropout.
    """
    if dropout_rate > 0.0 and rng is not None:
        raise NotImplementedError(
            "flash attention kernel has no attention-prob dropout; "
            "use attention_impl='xla' for training with attention_dropout"
        )
    if key_mask is None and bias is not None:
        key_mask = bias[:, 0, 0, :] >= -1e30

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return reference_attention(q, k, v, key_mask)
    return _flash_attention(q, k, v, key_mask, False)
