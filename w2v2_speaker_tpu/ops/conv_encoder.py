"""Fused stride-2 conv + bias + (LayerNorm) + GELU Pallas kernel for the
wav2vec2 feature encoder.

The reference runs the feature encoder through torch/cuDNN 1-D convs with
separate norm/GELU kernels (HF ``Wav2Vec2FeatureEncoder``; reference
`src/models/wav2vec2.py` uses it unchanged). On TPU the conv layers 1..6
(kernel 3 or 2, stride 2, 512->512 channels, VALID —
`Wav2Vec2Config.conv_{dim,kernel,stride}`) dominate the extraction forward:
~44% of the whole BASE B=48x3s program, and XLA's conv lowering leaves the
inter-layer GELU as separate HBM round trips.

This kernel maps each layer onto the MXU as a *pair-phase GEMM*:

- a block of ``2*BT`` input frames ``[2*BT, C]`` is reshaped in VMEM to
  ``[BT, 2C]`` — row t is ``concat(x[2t], x[2t+1])``, i.e. the two phases
  of output frame t — a free layout merge of sublane pairs into lanes;
- taps 0..1 become ONE ``[BT, 2C] @ [2C, C]`` matmul (weights stacked);
- the k=3 tap needs ``x[2t+2]`` = the *next* even phase: rows 1..BT of the
  even-phase matrix, whose single cross-block seam row is precomputed
  host-side (``seam[b, tile] = x[b, 2*BT*(tile+1)]``, a [B, tiles, C]
  gather) and appended in-kernel;
- the accumulator stays f32 in VMEM; conv bias, LayerNorm (LARGE's
  per-layer ``feat_extract_norm="layer"``) and exact GELU are applied
  in-register before the single bf16 write back to HBM.

Input/weight blocks use plain blocked specs (disjoint, block-granular index
maps), so Pallas' automatic pipelining double-buffers the DMA; no manual
copies are needed.

Backward: gradients fall back to XLA's conv-transpose via ``jax.vjp`` of
the reference formulation — the kernel is a forward-path optimization
(inference + train fwd); training numerics are unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["strided_conv_fused", "conv_fused_reference", "eligible"]


def eligible(kernel: int, stride: int, c_in: int, c_out: int) -> bool:
    """The shapes this kernel accepts: the wav2vec2 encoder layers 1..6."""
    return (
        stride == 2
        and kernel in (2, 3)
        and c_in == c_out
        and c_in % 128 == 0
    )


def _gelu_exact(x: jax.Array) -> jax.Array:
    # HF/torch default GELU (approximate='none'): 0.5x(1+erf(x/sqrt(2))) —
    # matches models/wav2vec2.py nn.gelu(approximate=False)
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _gelu_kernel(x: jax.Array) -> jax.Array:
    """Exact-GELU for the Pallas body: Mosaic has no erf lowering, so erf
    comes from Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below f32
    test tolerance and ~5 decades below the bf16 output rounding)."""
    z = x * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    return 0.5 * x * (1.0 + jnp.sign(z) * erf_abs)


def conv_fused_reference(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    ln_eps: float = 1e-5,
    fuse_gelu: bool = True,
) -> jax.Array:
    """XLA formulation with identical semantics (also the VJP primal).

    x: [B, T_in, C] (any float dtype), w: [k, C, C] (flax nn.Conv kernel
    layout), VALID padding, stride 2. Accumulates in f32 like the kernel,
    returns x.dtype.
    """
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if ln_scale is not None:
        mu = out.mean(axis=-1, keepdims=True)
        var = out.var(axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + ln_eps)
        out = out * ln_scale.astype(jnp.float32) + ln_bias.astype(
            jnp.float32
        )
    if fuse_gelu:
        out = _gelu_exact(out)
    return out.astype(x.dtype)


def _kernel(
    x_ref,  # [1, 2*BT, C] input frames (bf16)
    seam_ref,  # [1, tiles, C] per-tile seam rows (whole batch-row strip —
    #            a [1, 1, C] block would violate the TPU (8, 128) block-
    #            granularity rule; the strip is tiny, ~tiles*C*2 bytes)
    w01_ref,  # [2C, C] taps 0..1 stacked on the contraction axis
    w2_ref,  # [C, C] tap 2 (zeros when k == 2)
    misc_ref,  # [3, C] conv bias / LN scale / LN bias (f32)
    o_ref,  # [1, BT, C] output frames
    *,
    bt: int,
    c: int,
    k: int,
    has_bias: bool,
    has_ln: bool,
    ln_eps: float,
    fuse_gelu: bool,
):
    pairs = x_ref[0].reshape(bt, 2 * c)  # row t = [x[2t] | x[2t+1]]
    acc = jnp.dot(
        pairs, w01_ref[:], preferred_element_type=jnp.float32
    )
    if k == 3:
        even = pairs[:, :c]
        # x[2t+2] = even rows shifted by one; the seam row comes from the
        # next block's first even frame (precomputed host-side). Dynamic
        # sublane indexing must be 8-aligned on TPU, so select the row
        # from the full (tiny) strip with an iota mask instead.
        strip = seam_ref[0].astype(jnp.float32)  # [tiles, C]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, strip.shape, 0)
            == pl.program_id(1)
        )
        seam_row = jnp.sum(
            jnp.where(sel, strip, 0.0), axis=0, keepdims=True
        ).astype(even.dtype)
        even_next = jnp.concatenate([even[1:], seam_row], axis=0)
        acc += jnp.dot(
            even_next, w2_ref[:], preferred_element_type=jnp.float32
        )
    if has_bias:
        acc += misc_ref[0][None, :]
    if has_ln:
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
        acc = (acc - mu) * jax.lax.rsqrt(var + ln_eps)
        acc = acc * misc_ref[1][None, :] + misc_ref[2][None, :]
    if fuse_gelu:
        acc = _gelu_kernel(acc)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def strided_conv_fused(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    ln_scale: Optional[jax.Array],
    ln_bias: Optional[jax.Array],
    ln_eps: float = 1e-5,
    fuse_gelu: bool = True,
    block_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused stride-2 VALID conv (+bias) (+LayerNorm) (+exact GELU).

    x: [B, T_in, C], w: [k, C, C] with k in {2, 3}, C a multiple of 128.
    bias: [C] or None. ln_scale/ln_bias: [C] or None (both or neither).
    Returns [B, (T_in - k)//2 + 1, C] in x.dtype.
    """
    return _forward(
        x, w, bias, ln_scale, ln_bias, ln_eps, fuse_gelu, block_t,
        interpret,
    )


def _forward(
    x, w, bias, ln_scale, ln_bias, ln_eps, fuse_gelu, block_t, interpret
):
    b, t_in, c = x.shape
    k = w.shape[0]
    assert eligible(k, 2, c, w.shape[2]), (k, c, w.shape)
    t_out = (t_in - k) // 2 + 1
    # bt must be a multiple of 8 (TPU sublane block granularity)
    bt = min(block_t, max(8, (t_out + 7) // 8 * 8))
    tiles = pl.cdiv(t_out, bt)

    dtype = x.dtype
    w01 = w[:2].reshape(2 * c, c).astype(dtype)
    w2 = (
        w[2].astype(dtype)
        if k == 3
        else jnp.zeros((c, c), dtype)
    )
    # seam[b, tile] = x[b, 2*bt*(tile+1)] (clipped: rows that would run
    # past t_in only feed discarded out-of-range output rows)
    idx = jnp.minimum(2 * bt * (jnp.arange(tiles) + 1), t_in - 1)
    seam = x[:, idx, :]

    has_bias = bias is not None
    has_ln = ln_scale is not None
    misc = jnp.zeros((3, c), jnp.float32)
    if has_bias:
        misc = misc.at[0].set(bias.astype(jnp.float32))
    if has_ln:
        misc = misc.at[1].set(ln_scale.astype(jnp.float32))
        misc = misc.at[2].set(ln_bias.astype(jnp.float32))

    kern = functools.partial(
        _kernel,
        bt=bt,
        c=c,
        k=k,
        has_bias=has_bias,
        has_ln=has_ln,
        ln_eps=ln_eps,
        fuse_gelu=fuse_gelu,
    )
    flops = 2 * b * t_out * (2 + (k == 3)) * c * c
    out = pl.pallas_call(
        kern,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, 2 * bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tiles, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((2 * c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((3, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tiles * bt, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * t_out * c * x.dtype.itemsize,
            transcendentals=b * t_out * c if fuse_gelu else 0,
        ),
        interpret=interpret,
    )(x, seam, w01, w2, misc)
    return out[:, :t_out, :]


def _fwd(
    x, w, bias, ln_scale, ln_bias, ln_eps, fuse_gelu, block_t, interpret
):
    out = _forward(
        x, w, bias, ln_scale, ln_bias, ln_eps, fuse_gelu, block_t,
        interpret,
    )
    return out, (x, w, bias, ln_scale, ln_bias)


def _bwd(ln_eps, fuse_gelu, block_t, interpret, res, g):
    # backward through the XLA reference formulation: identical math, and
    # XLA's conv-transpose lowering is the measured optimum for these
    # gradient shapes (PERF.md conv roofline)
    x, w, bias, ln_scale, ln_bias = res
    diff = [x, w] + [a for a in (bias, ln_scale, ln_bias) if a is not None]

    def primal(*argv):
        it = iter(argv)
        x_, w_ = next(it), next(it)
        b_ = next(it) if bias is not None else None
        s_ = next(it) if ln_scale is not None else None
        lb_ = next(it) if ln_bias is not None else None
        return conv_fused_reference(x_, w_, b_, s_, lb_, ln_eps, fuse_gelu)

    _, vjp = jax.vjp(primal, *diff)
    grads = iter(vjp(g))
    dx, dw = next(grads), next(grads)
    db = next(grads) if bias is not None else None
    ds = next(grads) if ln_scale is not None else None
    dlb = next(grads) if ln_bias is not None else None
    return dx, dw, db, ds, dlb


strided_conv_fused.defvjp(_fwd, _bwd)
