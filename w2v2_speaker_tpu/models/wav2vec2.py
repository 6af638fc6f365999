"""wav2vec2 backbone, TPU-native (flax + XLA/Pallas attention).

From-scratch JAX implementation of the architecture the reference consumes
through HuggingFace (`/root/reference/src/models/wav2vec2.py:25-169`), built
for weight-porting from HF checkpoints (see `wav2vec2_convert.py`):

- 7-layer strided conv feature encoder (k 10,3,3,3,3,2,2 / s 5,2,2,2,2,2,2,
  512 ch, GELU, group-norm after the first conv for BASE) — channels-last so
  XLA lowers each conv to MXU matmuls
- feature projection LayerNorm + 512->768 Dense + dropout
- conv positional embedding (k=128, 16 groups, weight-norm reparam kept in
  torch layout so ported checkpoints stay exactly equivalent)
- 12-layer post-norm transformer encoder (768 / 12 heads / 3072 FFN),
  layerdrop as mask-based stochastic depth (same expectation as the
  reference's skip, but jit-compatible: SURVEY §7.3)
- SpecAugment time masking with the learned masked_spec_embed vector and
  feature span masking (HF semantics of mask_time_prob etc., which the
  reference tunes via `Wav2Vec2RegularisationConfig`,
  `models/wav2vec2.py:83-94`)
- optional CLS-token insertion between feature projection and encoder
  (`models/wav2vec2.py:126-140`), used by the `first+cls` pooling mode
- full attention-mask support for padded batches (new vs the reference,
  which evaluates unpadded at batch 1 — TPU needs static shapes)
- `Wav2Vec2LiteEncoder` = conv feature encoder only, 512 features
  (`models/wav2vec2.py:149-169`)

Compute dtype is configurable (bf16 on TPU for MXU throughput, f32 for
parity tests); params stay f32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .masking import sample_span_mask

__all__ = [
    "Wav2Vec2Config",
    "Wav2Vec2Model",
    "Wav2Vec2LiteEncoder",
    "BASE_CONFIG",
    "LARGE_CONFIG",
    "feat_extract_output_lengths",
]


@dataclass(frozen=True)
class Wav2Vec2Config:
    # conv feature encoder
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    # transformer
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # regularisation (reference Wav2Vec2RegularisationConfig defaults)
    feat_proj_dropout: float = 0.1
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layerdrop: float = 0.05
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    # compute
    dtype: str = "float32"
    remat: bool = False  # rematerialize encoder layers (memory for FLOPs)
    # Remat policy when remat=true. "nothing" recomputes the whole layer in
    # the backward (minimum memory); "dots" saves every dot_general output
    # (QKV/attention/FFN matmuls) and recomputes only the cheap elementwise
    # chain; "dots_no_batch" saves only the non-batched dots (QKV/out-proj/
    # FFN dense outputs) while recomputing the attention einsums — on TPU
    # the [B, H, T, T] attention probs pad ~1.7x in HBM at T=149, so
    # excluding them is most of "dots"'s memory for little recompute.
    # Measured (PERF.md round-4 remat-policy table): at LARGE batch-48
    # dots_no_batch is -8.6% step time vs "nothing"; at LARGE batch-66
    # both dots policies exceed HBM with f32 adam moments, and with
    # mu_dtype=bfloat16 dots_no_batch fits but runs +2.7% (memory-pressure
    # scheduling) — so "nothing" (always fits) stays the default.
    # Trajectory-identical in every mode (gradient-parity tested).
    remat_policy: str = "nothing"  # "nothing" | "dots" | "dots_no_batch"
    # Positional-conv gradient formulation. XLA's SPMD partitioner computes
    # grouped-conv KERNEL gradients exactly x accumulation_count when the
    # same conv's grad is accumulated more than once per program over a
    # batch-sharded input (tests/test_grad_accumulation.py::
    # test_grouped_conv_spmd_grad). True (default) decomposes into
    # per-group dense convs — always-correct gradients; False uses the
    # single native feature_group_count conv, which is correct whenever
    # each program computes the gradient once (accumulate_grad_batches ==
    # 1 — the experiment builder picks this automatically). In isolation
    # the native backward measures ~1.3 ms faster at BASE batch-66 shapes,
    # but at full-step level the two are within noise (XLA overlaps the
    # small per-group convs); the knob exists for grad-safety, not speed.
    # Identical math, params and checkpoint layout either way.
    posconv_decomposed: bool = True
    # lax.scan unroll factor over encoder layers. The scanned backward pays
    # ~50% over an unrolled one (measured on v5e: 12-layer BASE stack
    # fwd+bwd 68.9 ms scanned vs 47.8 ms unrolled at batch 66 x 149
    # frames) — dynamic-slice/update of the stacked params and stacked
    # residuals serialize the grad accumulation. Full unroll keeps the
    # stacked [L, ...] param layout (checkpoints/TP rules unchanged) but
    # emits straight-line HLO. Cost: linearly larger programs — keep 1
    # (pure scan) where compile time or program size matters more than
    # step time.
    encoder_unroll: int = 1
    # "flash": Pallas kernel when T >= 1024 on TPU (2x XLA at T=6016,
    # block-skips suffix padding; real flash backward; in-kernel
    # attention-prob dropout for training). Auto-falls back to the XLA
    # path for short sequences and non-TPU platforms.
    attention_impl: str = "flash"  # "flash" | "xla"
    # Strided-conv formulation for feature-encoder layers 1..6.
    # "fused_pallas" routes eligible layers (k in {2,3}, s=2, 512->512)
    # through ops/conv_encoder.py — one VMEM-resident pair-phase GEMM with
    # bias/LayerNorm/GELU fused in-register. Measured on v5e it LOSES to
    # XLA's implicit-GEMM conv lowering at every FLOP-carrying layer in
    # both the BASE (group-norm) and LARGE (per-layer LN) layouts (PERF.md
    # "conv-encoder roofline" A/B tables: ~56-65 vs ~92-104 TF/s), so the
    # default stays "xla"; the kernel remains available for future
    # hardware/compiler revisions. Forward-only: its backward falls back
    # to the XLA formulation (identical math).
    conv_impl: str = "xla"  # "xla" | "fused_pallas"
    # Inference-only: run the transformer/projection Dense matmuls as
    # dynamic int8 on the MXU's double-rate path (ops/quant.py). Same
    # parameter layout (checkpoints/converter/TP rules untouched); no
    # gradient path — training configs must keep this False.
    int8_matmuls: bool = False
    # Dropout mask sampler. True (default) draws every dropout keep mask
    # (feat-proj, in-layer hidden/activation, encoder-top, XLA-path
    # attention probs) from the murmur3 counter-hash the flash kernel
    # already uses in-block (ops/flash_attention.attention_dropout_keep):
    # ~8 fusable int ops per element instead of a standalone rbg PRNG pass
    # over the activation/probs tensor. Same scaled-Bernoulli semantics
    # (rate exact to 2^-32), deterministic per rng key. False restores
    # jax.random.bernoulli (nn.Dropout) masks — different stream, same
    # distribution — at every nn site and in the "xla" attention impl;
    # the flash kernel's in-block dropout is counter-hash by construction
    # (it regenerates the mask in the backward instead of storing [T, T]
    # probs). Measured A/B at BASE batch-66 x 3 s: see PERF.md round-4
    # "dropout sampler" table.
    hash_dropout: bool = True

    def __post_init__(self):
        # Validate enum-like knobs up front so a typo'd CLI override (e.g.
        # network.remat_policy=dots_nobatch) fails with the allowed set
        # instead of a bare KeyError deep inside model construction.
        allowed = {
            "remat_policy": ("nothing", "dots", "dots_no_batch"),
            "attention_impl": ("flash", "xla"),
            "conv_impl": ("xla", "fused_pallas"),
            "feat_extract_norm": ("group", "layer"),
        }
        for field_name, options in allowed.items():
            value = getattr(self, field_name)
            if value not in options:
                raise ValueError(
                    f"Wav2Vec2Config.{field_name}={value!r} is not one of "
                    f"{options}"
                )


BASE_CONFIG = Wav2Vec2Config()
LARGE_CONFIG = Wav2Vec2Config(
    hidden_size=1024,
    num_layers=24,
    num_heads=16,
    intermediate_size=4096,
    feat_extract_norm="layer",
    conv_bias=True,
    do_stable_layer_norm=True,
)


def feat_extract_output_lengths(
    input_lengths, cfg: Wav2Vec2Config = BASE_CONFIG
):
    """Frame count after the conv stack; works on ints or arrays.

    The reference hard-codes floor((n-80)/320) for BASE at
    `speech/wav2vec2_fc_letter.py:146`; this is the exact per-layer formula.
    """
    lengths = input_lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


def _dense(cfg: "Wav2Vec2Config", features: int, dtype, name: str):
    """nn.Dense, or its int8-MXU twin when cfg.int8_matmuls (identical
    param layout either way)."""
    if cfg.int8_matmuls:
        from ..ops.quant import QuantDense

        return QuantDense(features=features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class _MaskedChannelNorm(nn.Module):
    """GroupNorm(num_groups=C) with statistics over valid frames only.

    Param names match flax nn.GroupNorm ('scale'/'bias') so HF checkpoint
    conversion is identical for both code paths. With ``lengths=None`` all
    frames are valid (identical to nn.GroupNorm(num_groups=C) but computed
    with single-pass moments — this norm sits on the conv stack's largest
    activation, so one fused sum/sum-sq sweep instead of flax's
    mean-then-variance double pass).
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, lengths: Optional[jax.Array] = None
    ) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        t = x.shape[1]
        x32 = x.astype(jnp.float32)
        if lengths is None:
            n = jnp.float32(t)
            s1 = x32.sum(axis=1, keepdims=True)
            s2 = (x32 * x32).sum(axis=1, keepdims=True)
        else:
            m = (
                jnp.arange(t)[None, :] < lengths[:, None]
            ).astype(jnp.float32)[:, :, None]
            n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            s1 = (x32 * m).sum(axis=1, keepdims=True)
            s2 = (x32 * x32 * m).sum(axis=1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class _ConvParams(nn.Module):
    """Parameter twin of nn.Conv (kernel [k, in, out] + bias, same names,
    shapes and default inits) for the fused Pallas conv path — ported
    checkpoints and converters see an identical tree either way."""

    features: int
    kernel_size: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter twin of nn.LayerNorm (scale/bias) for the fused path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class ConvFeatureEncoder(nn.Module):
    """Raw waveform [B, N] -> features [B, T, conv_dim[-1]].

    With a waveform mask, the first-layer group norm uses *masked*
    per-channel statistics (valid frames only). HF normalizes over all
    frames including ones computed from padding, so HF's batched-masked
    inference differs from its own unpadded inference; the reference
    evaluates unpadded at batch 1 (`speaker_recognition_module.py:468`), and
    masked statistics reproduce exactly that behavior for padded batches.

    ``cfg.conv_impl == "fused_pallas"`` routes eligible layers (1..6:
    k in {2,3}, s=2, 512->512) through the fused Pallas kernel
    (ops/conv_encoder.py) with identical parameters and math; the default
    "xla" path is the measured optimum on v5e (PERF.md).
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,
        wav_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        dtype = jnp.dtype(self.cfg.dtype)
        x = wav[:, :, None].astype(dtype)  # [B, N, 1]
        lengths = None if wav_mask is None else wav_mask.sum(axis=-1)
        for i, (c, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            if self.cfg.conv_impl == "fused_pallas":
                from ..ops import conv_encoder

                if conv_encoder.eligible(k, s, x.shape[-1], c):
                    kernel, bias = _ConvParams(
                        features=c,
                        kernel_size=k,
                        use_bias=self.cfg.conv_bias,
                        name=f"conv_{i}",
                    )(x.shape[-1])
                    if self.cfg.feat_extract_norm == "layer":
                        ln_scale, ln_bias = _LNParams(
                            features=c, name=f"layer_norm_{i}"
                        )()
                    else:
                        ln_scale = ln_bias = None
                    x = conv_encoder.strided_conv_fused(
                        x,
                        kernel,
                        bias,
                        ln_scale,
                        ln_bias,
                        ln_eps=self.cfg.layer_norm_eps,
                        fuse_gelu=True,
                        interpret=jax.devices()[0].platform != "tpu",
                    )
                    if lengths is not None:
                        lengths = (lengths - k) // s + 1
                    continue
            x = nn.Conv(
                features=c,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=self.cfg.conv_bias,
                dtype=dtype,
                name=f"conv_{i}",
            )(x)
            if lengths is not None:
                lengths = (lengths - k) // s + 1
            if i == 0 and self.cfg.feat_extract_norm == "group":
                # HF GroupNorm(num_groups=C, C) == per-channel norm over time
                x = _MaskedChannelNorm(
                    epsilon=1e-5, dtype=dtype, name="group_norm"
                )(x, lengths)
            elif self.cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=self.cfg.layer_norm_eps,
                    dtype=dtype,
                    name=f"layer_norm_{i}",
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class HashDropout(nn.Module):
    """Drop-in `nn.Dropout` replacement on the counter-hash Bernoulli
    sampler (`ops/flash_attention.attention_dropout_keep`).

    Rationale (measured, PERF.md round-4 dropout-sampler table): drawing
    every dropout mask from the fused murmur3 counter-hash instead of
    `jax.random.bernoulli` takes the BASE batch-66 train step from 112.4
    to 102.7 ms (same-session A/B) — the rbg key-derivation chains and
    their backward recomputation serialize against the matmul stream,
    while the hash is ~8 int ops/element fused into the surrounding
    elementwise chain. Same "dropout" rng collection, same
    scaled-Bernoulli semantics (exact rate to 2^-32), deterministic per
    seed.
    """

    rate: float
    deterministic: bool = False
    # False restores the nn.Dropout sampler (jax.random.bernoulli) — kept
    # reachable via Wav2Vec2Config.hash_dropout for A/B; distribution-
    # identical to flax nn.Dropout (the stream differs only by this
    # module's path name in flax's rng fold).
    use_hash: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.deterministic or self.rate <= 0.0:
            return x
        if not self.use_hash:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.rate, x.shape
            )
            return jnp.where(
                keep, x / (1.0 - self.rate), jnp.zeros((), x.dtype)
            )
        from ..ops.flash_attention import (
            attention_dropout_keep,
            dropout_seed_from_rng,
        )

        seed = dropout_seed_from_rng(self.make_rng("dropout"))
        b, t, c = x.shape
        keep = attention_dropout_keep(seed, b, 1, t, c, self.rate)[:, 0]
        return jnp.where(
            keep, x / (1.0 - self.rate), jnp.zeros((), x.dtype)
        )


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dtype = jnp.dtype(self.cfg.dtype)
        x = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
        )(x)
        x = _dense(self.cfg, self.cfg.hidden_size, dtype, "projection")(x)
        x = HashDropout(
            rate=self.cfg.feat_proj_dropout, deterministic=not train,
            use_hash=self.cfg.hash_dropout,
        )(x)
        return x


class PosConvEmbedding(nn.Module):
    """Grouped conv positional embedding with torch-layout weight-norm params.

    Params `weight_v` [out, in/groups, k] and `weight_g` [1, 1, k] match
    torch.nn.utils.weight_norm(conv, dim=2) so HF checkpoints port exactly
    and the reparameterization trains identically.
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = jnp.dtype(self.cfg.dtype)
        h = self.cfg.hidden_size
        k = self.cfg.num_conv_pos_embeddings
        groups = self.cfg.num_conv_pos_embedding_groups

        def v_init(key, shape, _dtype=jnp.float32):
            # torch conv default init: kaiming_uniform(a=sqrt(5)) ==
            # U(-b, b), b = 1/sqrt(fan_in)
            fan_in = shape[1] * shape[2]
            bound = 1.0 / (fan_in**0.5)
            return jax.random.uniform(
                key, shape, _dtype, minval=-bound, maxval=bound
            )

        weight_v = self.param("weight_v", v_init, (h, h // groups, k))
        weight_g = self.param(
            "weight_g",
            lambda key, shape: jnp.linalg.norm(
                weight_v.reshape(-1, k), axis=0
            ).reshape(shape),
            (1, 1, k),
        )
        bias = self.param("bias", nn.initializers.zeros, (h,))

        norm = jnp.linalg.norm(weight_v.reshape(-1, k), axis=0).reshape(
            1, 1, k
        )
        w = weight_v * (weight_g / jnp.maximum(norm, 1e-12))
        # torch layout [out, in/groups, k] -> flax NWC kernel [k, in/groups, out]
        kernel = jnp.transpose(w, (2, 1, 0)).astype(dtype)

        # two formulations, identical math/params (cfg.posconv_decomposed):
        # per-group DENSE convs (always-correct kernel grads under SPMD
        # accumulation — see the config field's note) vs one native
        # feature_group_count conv (faster backward; safe when each
        # program computes the gradient once). Group g owns output
        # channels [g*h/G, (g+1)*h/G) of the torch grouped-conv layout.
        pad = k // 2
        xg = x.astype(dtype)
        if self.cfg.posconv_decomposed:
            hg = h // groups
            outs = []
            for g in range(groups):
                outs.append(
                    jax.lax.conv_general_dilated(
                        xg[..., g * hg : (g + 1) * hg],
                        kernel[:, :, g * hg : (g + 1) * hg],
                        window_strides=(1,),
                        padding=[(pad, pad)],
                        dimension_numbers=("NWC", "WIO", "NWC"),
                    )
                )
            out = jnp.concatenate(outs, axis=-1)
        else:
            out = jax.lax.conv_general_dilated(
                xg,
                kernel,
                window_strides=(1,),
                padding=[(pad, pad)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=groups,
            )
        out = out + bias.astype(dtype)
        if k % 2 == 0:  # SamePadLayer: drop the trailing frame
            out = out[:, :-1, :]
        return nn.gelu(out, approximate=False)


def _xla_attention(
    q, k, v, bias, dropout_rate, deterministic, rng, use_hash=True
):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0 and not deterministic:
        if use_hash:
            # counter-hash keep mask, not jax.random.bernoulli: 0.108 vs
            # 0.391 ms per layer at the T=149 training shape (PERF.md
            # round-4 dropout-sampler table); same sampler the flash
            # kernel regenerates in-block
            from ..ops.flash_attention import (
                attention_dropout_keep,
                dropout_seed_from_rng,
            )

            b, t, h, _ = q.shape
            keep = attention_dropout_keep(
                dropout_seed_from_rng(rng), b, h, t, k.shape[1],
                dropout_rate,
            )
            probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        else:
            keep = jax.random.bernoulli(
                rng, 1.0 - dropout_rate, probs.shape
            )
            probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class SelfAttention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attention_bias: Optional[jax.Array],
        train: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h, n_heads = cfg.hidden_size, cfg.num_heads
        head_dim = h // n_heads
        b, t, _ = x.shape

        # fused QKV: one [h, 3h] matmul instead of three [h, h] — fewer,
        # larger MXU ops (converter concatenates the HF q/k/v weights)
        qkv = _dense(cfg, 3 * h, dtype, "qkv_proj")(x)
        q, k, v = (
            part.reshape(b, t, n_heads, head_dim)
            for part in jnp.split(qkv, 3, axis=-1)
        )

        # flash kernel path: fwd AND bwd run as flash (real flash backward),
        # including training with attention_dropout > 0 — the kernel
        # applies attention-prob dropout in-block via a counter-hash mask
        # regenerated in the backward (no [T, T] mask in HBM)
        drop_rate = cfg.attention_dropout if train else 0.0
        rng = self.make_rng("dropout") if drop_rate > 0 else None
        if cfg.attention_impl == "flash":
            from ..ops.flash_attention import flash_attention

            out = flash_attention(
                q, k, v, bias=attention_bias,
                dropout_rate=drop_rate, rng=rng,
            )
        else:
            out = _xla_attention(
                q,
                k,
                v,
                attention_bias,
                cfg.attention_dropout,
                not train,
                rng,
                use_hash=cfg.hash_dropout,
            )
        out = out.reshape(b, t, h)
        return _dense(cfg, h, dtype, "out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-norm (BASE) or pre-norm (LARGE, stable-layer-norm) block.

    Includes mask-based layerdrop (stochastic depth with the reference's
    skip expectation, jit-compatible: SURVEY §7.3) so it can live inside
    nn.scan.
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attention_bias: Optional[jax.Array],
        train: bool = False,
    ) -> jax.Array:
        out = self._block(x, attention_bias, train)
        if train and self.cfg.layerdrop > 0:
            keep = jax.random.bernoulli(
                self.make_rng("layerdrop"), 1.0 - self.cfg.layerdrop
            )
            out = jnp.where(keep, out, x)
        return out

    def _block(
        self,
        x: jax.Array,
        attention_bias: Optional[jax.Array],
        train: bool,
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pre = cfg.do_stable_layer_norm

        attn_in = (
            nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
            )(x)
            if pre
            else x
        )
        attn = SelfAttention(cfg, name="attention")(
            attn_in, attention_bias, train=train
        )
        attn = HashDropout(
            rate=cfg.hidden_dropout, deterministic=not train,
            use_hash=cfg.hash_dropout,
        )(attn)
        x = x + attn
        if not pre:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
            )(x)

        ff_in = (
            nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                dtype=dtype,
                name="final_layer_norm",
            )(x)
            if pre
            else x
        )
        h = _dense(cfg, cfg.intermediate_size, dtype, "intermediate_dense")(
            ff_in
        )
        h = nn.gelu(h, approximate=False)
        h = HashDropout(
            rate=cfg.activation_dropout, deterministic=not train,
            use_hash=cfg.hash_dropout,
        )(h)
        h = _dense(cfg, cfg.hidden_size, dtype, "output_dense")(h)
        h = HashDropout(
            rate=cfg.hidden_dropout, deterministic=not train,
            use_hash=cfg.hash_dropout,
        )(h)
        x = x + h
        if not pre:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                dtype=dtype,
                name="final_layer_norm",
            )(x)
        return x


class ScanEncoderLayer(nn.Module):
    """EncoderLayer with the (carry, ys) signature nn.scan requires;
    optionally rematerialized (memory for FLOPs)."""

    cfg: Wav2Vec2Config
    collect: bool = False

    @nn.compact
    def __call__(self, x, attention_bias, train=False):
        layer_cls = EncoderLayer
        if self.cfg.remat:
            policy = {
                "nothing": None,  # recompute everything
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }[self.cfg.remat_policy]
            layer_cls = nn.remat(
                EncoderLayer, static_argnums=(3,), policy=policy
            )
        y = layer_cls(self.cfg, name="block")(x, attention_bias, train)
        return y, (y if self.collect else None)


class Encoder(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        train: bool = False,
        output_hidden_states: bool = False,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        attention_bias = None
        if attention_mask is not None:
            # zero padded positions (HF does the same before pos conv)
            x = x * attention_mask[:, :, None].astype(x.dtype)
            neg = jnp.finfo(jnp.float32).min
            attention_bias = jnp.where(
                attention_mask[:, None, None, :], 0.0, neg
            ).astype(dtype)

        x = x + PosConvEmbedding(cfg, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
            )(x)
        x = HashDropout(
            rate=cfg.hidden_dropout, deterministic=not train,
            use_hash=cfg.hash_dropout,
        )(x)

        # lax.scan over stacked layer params: 1 copy of the layer HLO
        # instead of num_layers copies — an order of magnitude faster XLA
        # compiles with identical math. Params live as [num_layers, ...].
        scan_layer = nn.scan(
            ScanEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=cfg.num_layers,
            unroll=min(max(cfg.encoder_unroll, 1), cfg.num_layers),
        )(cfg, collect=output_hidden_states, name="layers")

        hidden_states = [x] if output_hidden_states else None
        x, per_layer = scan_layer(x, attention_bias, train)
        if output_hidden_states:
            hidden_states.extend(
                per_layer[i] for i in range(cfg.num_layers)
            )

        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
            )(x)
            if output_hidden_states:
                hidden_states[-1] = x

        if output_hidden_states:
            return x, hidden_states
        return x


class Wav2Vec2Model(nn.Module):
    """Raw waveform -> contextual features [B, T(, +1 cls), hidden]."""

    cfg: Wav2Vec2Config = BASE_CONFIG
    insert_cls_token: bool = False
    cls_token_constant: float = 1.0

    @property
    def num_features(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,  # [B, N]
        wav_mask: Optional[jax.Array] = None,  # [B, N] validity
        train: bool = False,
        output_hidden_states: bool = False,
    ):
        cfg = self.cfg
        features = ConvFeatureEncoder(cfg, name="feature_encoder")(
            wav, wav_mask, train=train
        )

        frame_mask = None
        if wav_mask is not None:
            frame_lengths = feat_extract_output_lengths(
                wav_mask.sum(axis=-1), cfg
            )
            t = features.shape[1]
            frame_mask = (
                jnp.arange(t)[None, :] < frame_lengths[:, None]
            )

        x = FeatureProjection(cfg, name="feature_projection")(
            features, train=train
        )

        # SpecAugment on projected features (applied train-only, but the
        # learned mask embedding must exist unconditionally for checkpoints)
        masked_embed = (
            self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,),
            )
            if cfg.mask_time_prob > 0
            else None
        )
        if train and (cfg.mask_time_prob > 0 or cfg.mask_feature_prob > 0):
            b, t, h = x.shape
            if cfg.mask_time_prob > 0:
                time_mask = sample_span_mask(
                    self.make_rng("masking"),
                    b,
                    t,
                    cfg.mask_time_prob,
                    cfg.mask_time_length,
                    frame_mask.sum(-1) if frame_mask is not None else None,
                )
                x = jnp.where(
                    time_mask[:, :, None],
                    masked_embed.astype(x.dtype)[None, None, :],
                    x,
                )
            if cfg.mask_feature_prob > 0:
                feat_mask = sample_span_mask(
                    self.make_rng("masking"),
                    b,
                    h,
                    cfg.mask_feature_prob,
                    cfg.mask_feature_length,
                )
                x = x * (~feat_mask)[:, None, :].astype(x.dtype)

        if self.insert_cls_token:
            b = x.shape[0]
            cls = jnp.full(
                (b, 1, cfg.hidden_size), self.cls_token_constant, x.dtype
            )
            x = jnp.concatenate([cls, x], axis=1)
            if frame_mask is not None:
                frame_mask = jnp.concatenate(
                    [jnp.ones((b, 1), bool), frame_mask], axis=1
                )

        out = Encoder(cfg, name="encoder")(
            x,
            attention_mask=frame_mask,
            train=train,
            output_hidden_states=output_hidden_states,
        )
        if output_hidden_states:
            x, hidden_states = out
            return (
                x.astype(jnp.float32),
                frame_mask,
                [h.astype(jnp.float32) for h in hidden_states],
            )
        return out.astype(jnp.float32), frame_mask


class Wav2Vec2LiteEncoder(nn.Module):
    """Conv feature encoder only (512 features) — the reference's
    Wav2vecLiteWrapperModule (`models/wav2vec2.py:149-169`)."""

    cfg: Wav2Vec2Config = BASE_CONFIG

    @property
    def num_features(self) -> int:
        return self.cfg.conv_dim[-1]

    @nn.compact
    def __call__(self, wav, wav_mask=None, train: bool = False):
        features = ConvFeatureEncoder(self.cfg, name="feature_encoder")(
            wav, wav_mask, train=train
        )
        frame_mask = None
        if wav_mask is not None:
            frame_lengths = feat_extract_output_lengths(
                wav_mask.sum(axis=-1), self.cfg
            )
            t = features.shape[1]
            frame_mask = jnp.arange(t)[None, :] < frame_lengths[:, None]
        return features.astype(jnp.float32), frame_mask
