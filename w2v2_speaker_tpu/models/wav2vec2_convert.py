"""HF wav2vec2 checkpoint -> flax param tree converter.

The reference loads pretrained weights via
`Wav2Vec2Model.from_pretrained` (`/root/reference/src/models/wav2vec2.py:38`);
here pretrained initialization is a pure dict transformation from a torch
state dict (file or in-memory) into the `Wav2Vec2Model` flax tree, so no
torch is needed at train time. Handles both the classic weight-norm param
names (`weight_g`/`weight_v`) and the torch>=2 parametrizations layout.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .wav2vec2 import Wav2Vec2Config

__all__ = ["hf_state_dict_to_flax", "load_hf_checkpoint"]


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def hf_state_dict_to_flax(
    state_dict: Mapping[str, "object"],
    cfg: Wav2Vec2Config = Wav2Vec2Config(),
) -> Dict:
    """Convert a HF `Wav2Vec2Model` state dict to this package's param tree.

    Accepts keys with or without a leading 'wav2vec2.' prefix (i.e. both
    Wav2Vec2Model and Wav2Vec2ForCTC dumps).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("wav2vec2."):
            k = k[len("wav2vec2.") :]
        sd[k] = v

    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    # conv feature encoder
    for i in range(len(cfg.conv_dim)):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        # torch [out, in, k] -> flax NWC [k, in, out]
        put(
            ("feature_encoder", f"conv_{i}", "kernel"),
            np.transpose(w, (2, 1, 0)),
        )
        bkey = f"feature_extractor.conv_layers.{i}.conv.bias"
        if cfg.conv_bias and bkey in sd:
            put(("feature_encoder", f"conv_{i}", "bias"), _t(sd[bkey]))
        ln_w = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_w in sd:
            target = (
                ("feature_encoder", "group_norm")
                if i == 0 and cfg.feat_extract_norm == "group"
                else ("feature_encoder", f"layer_norm_{i}")
            )
            put(target + ("scale",), _t(sd[ln_w]))
            put(
                target + ("bias",),
                _t(sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"]),
            )

    # feature projection
    put(
        ("feature_projection", "layer_norm", "scale"),
        _t(sd["feature_projection.layer_norm.weight"]),
    )
    put(
        ("feature_projection", "layer_norm", "bias"),
        _t(sd["feature_projection.layer_norm.bias"]),
    )
    put(
        ("feature_projection", "projection", "kernel"),
        _t(sd["feature_projection.projection.weight"]).T,
    )
    put(
        ("feature_projection", "projection", "bias"),
        _t(sd["feature_projection.projection.bias"]),
    )

    if "masked_spec_embed" in sd and cfg.mask_time_prob > 0:
        put(("masked_spec_embed",), _t(sd["masked_spec_embed"]))

    # positional conv embedding (weight-norm, torch layout kept)
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = _t(sd["encoder.pos_conv_embed.conv.weight_g"])
        v = _t(sd["encoder.pos_conv_embed.conv.weight_v"])
    else:  # torch >= 2 parametrizations
        g = _t(
            sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        )
        v = _t(
            sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
        )
    put(("encoder", "pos_conv_embed", "weight_g"), g.reshape(1, 1, -1))
    put(("encoder", "pos_conv_embed", "weight_v"), v)
    put(
        ("encoder", "pos_conv_embed", "bias"),
        _t(sd["encoder.pos_conv_embed.conv.bias"]),
    )

    put(("encoder", "layer_norm", "scale"), _t(sd["encoder.layer_norm.weight"]))
    put(("encoder", "layer_norm", "bias"), _t(sd["encoder.layer_norm.bias"]))

    # transformer layers — stacked along axis 0 (the encoder scans over
    # [num_layers, ...] parameter arrays)
    def stacked(fmt, transpose=False):
        arrs = [_t(sd[fmt.format(i=i)]) for i in range(cfg.num_layers)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs, axis=0)

    block = ("encoder", "layers", "block")
    # fused QKV projection: concat HF's q/k/v along the output dim
    qkv_kernels = [
        stacked(
            "encoder.layers.{i}.attention." + proj + ".weight",
            transpose=True,
        )
        for proj in ("q_proj", "k_proj", "v_proj")
    ]
    put(
        block + ("attention", "qkv_proj", "kernel"),
        np.concatenate(qkv_kernels, axis=-1),
    )
    qkv_biases = [
        stacked("encoder.layers.{i}.attention." + proj + ".bias")
        for proj in ("q_proj", "k_proj", "v_proj")
    ]
    put(
        block + ("attention", "qkv_proj", "bias"),
        np.concatenate(qkv_biases, axis=-1),
    )
    put(
        block + ("attention", "out_proj", "kernel"),
        stacked("encoder.layers.{i}.attention.out_proj.weight", transpose=True),
    )
    put(
        block + ("attention", "out_proj", "bias"),
        stacked("encoder.layers.{i}.attention.out_proj.bias"),
    )
    put(
        block + ("layer_norm", "scale"),
        stacked("encoder.layers.{i}.layer_norm.weight"),
    )
    put(
        block + ("layer_norm", "bias"),
        stacked("encoder.layers.{i}.layer_norm.bias"),
    )
    put(
        block + ("intermediate_dense", "kernel"),
        stacked(
            "encoder.layers.{i}.feed_forward.intermediate_dense.weight",
            transpose=True,
        ),
    )
    put(
        block + ("intermediate_dense", "bias"),
        stacked("encoder.layers.{i}.feed_forward.intermediate_dense.bias"),
    )
    put(
        block + ("output_dense", "kernel"),
        stacked(
            "encoder.layers.{i}.feed_forward.output_dense.weight",
            transpose=True,
        ),
    )
    put(
        block + ("output_dense", "bias"),
        stacked("encoder.layers.{i}.feed_forward.output_dense.bias"),
    )
    put(
        block + ("final_layer_norm", "scale"),
        stacked("encoder.layers.{i}.final_layer_norm.weight"),
    )
    put(
        block + ("final_layer_norm", "bias"),
        stacked("encoder.layers.{i}.final_layer_norm.bias"),
    )

    return params


def load_hf_checkpoint(
    path: str, cfg: Wav2Vec2Config = Wav2Vec2Config()
) -> Dict:
    """Load a local torch checkpoint file (.pt/.bin state dict or
    safetensors) and convert. Never touches the network."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
    return hf_state_dict_to_flax(sd, cfg)
