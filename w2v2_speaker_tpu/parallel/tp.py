"""Tensor-parallel parameter sharding over the mesh's 'model' axis.

The reference has no TP (SURVEY §2.8) — data parallel is parity. This module
is the TPU-first extension the mesh was designed for: Megatron-style
column/row sharding of the transformer's large kernels, expressed purely as
`NamedSharding` placements. GSPMD then partitions the matmuls and inserts
the all-reduces over ICI; the train/eval step functions are unchanged (they
jit with unspecified state shardings and inherit the placements).

Rules for the wav2vec2 tree (kernels are stacked [num_layers, in, out]):
- qkv_proj / intermediate_dense: column-parallel (split the output dim)
- out_proj / output_dense:       row-parallel (split the input dim)
Everything else (norms, biases of row-parallel layers, conv encoder,
heads) stays replicated — biases of column-parallel layers follow their
kernel's output split.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["wav2vec2_tp_rules", "apply_tp_sharding"]


def wav2vec2_tp_rules() -> List[Tuple[str, P]]:
    """(path-regex, PartitionSpec) over '/'-joined param paths."""
    return [
        # column-parallel: shard the output feature dim
        (r".*attention/qkv_proj/kernel$", P(None, None, MODEL_AXIS)),
        (r".*attention/qkv_proj/bias$", P(None, MODEL_AXIS)),
        (r".*intermediate_dense/kernel$", P(None, None, MODEL_AXIS)),
        (r".*intermediate_dense/bias$", P(None, MODEL_AXIS)),
        # row-parallel: shard the input feature dim (outputs all-reduce)
        (r".*attention/out_proj/kernel$", P(None, MODEL_AXIS, None)),
        (r".*output_dense/kernel$", P(None, MODEL_AXIS, None)),
    ]


def apply_tp_sharding(
    params: Dict[str, Any],
    mesh: Mesh,
    rules: List[Tuple[str, P]] | None = None,
) -> Dict[str, Any]:
    """device_put every leaf with its rule's sharding (replicated default).

    Works on any pytree of arrays; paths are '/'-joined key paths.
    """
    rules = rules if rules is not None else wav2vec2_tp_rules()
    compiled = [(re.compile(pattern), spec) for pattern, spec in rules]

    def place(path, leaf):
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = P()
        for pattern, candidate in compiled:
            if pattern.match(path_str):
                # rank guard: pad/crop the spec to the leaf's rank
                if len(candidate) <= leaf.ndim:
                    spec = candidate
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
