"""Debug observability utilities.

Equivalents of the reference's debug machinery (SURVEY §2.7, §4):
- `debug_tensor_content` (`src/util.py:110-165`): min/max/mean/std/nan/inf
  stats printed and optionally persisted next to the raw array
- `dump_first_batch` (`callbacks/input_monitor_callback.py:36-156`): write
  the first batch of a run (tensors + stats + keys) for input auditing
- `model_summary` (`main.py:352-366` / pytorch_model_summary): parameter
  count audit per top-level module.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["debug_tensor_content", "dump_first_batch", "model_summary"]


def debug_tensor_content(
    tensor,
    name: str,
    save_dir: Optional[pathlib.Path] = None,
    print_stats: bool = True,
) -> Dict[str, float]:
    arr = np.asarray(tensor)
    finite = arr[np.isfinite(arr)] if arr.size else arr
    stats = {
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "min": float(finite.min()) if finite.size else float("nan"),
        "max": float(finite.max()) if finite.size else float("nan"),
        "mean": float(finite.mean()) if finite.size else float("nan"),
        "std": float(finite.std()) if finite.size else float("nan"),
        "num_nan": int(np.isnan(arr).sum()),
        "num_inf": int(np.isinf(arr).sum()),
    }
    if print_stats:
        print(f"[debug] {name}: {stats}")
    if save_dir is not None:
        save_dir = pathlib.Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        np.save(save_dir / f"{name}.npy", arr)
        (save_dir / f"{name}.txt").write_text(repr(stats))
    return stats


def dump_first_batch(batch: Dict[str, Any], save_dir: pathlib.Path) -> None:
    save_dir = pathlib.Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    for key, value in batch.items():
        if hasattr(value, "shape"):
            debug_tensor_content(
                value, f"batch_{key}", save_dir, print_stats=True
            )
        else:
            (save_dir / f"batch_{key}.txt").write_text(repr(value))


def batch_gradient_verification(
    embed_fn, features, mask=None, perturb_index: int = 0, eps: float = 1e3
) -> bool:
    """Cross-batch information-leakage check (the reference's
    BatchGradientVerification role, `main.py:343-351`): perturbing one sample
    of a batch must not change any other sample's embedding. Runs in eval
    mode (batch-norm uses running statistics, so a correct model is exactly
    per-sample independent).

    Returns True when no leakage is detected; raises AssertionError
    otherwise.
    """
    import numpy as np

    base = np.asarray(embed_fn(features, mask))
    perturbed = np.array(features)
    # replace the sample with fresh random content: affine perturbations are
    # nulled by per-utterance normalization and permutations by stats
    # pooling, so substitution is the only robust probe
    rng = np.random.default_rng(0)
    scale = float(np.abs(perturbed[perturb_index]).mean() + 1e-3)
    perturbed[perturb_index] = rng.normal(
        scale=scale, size=perturbed[perturb_index].shape
    ).astype(perturbed.dtype)
    out = np.asarray(embed_fn(perturbed, mask))
    changed = np.abs(out - base).reshape(out.shape[0], -1).max(axis=1)
    others = np.delete(changed, perturb_index)
    if (others > 1e-5).any():
        raise AssertionError(
            f"cross-batch leakage: perturbing sample {perturb_index} changed "
            f"{int((others > 1e-5).sum())} other samples "
            f"(max delta {others.max():.3e})"
        )
    if changed[perturb_index] == 0.0:
        raise AssertionError(
            "perturbation did not affect the perturbed sample — "
            "the check is vacuous"
        )
    return True


def model_summary(params) -> str:
    """Per-top-level-module parameter counts + total."""
    lines = []
    total = 0
    for name, subtree in sorted(params.items()):
        count = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(subtree))
        total += count
        lines.append(f"  {name:<30s} {count:>14,d}")
    lines.append(f"  {'TOTAL':<30s} {total:>14,d}")
    return "model parameters:\n" + "\n".join(lines)
