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
