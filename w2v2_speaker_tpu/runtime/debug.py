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
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "debug_tensor_content",
    "dump_first_batch",
    "model_summary",
    "PipelineDebugCapture",
]


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


class PipelineDebugCapture:
    """Per-preprocessor debug artifacts for the first few pipeline samples.

    Role of the reference's per-sample `side_info.pipeline_progress` +
    debug-writer chain (`callbacks/input_monitor_callback.py:93-156`: the
    original tensor is saved as .npy and a playable .wav, then every
    preprocessing stage writes its intermediate through its debug writer).
    Here each captured sample gets a directory of numbered stage artifacts
    (`00_original`, `01_augment_<op>`, `02_chunk0`, `03_normalize0`, ...),
    each as raw `.npy` + stats `.txt` + a 16-bit `.wav` render.

    Thread-safe: the speaker pipeline may run `process_one` under a
    `ParallelMap` worker pool.
    """

    def __init__(
        self,
        out_dir: pathlib.Path,
        max_samples: int = 4,
        sample_rate: int = 16000,
    ):
        self.out_dir = pathlib.Path(out_dir)
        self.max_samples = int(max_samples)
        self.sample_rate = int(sample_rate)
        self._stage_idx: Dict[str, int] = {}
        self._owner: Dict[str, int] = {}
        self._done: set = set()
        self._lock = threading.Lock()

    def wants(self, key: str) -> bool:
        with self._lock:
            return key in self._stage_idx or (
                len(self._stage_idx) < self.max_samples
            )

    def _next_stage(self, key: str, stage: str) -> Optional[int]:
        # A sample's full stage chain runs synchronously inside ONE worker
        # call, so chains are thread-local: the first thread to record a
        # key owns its chain. A concurrent occurrence of the same key on
        # ANOTHER worker (pairs/triplet sampling can draw a key twice per
        # epoch) is ignored outright — marking the key done there would
        # truncate the owner's in-flight chain mid-flight, leaving only
        # 00_original on disk.
        tid = threading.get_ident()
        with self._lock:
            if key in self._done:
                return None
            if key not in self._stage_idx:
                if len(self._stage_idx) >= self.max_samples:
                    return None
                self._stage_idx[key] = 0
                self._owner[key] = tid
            elif self._owner.get(key) != tid:
                return None
            elif stage == "original" and self._stage_idx[key] > 0:
                # a second pipeline pass over the same key on the owner
                # thread (the example batch drawn for state init, a later
                # epoch, an eval re-read): the first pass's stage chain is
                # complete — don't append duplicate artifacts
                self._done.add(key)
                return None
            idx = self._stage_idx[key]
            self._stage_idx[key] += 1
        return idx

    def record(self, key: str, stage: str, wav, render_wav: bool = True
               ) -> None:
        idx = self._next_stage(key, stage)
        if idx is None:
            return
        arr = np.asarray(wav)
        d = self.out_dir / key.replace("/", "_")
        name = f"{idx:02d}_{stage}"
        debug_tensor_content(arr, name, d, print_stats=False)
        if render_wav and arr.ndim == 1 and arr.size:
            # playable render beside the raw array (the reference's
            # torchaudio.save of original/stage tensors)
            from ..data.io import write_wav

            peak = float(np.abs(arr).max()) or 1.0
            write_wav(
                d / f"{name}.wav",
                (arr / max(peak, 1.0)).astype(np.float32),
                self.sample_rate,
            )

    def record_text(self, key: str, stage: str, text: str) -> None:
        """Non-tensor stage artifact (e.g. the speech pipeline's
        transcription before tokenization)."""
        idx = self._next_stage(key, stage)
        if idx is None:
            return
        d = self.out_dir / key.replace("/", "_")
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{idx:02d}_{stage}.txt").write_text(str(text) + "\n")


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
