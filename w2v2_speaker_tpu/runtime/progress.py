"""Tracked-sample embedding progress over training.

Reference: `src/callbacks/progress_tracker_callback.py` — declared but DEAD
CODE there (missing imports; `progress_tracker_callback.py:20` references an
undefined `VoxCelebDataModule`, SURVEY §2.7). Re-designed as a working
TPU-native validation hook rather than ported: a fixed probe set (up to
`per_speaker` utterances from each of the first `num_speakers` train
speaker indices, the reference's speakers 0-4 x 2) is embedded at every
validation with the same sharded embed fn as eval. Each snapshot writes

- `step_XXXXXXXX/embeddings.npy` — the raw [N, D] probe embedding matrix
  (the data behind the reference's seaborn heatmap),
- `step_XXXXXXXX/stats.txt` — per-sample min/max/mean/std/L2 lines (the
  reference's `debug_tensor_content` text dumps),
- `step_XXXXXXXX/embeddings.png` — a heatmap with per-sample separators
  (reference `_make_heatmap`), robust-scaled, when matplotlib is available,

and returns scalar separation metrics (mean intra-/inter-speaker cosine and
their gap) that land in TensorBoard/console beside `val_eer` — the signal
the reference's heatmaps were meant to let a human eyeball.
"""

from __future__ import annotations

import pathlib
from typing import Callable, Dict, Iterable, Optional

import numpy as np

__all__ = ["ProgressTracker"]


class ProgressTracker:
    def __init__(
        self,
        out_dir: pathlib.Path | str,
        num_speakers: int = 5,
        per_speaker: int = 2,
        heatmap: bool = True,
        max_scan_batches: int = 100,
    ):
        self.out_dir = pathlib.Path(out_dir)
        self.num_speakers = int(num_speakers)
        self.per_speaker = int(per_speaker)
        self.heatmap = bool(heatmap)
        self.max_scan_batches = int(max_scan_batches)
        self.features: Optional[np.ndarray] = None  # [N, ...] probe rows
        self.mask: Optional[np.ndarray] = None
        self.labels: Optional[np.ndarray] = None

    # -- probe-set selection -------------------------------------------------

    def select_samples(self, batches: Iterable[Dict]) -> bool:
        """Collect the fixed probe set from a train-batch stream (reference
        `_extract_train_val_samples`: up to 2 samples each of speaker
        indices 0..4). Returns False when no tracked-speaker sample appears
        (e.g. a subset run whose labels all exceed `num_speakers`)."""
        by_spk: Dict[int, list] = {}
        want = self.num_speakers * self.per_speaker
        for scanned, batch in enumerate(batches):
            if scanned >= self.max_scan_batches:
                # bound the startup cost: a tracked speaker with too few
                # utterances must not force a full-epoch decode before
                # training starts — take whatever the cap collected
                break
            feats = np.asarray(batch["features"])
            labels = np.asarray(batch["labels"]).reshape(-1)
            mask = batch.get("mask")
            mask = (
                np.ones(feats.shape[:2], bool)
                if mask is None
                else np.asarray(mask)
            )
            for j in range(min(len(labels), feats.shape[0])):
                lab = int(labels[j])
                if lab >= self.num_speakers:
                    continue
                rows = by_spk.setdefault(lab, [])
                if len(rows) >= self.per_speaker:
                    continue
                rows.append((feats[j], mask[j], lab))
            if sum(len(v) for v in by_spk.values()) >= want:
                break
        picked = [
            row for lab in sorted(by_spk) for row in by_spk[lab]
        ]
        if not picked:
            return False
        # probe rows may come from batches with different time lengths
        # (chunk strategy 'none', or short utterances padded only to their
        # own batch max) — right-pad to a common T; models are
        # padding-invariant under the mask by contract
        t_max = max(r[0].shape[0] for r in picked)

        def pad_t(a: np.ndarray) -> np.ndarray:
            if a.shape[0] == t_max:
                return a
            widths = [(0, t_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths)

        self.features = np.stack([pad_t(r[0]) for r in picked])
        self.mask = np.stack([pad_t(r[1]) for r in picked])
        self.labels = np.asarray([r[2] for r in picked])
        return True

    # -- per-validation snapshot ----------------------------------------------

    def snapshot(
        self, step: int, embed_fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
    ) -> Dict[str, float]:
        """Embed the probe set, persist the snapshot, return separation
        metrics. `embed_fn(features, mask) -> [N, D]`."""
        emb = np.asarray(embed_fn(self.features, self.mask))
        d = self.out_dir / f"step_{int(step):08d}"
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "embeddings.npy", emb)

        lines = []
        for j, (lab, e) in enumerate(zip(self.labels, emb)):
            lines.append(
                f"sample {j} speaker {int(lab)}: min={e.min():.4f} "
                f"max={e.max():.4f} mean={e.mean():.4f} "
                f"std={e.std():.4f} l2={np.linalg.norm(e):.4f} "
                f"nan={int(np.isnan(e).sum())}"
            )
        (d / "stats.txt").write_text("\n".join(lines) + "\n")

        metrics = self._separation_metrics(emb)
        if self.heatmap:
            self._write_heatmap(emb, d / "embeddings.png")
        return metrics

    def _separation_metrics(self, emb: np.ndarray) -> Dict[str, float]:
        n = emb / np.maximum(
            np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        sims = n @ n.T
        same = self.labels[:, None] == self.labels[None, :]
        offdiag = ~np.eye(len(emb), dtype=bool)
        intra = sims[same & offdiag]
        inter = sims[~same]
        out: Dict[str, float] = {}
        if intra.size:
            out["track_intra_cos"] = float(intra.mean())
        if inter.size:
            out["track_inter_cos"] = float(inter.mean())
        if intra.size and inter.size:
            out["track_separation"] = float(intra.mean() - inter.mean())
        return out

    def _write_heatmap(self, emb: np.ndarray, path: pathlib.Path) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return  # npy snapshot still carries the data
        lo, hi = np.percentile(emb, [2, 98])  # seaborn robust=True scaling
        fig, ax = plt.subplots(
            figsize=(8, max(2.0, 0.4 * emb.shape[0]))
        )
        ax.imshow(
            emb, aspect="auto", vmin=lo, vmax=hi, cmap="viridis",
            interpolation="nearest",
        )
        for i in range(emb.shape[0] + 1):  # reference's white row separators
            ax.axhline(i - 0.5, color="white", lw=2)
        ax.set_yticks(range(emb.shape[0]))
        ax.set_yticklabels([f"spk {int(l)}" for l in self.labels])
        ax.set_xlabel("embedding dim")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)
