"""Checkpointing: orbax-backed train-state persistence + best-k policy.

TPU equivalent of the reference's ModelCheckpoint setup (SURVEY §5.4):
top-1 on the monitored metric (val_eer for speaker, val_wer_clean for
speech), `save_last`, metric-stamped filenames
(`config/callbacks/speaker_default.yaml:15-25`), plus weights-only warm
starts (`main.py:272-283` load_network_from_checkpoint with strict=False —
here: restore params only, tolerating a different head via subtree
selection).
"""

from __future__ import annotations

import json
import pathlib
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = [
    "CheckpointManager",
    "save_params",
    "load_params",
    "resolve_checkpoint_path",
]


def resolve_checkpoint_path(path: pathlib.Path | str) -> pathlib.Path:
    """Map `<ckpt_dir>/best` to the best entry recorded in `index.json` (the
    manager never materializes a literal 'best' directory — only 'last' and
    metric-stamped dirs), falling back to 'last'. Existing paths pass
    through untouched."""
    p = pathlib.Path(path)
    if p.exists() or p.name != "best":
        return p
    idx = p.parent / "index.json"
    if idx.exists():
        index = json.loads(idx.read_text())
        entries = index.get("best") or []
        if entries:
            return p.parent / entries[0]["name"]
        if index.get("last") and (p.parent / "last").exists():
            return p.parent / "last"
    return p


def _to_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
        "rng": state.rng,
    }


class CheckpointManager:
    """Best-k + last checkpointing of TrainState.

    mode='min' keeps the k checkpoints with the lowest monitored metric
    (EER/WER); `save_last` always maintains a 'last' checkpoint for resume.
    """

    def __init__(
        self,
        directory: pathlib.Path | str,
        monitor: str = "val_eer",
        mode: str = "min",
        top_k: int = 1,
        save_last: bool = True,
    ):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.save_last = save_last
        self._ckpt = ocp.StandardCheckpointer()
        self._index_path = self.dir / "index.json"
        self._index: Dict[str, Dict] = self._load_index()

    def _load_index(self) -> Dict:
        if self._index_path.exists():
            return json.loads(self._index_path.read_text())
        return {"best": [], "last": None}

    def _write_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=2))

    def _save(self, name: str, state: TrainState) -> None:
        path = (self.dir / name).absolute()
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, _to_pytree(state))
        self._ckpt.wait_until_finished()

    def save_step(
        self,
        state: TrainState,
        metrics: Optional[Dict[str, float]] = None,
        epoch: Optional[int] = None,
    ) -> None:
        """Call after each validation: updates 'last' and the best-k set.

        `epoch` (the epoch in progress at save time) rides the index so a
        resumed run continues epoch accounting where it left off — PL
        persists the epoch counter in its checkpoints, and without it
        `trainer.max_epochs`/`min_epochs` would restart from 0 on every
        relaunch (a max_epochs-capped run would train max_epochs MORE
        epochs after each resume)."""
        step = int(state.step)
        if self.save_last:
            self._save("last", state)
            self._index["last"] = {"step": step}
            if epoch is not None:
                self._index["last"]["epoch"] = int(epoch)
        metric = None if metrics is None else metrics.get(self.monitor)
        if metric is not None and np.isfinite(metric):
            name = f"step{step:08d}_{self.monitor}={metric:.4f}"
            entries = self._index["best"]
            sign = 1.0 if self.mode == "min" else -1.0
            worst = max((sign * e["metric"] for e in entries), default=np.inf)
            if any(e["name"] == name for e in entries):
                # re-validated at the same step (e.g. a limit_train epoch cap
                # landing on a val boundary): one directory must map to one
                # index entry, or eviction would rmtree it out from under the
                # duplicate and averaging would count it twice
                pass
            elif len(entries) < self.top_k or sign * metric < worst:
                self._save(name, state)
                entries.append(
                    {"name": name, "metric": float(metric), "step": step}
                )
                entries.sort(key=lambda e: sign * e["metric"])
                while len(entries) > self.top_k:
                    dropped = entries.pop()
                    dropped_path = self.dir / dropped["name"]
                    if dropped_path.exists():
                        shutil.rmtree(dropped_path)
        self._write_index()

    @property
    def best_path(self) -> Optional[pathlib.Path]:
        entries = self._index["best"]
        if not entries:
            return self.dir / "last" if self._index["last"] else None
        return self.dir / entries[0]["name"]

    def average_best(self, template: TrainState, k: int) -> TrainState:
        """Uniform average of the best-k checkpoints' float leaves
        (checkpoint averaging — the standard eval-time trick the reference's
        top-1 ModelCheckpoint cannot express; beyond-reference capability).
        Non-float leaves (step counters etc.) and opt_state/rng come from
        the single best checkpoint. Falls back to a plain best restore when
        fewer than 2 best entries exist."""
        entries = self._index["best"][: max(int(k), 1)]
        if len(entries) < 2:
            print(
                f"checkpoint averaging: requested {k} but only "
                f"{len(entries)} best checkpoint(s) recorded (is "
                f"trainer.save_top_k >= {k}?) — restoring the single best"
            )
            return self.restore(template, name="best")
        target = jax.tree.map(np.asarray, _to_pytree(template))

        def to_acc(x):
            x = np.asarray(x)
            return (
                x.astype(np.float64)
                if np.issubdtype(x.dtype, np.floating)
                else x
            )

        def add_leaf(a, x):
            x = np.asarray(x)
            return a + x if np.issubdtype(x.dtype, np.floating) else a

        # restore sequentially, keeping only a running float64 sum — holds at
        # most 2 full states in host RAM instead of k
        best = self._ckpt.restore(
            (self.dir / entries[0]["name"]).absolute(), target
        )
        acc = {
            "params": jax.tree.map(to_acc, best["params"]),
            "model_state": jax.tree.map(to_acc, best["model_state"]),
        }
        for e in entries[1:]:
            r = self._ckpt.restore((self.dir / e["name"]).absolute(), target)
            for key in acc:
                acc[key] = jax.tree.map(add_leaf, acc[key], r[key])

        def mean_leaf(a, x0):
            x0 = np.asarray(x0)
            if not np.issubdtype(x0.dtype, np.floating):
                return x0
            return (a / len(entries)).astype(x0.dtype)

        print(
            f"checkpoint averaging: {len(entries)} best checkpoints "
            f"({[e['name'] for e in entries]})"
        )
        return template.replace(
            step=best["step"],
            params=jax.tree.map(mean_leaf, acc["params"], best["params"]),
            opt_state=best["opt_state"],
            model_state=jax.tree.map(
                mean_leaf, acc["model_state"], best["model_state"]
            ),
            rng=best["rng"],
        )

    def last_epoch(self) -> Optional[int]:
        """Epoch recorded with the 'last' checkpoint (None on old/absent
        indexes); lets a resumed run continue max/min_epochs accounting."""
        ep = (self._index.get("last") or {}).get("epoch")
        return None if ep is None else int(ep)

    def restore(self, template: TrainState, name: str = "best") -> TrainState:
        """Restore full train state into the (abstract) template."""
        path = (
            self.best_path if name == "best" else (self.dir / name)
        )
        if path is None or not path.exists():
            raise FileNotFoundError(f"no checkpoint at {path}")
        target = jax.tree.map(np.asarray, _to_pytree(template))
        restored = self._ckpt.restore(path.absolute(), target)
        return template.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            model_state=restored["model_state"],
            rng=restored["rng"],
        )


def save_params(path: pathlib.Path | str, params: Any) -> None:
    """Weights-only save (for warm starts / predict)."""
    path = pathlib.Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, {"params": params})
    ckpt.wait_until_finished()


def load_params(path: pathlib.Path | str, template: Any) -> Any:
    """Weights-only restore; like the reference's strict=False warm start,
    missing/extra subtrees in the template are tolerated by restoring only
    matching leaves."""
    ckpt = ocp.StandardCheckpointer()
    path = resolve_checkpoint_path(path)
    target = {"params": jax.tree.map(np.asarray, template)}
    try:
        return ckpt.restore(pathlib.Path(path).absolute(), target)["params"]
    except Exception:
        # partial restore: load raw then graft matching subtrees
        raw = ckpt.restore(pathlib.Path(path).absolute())["params"]

        def graft(tmpl, loaded):
            if isinstance(tmpl, dict) and isinstance(loaded, dict):
                return {
                    k: graft(tmpl[k], loaded[k]) if k in loaded else tmpl[k]
                    for k in tmpl
                }
            if (
                hasattr(tmpl, "shape")
                and hasattr(loaded, "shape")
                and tuple(tmpl.shape) == tuple(loaded.shape)
            ):
                return loaded
            return tmpl

        return graft(template, raw)
