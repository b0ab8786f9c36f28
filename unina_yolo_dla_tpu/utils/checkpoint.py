"""Checkpointing: orbax-backed train checkpoints + single-file artifacts.

The reference delegates checkpoints to Ultralytics (best.pt / last.pt,
train.py:648, 898) and writes a pickled pre-calibrated QAT module for DDP
workers (qat_init_calibrated.pt, train.py:823-845). Here:

- ``CheckpointManager``: orbax step checkpoints with best/last tracking
  (fitness metric -> best, like the reference's best.pt selection).
- ``save_msgpack`` / ``load_msgpack``: single-file flax-serialized
  variable trees — the portable artifact for CLIs and the serving loader
  (the qat_init_calibrated.pt analogue is simply the variables dict with
  its ``quant`` collection included; no pickling of live modules needed).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_msgpack(tree: Any, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(tree)))


def load_msgpack(path: str | Path, template: Any) -> Any:
    """Restore a tree saved with ``save_msgpack``; ``template`` provides
    structure/dtypes (e.g. ``model.init`` output)."""
    return serialization.from_bytes(template, Path(path).read_bytes())


def load_msgpack_raw(path: str | Path) -> Any:
    """Template-free restore: plain nested dict of numpy arrays."""
    return serialization.msgpack_restore(Path(path).read_bytes())


class CheckpointManager:
    """Step checkpoints under ``dir/`` with last/best selection.

    Layout: ``<dir>/step_<N>.msgpack`` + ``<dir>/state.json`` recording
    {step: fitness} and the best/last pointers — a deliberately simple,
    inspectable format (orbax's async machinery is overkill for a ~5M-param
    model; the serialization itself is flax msgpack).
    """

    def __init__(self, directory: str | Path, keep: int = 3) -> None:
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._meta_path = self.dir / "state.json"
        self.meta = (json.loads(self._meta_path.read_text())
                     if self._meta_path.exists()
                     else {"steps": {}, "best_step": None, "last_step": None})

    def save(self, step: int, tree: Any, fitness: float | None = None) -> Path:
        path = self.dir / f"step_{step}.msgpack"
        save_msgpack(tree, path)
        self.meta["steps"][str(step)] = fitness
        self.meta["last_step"] = step
        if fitness is not None:
            best = self.meta.get("best_step")
            best_fit = (self.meta["steps"].get(str(best))
                        if best is not None else None)
            if best_fit is None or fitness > best_fit:
                self.meta["best_step"] = step
        self._gc()
        self._meta_path.write_text(json.dumps(self.meta, indent=2))
        return path

    def _gc(self) -> None:
        steps = sorted(int(s) for s in self.meta["steps"])
        protected = {self.meta.get("best_step"), self.meta.get("last_step")}
        removable = [s for s in steps if s not in protected]
        for s in removable[:max(0, len(removable) - self.keep)]:
            (self.dir / f"step_{s}.msgpack").unlink(missing_ok=True)
            del self.meta["steps"][str(s)]

    def _load(self, step: int | None, template: Any) -> Any:
        if step is None:
            raise FileNotFoundError(f"no checkpoint recorded in {self.dir}")
        return load_msgpack(self.dir / f"step_{step}.msgpack", template)

    def load_last(self, template: Any) -> Any:
        return self._load(self.meta.get("last_step"), template)

    def load_best(self, template: Any) -> Any:
        return self._load(self.meta.get("best_step")
                          or self.meta.get("last_step"), template)
