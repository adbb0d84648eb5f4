"""Checkpoint / resume for training loops.

Reference behavior (``gcd/methods/metric_learn/learn_metric.py:320-338``):
save ``model.pt`` (+ projection head) every epoch, and ``model_best.pt``
whenever old-class test ACC improves.  The reference never checkpoints
optimizer state or step counters (SURVEY.md §5) — we do, so training is
actually resumable.

Format: one msgpack blob per step via ``flax.serialization`` (pytree of
jax/numpy arrays — params, opt_state, anything), plus a JSON sidecar with
step/metrics and a ``manifest.json`` index tracking latest/best.  Restore
requires a ``target`` pytree of the right structure (standard flax
contract), which training code always has (its freshly-initialized state).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """Per-step checkpoints with retention and best-metric tracking."""

    def __init__(self, directory: str, keep: int = 3,
                 best_metric: Optional[str] = None, mode: str = "max"):
        assert mode in ("max", "min")
        self.directory = directory
        self.keep = keep
        self.best_metric = best_metric
        self.mode = mode
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)
        else:
            self._manifest = {"steps": [], "best_step": None,
                              "best_value": None}

    # ------------------------------------------------------------ paths
    def _blob(self, step) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.msgpack")

    def _meta(self, step) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.json")

    # ------------------------------------------------------------- save
    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> str:
        """Write checkpoint ``step``; update best; prune old non-best."""
        path = self._blob(step)
        with open(path + ".tmp", "wb") as f:
            f.write(serialization.to_bytes(_to_host(state)))
        os.replace(path + ".tmp", path)  # atomic: no torn ckpt on crash
        with open(self._meta(step), "w") as f:
            json.dump({"step": step, "metrics": metrics or {}}, f)

        if step not in self._manifest["steps"]:
            self._manifest["steps"].append(step)
        if (self.best_metric and metrics
                and self.best_metric in metrics):
            v = float(metrics[self.best_metric])
            best = self._manifest["best_value"]
            improved = (best is None
                        or (v > best if self.mode == "max" else v < best))
            if improved:
                self._manifest["best_step"] = step
                self._manifest["best_value"] = v
                shutil.copyfile(path, os.path.join(self.directory,
                                                   "ckpt_best.msgpack"))
                with open(os.path.join(self.directory, "ckpt_best.json"),
                          "w") as f:
                    json.dump({"step": step, "metrics": metrics}, f)
        self._prune()
        with open(self._manifest_path, "w") as f:
            json.dump(self._manifest, f)
        return path

    def _prune(self):
        steps = sorted(self._manifest["steps"])
        excess = steps[:-self.keep] if self.keep else []
        for s in excess:
            for p in (self._blob(s), self._meta(s)):
                if os.path.exists(p):
                    os.remove(p)
            self._manifest["steps"].remove(s)

    # ---------------------------------------------------------- restore
    def latest_step(self) -> Optional[int]:
        return max(self._manifest["steps"]) if self._manifest["steps"] else None

    def restore(self, target: Any, step: Optional[int] = None
                ) -> Tuple[int, Any]:
        """Restore into the structure of ``target``; default latest step."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        with open(self._blob(step), "rb") as f:
            state = serialization.from_bytes(target, f.read())
        return step, state

    def restore_best(self, target: Any) -> Tuple[int, Any]:
        path = os.path.join(self.directory, "ckpt_best.msgpack")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no best checkpoint in {self.directory}")
        with open(path, "rb") as f:
            state = serialization.from_bytes(target, f.read())
        return int(self._manifest["best_step"]), state


def strip_key_prefix(state_dict: Dict[str, Any],
                     prefix: str = "module.") -> Dict[str, Any]:
    """Drop a key prefix from a flat state dict (reference
    ``strip_state_dict``, ``general_utils.py:47-58`` — used when loading
    DataParallel-saved torch checkpoints)."""
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in state_dict.items()}
