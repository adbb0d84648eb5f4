"""Stage-artifact cache.

Reproduces the reference's ``.pt`` cache protocol (``main_unsup.py:294-311``,
``366-374``: every stage persists its outputs and can be re-entered from
cache) with deterministic keys: artifacts are ``.npz`` files named by a
config hash, with a JSON sidecar describing provenance.  This doubles as the
failure-recovery story (SURVEY.md §5): any stage can be replayed from the last
cached artifact.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class ArtifactCache:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str, key: str):
        base = os.path.join(self.root, f"{stage}_{key}")
        return base + ".npz", base + ".json"

    def has(self, stage: str, key: str) -> bool:
        npz, _ = self._paths(stage, key)
        return os.path.exists(npz)

    def save(self, stage: str, key: str, arrays: Dict[str, np.ndarray],
             meta: Optional[dict] = None) -> str:
        npz, js = self._paths(stage, key)
        # unique tmp per writer: two processes saving the same stage/key
        # (parallel sweep workers) must not interleave into one tmp file
        tmp = f"{npz}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, npz)  # atomic publish so a crash never leaves a torn cache
        with open(js, "w") as f:
            json.dump({"stage": stage, "key": key, "time": time.time(),
                       "meta": meta or {},
                       "arrays": {k: list(np.asarray(v).shape) for k, v in arrays.items()}},
                      f, indent=2, default=str)
        return npz

    def load(self, stage: str, key: str) -> Dict[str, np.ndarray]:
        npz, _ = self._paths(stage, key)
        with np.load(npz, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def load_or_compute(self, stage: str, key: str, fn, meta: Optional[dict] = None,
                        refresh: bool = False) -> Dict[str, np.ndarray]:
        if not refresh and self.has(stage, key):
            return self.load(stage, key)
        arrays = fn()
        self.save(stage, key, arrays, meta=meta)
        return arrays
