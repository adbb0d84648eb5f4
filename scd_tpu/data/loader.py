"""Batch iteration: dataset -> numpy NHWC batches with threaded decode.

Replaces the reference's torch DataLoader (``main_unsup.py:284-289``): a
thread pool decodes/transforms PIL images while the accelerator consumes the
previous batch; batches are contiguous float32 NHWC arrays ready for
``device_put``.  Order is deterministic (sequential, like the reference's
``shuffle=False`` extraction loaders) unless a shuffle seed is given.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


def iterate_batches(dataset, batch_size: int, num_workers: int = 8,
                    shuffle_seed: Optional[int] = None,
                    drop_last: bool = False) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield (images [B,H,W,C] f32, labels [B] i64, uq_idxs [B] i64,
    mask_lab [B] bool) batches from a MergedDataset-contract dataset.

    3-tuple datasets (no labelled mask) yield mask_lab = zeros.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(order)

    def fetch(i: int):
        item = dataset[int(i)]
        if len(item) == 4:
            img, label, uq, lab = item
            return img, label, uq, int(np.asarray(lab).reshape(-1)[0])
        img, label, uq = item
        return img, label, uq, 0

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            if drop_last and len(idxs) < batch_size:
                break
            items = list(pool.map(fetch, idxs))
            first = np.asarray(items[0][0])
            # preserve uint8 batches: the device-normalize path ships 4x
            # fewer bytes over the (slow) host->device link and applies
            # mean/std on device
            batch_dtype = np.uint8 if first.dtype == np.uint8 else np.float32
            images = np.stack([np.asarray(it[0], batch_dtype)
                               for it in items])
            labels = np.array([it[1] for it in items], np.int64)
            uqs = np.array([it[2] for it in items], np.int64)
            mask = np.array([it[3] for it in items], bool)
            yield images, labels, uqs, mask
