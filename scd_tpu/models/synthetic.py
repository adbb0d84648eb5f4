"""Synthetic joint image-text encoder for asset-free end-to-end runs.

No model weights or datasets ship in this environment (the reference's
``extracted_features/``, ``zeroshot_weights/`` and checkpoints are
download-by-reference), so the pipelines need a stand-in encoder pair whose
image and text embeddings live in one space: ``encode_image`` projects a
color-statistics signature through a fixed random MLP; ``encode_text``
embeds a known class name as the projection of that class's canonical color
(a perfect "caption"), and any other string as a deterministic hash vector.
This gives the full SCD pipeline (clustering -> vocabulary voting -> sACC)
real signal on the synthetic dataset, exercising exactly the code paths the
real CLIP encoders feed.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SyntheticCLIP:
    def __init__(self, class_colors: Dict[str, np.ndarray], dim: int = 64,
                 seed: int = 7):
        self.dim = dim
        rng = np.random.default_rng(seed)
        # fixed 2-layer random projection of a 9-d color signature
        self.w1 = rng.standard_normal((9, 128)).astype(np.float32) / 3.0
        self.w2 = rng.standard_normal((128, dim)).astype(np.float32) / 11.0
        self.class_colors = {k: np.asarray(v, np.float32)
                             for k, v in class_colors.items()}
        self._names = sorted(self.class_colors, key=len, reverse=True)
        # weights enter as jit ARGUMENTS (repo-wide invariant: closures
        # bake weights into the HLO as constants)
        self._jit_encode = jax.jit(self._encode_with)

    # ------------------------------------------------------------- image side

    def _signature(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] -> [B,9]: channel means, stds, and mean square."""
        mean = jnp.mean(images, axis=(1, 2))
        std = jnp.std(images, axis=(1, 2))
        sq = jnp.mean(images ** 2, axis=(1, 2))
        return jnp.concatenate([mean, std, sq], axis=-1)

    def _encode_with(self, w1: jnp.ndarray, w2: jnp.ndarray,
                     images: jnp.ndarray) -> jnp.ndarray:
        sig = self._signature(images.astype(jnp.float32))
        h = jnp.tanh(sig @ w1)
        out = h @ w2
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._jit_encode(self.w1, self.w2,
                                           jnp.asarray(images)))

    # -------------------------------------------------------------- text side

    def _color_embed(self, color: np.ndarray) -> np.ndarray:
        patch = np.broadcast_to(color.reshape(1, 1, 1, 3), (1, 4, 4, 3))
        return self.encode_image(np.ascontiguousarray(patch))[0]

    def _hash_embed(self, text: str) -> np.ndarray:
        h = int(hashlib.md5(text.encode()).hexdigest(), 16) % (2 ** 32)
        v = np.random.default_rng(h).standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            tl = t.lower()
            hit = next((n for n in self._names
                        if re.search(rf"\b{re.escape(n)}\b", tl)), None)
            if hit is not None:
                out[i] = self._color_embed(self.class_colors[hit])
            else:
                out[i] = self._hash_embed(tl)
        return out


def synthetic_name_similarity(name_a: str, name_b: str) -> float:
    """Stand-in for the WordNet lch similarity on synthetic vocabularies
    (``main_unsup.py:170-188``): exact match scores the lch self-similarity
    ceiling, anything else a small floor — mirroring lch's bounded-below,
    maximal-at-identity shape so Soft-sACC printouts are meaningful and
    testable without WordNet."""
    return 3.6375861597263857 if name_a == name_b else 0.5


def synthetic_vocabulary(class_names: List[str], n_distractors: int = 40,
                         seed: int = 3) -> List[str]:
    """Class names mixed into a larger noun list (stable order)."""
    rng = np.random.default_rng(seed)
    distractors = [f"noun_{i}" for i in range(n_distractors)]
    vocab = sorted(set(class_names) | set(distractors))
    rng.shuffle(vocab)
    return vocab
