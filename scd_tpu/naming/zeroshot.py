"""Prompt-ensembled zero-shot vocabulary embedding.

Reference: ``zeroshot_classifier`` (``clip_lang_util.py:96-108``) loops one
class name at a time — 80 templates tokenized, text-encoded, normalized,
averaged, renormalized — for ~68k names.  Here names are processed in large
batches: one [B*80, L] token batch per step feeds the text encoder, and the
normalize→mean-over-templates→renormalize reduction is a single jitted op on
[B, 80, D].  With the names axis sharded over the mesh the whole-vocabulary
embedding becomes embarrassingly parallel.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_TEMPLATE_COUNT = 80


@jax.jit
def _ensemble_reduce(emb: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D] raw text embeddings -> [B, D] prompt-ensembled weights."""
    emb = emb.astype(jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    mean = jnp.mean(emb, axis=1)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)


def build_zeroshot_weights(encode_text_fn: Callable[[List[str]], np.ndarray],
                           classnames: Sequence[str],
                           templates: Sequence[str],
                           names_per_batch: int = 64) -> np.ndarray:
    """Build the [D, V] zero-shot weight matrix (column per name).

    ``encode_text_fn`` maps a list of prompt strings to raw (unnormalized)
    embeddings [len(texts), D] — typically the JAX CLIP text encoder; any
    callable works (tests use a deterministic hash embedding).
    """
    t = len(templates)
    cols = []
    for start in range(0, len(classnames), names_per_batch):
        batch = classnames[start:start + names_per_batch]
        texts = [tmpl.format(name) for name in batch for tmpl in templates]
        emb = np.asarray(encode_text_fn(texts))  # [B*T, D]
        emb = emb.reshape(len(batch), t, -1)
        cols.append(np.asarray(_ensemble_reduce(jnp.asarray(emb))))
    weights = np.concatenate(cols, axis=0)  # [V, D]
    return weights.T.astype(np.float32)  # [D, V] — reference layout
