"""Winner-take-all (WTA) hashing of embedding vectors.

Reference ``local_utils/wta.py`` (the only TensorFlow code in the repo — an
orphan experiment): sample ``hash_code_dim`` random windows of
``hash_win_len`` feature indices and keep the argmax position within each
window, turning a dense embedding into an ordinal hash code that is robust
to monotone feature rescaling.

JAX rewrite: the per-row ``tf.map_fn(tf.random.shuffle)`` becomes a vmapped
``jax.random.permutation``; gather + argmax run fused on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("embed_dim", "hash_code_dim",
                                   "hash_win_len"))
def structured_hash_idx(key: jax.Array, embed_dim: int, hash_code_dim: int,
                        hash_win_len: int) -> jnp.ndarray:
    """[hash_code_dim, hash_win_len] index matrix: each row is the first
    ``hash_win_len`` entries of an independent permutation of
    ``range(embed_dim)`` (reference ``get_structured_hash_idx``,
    ``wta.py:8-12``)."""
    keys = jax.random.split(key, hash_code_dim)
    perm = jax.vmap(lambda k: jax.random.permutation(k, embed_dim))(keys)
    return perm[:, :hash_win_len]


@jax.jit
def wta_hash(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, D] features, [C, W] window indices -> [B, C] int codes: argmax
    position within each window (reference ``hash_transform``,
    ``wta.py:14-24``)."""
    windows = features[:, idx]  # [B, C, W]
    return jnp.argmax(windows, axis=-1)


def hash_transform(key: jax.Array, features: jnp.ndarray,
                   hash_code_dim: int, hash_win_len: int) -> jnp.ndarray:
    """One-call variant matching the reference API."""
    if features.ndim != 2:
        raise ValueError("expected [batch, embed_dim] features")
    idx = structured_hash_idx(key, features.shape[1], hash_code_dim,
                              hash_win_len)
    return wta_hash(features, idx)
