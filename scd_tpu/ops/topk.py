"""Fused vocabulary classification: logits -> softmax -> top-k.

Replaces the reference's host-managed 1024-row chunking over the N×V
similarity matrix (``main_unsup.py:504-531``) with a single jitted
matmul+softmax+top_k.  For multi-chip runs the vocabulary axis V is sharded
over the ``model`` mesh axis with ``shard_map``: each shard computes its
local top-k, softmax normalization is exact via a global ``psum`` of the
logit max/denominator, and the per-shard candidates are merged with one
small all-gather — the full N×V matrix never exists in one chip's HBM.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def classify_topk(feats: jnp.ndarray, weights: jnp.ndarray, k: int,
                  scale: float = 100.0,
                  apply_softmax: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k names per row. feats [N, D] (L2-normalized), weights [D, V].

    Returns (values [N, k] f32, indices [N, k] i32).  ``apply_softmax``
    mirrors the reference's ``F.softmax(100 * feats @ W)`` before top-k
    (softmax is monotonic, so indices are unaffected; the values feed the
    logit-weighted vote variant).

    On TPU with a large vocabulary this dispatches to the fused Pallas
    kernel (``scd_tpu.ops.pallas_kernels.topk_softmax_pallas``): exact
    semantics, ~10% faster than the XLA path at matched (full f32)
    precision, and the [N, V] logits matrix never exists in HBM — at
    dataset scale (N=128k, V=68k -> 35 GB f32) that is the difference
    between feasible and not.
    """
    v = weights.shape[1]
    if (jax.default_backend() == "tpu" and v >= 8192
            and feats.shape[0] >= 256 and k <= 16):
        from scd_tpu.ops.pallas_kernels import (
            topk_block_v,
            topk_softmax_pallas,
        )

        block_v = topk_block_v(feats.shape[1], block_n=256)
        if block_v is not None:
            return topk_softmax_pallas(feats, weights, k, scale=scale,
                                       block_n=256, block_v=block_v,
                                       apply_softmax=apply_softmax)
    return _classify_topk_xla(feats, weights, k, scale, apply_softmax)


@partial(jax.jit, static_argnames=("k", "apply_softmax"))
def _classify_topk_xla(feats: jnp.ndarray, weights: jnp.ndarray, k: int,
                       scale: float = 100.0, apply_softmax: bool = True
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # Precision.HIGH: the bf16-pass default perturbs logits by ~1e-3
    # relative, enough to flip near-tie name rankings
    logits = scale * jax.lax.dot_general(
        feats.astype(jnp.float32), weights.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    # rank on raw logits (softmax is monotonic — identical order), then
    # normalize only the selected values: softmax-then-top_k underflows to
    # exact zeros for saturated rows and degrades top-k to index-order ties
    vals, idx = jax.lax.top_k(logits, k)
    if apply_softmax:
        m = jnp.max(logits, axis=-1, keepdims=True)
        denom = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
        vals = jnp.exp(vals - m) / denom
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "scale", "apply_softmax",
                                   "model_axis"))
def _sharded_topk_body(f, w_local, k, scale, apply_softmax, model_axis):
    logits = scale * jax.lax.dot_general(
        f.astype(jnp.float32), w_local.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)  # [N, V/s]
    lv, li = jax.lax.top_k(logits, k)  # local candidates (raw logits)
    shard_id = jax.lax.axis_index(model_axis)
    li_global = li + shard_id * w_local.shape[1]
    # merge on RAW logits: softmaxed values saturate to exact zeros for
    # dominated candidates, which would degrade the cross-shard merge to
    # arbitrary tie-breaking; normalize only the merged winners
    all_v = jax.lax.all_gather(lv, model_axis, axis=1, tiled=True)  # [N, k*s]
    all_i = jax.lax.all_gather(li_global, model_axis, axis=1, tiled=True)
    mv, mpos = jax.lax.top_k(all_v, k)
    mi = jnp.take_along_axis(all_i, mpos, axis=1)
    if apply_softmax:
        gmax = jax.lax.pmax(jnp.max(logits, axis=1), model_axis)  # [N]
        denom = jax.lax.psum(
            jnp.sum(jnp.exp(logits - gmax[:, None]), axis=1),
            model_axis)  # [N]
        mv = jnp.exp(mv - gmax[:, None]) / denom[:, None]
    return mv, mi.astype(jnp.int32)


@lru_cache(maxsize=32)
def _sharded_topk_fn(mesh: Mesh, k: int, scale: float, apply_softmax: bool,
                     model_axis: str):
    """Cached shard_map+jit construction — rebuilding it per call would
    retrace and recompile the full multi-chip program every time."""
    try:
        from jax import shard_map  # jax >= 0.8
        _check_off = {"check_vma": False}
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map
        _check_off = {"check_rep": False}

    def shard_fn(f, w_local):
        return _sharded_topk_body.__wrapped__(f, w_local, k, scale,
                                              apply_softmax, model_axis)

    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, model_axis)),
        out_specs=(P(), P()),
        **_check_off,
    ))


def classify_topk_sharded(feats, weights, k: int, mesh: Mesh,
                          scale: float = 100.0, apply_softmax: bool = True,
                          model_axis: str = "model"):
    """Vocabulary-sharded top-k: weights [D, V] split over ``model_axis``.

    Per-shard top-k candidates are globally merged; softmax uses the exact
    global normalizer (max-subtracted logsumexp psum'd across shards).

    Multi-controller: host inputs must be the identical full value on
    every process (each host materializes its own devices' shards);
    already-global arrays pass through.
    """
    n_shards = mesh.shape[model_axis]
    v = weights.shape[1]
    assert v % n_shards == 0, f"V={v} not divisible by {n_shards} shards"

    from scd_tpu.core.multihost import is_multiprocess, put_global

    def _place(x, spec):
        sh = NamedSharding(mesh, spec)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # global already; jit reshards to the spec if needed
        if is_multiprocess():
            return put_global(x, sh)
        return jax.device_put(x, sh)

    fn = _sharded_topk_fn(mesh, k, float(scale), bool(apply_softmax),
                          model_axis)
    return fn(_place(feats, P()), _place(weights, P(None, model_axis)))
