"""Pallas TPU kernels for the two hot loops.

1. ``estep_assign_pallas`` — fused pairwise-distance -> (argmin, min) for
   the k-means E-step (reference hot loop: ``pairwise_distance`` +
   ``torch.min``, ``sskm_constrained.py:115`` / SURVEY §7.3).  The N×K
   distance matrix never leaves VMEM: each (row-tile, center-tile) grid
   step computes its distance block on the MXU and folds it into a running
   per-row (min, argmin) carried in the output refs.

2. ``topk_softmax_pallas`` — fused logits -> online softmax -> top-k over
   the N×V image↔vocabulary similarity (reference hot loop #3:
   1024-row host chunking over ~68k logits, ``main_unsup.py:504-531``).
   Streams V in tiles, maintaining flash-softmax style running (max,
   sum-exp) plus a running top-k per row — the [N, V] logits matrix
   (2.2 GB at N=8k, V=68k f32) is never materialized in HBM.

Both kernels run in interpreter mode off-TPU so the CPU test mesh
validates them against the XLA reference paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_rows(x: jnp.ndarray, multiple: int, value: float = 0.0):
    n = x.shape[0]
    target = _cdiv(n, multiple) * multiple
    if target == n:
        return x
    return jnp.pad(x, [(0, target - n)] + [(0, 0)] * (x.ndim - 1),
                   constant_values=value)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ----------------------------------------------------------- fused E-step

def _estep_kernel(x_ref, ct_ref, csq_ref, min_ref, lab_ref, *,
                  block_k: int):
    j = pl.program_id(1)
    xb = x_ref[:].astype(jnp.float32)  # [BN, D]
    ctb = ct_ref[:].astype(jnp.float32)  # [D, BK] (pre-transposed: straight
    # MXU matmul, no in-kernel transpose / register pressure)
    cross = jax.lax.dot_general(
        xb, ctb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [BN, BK]
    # partial distance: |c|^2 - 2 x.c  (the per-row |x|^2 is added by the
    # wrapper — it does not affect the argmin)
    d = csq_ref[:] - 2.0 * cross

    local_min = jnp.min(d, axis=1, keepdims=True)  # [BN, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * block_k
    big = jnp.int32(2_147_483_647)
    local_arg = jnp.min(jnp.where(d <= local_min, col, big), axis=1,
                        keepdims=True)  # first index attaining the min

    @pl.when(j == 0)
    def _():
        min_ref[:] = local_min
        lab_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < min_ref[:]
        min_ref[:] = jnp.where(better, local_min, min_ref[:])
        lab_ref[:] = jnp.where(better, local_arg, lab_ref[:])


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def estep_assign_pallas(x: jnp.ndarray, c: jnp.ndarray, block_n: int = 256,
                        block_k: int = 256, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused nearest-centroid assignment.  x [N, D], c [K, D] ->
    (labels [N] i32, min squared distance [N] f32)."""
    n, d_dim = x.shape
    k = c.shape[0]
    x32 = _pad_rows(x.astype(jnp.float32), block_n)
    # pad centers with a huge squared norm so padded rows never win the min
    c32 = _pad_rows(c.astype(jnp.float32), block_k, value=0.0)
    csq = jnp.sum(c32 * c32, axis=1)[None, :]  # [1, K_pad]
    if c32.shape[0] != k:
        col = jnp.arange(c32.shape[0])[None, :]
        csq = jnp.where(col < k, csq, 1e30)
    ct = c32.T  # [D, K_pad]
    n_pad, k_pad = x32.shape[0], c32.shape[0]
    grid = (n_pad // block_n, k_pad // block_k)

    min_part, labels = pl.pallas_call(
        functools.partial(_estep_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, block_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x32, ct, csq)

    x_sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=1)
    mindist = jnp.maximum(min_part[:n, 0] + x_sq, 0.0)
    return labels[:n, 0], mindist


# ------------------------------------------------- fused softmax + top-k

def _topk_local(logits: jnp.ndarray, base: jnp.ndarray, k: int):
    """k-pass max extraction: returns (vals [BN, k], idx [BN, k])."""
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base
    vals, idxs = [], []
    work = logits
    for _ in range(k):
        m = jnp.max(work, axis=1, keepdims=True)  # [BN, 1]
        hit = work >= m
        arg = jnp.min(jnp.where(hit, col, jnp.int32(2_147_483_647)), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(arg)
        work = jnp.where(col == arg, -jnp.inf, work)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _topk_softmax_kernel(f_ref, w_ref, m_ref, s_ref, v_ref, i_ref, *,
                         block_v: int, k: int, v_total: int, scale: float):
    j = pl.program_id(1)
    # keep native input dtypes for the matmul (bf16 weights run the MXU at
    # 2x and halve the streaming HBM traffic); accumulate in f32
    # HIGHEST: mosaic supports only DEFAULT/HIGHEST; the bf16-pass default
    # perturbs logits enough to flip near-tie name rankings
    logits = scale * jax.lax.dot_general(
        f_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [BN, BV]
    base = j * block_v
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base
    logits = jnp.where(col < v_total, logits, -jnp.inf)  # mask V padding

    local_max = jnp.max(logits, axis=1, keepdims=True)  # [BN, 1]
    lv, li = _topk_local(logits, base, k)

    @pl.when(j == 0)
    def _():
        m_ref[:] = local_max
        s_ref[:] = jnp.sum(jnp.exp(logits - local_max), axis=1,
                           keepdims=True)
        v_ref[:] = lv
        i_ref[:] = li

    @pl.when(j > 0)
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, local_max)
        s_ref[:] = (s_ref[:] * jnp.exp(m_old - m_new)
                    + jnp.sum(jnp.exp(logits - m_new), axis=1,
                              keepdims=True))
        m_ref[:] = m_new
        # merge running and local top-k: 2k candidates -> k
        cand_v = jnp.concatenate([v_ref[:], lv], axis=1)  # [BN, 2k]
        cand_i = jnp.concatenate([i_ref[:], li], axis=1)
        for slot in range(k):
            m = jnp.max(cand_v, axis=1, keepdims=True)
            hit = cand_v >= m
            # lowest vocab index among ties (stable first-hit semantics)
            arg_i = jnp.min(jnp.where(hit, cand_i,
                                      jnp.int32(2_147_483_647)),
                            axis=1, keepdims=True)
            v_ref[:, slot:slot + 1] = m
            i_ref[:, slot:slot + 1] = arg_i
            cand_v = jnp.where(cand_i == arg_i, -jnp.inf, cand_v)


@functools.partial(jax.jit, static_argnames=("k", "scale", "block_n",
                                             "block_v", "apply_softmax",
                                             "interpret"))
def topk_softmax_pallas(feats: jnp.ndarray, weights: jnp.ndarray, k: int,
                        scale: float = 100.0, block_n: int = 512,
                        block_v: int = 1024, apply_softmax: bool = True,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``softmax(scale * feats @ weights)`` top-k without ever
    materializing [N, V].  feats [N, D], weights [D, V] ->
    (values [N, k] f32, indices [N, k] i32).

    Values are softmax probabilities when ``apply_softmax`` (matching
    ``classify_topk``), else raw logits.

    Block geometry: the kernel holds ~3 [block_n, block_v] f32 buffers
    (logits, iota, masked work copy) plus the input blocks in VMEM; the
    old (1024, 2048) default needed 27 MB against the 16 MB scoped-VMEM
    limit and OOMed Mosaic on real hardware (caught by
    ``tests/test_pallas_on_tpu.py`` — interpret-mode CPU runs cannot see
    it).  (512, 1024) uses ~9 MB and compiles on v5e.  ``topk_block_v``
    picks a block_v from the same budget model for other (D, block_n).
    """
    n, d_dim = feats.shape
    v = weights.shape[1]
    if v < k:
        # the per-tile knockout would re-extract column 0 with fabricated
        # values once real columns run out — fail loudly instead (the XLA
        # path handles tiny vocabularies; classify_topk routes there)
        raise ValueError(f"topk_softmax_pallas requires V >= k (V={v}, "
                         f"k={k}); use the XLA path for tiny vocabularies")
    f32 = _pad_rows(feats, block_n)
    w32 = weights
    v_pad = _cdiv(v, block_v) * block_v
    if v_pad != v:
        w32 = jnp.pad(w32, [(0, 0), (0, v_pad - v)])
    n_pad = f32.shape[0]
    grid = (n_pad // block_n, v_pad // block_v)

    m, s, vals, idx = pl.pallas_call(
        functools.partial(_topk_softmax_kernel, block_v=block_v, k=k,
                          v_total=v, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, block_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(f32, w32)

    vals, idx = vals[:n], idx[:n]
    if apply_softmax:
        vals = jnp.exp(vals - m[:n]) / s[:n]
    return vals, idx


# ------------------------------------------- fused short-sequence attention

def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, l_valid: int,
                     scale: float, causal: bool):
    """One program = ``G`` (batch*head) slices; the full [Lp, Lp] score
    matrix lives only in VMEM/registers.  ViT sequences are short (197
    image / 77 text tokens) so no online-softmax streaming is needed —
    the win over XLA is purely not round-tripping the [B, H, L, L] score
    tensor through HBM (4 passes/layer at B=256 is ~1.9 GB)."""
    g = q_ref.shape[0]
    col = None
    for h in range(g):
        q = q_ref[h]  # [Lp, d]
        s = jax.lax.dot_general(
            q, k_ref[h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Lp, Lp] f32
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            keep = col < l_valid
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                keep = jnp.logical_and(keep, col <= row)
        s = jnp.where(keep, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Lp, d]
        o_ref[h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "group",
                                             "interpret"))
def vit_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float, causal: bool = False, group: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused softmax attention for short fixed sequences.

    q/k/v: [B, L, H, d] -> out [B, L, H, d] (same dtype as v).  Scores are
    computed in f32 and never leave the chip.  ``causal`` applies the CLIP
    text-encoder triangular mask (``clip.py`` builds an explicit tril for
    the XLA path).
    """
    b, l, h, d = q.shape
    lp = _cdiv(l, 128) * 128

    def to_rows(t):
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, l, d)
        return jnp.pad(t, ((0, 0), (0, lp - l), (0, 0)))

    qr, kr, vr = to_rows(q), to_rows(k), to_rows(v)
    bh = b * h
    g = min(group, bh)
    bh_pad = _cdiv(bh, g) * g
    if bh_pad != bh:
        qr = jnp.pad(qr, ((0, bh_pad - bh), (0, 0), (0, 0)))
        kr = jnp.pad(kr, ((0, bh_pad - bh), (0, 0), (0, 0)))
        vr = jnp.pad(vr, ((0, bh_pad - bh), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_vit_attn_kernel, l_valid=l, scale=scale,
                          causal=causal),
        grid=(bh_pad // g,),
        in_specs=[
            pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_pad, lp, d), v.dtype),
        interpret=interpret,
    )(qr, kr, vr)

    out = out[:bh, :l].reshape(b, h, l, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def _qkv_attn_kernel(qkv_ref, o_ref, *, heads: int, head_dim: int,
                     l_valid: int, scale: float, causal: bool):
    """Heads are static lane-dim slices of the fused qkv projection — the
    layout the Dense layer already produces — so the wrapper needs NO
    transposes (the [B,L,H,d] repack in the first kernel version cost more
    than the fused softmax saved)."""
    width = heads * head_dim
    keep = None
    for h in range(heads):
        q = qkv_ref[0][:, h * head_dim:(h + 1) * head_dim]
        k = qkv_ref[0][:, width + h * head_dim:width + (h + 1) * head_dim]
        v = qkv_ref[0][:, 2 * width + h * head_dim:
                       2 * width + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Lp, Lp] f32
        if keep is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            keep = col < l_valid
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                keep = jnp.logical_and(keep, col <= row)
        s = jnp.where(keep, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Lp, d]
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "causal",
                                             "interpret"))
def qkv_attention_pallas(qkv: jnp.ndarray, heads: int, scale: float,
                         causal: bool = False,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused multi-head softmax attention on the packed qkv projection.

    qkv: [B, L, 3*width] (q | k | v concatenated on the feature axis, the
    native output of the fused qkv Dense) -> out [B, L, width].  One grid
    step per batch row; scores live only in VMEM.
    """
    b, l, w3 = qkv.shape
    width = w3 // 3
    head_dim = width // heads
    lp = _cdiv(l, 128) * 128
    if lp != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, lp - l), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_qkv_attn_kernel, heads=heads, head_dim=head_dim,
                          l_valid=l, scale=scale, causal=causal),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, lp, w3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, lp, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, width), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out[:, :l]


# ------------------------------------------------- fused E+M k-means step

_EM_VMEM_BUDGET = 14_500_000  # bytes; see fused_em_block_n


def fused_em_block_n(d: int, k: int):
    """Largest safe row-block for ``fused_em_step_pallas`` at (D, K).

    The kernel's scoped-VMEM footprint grows with ``block_n*(d + kp)``
    (the x block + its bf16 splits, the [block_n, kp] distance/one-hot
    temporaries) plus a fixed ``kp*d`` term (centers + splits + the sums
    output block).  Budget fitted to the measured v5e OK/OOM boundary —
    OOM'd on hardware: (block_n=1024, kp=768) at 16.63 of 16 MB scoped
    VMEM, (512, 1536), (2048, 128) at 22.8 MB; OK: (1024, 128),
    (512, 768), (256, 1536) — all six respected by
    ``8*block_n*(d+kp) + 8*kp*d <= 14.5 MB``.

    Returns None when even block_n=128 busts the budget (huge K*D — the
    fixed centers term alone): callers fall back to the XLA two-pass
    path, which tiles freely.
    """
    kp = _cdiv(max(k, 1), 128) * 128
    fixed = 8 * kp * d
    for bn in (1024, 512, 256, 128):
        if fixed + 8 * bn * (d + kp) <= _EM_VMEM_BUDGET:
            return bn
    return None


def topk_block_v(d: int, block_n: int = 256):
    """Largest safe vocabulary block for ``topk_softmax_pallas`` at
    (D, block_n), from the kernel's documented VMEM model: ~3
    [block_n, block_v] f32 working buffers + the [d, block_v] weight
    block + the [block_n, d] feats block, under the same 14.5 MB budget
    the EM kernel's measured boundary fitted (both kernels scope the
    whole footprint in VMEM).  (256, 2048) at D=512 -> 8.9 MB, matching
    the shipped geometry; D=1024 drops to block_v=1024.  Returns None if
    even block_v=512 busts the budget — callers use the XLA path."""
    fixed = 4 * block_n * d
    for bv in (2048, 1024, 512):
        if fixed + 4 * bv * (3 * block_n + d) <= _EM_VMEM_BUDGET:
            return bv
    return None


def _fused_em_kernel(x_ref, ct_ref, csq_ref, mask_ref,
                     lab_ref, sums_ref, stats_ref, *, estep_passes: int = 3):
    """One row-block of a full k-means EM iteration: nearest-centroid
    assignment AND the one-hot M-step partial sums in a single pass over
    the block — ``x`` streams from HBM once per iteration instead of twice
    (the separate estep_assign + segment_sums matmuls each read it).

    Partial-outputs design: every grid step writes its own [Kp, D] sums
    slab (reduced by the wrapper) instead of accumulating in place, so the
    kernel needs no ``pl.program_id`` and stays safe under ``jax.vmap``
    (the restart axis) — program_id would silently re-bind to the batch
    dimension there.
    """
    m = mask_ref[:]  # [BN, 1] f32 (0 for wrapper row padding)

    # Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST's 6-pass
    # f32 emulation would make the kernel compute-bound.  Hand-rolled
    # bf16x3 (the decomposition Precision.HIGH uses): hi/lo bf16 split,
    # three single-pass MXU dots, f32 accumulation — f32-class accuracy at
    # 3 passes.
    def _split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    if x_ref.dtype == jnp.bfloat16:
        # bf16-storage mode: x was rounded ONCE in HBM (halves the
        # kernel's dominant stream) — its lo split is exactly zero, so the
        # cross term needs 2 passes (x.c_hi + x.c_lo) and the M-step one
        xh, xl = x_ref[:], None
        xb = xh.astype(jnp.float32)  # [BN, D]
    else:
        xb = x_ref[:].astype(jnp.float32)  # [BN, D]
        xh, xl = _split(xb)

    ch, cl = _split(ct_ref[:].astype(jnp.float32))
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # estep_passes=2 drops the (x_lo . c_hi) term: equivalent to rounding x
    # to bf16 for the cross term while keeping centers at ~bf16x2 — a
    # measured-parity option (see fused_em_step_pallas docstring)
    cross = dot(xh, ch) + dot(xh, cl)  # [BN, Kp]
    if xl is not None and estep_passes >= 3:
        cross = cross + dot(xl, ch)
    d = csq_ref[:] - 2.0 * cross  # |x|^2 deferred: constant per row
    lab = jnp.argmin(d, axis=1)  # first-min tie-break, matches jnp.argmin
    # 2-D throughout: mosaic's vector layout cannot lower reductions over
    # 1-D slices of 2-D values ("Offset change")
    xsq = jnp.sum(xb * xb, axis=1, keepdims=True)  # [BN, 1]
    mind = jnp.maximum(jnp.min(d, axis=1, keepdims=True) + xsq, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    oh = jnp.where(col == lab[:, None], 1.0, 0.0) * m  # [BN, Kp]
    # one-hot entries are exact in bf16: hi/lo passes over x suffice
    ohb = oh.astype(jnp.bfloat16)
    msum = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sums = msum(ohb, xh)  # xh is bf16 in both modes
    if xl is not None:
        sums = sums + msum(ohb, xl)
    sums_ref[0] = sums  # [Kp, D]
    # stats slab [8, Kp] (mosaic wants >= (8, 128) minor block dims):
    # row 0 = counts, row 1 col 0 = this block's inertia partial.
    # Built with iota masks — mosaic has no scatter lowering for .at[].set
    kp = oh.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, kp), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (8, kp), 1)
    counts = jnp.sum(oh, axis=0)[None, :]  # [1, Kp]
    ine = jnp.sum(mind * m)  # 2-D elementwise then full reduce
    stats = jnp.where(row == 0, jnp.broadcast_to(counts, (8, kp)), 0.0)
    stats = jnp.where((row == 1) & (colid == 0), ine, stats)
    stats_ref[0] = stats
    lab_ref[:] = lab[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret",
                                             "estep_passes", "x_bf16"))
def fused_em_step_pallas(x: jnp.ndarray, c: jnp.ndarray,
                         row_mask: jnp.ndarray = None,
                         block_n: int = None, interpret: bool = False,
                         estep_passes: int = 3, x_bf16: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """Fused k-means EM iteration.  x [N, D] f32, c [K, D] ->
    (labels [N] i32, sums [K, D], counts [K], inertia scalar).

    Semantics match ``estep_assign`` + ``segment_sums`` + the min-distance
    inertia sum, with K padded to the 128-lane width internally (padded
    centers get squared norm 1e30 and never win the argmin).  ``row_mask``
    [N] (0/1) drops rows from sums/counts/inertia — the caller's padded
    sharding rows; labels for masked rows are still the plain argmin.

    ``estep_passes``: 3 (default) = full bf16x3 cross-term (label parity
    with the XLA oracle down to ~0.02 squared-distance margins on real
    hardware — the dropped x_lo.c_lo term plus hi/lo rounding carry
    std ~2^-18*sqrt(sum x_i^2 c_i^2), and XLA's own f32 matmul on TPU is
    the same bf16 decomposition; exact-f32-class in interpret mode);
    2 drops the (x_lo . c_hi) MXU pass.  Measured on v5e at
    N=65k, D=768, K=100: 2435 iters/s (3-pass) vs 2659 (2-pass, +9%) with
    1.000000 label agreement on class-structured data — the M-step matmul
    and VPU work bound the kernel more than the third cross-term pass, so
    the accurate default stays 3; flip per-call when 9% matters and the
    feature distribution has been parity-checked.

    ``x_bf16``: stream the [N, D] x block from HBM as bf16 — HALVES the
    kernel's dominant HBM read (x dwarfs the [K, D] centers at pipeline
    shapes).  x is rounded once on upload; the in-kernel hi/lo split
    becomes the identity, so the cross term runs 2 MXU passes and the
    M-step one.  Labels match f32 wherever the distance margin exceeds
    bf16 resolution (~0.4% relative); sums/inertia carry the rounding
    (~1e-3 relative on unit-scale data — see the near-tie parity tests).
    Measured on the real chip (round 4, N=65536, D=768, K=100->128):
    3931 iters/s vs 2365 for the 3-pass f32-stream default — +66%, ~51%
    MFU on useful FLOPs (2NKD E + 2NKD M) — confirming the kernel is
    HBM-bound on the x stream.  Stays off by default because the label
    contract loosens to 0.25 squared-distance margins (bf16 x storage);
    enable per-fit when the feature distribution has been parity-checked
    (the pipelines' CLIP/DINO features pass at 1.000000 agreement).

    ``block_n``: None (default) picks the largest VMEM-safe block via
    ``fused_em_block_n`` — at D=768 that is 1024 up to K=512 (the
    measured v5e sweet spot: 512 -> 2339 iters/s, 1024 -> 2371), 512 at
    Herbarium-scale K<=1024, 256 beyond (the [block_n, D] f32 block, its
    bf16 splits, and the [block_n, Kp] distance temporaries all scale in
    block_n; K=683 at block_n=1024 OOMs scoped VMEM on hardware).
    Raises when no block fits — prefer the XLA path there (callers that
    auto-select via ``ops.em`` already do)."""
    n, d_dim = x.shape
    k = c.shape[0]
    if block_n is None:
        block_n = fused_em_block_n(d_dim, k)
        if block_n is None:
            if interpret:
                block_n = 1024  # no scoped-VMEM ceiling off-hardware
            else:
                raise ValueError(
                    f"fused EM kernel cannot fit D={d_dim}, K={k} in "
                    "scoped VMEM at any block size; use the XLA path "
                    "(ops.em with fused=False)")
    x32 = _pad_rows(x.astype(jnp.bfloat16 if x_bf16 else jnp.float32),
                    block_n)
    npad = x32.shape[0]
    nb = npad // block_n
    c32 = _pad_rows(c.astype(jnp.float32), 128)
    kp = c32.shape[0]
    csq = jnp.sum(c32 * c32, axis=1)[None, :]
    if kp != k:
        colk = jnp.arange(kp)[None, :]
        csq = jnp.where(colk < k, csq, 1e30)
    if row_mask is None:
        mask = (jnp.arange(npad) < n).astype(jnp.float32)[:, None]
    else:
        mask = _pad_rows(row_mask.astype(jnp.float32)[:, None], block_n)
    lab, sums, stats = pl.pallas_call(
        functools.partial(_fused_em_kernel, estep_passes=estep_passes),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_n, d_dim), lambda i: (i, 0)),
            pl.BlockSpec((d_dim, kp), lambda i: (0, 0)),
            pl.BlockSpec((1, kp), lambda i: (0, 0)),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, kp, d_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, kp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, kp, d_dim), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, kp), jnp.float32),
        ],
        interpret=interpret,
    )(x32, c32.T, csq, mask)
    return (lab[:n, 0], sums.sum(axis=0)[:k], stats[:, 0, :].sum(axis=0)[:k],
            stats[:, 1, 0].sum())


# ----------------------------------------------------- W8A8 int8 dense GEMM

def _w8a8_kernel(xq_ref, wq_ref, sx_ref, sw_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _w8a8_kernel3(xq_ref, wq_ref, sx_ref, sw_ref, b_ref, o_ref):
    # rank-3 x block [bb, L, D]: contraction on D, bb/L stay — each of the
    # bb [L, D] @ [D, bf] matmuls runs on the MXU without EVER flattening
    # (B, L) on the host side, which at L=197 (not tile-aligned) costs a
    # full relayout copy of x AND the [N, F] output per dense call —
    # measured 1.73 ms vs 0.44 for the same GEMM fed 2-D (r5, v5e)
    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def w8a8_block_sizes_3d(b: int, l: int, d: int, f: int):
    """(block_b, block_f) for the rank-3 W8A8 kernel, or None when the
    shape cannot tile.  block_b divides B; the VMEM budget mirrors
    :func:`w8a8_block_sizes` with the [bb, L, bf] accumulator dominating."""
    if d % 128 or f % 128:
        return None
    for bb in (8, 4, 2, 1):
        if b % bb:
            continue
        for bf in range(min(f, 1024), 127, -128):
            if f % bf:
                continue
            vmem = (2 * bb * l * d       # int8 x block, double-buffered
                    + 2 * d * bf         # int8 w block, double-buffered
                    + bb * l * bf * 4    # int32 accumulator
                    + 2 * bb * l * bf * 2  # out block, double-buffered
                    + bb * l * 4 + bf * 8)
            # 10 MB, NOT the 16 MB scoped limit: Mosaic's real stack
            # charge ran ~1.4x this estimate on hardware (bb=8 estimated
            # 13.7M, actual 19.70M -> scoped-VMEM OOM; r5 measured)
            if vmem <= 10 * 1024 * 1024:
                return bb, bf
    return None


@functools.partial(jax.jit, static_argnames=("block_b", "block_f",
                                             "out_dtype", "interpret"))
def dense_w8a8_pallas_3d(xq: jnp.ndarray, wq: jnp.ndarray, s_x: jnp.ndarray,
                         s_w: jnp.ndarray, bias: jnp.ndarray,
                         block_b: int = None, block_f: int = None,
                         out_dtype=jnp.bfloat16, interpret: bool = False
                         ) -> jnp.ndarray:
    """Rank-3 variant of :func:`dense_w8a8_pallas`: ``xq [B, L, D] i8 @
    wq [D, F] i8`` -> ``[B, L, F]`` with the dequant epilogue fused, and
    NO host-side (B, L) flatten — see ``_w8a8_kernel3`` for why that
    matters at non-tile-aligned L.  ``s_x`` is [B, L, 1]."""
    b, l, d = xq.shape
    f = wq.shape[1]
    if block_b is None or block_f is None:
        bs = w8a8_block_sizes_3d(b, l, d, f)
        if bs is None:
            raise ValueError(f"dense_w8a8_pallas_3d cannot tile B={b} "
                             f"L={l} D={d} F={f}; use the XLA path")
        block_b, block_f = bs
    return pl.pallas_call(
        _w8a8_kernel3,
        grid=(b // block_b, f // block_f),
        in_specs=[
            pl.BlockSpec((block_b, l, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_b, l, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_f), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, 1, block_f), lambda i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_b, l, block_f), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, l, f), out_dtype),
        interpret=interpret,
    )(xq, wq, s_x.reshape(b, l, 1),
      s_w.reshape(1, 1, f).astype(jnp.float32),
      bias.reshape(1, 1, f).astype(jnp.float32))


def w8a8_block_sizes(n: int, d: int, f: int):
    """(block_n, block_f) for ``dense_w8a8_pallas`` or None when the shape
    cannot tile (d/f must be 128-lane multiples; block_f must divide f).

    block_f is the LARGEST 128-multiple divisor of f up to 1024 — measured
    r5 on v5e at N=25216 (sound loop-variant harness): small column blocks
    gut the kernel (F=2304: 312.7 TOPS at bf=768 vs 220.2 at bf=256;
    F=3072: 262.8 at 1024 vs its divisor ladder), and block_n=512 beats
    256/768/1024 everywhere tested.  Budgeted against scoped VMEM: the
    int32 accumulator block dominates (block_n*block_f*4 plus the out
    block and the double-buffered int8 in blocks)."""
    if d % 128 or f % 128:
        return None
    for bn in (512, 256, 128):
        for bf in range(min(f, 1024), 127, -128):
            if f % bf:
                continue
            vmem = (2 * bn * d          # int8 x block, double-buffered
                    + 2 * d * bf        # int8 w block, double-buffered
                    + bn * bf * 4       # int32 accumulator
                    + bn * bf * 2       # bf16/f32-out block (bf16 typical)
                    + bn * 4 + bf * 8)  # scales + bias rows
            if vmem <= 12 * 1024 * 1024:
                return bn, bf
    return None


@functools.partial(jax.jit, static_argnames=("block_n", "block_f",
                                             "out_dtype", "interpret"))
def dense_w8a8_pallas(xq: jnp.ndarray, wq: jnp.ndarray, s_x: jnp.ndarray,
                      s_w: jnp.ndarray, bias: jnp.ndarray,
                      block_n: int = None, block_f: int = None,
                      out_dtype=jnp.bfloat16, interpret: bool = False
                      ) -> jnp.ndarray:
    """Epilogue-fused W8A8 dense: ``(xq [N, D] i8) @ (wq [D, F] i8)`` on the
    MXU's native int8 path, dequantized (``* s_x [N, 1] * s_w [1, F]``),
    biased and cast to ``out_dtype`` INSIDE the kernel — the int32
    accumulator never round-trips HBM.

    Exists because XLA's own lowering of an int8xint8->int32 dot on this
    backend does NOT reach the MXU int8 path: measured r5 on v5e,
    a bare ``lax.dot_general`` int8 runs at 0.42x the bf16 rate (81 vs
    195 TOPS at ViT fc1 shape) while the SAME dot inside a Mosaic kernel
    runs at >1.4x — the difference between the --int8 knob being a
    measured de-optimization (r4: -14% end-to-end) and a real win.
    Semantics match the XLA reference path in ``models/vit.py::Int8Dense``
    op-for-op (same int32 accumulation, same f32 dequant order), so
    outputs are bit-identical after the same out-cast.
    """
    n, d = xq.shape
    f = wq.shape[1]
    if block_n is None or block_f is None:
        bs = w8a8_block_sizes(n, d, f)
        if bs is None:
            raise ValueError(f"dense_w8a8_pallas cannot tile N={n} D={d} "
                             f"F={f}; use the XLA path")
        block_n, block_f = bs
    xq = _pad_rows(xq, block_n)
    npad = xq.shape[0]
    s_x = _pad_rows(s_x.reshape(n, 1), block_n)
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(npad // block_n, f // block_f),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_n, block_f), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((npad, f), out_dtype),
        interpret=interpret,
    )(xq, wq, s_x, s_w.reshape(1, f).astype(jnp.float32),
      bias.reshape(1, f).astype(jnp.float32))
    return out[:n]


def _w8a8_act(y, act):
    """Epilogue activation at f32 (slightly better than the bf16-dtype
    activation the unquantized Mlp computes — covered by tolerance)."""
    if act == "quick_gelu":
        return y * jax.nn.sigmoid(1.702 * y)
    if act == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    if act == "gelu":
        return jax.nn.gelu(y, approximate=False)
    assert act is None, act
    return y


def _w8a8_fusedq_kernel(x_ref, wq_ref, sw_ref, b_ref, o_ref, *, act=None):
    # Activation quantization IN VMEM: the x block spans the full
    # contraction dim D, so per-row abs-max scales need nothing outside
    # the block.  The kernel reads bf16 activations straight from HBM —
    # the SAME traffic as a bf16 dense — and the MXU still runs the
    # int8 double-rate path; the XLA-side quant chain (abs-max pass +
    # round pass + int8/scale materialization per layer) disappears.
    # The quantize VPU work recomputes once per column block j (x stays
    # VMEM-resident across j — the index map is j-invariant), but at
    # [block_n, D] it is ~microseconds against the MXU dot.
    x = x_ref[...].astype(jnp.float32)
    # divide (not multiply-by-reciprocal): 1/127 is inexact in binary and
    # a 1-ulp scale difference flips round-to-nearest at quantization
    # boundaries vs the XLA reference chain
    s_x = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                      1e-12) / 127.0
    xq = jnp.round(jnp.clip(x / s_x, -127.0, 127.0)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * sw_ref[...] + b_ref[...]
    # fused activation: XLA fuses GELU into its own matmul epilogues, so
    # without this the int8 path pays a separate elementwise HBM pass
    # over the [N, F] output that the bf16 dense never pays (~0.4 ms per
    # ViT-B block at fc1 width — most of the remaining int8-vs-bf16 gap
    # measured r5)
    y = _w8a8_act(y, act)
    o_ref[...] = y.astype(o_ref.dtype)


def w8a8_fusedq_block_sizes(n: int, d: int, f: int, x_bytes: int = 2):
    """(block_n, block_f) for ``dense_w8a8_fusedq_pallas`` or None.  Same
    shape rules as :func:`w8a8_block_sizes`; the x block is bf16 (2 B)
    instead of int8 and an f32 quantized copy lives on the stack."""
    if d % 128 or f % 128:
        return None
    for bn in (512, 256, 128):
        for bf in range(min(f, 1024), 127, -128):
            if f % bf:
                continue
            vmem = (2 * bn * d * x_bytes  # x block, double-buffered
                    + bn * d * 5          # in-kernel f32 cast + int8 copy
                    + 2 * d * bf          # int8 w block, double-buffered
                    + bn * bf * 4         # int32 accumulator
                    + bn * bf * 2         # out block (bf16 typical)
                    + bn * 4 + bf * 8)
            if vmem <= 12 * 1024 * 1024:
                return bn, bf
    return None


@functools.partial(jax.jit, static_argnames=("block_n", "block_f",
                                             "out_dtype", "act",
                                             "interpret"))
def dense_w8a8_fusedq_pallas(x: jnp.ndarray, wq: jnp.ndarray,
                             s_w: jnp.ndarray, bias: jnp.ndarray,
                             block_n: int = None, block_f: int = None,
                             out_dtype=jnp.bfloat16, act: str = None,
                             interpret: bool = False) -> jnp.ndarray:
    """W8A8 dense with the ACTIVATION quantization fused into the kernel:
    ``x [N, D] bf16/f32 @ wq [D, F] i8 -> [N, F]``.

    :func:`dense_w8a8_pallas` still pays an XLA-side quant chain per
    layer (abs-max + round + int8 x / f32 s_x materialized in HBM) —
    measured r5 on v5e it turns per-site GEMM wins into an 18% TOWER
    loss.  Here x streams in at its own dtype and quantizes in VMEM
    (see ``_w8a8_fusedq_kernel``), so the int8 path's HBM traffic
    equals the bf16 dense it replaces.  Weights stay pre-quantized
    outside (loop-invariant, and int8 weights halve weight traffic).

    Semantics: identical to the XLA reference chain in
    ``models/vit.py::Int8Dense`` computed at x's dtype (callers cast to
    bf16 first so the quant sees exactly what a bf16 dense would)."""
    n, d = x.shape
    f = wq.shape[1]
    if block_n is None or block_f is None:
        bs = w8a8_fusedq_block_sizes(n, d, f, x.dtype.itemsize)
        if bs is None:
            raise ValueError(f"dense_w8a8_fusedq_pallas cannot tile N={n} "
                             f"D={d} F={f}; use the XLA path")
        block_n, block_f = bs
    x = _pad_rows(x, block_n)
    npad = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_w8a8_fusedq_kernel, act=act),
        grid=(npad // block_n, f // block_f),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_n, block_f), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((npad, f), out_dtype),
        interpret=interpret,
    )(x, wq, s_w.reshape(1, f).astype(jnp.float32),
      bias.reshape(1, f).astype(jnp.float32))
    return out[:n]
