"""Pallas fused-kernel tests (interpreter mode on the CPU mesh) against the
XLA reference paths in ``scd_tpu.ops.distance`` / ``scd_tpu.ops.topk``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.ops.distance import estep_assign
from scd_tpu.ops.pallas_kernels import estep_assign_pallas, \
    topk_softmax_pallas
from scd_tpu.ops.topk import classify_topk


@pytest.mark.parametrize("n,k,d", [(300, 37, 64), (1024, 512, 128),
                                   (513, 100, 32)])
def test_estep_pallas_matches_xla(n, k, d):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    c = rng.standard_normal((k, d)).astype(np.float32)
    lab_ref, dist_ref = estep_assign(jnp.asarray(x), jnp.asarray(c))
    lab, dist = estep_assign_pallas(jnp.asarray(x), jnp.asarray(c),
                                    block_n=256, block_k=256,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-3)


def test_estep_pallas_tie_breaking():
    # duplicate centers: first index must win (reference argmin semantics)
    x = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    c = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    lab, dist = estep_assign_pallas(jnp.asarray(x), jnp.asarray(c),
                                    block_n=256, block_k=256,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(lab), [0, 2])
    np.testing.assert_allclose(np.asarray(dist), [0.0, 0.0], atol=1e-5)


@pytest.mark.parametrize("n,v,k", [(100, 1000, 5), (257, 3000, 3)])
def test_topk_softmax_pallas_matches_xla(n, v, k):
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((n, 32)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    w = rng.standard_normal((32, v)).astype(np.float32)
    ref_v, ref_i = classify_topk(jnp.asarray(feats), jnp.asarray(w), k)
    got_v, got_i = topk_softmax_pallas(jnp.asarray(feats), jnp.asarray(w),
                                       k, block_n=128, block_v=512,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    # on TPU hardware the two paths use different matmul pass counts
    # (HIGHEST vs HIGH); at this test's unrealistic logit scale (~300) exp
    # amplifies the ~1e-6 logit difference into ~4e-3 relative prob error
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-2, atol=1e-6)


def test_topk_softmax_pallas_raw_logits():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((64, 16)).astype(np.float32)
    w = rng.standard_normal((16, 700)).astype(np.float32)
    ref_v, ref_i = classify_topk(jnp.asarray(feats), jnp.asarray(w), 4,
                                 apply_softmax=False)
    got_v, got_i = topk_softmax_pallas(jnp.asarray(feats), jnp.asarray(w),
                                       4, block_n=128, block_v=256,
                                       apply_softmax=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)


def test_vit_attention_pallas_matches_xla():
    """Fused short-seq attention kernel (interpret mode) == XLA dpa, for the
    image (L=197) and text (L=77, causal) shapes."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.pallas_kernels import vit_attention_pallas

    for (b, l, h, d, causal) in [(2, 197, 12, 64, False),
                                 (3, 77, 8, 64, True),
                                 (1, 5, 2, 64, False)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = [jax.random.normal(kk, (b, l, h, d), jnp.float32)
                   for kk in ks]
        out = vit_attention_pallas(q, k, v, scale=d ** -0.5, causal=causal,
                                   interpret=True)
        mask = (jnp.tril(jnp.ones((l, l), jnp.bool_))[None, None]
                if causal else None)
        ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_qkv_attention_pallas_matches_xla():
    """Packed-qkv attention kernel (interpret mode) == XLA dpa."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.pallas_kernels import qkv_attention_pallas

    for (b, l, h, d, causal) in [(2, 197, 12, 64, False),
                                 (3, 77, 8, 64, True)]:
        qkv = jax.random.normal(jax.random.PRNGKey(1), (b, l, 3 * h * d),
                                jnp.float32)
        out = qkv_attention_pallas(qkv, heads=h, scale=d ** -0.5,
                                   causal=causal, interpret=True)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hh = lambda t: t.reshape(b, l, h, d)
        mask = (jnp.tril(jnp.ones((l, l), jnp.bool_))[None, None]
                if causal else None)
        ref = jax.nn.dot_product_attention(
            hh(q), hh(k), hh(v), mask=mask).reshape(b, l, h * d)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_manual_attention_bf16_close_to_f32():
    """The bf16-score attention used on TPU stays within bf16 tolerance of
    the f32 XLA reference (causal and non-causal)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.vit import _manual_attention_bf16

    for causal in (False, True):
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q, k, v = [jax.random.normal(kk, (2, 197, 12, 64), jnp.float32)
                   for kk in ks]
        got = _manual_attention_bf16(q.astype(jnp.bfloat16),
                                     k.astype(jnp.bfloat16),
                                     v.astype(jnp.bfloat16),
                                     64 ** -0.5, causal)
        mask = (jnp.tril(jnp.ones((197, 197), jnp.bool_))[None, None]
                if causal else None)
        ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        assert err < 0.05, err


def test_fused_em_step_matches_xla_ops():
    """fused_em_step_pallas == estep_assign + segment_sums + inertia, incl.
    under vmap (the restart axis) — partial-output design, no program_id."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas
    from scd_tpu.ops.segment import segment_sums

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1500, 48)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((10, 48)), jnp.float32)
    lab, sums, cnt, ine = fused_em_step_pallas(x, c, block_n=512,
                                               interpret=True)
    lab_ref, mind = estep_assign(x, c)
    s_ref, c_ref = segment_sums(x, lab_ref, 10)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(s_ref), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(c_ref))
    np.testing.assert_allclose(float(ine), float(mind.sum()), rtol=1e-5)

    cs = jnp.stack([c, c * 1.1, c * 0.9])
    labv, sumsv, cntv, inev = jax.vmap(
        lambda cc: fused_em_step_pallas(x, cc, block_n=512, interpret=True))(cs)
    l1, s1, n1, i1 = fused_em_step_pallas(x, cs[1], block_n=512,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(labv[1]), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(sumsv[1]), np.asarray(s1),
                               atol=1e-3)


def test_fused_lloyd_loop_matches_xla_path():
    """The full fit path with fused=True (interpret-mode kernel on CPU)
    reproduces the XLA E/M path: same labels and inertia on blobs."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.cluster.kmeans import _fit_kmeans_device

    rng = np.random.default_rng(1)
    centers = rng.standard_normal((6, 16)) * 4
    x = (centers[rng.integers(0, 6, 900)]
         + 0.3 * rng.standard_normal((900, 16))).astype(np.float32)
    x_j = jnp.asarray(x)
    nv = jnp.asarray(900)
    a = _fit_kmeans_device(jax.random.PRNGKey(0), x_j, nv, 6, 25, 1e-4, 2,
                           fused=False)
    b = _fit_kmeans_device(jax.random.PRNGKey(0), x_j, nv, 6, 25, 1e-4, 2,
                           fused=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # inertia: hand-rolled bf16x3 vs XLA HIGH accumulate in different
    # orders -> f32-class but not bitwise agreement
    np.testing.assert_allclose(float(a[1]), float(b[1]), rtol=1e-3)


def test_fused_em_step_two_pass_label_parity():
    """estep_passes=2 (drop the x_lo.c_hi term) must keep label parity with
    the XLA f32 E-step on realistic cluster structure — the gate for
    enabling the faster variant (see fused_em_step_pallas docstring)."""
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((12, 64)).astype(np.float32) * 2
    x = (centers[rng.integers(0, 12, 2000)]
         + 0.5 * rng.standard_normal((2000, 64))).astype(np.float32)
    c = jnp.asarray(centers + 0.05 * rng.standard_normal(centers.shape),
                    jnp.float32)
    lab2, _s, _c, _i = fused_em_step_pallas(jnp.asarray(x), c, block_n=512,
                                            interpret=True, estep_passes=2)
    lab_ref, _ = estep_assign(jnp.asarray(x), c)
    agree = (np.asarray(lab2) == np.asarray(lab_ref)).mean()
    assert agree >= 0.999, agree


def test_fused_em_step_x_bf16_parity():
    """x_bf16=True (bf16 HBM storage of the x stream, half the dominant
    read) must keep label parity on realistic cluster structure and
    bounded sums/inertia drift — the gate for the bandwidth variant."""
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas
    from scd_tpu.ops.segment import segment_sums

    rng = np.random.default_rng(4)
    centers = rng.standard_normal((12, 64)).astype(np.float32) * 2
    x = (centers[rng.integers(0, 12, 2000)]
         + 0.5 * rng.standard_normal((2000, 64))).astype(np.float32)
    c = jnp.asarray(centers + 0.05 * rng.standard_normal(centers.shape),
                    jnp.float32)
    lab, sums, cnt, ine = fused_em_step_pallas(
        jnp.asarray(x), c, block_n=512, interpret=True, x_bf16=True)
    lab_ref, mind = estep_assign(jnp.asarray(x), c)
    agree = (np.asarray(lab) == np.asarray(lab_ref)).mean()
    assert agree >= 0.999, agree
    s_ref, c_ref = segment_sums(jnp.asarray(x), lab_ref, 12)
    # sums carry one bf16 rounding of x (~0.4% per element, averaged down
    # by the per-cluster accumulation)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(s_ref),
                               rtol=0.02, atol=0.3)
    np.testing.assert_allclose(np.asarray(cnt), np.asarray(c_ref), atol=2)
    np.testing.assert_allclose(float(ine), float(mind.sum()), rtol=0.02)


def test_fused_em_near_tie_margins():
    """Adversarial near-tie E-step parity (VERDICT r3 item 5's gate for
    flipping a faster default): points constructed ON the bisector of two
    centers, displaced by controlled squared-distance margins.

    - 3-pass bf16x3 (the default) must match the XLA f32 argmin down to
      margins ~1e-3 in INTERPRET mode (real f32 host math; this checks
      the hi/lo decomposition algebra).  On the real MXU the honest
      contract is 0.02 — both the kernel and the XLA oracle run bf16-
      decomposed passes there, and round-4 hardware runs observed flips
      just above 1e-3 at d=768 — see
      ``test_pallas_on_tpu.py::test_fused_em_fast_variants_on_chip_near_ties``;
    - 2-pass and x_bf16 round x to bf16 for the cross term, so their
      decision boundary blurs by ~|2*c*dx| ~ 0.01*|x||c|: they must match
      at margins >= 0.25 and are ALLOWED to flip below — the documented
      contract for enabling either in a pipeline."""
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas

    rng = np.random.default_rng(5)
    d = 64
    c0 = rng.standard_normal(d).astype(np.float32)
    c1 = c0 + 0.8 * rng.standard_normal(d).astype(np.float32)
    c = jnp.asarray(np.stack([c0, c1]))
    mid = (c0 + c1) / 2
    u = (c1 - c0) / np.linalg.norm(c1 - c0)
    # squared-distance margins, both signs: d0^2 - d1^2 = 2*t*|c1-c0|
    margins = np.concatenate([
        -np.logspace(-6, 0, 25), np.logspace(-6, 0, 25)]).astype(np.float32)
    t = margins / (2 * np.linalg.norm(c1 - c0))
    x = (mid[None, :] + t[:, None] * u[None, :]).astype(np.float32)
    # plus orthogonal jitter rows (same margins, off-axis)
    orth = rng.standard_normal(d).astype(np.float32)
    orth -= orth @ u * u
    orth /= np.linalg.norm(orth)
    x = np.concatenate([x, x + 0.5 * orth[None, :]])
    margins = np.concatenate([margins, margins])

    lab_ref, _ = estep_assign(jnp.asarray(x), c)
    lab_ref = np.asarray(lab_ref)
    # sanity: the XLA oracle itself follows the margin sign (up to f32)
    clear = np.abs(margins) >= 1e-3
    np.testing.assert_array_equal(lab_ref[clear], (margins[clear] > 0))

    for kw, min_margin in [(dict(estep_passes=3), 1e-3),
                           (dict(estep_passes=2), 0.25),
                           (dict(x_bf16=True), 0.25)]:
        lab, *_ = fused_em_step_pallas(jnp.asarray(x), c, block_n=128,
                                       interpret=True, **kw)
        lab = np.asarray(lab)
        ok = np.abs(margins) >= min_margin
        mismatch = (lab[ok] != lab_ref[ok]).sum()
        assert mismatch == 0, (kw, min_margin, mismatch)


def test_fused_em_step_multi_lane_block_k():
    """K > 128 pads to multiple 128-lane blocks (Kp=256 here) — the
    padded-center masking and stats slab must stay exact across lane
    blocks."""
    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas
    from scd_tpu.ops.segment import segment_sums

    rng = np.random.default_rng(7)
    k, d = 200, 64
    centers = rng.standard_normal((k, d)) * 4.0
    assign = rng.integers(0, k, 3000)
    x = jnp.asarray(centers[assign] + 0.3 * rng.standard_normal((3000, d)),
                    jnp.float32)
    c = jnp.asarray(centers, jnp.float32)
    lab, sums, cnt, ine = fused_em_step_pallas(x, c, block_n=512,
                                               interpret=True)
    lab_ref, mind = estep_assign(x, c)
    s_ref, c_ref = segment_sums(x, lab_ref, k)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(s_ref),
                               atol=1e-3)
    # bf16x3 distance accumulation: ~1e-5 relative on the summed inertia
    np.testing.assert_allclose(float(ine), float(mind.sum()), rtol=1e-4)


def test_fused_em_block_n_vmem_model():
    """The adaptive block chooser must reproduce the measured v5e OK/OOM
    boundary (see fused_em_block_n docstring) and fall back to None when
    the fixed centers term alone busts the budget."""
    from scd_tpu.ops.pallas_kernels import fused_em_block_n

    assert fused_em_block_n(768, 100) == 1024   # bench shape, unchanged
    assert fused_em_block_n(768, 683) == 512    # Herbarium (1024 OOM'd)
    assert fused_em_block_n(768, 1500) == 256   # (512 OOM'd)
    assert fused_em_block_n(48, 10) == 1024     # tiny test shapes
    assert fused_em_block_n(768, 20000) is None  # XLA fallback regime


def test_topk_block_v_vmem_model():
    """topk geometry chooser: shipped (256, 2048) at D=512 stays; wider
    towers shrink block_v instead of OOMing scoped VMEM on hardware."""
    from scd_tpu.ops.pallas_kernels import topk_block_v

    assert topk_block_v(512) == 2048   # the measured-good shipped geometry
    assert topk_block_v(768) == 2048
    assert topk_block_v(1024) >= 1024  # ViT-L-class width still compiles
    assert topk_block_v(4096, block_n=1024) is None  # XLA fallback


def test_topk_pallas_rejects_vocab_smaller_than_k():
    from scd_tpu.ops.pallas_kernels import topk_softmax_pallas

    feats = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                        jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 3)),
                    jnp.float32)
    with pytest.raises(ValueError, match="V >= k"):
        topk_softmax_pallas(feats, w, k=5, interpret=True)


def test_em_iteration_fused_pads_k_like_xla():
    """em_iteration(k > centers rows): the fused path must return the same
    [k]-shaped sums/counts the XLA path does (it pads centers with far
    sentinels), not silently size outputs from centers.shape[0]."""
    from scd_tpu.ops.em import em_iteration

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((256, 8)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    lab_f, sums_f, cnt_f, in_f = em_iteration(x, c, k=6, fused=True)
    lab_x, sums_x, cnt_x, in_x = em_iteration(x, c, k=6, fused=False)
    assert sums_f.shape == sums_x.shape == (6, 8)
    assert cnt_f.shape == (6,)
    np.testing.assert_array_equal(np.asarray(lab_f), np.asarray(lab_x))
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_x))
    np.testing.assert_allclose(np.asarray(sums_f), np.asarray(sums_x),
                               atol=1e-3)
    np.testing.assert_allclose(float(in_f), float(in_x), rtol=1e-4)


def test_dense_w8a8_pallas_matches_xla_reference():
    """Interpret-mode W8A8 kernel vs the XLA int8 graph in Int8Dense:
    identical int32 accumulation and dequant math — equal to within one
    f32 ulp (the epilogue's mul-add may or may not contract to an FMA
    between the two compilers) — incl. a non-block-multiple N exercising
    row padding."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.pallas_kernels import dense_w8a8_pallas

    rng = np.random.default_rng(0)
    n, d, f = 300, 128, 256
    xq = jnp.asarray(rng.integers(-127, 128, (n, d)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (d, f)).astype(np.int8))
    sx = jnp.asarray((0.003 + 0.001 * rng.random((n, 1))).astype(np.float32))
    sw = jnp.asarray((0.001 + 0.002 * rng.random((1, f))).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(f).astype(np.float32))

    y_k = dense_w8a8_pallas(xq, wq, sx, sw, b, block_n=128, block_f=128,
                            out_dtype=jnp.float32, interpret=True)

    y_ref = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y_ref = y_ref.astype(jnp.float32) * sx * sw + b
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-7, atol=2e-6)


def test_w8a8_block_sizes_guard():
    from scd_tpu.ops.pallas_kernels import w8a8_block_sizes

    assert w8a8_block_sizes(25216, 768, 3072) is not None
    assert w8a8_block_sizes(25216, 768, 2304) is not None
    # non-128-lane dims cannot tile
    assert w8a8_block_sizes(1024, 100, 3072) is None
    assert w8a8_block_sizes(1024, 768, 1000) is None


def test_dense_w8a8_pallas_3d_matches_xla_reference():
    """Rank-3 W8A8 kernel (no host-side (B, L) flatten — the flatten at
    non-tile-aligned L costs relayout copies worth 4x the GEMM) vs the
    rank-3 XLA int8 dot, interpret mode."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.pallas_kernels import (dense_w8a8_pallas_3d,
                                            w8a8_block_sizes_3d)

    rng = np.random.default_rng(0)
    b, l, d, f = 4, 13, 128, 256  # odd L: the exact case the kernel is for
    xq = jnp.asarray(rng.integers(-127, 128, (b, l, d)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (d, f)).astype(np.int8))
    sx = jnp.asarray((0.003 + 0.001 * rng.random((b, l, 1))
                      ).astype(np.float32))
    sw = jnp.asarray((0.001 + 0.002 * rng.random((1, f))).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(f).astype(np.float32))

    y_k = dense_w8a8_pallas_3d(xq, wq, sx, sw, bias, block_b=2, block_f=128,
                               out_dtype=jnp.float32, interpret=True)
    y_ref = jax.lax.dot_general(xq, wq, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    y_ref = (y_ref.astype(jnp.float32) * sx * sw.reshape(1, 1, f)
             + bias.reshape(1, 1, f))
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-7, atol=2e-6)

    assert w8a8_block_sizes_3d(128, 197, 768, 3072) is not None
    assert w8a8_block_sizes_3d(128, 197, 100, 3072) is None
    assert w8a8_block_sizes_3d(127, 197, 768, 3072) == (1, 1024)  # B prime


def test_dense_w8a8_fusedq_matches_reference_chain():
    """Fused-activation-quant W8A8 kernel (quantize in VMEM; x streams in
    bf16 so the int8 path adds zero HBM traffic over the bf16 dense it
    replaces) vs the explicit quantize->int8 dot->dequant chain at the
    same bf16 input, interpret mode."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.pallas_kernels import (dense_w8a8_fusedq_pallas,
                                            w8a8_fusedq_block_sizes)

    rng = np.random.default_rng(0)
    n, d, f = 384, 256, 384
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (d, f)).astype(np.int8))
    sw = jnp.asarray((0.001 + 0.002 * rng.random((1, f))).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(f).astype(np.float32))

    y_k = dense_w8a8_fusedq_pallas(x, wq, sw, bias, block_n=128, block_f=128,
                                   out_dtype=jnp.float32, interpret=True)

    x32 = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(x32).max(axis=1, keepdims=True), 1e-12) / 127.0
    xq = np.rint(np.clip(x32 / sx, -127.0, 127.0)).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(wq, np.int32)
    y_ref = acc.astype(np.float32) * sx * np.asarray(sw) + np.asarray(bias)
    # NOT bit-equal: the in-kernel divide can differ from the host chain
    # by 1 ulp of s_x, flipping round-to-nearest exactly AT quantization
    # boundaries (x/s_x == k+0.5).  Each flip moves one xq by +-1, so the
    # output moves by at most (flips per row) * max|w| * s_x * s_w —
    # bound it at 1024 quantization steps (~2.6e-4 relative at D=256)
    # and require the flips to be rare.
    step = sx * np.asarray(sw)  # [n, f] dequant step
    diff = np.abs(np.asarray(y_k) - y_ref)
    assert (diff <= 1024 * step + 1e-5).all(), diff.max()
    assert (diff > 1e-5).mean() < 0.05

    # ragged N pads rows internally (same contract as dense_w8a8_pallas)
    y_r = dense_w8a8_fusedq_pallas(x[:200], wq, sw, bias, block_n=128,
                                   block_f=128, out_dtype=jnp.float32,
                                   interpret=True)
    diff_r = np.abs(np.asarray(y_r) - y_ref[:200])
    assert (diff_r <= 1024 * step[:200] + 1e-5).all()

    assert w8a8_fusedq_block_sizes(26624, 768, 3072) is not None
    assert w8a8_fusedq_block_sizes(26624, 100, 3072) is None
