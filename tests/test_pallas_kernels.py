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
