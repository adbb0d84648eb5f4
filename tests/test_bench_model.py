"""bench.py's analytic models and timing protocol — the driver-facing
harness must not bitrot between hardware runs (it only executes on the
real chip otherwise)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # bench.py lives at the repo root


def test_clip_flops_model_matches_hand_count():
    """ViT-B/16 @224 analytic FLOPs: independently recompute each term.
    The published '17.6 GFLOPs' MAC count for ViT-B/16 excludes the
    attention score/AV matmuls this model includes — sanity-band it."""
    from bench import CLIP_VIT_B16_FLOPS_PER_IMG, clip_vit_b16_flops_per_img

    g, w, d, h, s = 14, 768, 12, 12, 197
    conv = (g * g) * (16 * 16 * 3) * w
    per_layer = (3 * s * w * w + 2 * h * s * s * (w // h)
                 + s * w * w + 2 * s * w * 4 * w)
    want = 2.0 * (conv + d * per_layer + w * 512)
    assert clip_vit_b16_flops_per_img() == want
    assert CLIP_VIT_B16_FLOPS_PER_IMG == want
    assert 33e9 < want < 40e9  # 2/MAC convention, attention included


def test_flops_model_scales_with_arch():
    from bench import clip_vit_b16_flops_per_img

    base = clip_vit_b16_flops_per_img()
    # ViT-L-ish: deeper+wider strictly costs more; smaller images less
    assert clip_vit_b16_flops_per_img(width=1024, depth=24, heads=16) > base
    assert clip_vit_b16_flops_per_img(image_size=112) < base


def test_timed_slope_cancels_fixed_overhead():
    """The two-point slope must recover per-iteration cost exactly when a
    fixed per-call overhead is present (the ~33 ms tunnel round-trip this
    protocol exists to cancel)."""
    import time as _time

    from bench import _timed_slope

    per_iter, fixed = 2e-3, 20e-3

    def make_run(k):
        def run():
            _time.sleep(fixed + k * per_iter)
            return np.float32(1.0)
        return run

    got = _timed_slope(make_run, 2, 12, reps=1)
    assert got == pytest.approx(per_iter, rel=0.25)


def test_peak_tflops_lookup():
    from bench import _PEAK_TFLOPS, device_peak_tflops

    # CPU test env: unknown device kind -> NaN (bench prints mfu as NaN
    # rather than crashing); the table itself must cover the v5e family
    assert np.isnan(device_peak_tflops()) or device_peak_tflops() > 0
    assert _PEAK_TFLOPS["TPU v5 lite"] == 197.0
