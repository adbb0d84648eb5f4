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


def test_init_backend_retries_then_succeeds(monkeypatch):
    """Transient backend errors (the BENCH_r03 failure class) must be
    retried with backoff, not propagated from the first attempt."""
    import bench

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")
        return 197.0

    monkeypatch.setattr(bench, "device_peak_tflops", flaky)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.init_backend(max_tries=4) == 197.0
    assert calls["n"] == 3


def test_init_backend_bounded(monkeypatch):
    import bench

    def dead():
        raise RuntimeError("UNAVAILABLE")

    monkeypatch.setattr(bench, "device_peak_tflops", dead)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        bench.init_backend(max_tries=2)


def _last_json_line(capsys):
    import json

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_main_emits_json_on_backend_failure(monkeypatch, capsys):
    """The driver must NEVER see rc=1 with no JSON (BENCH_r03 regression):
    a dead backend still yields one parseable line with an error field."""
    import bench

    def dead(max_tries=4, base_sleep_s=5.0):
        raise RuntimeError("backend init failed after 4 attempts")

    monkeypatch.setattr(bench, "init_backend", dead)
    bench.main()  # must not raise
    out = _last_json_line(capsys)
    assert out["metric"] == "clip_embed_imgs_per_sec_per_chip"
    assert out["value"] is None
    assert "backend init failed" in out["error"]


def test_main_headline_failure_keeps_secondaries(monkeypatch, capsys):
    """A headline-bench exception must not stop the secondary benches or
    the e2e stage; completed metrics ride in the JSON line."""
    import bench
    import scd_tpu.utils.runtime as rt

    monkeypatch.setattr(bench, "init_backend", lambda **kw: 197.0)
    monkeypatch.setattr(rt, "enable_compilation_cache", lambda: None)
    monkeypatch.setattr(
        bench, "bench_clip_embed",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("boom")))
    monkeypatch.setattr(bench, "bench_kmeans_iter",
                        lambda *a, **kw: (5.0, 1e12))
    monkeypatch.setattr(bench, "bench_vocab_topk", lambda *a, **kw: 1000.0)
    monkeypatch.setattr(bench, "bench_text_embed", lambda *a, **kw: 2000.0)
    monkeypatch.setattr(bench, "bench_constrained_estep",
                        lambda *a, **kw: 100.0)
    monkeypatch.setattr(bench, "bench_gcd_train", lambda *a, **kw: 300.0)
    monkeypatch.setattr(bench, "bench_uno_e2e_step", lambda *a, **kw: 400.0)
    # mock the loader bench too: it would otherwise write + decode ~4k
    # real JPEGs per test run and couple this unit test to the host disk
    monkeypatch.setattr(bench, "bench_image_loader", lambda *a, **kw: 50.0)
    monkeypatch.setattr(bench, "bench_e2e", lambda: {"total_s": 1.0})
    bench.main()
    out = _last_json_line(capsys)
    assert out["value"] is None and "headline" in out["error"]
    assert out["secondary"]["kmeans_iters_per_sec"] == 5.0
    assert out["secondary"]["uno_e2e_imgs_per_sec"] == 400.0
    assert out["e2e"] == {"total_s": 1.0}


def test_main_watchdog_emits_on_hang():
    """Observed failure mode: backend bring-up HANGS (jax.devices() blocked
    >500 s, no exception) — the watchdog thread must emit the JSON line and
    exit 0 anyway.  Runs in a subprocess because the watchdog uses
    os._exit."""
    import json
    import subprocess

    code = (
        "import bench, time\n"
        "bench.init_backend = lambda **kw: time.sleep(3600)\n"
        "bench.main()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60, cwd=".",
        env={**__import__('os').environ, "SCD_BENCH_HARD_CAP_S": "2"})
    assert proc.returncode == 0, proc.stderr[-500:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] is None and "watchdog" in out["error"]


def test_main_happy_path_json(monkeypatch, capsys):
    import bench
    import scd_tpu.utils.runtime as rt

    monkeypatch.setattr(bench, "init_backend", lambda **kw: 197.0)
    monkeypatch.setattr(rt, "enable_compilation_cache", lambda: None)
    monkeypatch.setattr(bench, "bench_clip_embed", lambda *a, **kw: 3300.0)
    for name in ("bench_kmeans_iter", "bench_vocab_topk", "bench_text_embed",
                 "bench_constrained_estep", "bench_gcd_train",
                 "bench_uno_e2e_step", "bench_image_loader"):
        monkeypatch.setattr(
            bench, name,
            (lambda *a, **kw: (5.0, 1e12)) if name == "bench_kmeans_iter"
            else lambda *a, **kw: 1.0)
    monkeypatch.setenv("SCD_BENCH_SKIP_E2E", "1")
    bench.main()
    out = _last_json_line(capsys)
    assert out["error"] is None
    assert out["value"] == 3300.0
    assert out["mfu"] == pytest.approx(
        3300.0 * bench.CLIP_VIT_B16_FLOPS_PER_IMG / 1e12 / 197.0, abs=1e-3)
    assert out["e2e"] is None
