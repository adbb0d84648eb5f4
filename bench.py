"""Benchmark harness — prints ONE JSON line on stdout.

Headline metric: CLIP ViT-B/16 image-embedding throughput per chip
(bf16 compute, the feature-extraction hot loop of the SCD pipeline,
reference ``main_unsup.py:297-311``).  Secondary metrics (k-means E/M
iterations/sec, fused vocab top-k) go to stderr.

Measurement protocol (the transport to the TPU in this environment resolves
buffer futures optimistically, so ``block_until_ready`` on an un-fetched
output is NOT a reliable fence):

- inputs are generated ON DEVICE with ``jax.random`` (host->device copies
  through the tunnel run at ~50 MB/s and would swamp the measurement);
- each benchmark runs K iterations inside ONE jitted ``lax.scan`` whose
  carry chains every iteration into a scalar;
- the wall time is taken around a host fetch of that scalar — the only
  operation the transport cannot satisfy without running everything.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md).  We normalize against a nominal 400 imgs/sec for the
reference's fp32 single-GPU torch pipeline on its era hardware
(cudatoolkit 10.2-class GPU), documented here so the ratio is
interpretable; the absolute number is the real signal.
"""

import json
import sys
import time

import numpy as np

REFERENCE_NOMINAL_IMGS_PER_SEC = 400.0


def _timed_scalar(jitted, *args, inner_iters):
    """Run ``jitted(*args)`` (a scan returning one scalar) twice: once to
    compile + warm, once timed around the scalar fetch."""
    float(jitted(*args))  # compile + warm
    t0 = time.perf_counter()
    val = float(jitted(*args))
    dt = (time.perf_counter() - t0) / inner_iters
    assert np.isfinite(val)
    return dt


def bench_clip_embed(batch: int = 256, k_iters: int = 8):
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    model = CLIPModel(cfg)

    # Initialize ON DEVICE with a single jitted program: eager init would
    # dispatch hundreds of tiny programs through the tunnel (~minutes), and
    # initializing on the host CPU means uploading 600 MB of parameters
    # through a ~5 MB/s effective link.  Random weights time identically to
    # trained ones.  Params enter the forward as a jit ARGUMENT — closing
    # over them would bake 150M weights into the HLO as constants and
    # explode remote compile time.
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))
    jax.block_until_ready(variables)

    @jax.jit
    def run(v, key):
        def body(acc, k):
            x = jax.random.normal(k, (batch, 224, 224, 3), jnp.float32)
            out = model.apply(v, x, method=CLIPModel.encode_image)
            return acc + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(key, k_iters))
        return acc

    dt = _timed_scalar(run, variables, jax.random.PRNGKey(1),
                       inner_iters=k_iters)
    return batch / dt


def bench_kmeans_iter(n: int = 65536, d: int = 768, k: int = 100,
                      k_iters: int = 20):
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.segment import segment_mean

    @jax.jit
    def run(key):
        kx, kc = jax.random.split(key)
        x = jax.random.normal(kx, (n, d), jnp.float32)

        def body(c, _):
            labels, mindist = estep_assign(x, c)
            means, _counts = segment_mean(x, labels, k)
            return means, jnp.sum(mindist)

        c, inertias = jax.lax.scan(
            body, jax.random.normal(kc, (k, d), jnp.float32), None,
            length=k_iters)
        return inertias.sum() + c.sum()

    dt = _timed_scalar(run, jax.random.PRNGKey(2), inner_iters=k_iters)
    return 1.0 / dt


def bench_vocab_topk(n: int = 8192, d: int = 512, v: int = 68000,
                     topk: int = 5, k_iters: int = 10):
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.topk import classify_topk

    @jax.jit
    def run(key):
        kw, kf = jax.random.split(key)
        w = jax.random.normal(kw, (d, v), jnp.float32)

        def body(acc, k):
            feats = jax.random.normal(k, (n, d), jnp.float32)
            vals, idx = classify_topk(feats, w, topk)
            return acc + vals.astype(jnp.float32).sum() + idx.sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(kf, k_iters))
        return acc

    dt = _timed_scalar(run, jax.random.PRNGKey(3), inner_iters=k_iters)
    return n / dt


def bench_text_embed(batch: int = 2048, seq: int = 77, k_iters: int = 8):
    """CLIP text-encoder throughput (prompts/sec) — the vocabulary-embedding
    stage runs ~68k names x 80 templates = 5.4M prompts through it
    (reference loops one name at a time, ``clip_lang_util.py:96-108``)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    model = CLIPModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))
    jax.block_until_ready(variables)

    @jax.jit
    def run(v, key):
        def body(acc, k):
            toks = jax.random.randint(k, (batch, seq), 0, 49408, jnp.int32)
            out = model.apply(v, toks, method=CLIPModel.encode_text)
            return acc + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(key, k_iters))
        return acc

    dt = _timed_scalar(run, variables, jax.random.PRNGKey(4),
                       inner_iters=k_iters)
    return batch / dt


def main():
    from scd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    imgs_per_sec = bench_clip_embed()
    print(f"[bench] clip_embed: {imgs_per_sec:.1f} imgs/sec/chip",
          file=sys.stderr)
    try:
        km = bench_kmeans_iter()
        print(f"[bench] kmeans_em_iter (N=65536,D=768,K=100): {km:.2f} iters/sec",
              file=sys.stderr)
        tk = bench_vocab_topk()
        print(f"[bench] vocab softmax-topk (V=68k): {tk:.0f} imgs/sec",
              file=sys.stderr)
        tx = bench_text_embed()
        print(f"[bench] clip text encoder: {tx:.0f} prompts/sec "
              f"(68k-name x 80-template vocab in ~{5.44e6 / tx / 60:.1f} min)",
              file=sys.stderr)
    except Exception as e:  # secondary benches must not kill the headline
        print(f"[bench] secondary failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "clip_embed_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_NOMINAL_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
