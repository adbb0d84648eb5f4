"""Benchmark harness — prints ONE JSON line on stdout.

Headline metric: CLIP ViT-B/16 image-embedding throughput per chip
(bf16 compute, the feature-extraction hot loop of the SCD pipeline,
reference ``main_unsup.py:297-311``).  Secondary metrics (k-means E/M
iterations/sec, fused vocab top-k) go to stderr.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md) — no timing tables exist in the repo.  We normalize against a
nominal 400 imgs/sec for the reference's fp32 single-GPU torch pipeline on
its era hardware (cudatoolkit 10.2-class GPU), documented here so the ratio
is interpretable; the absolute number is the real signal.
"""

import json
import sys
import time

import numpy as np

REFERENCE_NOMINAL_IMGS_PER_SEC = 400.0


def _bench(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_clip_embed(batch: int = 256):
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    model = CLIPModel(cfg)
    images = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    tokens = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images[:1], tokens)

    @jax.jit
    def forward(x):
        return model.apply(variables, x, method=CLIPModel.encode_image)

    dt = _bench(forward, images)
    return batch / dt


def bench_kmeans_iter(n: int = 65536, d: int = 768, k: int = 100):
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.segment import segment_mean

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))

    @jax.jit
    def em_iter(x, c):
        labels, mindist = estep_assign(x, c)
        means, counts = segment_mean(x, labels, k)
        return means, jnp.sum(mindist)

    dt = _bench(em_iter, x, c)
    return 1.0 / dt


def bench_vocab_topk(n: int = 8192, d: int = 512, v: int = 68000, k: int = 5):
    import jax.numpy as jnp

    from scd_tpu.ops.topk import classify_topk

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, v)).astype(np.float32))

    dt = _bench(lambda f: classify_topk(f, w, k), feats)
    return n / dt


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
