"""Benchmark harness — prints ONE JSON line on stdout.

Headline metric: CLIP ViT-B/16 image-embedding throughput per chip
(bf16 compute, the feature-extraction hot loop of the SCD pipeline,
reference ``main_unsup.py:297-311``), with analytic FLOPs and MFU so
progress is measured against the hardware.  Secondary metrics (k-means E/M
iterations/sec, fused vocab top-k, text encoder) go to stderr.

Measurement protocol (the transport to the TPU in this environment resolves
buffer futures optimistically, so ``block_until_ready`` on an un-fetched
output is NOT a reliable fence):

- inputs live ON DEVICE (host->device copies through the tunnel run at
  ~50 MB/s and would swamp the measurement).  The image batch is generated
  once outside the timed loop and re-derived per iteration with a cheap
  key-dependent perturbation — fresh values every iteration (so nothing is
  loop-hoisted) without paying ~4 ms/iter of Philox normal generation
  inside the measurement;
- each benchmark runs K iterations inside ONE jitted ``lax.scan`` whose
  carry chains every iteration into a scalar;
- the wall time is taken around a host fetch of that scalar — the only
  operation the transport cannot satisfy without running everything;
- every dispatch through the tunnel carries a ~33 ms fixed round-trip
  (measured: a no-op 1-iteration scan takes 34 ms wall).  A single timed
  call would fold that constant into the per-iteration number (it made the
  round-1 k-means figure 3.7x worse than reality), so each benchmark times
  the SAME program at two scan lengths and reports the slope
  ``(t_hi - t_lo) / (k_hi - k_lo)`` — the steady-state per-iteration time,
  which is what any real pipeline running thousands of batches sees.

FLOP accounting: ``CLIP_VIT_B16_FLOPS_PER_IMG`` counts 2 FLOPs per MAC
(the MFU convention); the often-quoted "17.6 GFLOPs" for ViT-B/16 is the
MAC count.  MFU is against the per-chip bf16 peak looked up from the
device kind (v5e = 197 TFLOP/s).

Why the CLIP tower tops out near ~59% MFU on v5e (measured analysis,
round 2): the per-layer time splits into dense matmuls that run at ~195
TFLOP/s (essentially the chip's measured matmul ceiling at K=768-class
shapes) and softmax attention that cannot go much faster on this
hardware: head_dim=64 fills only half the 128-lane MXU contraction, L=197
score tiles are small, and the softmax's HBM round-trip of the
[B, 12, 197, 197] score tensor is already halved by bf16 storage.  Batch
size is a first-order knob: B=128 measures 3.3k imgs/s vs 2.9k at 256 and
2.6k at 512 (smaller score tensors keep the softmax chain resident).
Three Pallas kernel variants (per-head fused, packed-qkv lane-sliced,
staged-scratch; see ``ops/pallas_kernels.py``) all measured SLOWER than
the XLA bf16-score path because Mosaic serializes the per-head
MXU->VPU->MXU chains; jax's own
``pallas.ops.tpu.flash_attention`` (padded 197->256 with segment-id
masking) measured 6x slower still (4.4 vs 0.72 ms/layer at B=128) —
flash-style streaming pays off at long sequences, not L=197 x d=64.
Raising MFU further would require wider heads or longer sequences —
model-architecture changes, not kernel ones.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md).  We normalize against a nominal 400 imgs/sec for the
reference's fp32 single-GPU torch pipeline on its era hardware
(cudatoolkit 10.2-class GPU), documented here so the ratio is
interpretable; the absolute number is the real signal.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_NOMINAL_IMGS_PER_SEC = 400.0

# bf16 peak TFLOP/s per chip by device kind (2 FLOPs/MAC convention)
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def clip_vit_b16_flops_per_img(image_size: int = 224, patch: int = 16,
                               width: int = 768, depth: int = 12,
                               heads: int = 12, mlp_ratio: int = 4,
                               out_dim: int = 512) -> float:
    """Analytic forward FLOPs (2 per MAC) for the CLIP image tower."""
    g = image_size // patch
    n_patch = g * g
    seq = n_patch + 1
    head_dim = width // heads
    conv = n_patch * (patch * patch * 3) * width
    per_layer = (
        3 * seq * width * width          # qkv
        + 2 * heads * seq * seq * head_dim  # scores + AV
        + seq * width * width            # out proj
        + 2 * seq * width * (mlp_ratio * width)  # mlp fc1+fc2
    )
    proj = width * out_dim
    return 2.0 * (conv + depth * per_layer + proj)


CLIP_VIT_B16_FLOPS_PER_IMG = clip_vit_b16_flops_per_img()


def device_peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return float("nan")


def init_backend(max_tries: int = 4, base_sleep_s: float = 5.0) -> float:
    """Bring the backend up with bounded retries and return the per-chip
    bf16 peak TFLOP/s (NaN for unknown device kinds).

    The axon plugin's ``UNAVAILABLE: TPU backend setup/compile error`` is
    transient-class — one occurrence voided ALL of round 3's perf evidence
    (``BENCH_r03.json``: rc=1, no JSON) because ``jax.devices()`` ran before
    any try/except.  Between attempts the cached (failed) backend is
    dropped via ``jax.extend.backend.clear_backends()`` so the plugin
    re-initializes from scratch."""
    import jax

    last: Exception | None = None
    for attempt in range(max_tries):
        try:
            return device_peak_tflops()
        except Exception as e:  # noqa: BLE001 — any init error is retryable
            last = e
            sleep_s = base_sleep_s * (2.0 ** attempt)
            print(f"[bench] backend init attempt {attempt + 1}/{max_tries} "
                  f"failed ({type(e).__name__}: {e}); retrying in "
                  f"{sleep_s:.0f}s", file=sys.stderr, flush=True)
            try:
                import jax.extend.backend as _eb

                _eb.clear_backends()
            except Exception:
                pass
            time.sleep(sleep_s)
    raise RuntimeError(
        f"backend init failed after {max_tries} attempts") from last


def _timed_slope(make_run, k_lo: int, k_hi: int, *args, reps: int = 2,
                 _depth: int = 0, _t_lo: float | None = None):
    """Two-point timing: ``make_run(k)`` builds a jitted scan of k chained
    iterations returning one scalar.  Returns seconds per iteration as the
    slope between the two scan lengths, cancelling the fixed per-dispatch
    tunnel round-trip (~33 ms) exactly.

    When the signal (times[k_hi] - times[k_lo]) is under the tunnel's
    timing noise the raw slope can come out ~0 or even NEGATIVE (observed
    round 4: the 0.5 ms constrained E-step at dk=16 gave -0.16 ms/iter).
    Guard: if the gap is below a 10 ms noise floor or non-positive, retry
    with k_hi scaled 8x (one extra compile, only on the stages fast enough
    to need it); after 2 retries fall back to times[k_hi]/k_hi, which
    includes the dispatch overhead and so under-reports throughput rather
    than fabricating it — and is always positive.  Retries reuse the
    already-measured k_lo timing (``_t_lo``) so each retry pays exactly
    one extra compile (the new k_hi), not two."""
    times = []
    for k in (k_lo, k_hi):
        if k == k_lo and _t_lo is not None:
            times.append(_t_lo)
            continue
        run = make_run(k)
        val = float(run(*args))  # compile + warm
        assert np.isfinite(val)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    gap = times[1] - times[0]
    if gap <= 0.010:  # noise-dominated: the RTT jitter is a few ms
        if _depth < 2:
            return _timed_slope(make_run, k_lo, k_lo + (k_hi - k_lo) * 8,
                                *args, reps=reps + 1, _depth=_depth + 1,
                                _t_lo=times[0])
        return times[1] / k_hi  # conservative positive fallback
    return gap / (k_hi - k_lo)


def _fresh(base, key):
    """Cheap per-iteration freshening: key-dependent scale keeps every
    iteration's input distinct (no loop hoisting) at the cost of one
    elementwise pass instead of a full Philox re-generation."""
    import jax.numpy as jnp

    eps = (key[0] % 1024).astype(jnp.float32) * 1e-6
    return base * (1.0 + eps)


def bench_clip_embed(batch: int = 128, dense_int8: bool = False):
    """Batch 128 is the measured v5e sweet spot (3.3k imgs/s vs 2.9k at
    256, 2.6k at 512): the [B, 12, 197, 197] bf16 attention scores shrink
    enough for XLA to keep the softmax chain better-resident.

    ``dense_int8`` benches the W8A8 dense path (models/vit.py Int8Dense).
    Published as evidence, not as a recommendation: measured r5 the int8
    tower LOSES to bf16 at ViT-B/16 scale on v5e (pad-to-208 + pallas_call
    fusion barriers outweigh the per-GEMM kernel wins; see README)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16,
                              dense_int8=dense_int8)
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

    def make_run(k_iters):
        @jax.jit
        def run(v, key):
            base = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

            def body(acc, k):
                out = model.apply(v, _fresh(base, k),
                                  method=CLIPModel.encode_image)
                return acc + out.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jax.random.split(key, k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 2, 10, variables, jax.random.PRNGKey(1))
    return batch / dt


def bench_kmeans_iter(n: int = 65536, d: int = 768, k: int = 100,
                      em_kwargs: dict = None):
    """One full k-means EM iteration — the same path the library's Lloyd
    loop runs: on TPU that is the fused Pallas E+M kernel (one streaming
    pass over x instead of two), with K padded to the 128-lane width.

    Data is class-structured (k gaussian clusters — the regime the
    pipelines cluster: CLIP/DINO features with class structure, not pure
    noise); kernel time is data-independent, so only the ``estep='auto'``
    probe outcome depends on this choice.

    ``em_kwargs=None`` (the headline) measures the LIBRARY DEFAULT:
    ``ClusterConfig.estep='auto'`` runs its parity probe on the actual
    features and picks the x_bf16 fast path only on full label agreement
    (``cluster.kmeans._resolve_estep``; VERDICT r4 item 1).  Explicit
    kwargs select variants for the precision-vs-speed sweep:
    ``{"estep_passes": 3}`` (exact), ``{"estep_passes": 2}``,
    ``{"x_bf16": True}``.  Parity contracts live in
    ``tests/test_pallas_on_tpu.py::test_fused_em_fast_variants...``."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.em import em_iteration

    def gen_x(key):
        kx, kc, ka = jax.random.split(key, 3)
        ctrs = 3.0 * jax.random.normal(kc, (k, d), jnp.float32)
        assign = jax.random.randint(ka, (n,), 0, k)
        return ctrs[assign] + 0.5 * jax.random.normal(kx, (n, d),
                                                      jnp.float32)

    if em_kwargs is None:
        from scd_tpu.cluster.kmeans import _resolve_estep, _use_fused
        from scd_tpu.core.config import ClusterConfig

        cfg = ClusterConfig(n_clusters=k)  # estep defaults to "auto"
        fused = _use_fused(d, k, cfg.fused_mesh)
        x_probe = jax.jit(gen_x)(jax.random.PRNGKey(2))
        passes, xbf = _resolve_estep(cfg, fused, x_probe,
                                     jnp.asarray(n), n, None)
        em_kwargs = {"estep_passes": passes, "x_bf16": xbf}
        print(f"[bench] kmeans estep auto probe resolved -> "
              f"passes={passes} x_bf16={xbf}", file=sys.stderr)
        del x_probe

    def make_run(k_iters):
        @jax.jit
        def run(key):
            kg, kc = jax.random.split(key)
            x = gen_x(kg)

            def body(c, _):
                # exactly the library Lloyd-loop iteration incl. the
                # empty-cluster keep-previous-center select
                _lab, sums, counts, inertia = em_iteration(x, c, k,
                                                           **em_kwargs)
                means = sums / jnp.maximum(counts, 1.0)[:, None]
                means = jnp.where((counts < 0.5)[:, None], c, means)
                return means, inertia

            c, inertias = jax.lax.scan(
                body, jax.random.normal(kc, (k, d), jnp.float32), None,
                length=k_iters)
            return inertias.sum() + c.sum()

        return run

    dt = _timed_slope(make_run, 20, 220, jax.random.PRNGKey(2))
    # E-step cross-term (N x Kpad x D MACs) + M-step one-hot matmul
    k_pad = -(-k // 128) * 128
    flops = 2.0 * n * k_pad * d * 2  # estep matmul + segment-sum matmul
    return 1.0 / dt, flops * 1.0 / dt


def bench_vocab_topk(n: int = 8192, d: int = 512, v: int = 68000,
                     topk: int = 5):
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.topk import classify_topk

    def make_run(k_iters):
        @jax.jit
        def run(key):
            kw, kf = jax.random.split(key)
            w = jax.random.normal(kw, (d, v), jnp.float32)
            base = jax.random.normal(kf, (n, d), jnp.float32)

            def body(acc, k):
                vals, idx = classify_topk(_fresh(base, k), w, topk)
                return acc + vals.astype(jnp.float32).sum() + idx.sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jax.random.split(kf, k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 4, 20, jax.random.PRNGKey(3))
    return n / dt


def bench_text_embed(batch: int = 2048, seq: int = 32):
    """CLIP text-encoder throughput (prompts/sec) — the vocabulary-embedding
    stage runs ~68k names x 80 templates = 5.4M prompts through it
    (reference loops one name at a time, ``clip_lang_util.py:96-108``).
    Default seq=32: the EOT-bucket truncation the vocab build uses
    (``naming/zeroshot.py::truncate_to_eot_bucket`` — exact for the causal
    EOT-pooled tower; typical vocabulary prompts are 10-20 tokens)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    model = CLIPModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))
    jax.block_until_ready(variables)

    def make_run(k_iters):
        @jax.jit
        def run(v, key):
            def body(acc, k):
                toks = jax.random.randint(k, (batch, seq), 0, 49408,
                                          jnp.int32)
                out = model.apply(v, toks, method=CLIPModel.encode_text)
                return acc + out.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jax.random.split(key, k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 2, 10, variables, jax.random.PRNGKey(4))
    return batch / dt


def bench_vocab_build(n_names: int = 8192, prefix: bool = False):
    """Measured END-TO-END vocabulary build rate (prompts/sec): the real
    builder loop — host tokenization, token upload, text-tower encode,
    on-device ensemble reduction, weight fetch — on a fabricated vocabulary
    with a WordNet-like name-length mix and the 80 ImageNet templates.
    ``prefix=False`` (the pipeline default) runs the full-row sharded
    builder; ``prefix=True`` the opt-in prefix-KV-cached builder
    (``naming/zeroshot.py::build_zeroshot_weights_prefix`` — measured a
    TIE at 20x the cold compile, which is why it is neither the pipeline
    nor the bench default).  Unlike ``bench_text_embed`` (a fixed seq=32
    tower scan) this includes every real overhead, so it is the number
    the ~68k x 80 cold stage scales from."""
    import time

    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, clip_vit_b16_config
    from scd_tpu.models.tokenizer import HashTokenizer
    from scd_tpu.naming.templates import IMAGENET_TEMPLATES
    from scd_tpu.naming.zeroshot import (build_zeroshot_weights_prefix,
                                         build_zeroshot_weights_sharded)

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    model = CLIPModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))
    jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])
    tokenizer = HashTokenizer()

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(997)]
    # WordNet-ish mix: ~60% one-word, 30% two-word, 10% three-word lemmas
    n_words = rng.choice([1, 2, 3], size=n_names, p=[0.6, 0.3, 0.1])
    names = [" ".join(rng.choice(words, k)) for k in n_words]

    fwd = lambda v, t: model.apply(v, t, method=CLIPModel.encode_text)

    def run():
        if prefix:
            return build_zeroshot_weights_prefix(
                fwd,
                lambda v, t: model.apply(
                    v, t, method=CLIPModel.encode_text_prefix),
                lambda v, t, kv, p: model.apply(
                    v, t, kv, p, method=CLIPModel.encode_text_suffix),
                variables, tokenizer, names, IMAGENET_TEMPLATES)
        return build_zeroshot_weights_sharded(
            fwd, variables, tokenizer, names, IMAGENET_TEMPLATES)

    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return n_names * len(IMAGENET_TEMPLATES) / dt


def bench_image_loader(n_images: int = 4096, src_size: int = 256,
                       image_size: int = 224, num_workers: int = 8,
                       batch: int = 256):
    """Host-side threaded image loader throughput (imgs/sec): JPEG decode
    + CLIP eval preprocess (resize/crop, uint8 out) through
    ``data/loader.py::iterate_batches`` — the path the e2e bench excludes
    (its towers consume device-generated images because this
    environment's host->device tunnel is ~50 MB/s, an artifact).  This
    measures the actual decode pipeline so the exclusion carries a
    number: at the measured rate, X imgs/s vs the ~3.3k imgs/s/chip
    encode, N loader threads keep M chips fed.  Purely host work — runs
    (and is comparable) even when the TPU is unreachable."""
    import shutil
    import tempfile

    from PIL import Image

    from scd_tpu.data.core import ImageTable
    from scd_tpu.data.datasets import _pil_loader
    from scd_tpu.data.loader import iterate_batches
    from scd_tpu.data.transforms import clip_preprocess

    tmp = tempfile.mkdtemp(prefix="scd_loader_bench_")
    try:
        rng = np.random.default_rng(0)
        # structured content: pure noise JPEGs are adversarially slow to
        # decode; gradients+noise approximate photo entropy
        base = np.linspace(0, 255, src_size, dtype=np.float32)
        grad = (base[None, :, None] + base[:, None, None]) / 2
        n_unique = 512  # distinct files, cycled — keeps setup O(seconds)
        paths = []
        for i in range(n_unique):
            img = np.clip(grad + rng.normal(0, 40, (src_size, src_size, 3)),
                          0, 255).astype(np.uint8)
            p = os.path.join(tmp, f"img_{i}.jpg")
            Image.fromarray(img, "RGB").save(p, quality=85)
            paths.append(p)
        all_paths = np.array([paths[i % n_unique] for i in range(n_images)],
                             object)
        table = ImageTable(
            source=all_paths, targets=np.zeros(n_images, np.int64),
            uq_idxs=np.arange(n_images, dtype=np.int64), classnames=[],
            load=_pil_loader,
            transform=clip_preprocess(image_size, device_normalize=True))
        # warm (page cache + pool spin-up) on a slice, then time the pass
        for _ in iterate_batches(table.select(np.arange(batch)), batch,
                                 num_workers=num_workers):
            pass
        t0 = time.perf_counter()
        count = 0
        for images, *_rest in iterate_batches(table, batch,
                                              num_workers=num_workers):
            count += len(images)
        dt = time.perf_counter() - t0
        assert count == n_images
        return n_images / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_packed_shard_reader(n_images: int = 8192, image_size: int = 224,
                              batch: int = 256):
    """Host-side packed-shard ingest rate (imgs/sec): stream pre-decoded
    uint8 shards through ``data/shards.py::iterate_shard_batches`` — the
    decode-free counterpart of ``bench_image_loader`` (decode is paid ONCE
    at shard-writing time, so per-epoch ingest is one sequential read per
    shard + zero per-image Python).  Purely host work."""
    import shutil
    import tempfile

    from scd_tpu.data.shards import iterate_shard_batches, write_image_shards

    tmp = tempfile.mkdtemp(prefix="scd_shard_bench_")
    try:
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256,
                            (n_images, image_size, image_size, 3),
                            dtype=np.uint8)

        def src():
            for s in range(0, n_images, batch):
                e = min(s + batch, n_images)
                yield (imgs[s:e], np.zeros(e - s, np.int64),
                       np.arange(s, e), np.zeros(e - s, bool))

        write_image_shards(src(), tmp, shard_size=2048)
        # warm the page cache (production shards live on fast local SSD /
        # are cached after the writing pass)
        for _ in iterate_shard_batches(tmp, batch):
            pass
        t0 = time.perf_counter()
        count = 0
        for images, *_ in iterate_shard_batches(tmp, batch):
            count += len(images)
        dt = time.perf_counter() - t0
        assert count == n_images
        return n_images / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_fed_extract(source: str = "packed", n_images: int = 2048,
                      image_size: int = 224, batch: int = 128,
                      num_workers: int = 8):
    """CLIP-tower extraction fed by REAL host ingest (imgs/sec): uint8
    batches from either packed shards (``source='packed'``) or the
    threaded JPEG loader (``source='jpeg'``) cross host->device and
    normalize on device — the loader-in-the-loop leg the device-generated
    e2e stage excludes (r4 VERDICT item 5).

    Caveat this bench exists to quantify: THIS environment's tunnel moves
    ~50 MB/s, so a host-fed tower caps at ~330 imgs/s on uint8 224^2
    regardless of ingest format (a production TPU VM host link is GB/s
    and the cap disappears; the HOST-side rates are the portable numbers
    — bench_image_loader vs bench_packed_shard_reader)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from scd_tpu.data.transforms import device_normalize_clip
    from scd_tpu.models import CLIPModel, clip_vit_b16_config

    model = CLIPModel(clip_vit_b16_config(compute_dtype=jnp.bfloat16))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))

    @jax.jit
    def step(vv, x_uint8):
        f = model.apply(vv, device_normalize_clip(x_uint8),
                        method=CLIPModel.encode_image)
        return f.astype(jnp.float32).sum()

    tmp = tempfile.mkdtemp(prefix="scd_fed_bench_")
    try:
        rng = np.random.default_rng(0)
        if source == "packed":
            from scd_tpu.data.shards import (iterate_shard_batches,
                                             write_image_shards)

            imgs = rng.integers(0, 256,
                                (n_images, image_size, image_size, 3),
                                dtype=np.uint8)

            def src():
                for s in range(0, n_images, batch):
                    e = min(s + batch, n_images)
                    yield (imgs[s:e], np.zeros(e - s, np.int64),
                           np.arange(s, e), np.zeros(e - s, bool))

            write_image_shards(src(), tmp, shard_size=2048)

            def batches():
                return iterate_shard_batches(tmp, batch)
        elif source == "jpeg":
            from PIL import Image

            from scd_tpu.data.core import ImageTable
            from scd_tpu.data.datasets import _pil_loader
            from scd_tpu.data.loader import iterate_batches
            from scd_tpu.data.transforms import clip_preprocess

            base = np.linspace(0, 255, 256, dtype=np.float32)
            grad = (base[None, :, None] + base[:, None, None]) / 2
            paths = []
            for i in range(256):
                img = np.clip(grad + rng.normal(0, 40, (256, 256, 3)),
                              0, 255).astype(np.uint8)
                p = os.path.join(tmp, f"img_{i}.jpg")
                Image.fromarray(img, "RGB").save(p, quality=85)
                paths.append(p)
            all_paths = np.array([paths[i % 256] for i in range(n_images)],
                                 object)
            table = ImageTable(
                source=all_paths, targets=np.zeros(n_images, np.int64),
                uq_idxs=np.arange(n_images, dtype=np.int64), classnames=[],
                load=_pil_loader,
                transform=clip_preprocess(image_size, device_normalize=True))

            def batches():
                return iterate_batches(table, batch,
                                       num_workers=num_workers)
        else:
            raise ValueError(source)

        # warm: compile + first-batch page cache
        for images, *_ in batches():
            float(step(variables, jnp.asarray(images)))
            break
        t0 = time.perf_counter()
        accs, count = [], 0
        for images, *_ in batches():
            accs.append(step(variables, jnp.asarray(images)))  # async
            count += len(images)
        total = float(sum(a for a in accs))  # one sync at the end
        assert np.isfinite(total) and count == n_images
        dt = time.perf_counter() - t0
        return n_images / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_constrained_estep(n: int = 65536, k: int = 100,
                            size_min: int = 50, size_max: int = 1200):
    """On-device size-constrained E-step (Sinkhorn OT + integral repair,
    ``ops/sinkhorn.py``) at the k-means bench shape.  This is the step the
    reference solves with a HOST min-cost-flow per Lloyd iteration
    (``sskm_constrained.py:116``) — the exact native solver needs seconds
    at this size where the on-device OT needs milliseconds.

    Round-3 breakdown (measured on v5e): the 8 unconditional repair passes
    were 49.6 of the 50.7 ms/step (each pass = 2 argsorts over N plus
    [N, K] masked-min sweeps); the dual loop's tol early-exit already
    converges in ~1-2 iterations at this shape (0.1 ms).  With the
    feasibility early-exit (repair stops the moment counts are in-box —
    an exact no-op skip) this measures 0.50 ms/step (2006 steps/s) at the
    default loose bounds and 7.8 ms/step (128 steps/s) under forced
    rebalancing (size 600-700 exactly)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.sinkhorn import sinkhorn_constrained_assign

    def make_run(k_iters):
        @jax.jit
        def run(key):
            cost = jax.random.uniform(key, (n, k), jnp.float32)

            def body(acc, kk):
                # per-iteration scale keeps the body loop-variant (XLA would
                # hoist a constant-input assignment out of the scan)
                c = cost * (1.0 + kk.astype(jnp.float32) * 1e-7)
                a = sinkhorn_constrained_assign(c, k, size_min, size_max)
                return acc + a.labels.sum() + a.feasible, None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 2, 8, jax.random.PRNGKey(6))
    return 1.0 / dt


def bench_gcd_train(batch: int = 64, n_views: int = 2,
                    int8_frozen: bool = False):
    """GCD contrastive finetuning step (ViT-B/16 bf16, InfoNCE+SupCon,
    fwd+bwd+SGD in one program, reference ``learn_metric.py:217-338``).
    With the reference recipe (grad_from_block=11) backprop stops at the
    last trainable block, so a step costs ~fwd + bwd-of-one-block+head.
    Throughput rises at smaller per-step batches (measured: 2438 imgs/s at
    batch 32, 2113 at 64, 1968 at 128 — the attention-score residency
    effect of the forward sweep), but batch size is part of the training
    recipe, so the bench measures the default recipe shape."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.core.config import TrainConfig
    from scd_tpu.models.vit import ViTConfig
    from scd_tpu.train.gcd import make_gcd_state

    vit_cfg = ViTConfig(image_size=224, patch_size=16, width=768, depth=12,
                        heads=12, compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(grad_from_block=11, proj_dim=65536, lr=0.1,
                      n_views=n_views, int8_frozen=int8_frozen)
    params, opt_state, step = make_gcd_state(
        vit_cfg, cfg, jax.random.PRNGKey(0), total_steps=1000)
    n_img = n_views * batch
    labels = jnp.asarray(np.arange(batch) % 10, jnp.int32)
    mask = jnp.asarray(np.arange(batch) % 2 == 0)

    def make_run(k_iters):
        @jax.jit
        def run(p, o, key):
            base = jax.random.normal(key, (n_img, 224, 224, 3), jnp.float32)

            def body(carry, k):
                p, o, acc = carry
                p, o, m = step(p, o, {"images": _fresh(base, k),
                                      "labels": labels, "mask_lab": mask})
                return (p, o, acc + m["loss"]), None

            (p, o, acc), _ = jax.lax.scan(
                body, (p, o, jnp.zeros((), jnp.float32)),
                jax.random.split(key, k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 2, 8, params, opt_state, jax.random.PRNGKey(5))
    return n_img / dt


def bench_uno_e2e_step(batch: int = 64, n_views: int = 2):
    """UNO v2 end-to-end train step (ViT-B/16 backbone, 2 views, 4 heads,
    Sinkhorn pseudo-labels, swapped CE, fwd+bwd+SGD in one program;
    reference ``uno_v2.py:96-160`` trains the full backbone)."""
    import jax
    import jax.numpy as jnp
    import optax

    from scd_tpu.models import VisionTransformer, dino_vit_b16_config
    from scd_tpu.train.baselines import MultiHeadPrototypes, uno_targets
    from scd_tpu.train.baselines_e2e import _swapped_loss_per_head

    n_labeled, n_unlab = 50, 50
    vit_cfg = dino_vit_b16_config(compute_dtype=jnp.bfloat16)
    backbone = VisionTransformer(vit_cfg)
    heads = MultiHeadPrototypes(num_heads=4, num_prototypes=100)
    feat_dim = vit_cfg.output_proj or vit_cfg.width
    params = {
        "backbone": jax.jit(backbone.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32))["params"],
        "heads": jax.jit(heads.init)(
            jax.random.PRNGKey(1),
            jnp.zeros((1, feat_dim), jnp.float32))["params"],
    }
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    labels = jnp.asarray(np.arange(batch) % n_labeled, jnp.int32)
    mask = jnp.asarray(np.arange(batch) % 2 == 0)

    def loss_fn(p, batch_views):
        flat = batch_views.reshape((-1,) + batch_views.shape[2:])
        feats = backbone.apply({"params": p["backbone"]}, flat)
        feats = feats.reshape(n_views, batch, -1)
        logits = jax.vmap(
            lambda f: heads.apply({"params": p["heads"]}, f)[0])(feats)
        targets = uno_targets(
            jax.lax.stop_gradient(logits[..., n_labeled:]), labels, mask,
            n_labeled)
        return _swapped_loss_per_head(logits, targets, 0.1).mean()

    def train_step(p, o, batch_views):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_views)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def make_run(k_iters):
        @jax.jit
        def run(p, o, key):
            base = jax.random.normal(key, (n_views, batch, 224, 224, 3),
                                     jnp.float32)

            def body(carry, k):
                p, o, acc = carry
                p, o, loss = train_step(p, o, _fresh(base, k))
                return (p, o, acc + loss), None

            (p, o, acc), _ = jax.lax.scan(
                body, (p, o, jnp.zeros((), jnp.float32)),
                jax.random.split(key, k_iters))
            return acc

        return run

    dt = _timed_slope(make_run, 2, 6, params, opt_state,
                      jax.random.PRNGKey(7))
    return n_views * batch / dt


def bench_e2e():
    """Measured end-to-end unsup naming pipeline at ImageNet-100 scale on
    ONE chip (the BASELINE.md north-star check: >=10x the reference's
    single-GPU loop on v5e-8).

    What runs (the real pipeline functions, reference
    ``main_unsup.py:297-641``):

    1. feature extraction x2 — the full CLIP ViT-B/16 image tower (512-d)
       AND the DINO ViT-B/16 tower (768-d) over 130,048 images
       (= the ImageNet-100 GCD merged train set, 1016 batches of 128),
       each pass one scan-chained program.  Images are generated on device
       (CLAUDE.md rule 5: the tunneled host->device link is ~50 MB/s and
       is an artifact of this environment, not the framework; production
       TPU VMs feed from local storage at >GB/s).
    2. SSKM clustering of the 97,536 unlabelled + 32,512 labelled 768-d
       features via ``fit_sskm`` at the REFERENCE's own hyperparameters
       (k=100, n_init=10, max_iterations=10 — ``main_unsup.py:350-351``),
       so the stage comparison is apples-to-apples (round 3 ran n_init=3,
       max_iter=20).  The vmapped-restart design makes the extra restarts
       nearly free: all 10 run in one compiled while_loop.
    3. fused vocabulary softmax->top-k over [130k, 512] x [512, 68k].
    4. the iterative voting loop to fixpoint + ACC v2.
    Stages 2-4 run on class-structured device-generated features (random
    extraction outputs would change CONVERGENCE, not stage cost shape);
    the zeroshot vocabulary build is excluded on both sides (both load it
    from cache — reference ``main_unsup.py:387-395``; cold build is
    benched separately: ~3.2 min/chip, names-sharded ~8x on a mesh).

    Wall times INCLUDE residual jit/remote-compile time not covered by the
    persistent cache — the conservative side of the comparison.

    The reference model (the reference publishes no timing; host-side
    components are MEASURED by running the reference's own code on this
    machine, GPU components modeled):
    extraction 2 passes x 130,048 imgs at the 400 imgs/s nominal
    (REFERENCE_NOMINAL_IMGS_PER_SEC: fp16 CLIP + fp32 DINO torch on the
    repo's cudatoolkit-10.2-era single GPU) = 650 s; SSKM fit_mix with 10
    serialized joblib restarts x max_iterations=10 Lloyd iters
    (``main_unsup.py:350-351`` — the reference CAPS at 10, not ~100 as the
    round-3 model over-charged) of chunked [98k, 100] torch distance +
    host argmin ~= 6 s; chunked top-k + softmax over 68k vocab + D2H
    ~= 5 s; voting: 4 rounds x (vendored-Munkres Hungarian on the vote
    matrix — MEASURED 7.6 s at the 600x600 shape a K=100 x
    num_common_vote=20 pool reaches, ``linear_assignment.py`` imported
    from the reference and timed on this host — + 0.18 s measured
    reference-pattern Counter histograms + ~1.5 s GPU reclassify and
    metric evals) ~= 37 s.
    Total ~698 s => single-chip speedup = 698 / measured; v5e-8
    projection shards extraction (x8 zero-collective dp,
    ``make_sharded_image_encoder``), SSKM (instance axis), and top-k
    (vocab axis) but not the host voting bookkeeping.
    """
    import jax
    import jax.numpy as jnp

    from scd_tpu.cluster import fit_sskm
    from scd_tpu.core.config import ClusterConfig, NamingConfig
    from scd_tpu.metrics import split_cluster_acc_v2
    from scd_tpu.models import (CLIPModel, VisionTransformer,
                                clip_vit_b16_config, dino_vit_b16_config)
    from scd_tpu.naming.loop import voting_loop
    from scd_tpu.naming.vote import topk_names

    n_batches, batch = 1016, 128
    n_images = n_batches * batch          # 130,048
    n_l = 32_512                          # 25% labelled (50 cls x 0.5)
    n_u = n_images - n_l
    k, v, d_feat, d_clip = 100, 68_000, 768, 512
    stages = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        print(f"[bench.e2e] {name}: {stages[name]}s", file=sys.stderr,
              flush=True)
        return out

    # ---- stage 1: extraction (both towers), scan-chained, on-device data
    def run_tower(model, method, seed):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            *(() if method is None else (jnp.zeros((1, 77), jnp.int32),)))

        @jax.jit
        def extract(vv, key):
            base = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

            def body(acc, kk):
                x = _fresh(base, kk)
                f = (model.apply(vv, x) if method is None
                     else model.apply(vv, x, method=method))
                f = f.astype(jnp.float32)
                f = f / jnp.maximum(
                    jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
                # running stats, not the [130k, D] stack: the bench wants
                # the encoder stream cost, not 400 MB of residency
                return acc + f.sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jax.random.split(key, n_batches))
            return acc

        def run():
            return float(extract(variables, jax.random.PRNGKey(seed + 1)))

        return run

    clip_model = CLIPModel(clip_vit_b16_config(compute_dtype=jnp.bfloat16))
    timed("extract_clip_130k", run_tower(
        clip_model, CLIPModel.encode_image, 0))
    # gelu_tanh mirrors the pipeline default (FeatureConfig.gelu_tanh:
    # exact-erf gelu taxes the DINO tower ~21% on the VPU; the tanh
    # approximation sits below the bf16 rounding floor — r4 VERDICT item 2)
    dino = VisionTransformer(dino_vit_b16_config(compute_dtype=jnp.bfloat16,
                                                 gelu_tanh=True))
    timed("extract_dino_130k", run_tower(dino, None, 10))

    # ---- fabricate class-structured features ON DEVICE for stages 2-4
    @jax.jit
    def make_features(key):
        ks = jax.random.split(key, 7)
        feat_c = jax.random.normal(ks[0], (k, d_feat)) * 3.0
        clip_c = jax.random.normal(ks[1], (k, d_clip))
        clip_c = clip_c / jnp.linalg.norm(clip_c, axis=1, keepdims=True)
        u_true = jax.random.randint(ks[2], (n_u,), 0, k)
        l_true = jax.random.randint(ks[3], (n_l,), 0, k // 2)
        u_f = feat_c[u_true] + 0.5 * jax.random.normal(ks[4], (n_u, d_feat))
        l_f = feat_c[l_true] + 0.5 * jax.random.normal(ks[5], (n_l, d_feat))
        c_u = clip_c[u_true] + 0.1 * jax.random.normal(ks[6], (n_u, d_clip))
        c_u = c_u / jnp.linalg.norm(c_u, axis=1, keepdims=True)
        return u_f, l_f, u_true, l_true, c_u, clip_c

    u_feats, l_feats, u_true_d, l_true_d, clip_u, clip_c = make_features(
        jax.random.PRNGKey(42))
    jax.block_until_ready(u_feats)
    u_true = np.asarray(u_true_d)
    l_true = np.asarray(l_true_d)

    # vocabulary with GT columns carrying the class signatures
    @jax.jit
    def make_vocab(key, clip_c):
        w = jax.random.normal(key, (d_clip, v), jnp.float32)
        w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
        stride = v // k
        cols = jnp.arange(k) * stride
        return w.at[:, cols].set(clip_c.T)

    zw = make_vocab(jax.random.PRNGKey(43), clip_c)
    jax.block_until_ready(zw)
    gt_cols = np.arange(k) * (v // k)
    nouns = [f"name_{i}" for i in range(v)]

    # ---- stage 2: SSKM (device-resident features: no host round-trip)
    # reference hyperparameters exactly (main_unsup.py:350-351): n_init=10,
    # max_iterations=10 — the restarts are vmapped into one while_loop
    res = timed("sskm_130k", lambda: fit_sskm(
        jax.random.PRNGKey(0), u_feats, l_feats, l_true,
        ClusterConfig(algorithm="SSKM", n_clusters=k, n_init=10,
                      max_iterations=10)))
    u_preds0 = res.labels[n_l:]

    # ---- stage 3: vocabulary top-k
    name_idx, _vals = timed("vocab_topk_130k", lambda: topk_names(
        clip_u, zw, k=5))

    # ---- stage 4: voting loop + metrics
    def run_vote():
        ncfg = NamingConfig(topk=5, num_common_vote=20, num_common_linear=4)
        vres = voting_loop(nouns, name_idx, clip_u, zw, u_preds0, k, ncfg)
        accs = split_cluster_acc_v2(u_true, np.asarray(vres.u_preds),
                                    u_true < k // 2)
        return vres, accs

    vres, accs = timed("voting_loop", run_vote)

    total = sum(stages.values())
    e2e_rate = n_images / total
    ref_model_s = 698.0  # 650 extract + 6 SSKM@10x10 + 5 topk + 37 voting
    # v5e-8 projection: extraction dp x8 (zero-collective), SSKM instance
    # sharding (conservative x4 of the measured-working mesh path), top-k
    # vocab sharding x8; voting loop host bookkeeping unsharded
    proj8 = (stages["extract_clip_130k"] / 8 + stages["extract_dino_130k"] / 8
             + stages["sskm_130k"] / 4 + stages["vocab_topk_130k"] / 8
             + stages["voting_loop"])
    out = {
        "stages_s": stages,
        "total_s": round(total, 1),
        "imgs_per_sec_1chip": round(e2e_rate, 1),
        "ref_model_s": ref_model_s,
        "speedup_1chip": round(ref_model_s / total, 2),
        "projected_v5e8_s": round(proj8, 1),
        "speedup_v5e8": round(ref_model_s / proj8, 2),
        "voting_iters": vres.n_iters,
        "acc_all": round(float(accs[0]), 4),
    }
    print(f"[bench.e2e] total {out['total_s']}s "
          f"({out['imgs_per_sec_1chip']} imgs/s e2e 1-chip), "
          f"ref model {ref_model_s}s -> x{out['speedup_1chip']} single chip, "
          f"x{out['speedup_v5e8']} projected v5e-8", file=sys.stderr,
          flush=True)
    return out


def main():
    """Failure-proof driver: the single JSON line prints from ``finally``
    NO MATTER WHAT — backend init failure, a bench exception, SIGTERM from
    a harness timebox — carrying an ``error`` field plus whatever metrics
    completed, and the process exits 0.  Round 3 lost its entire perf
    record to one transient backend error that escaped ``main()``
    (``BENCH_r03.json``: rc=1, parsed=null); the contract now is that the
    driver can ALWAYS parse the line."""
    import signal
    import threading

    # A harness timebox sends SIGTERM; convert it to an exception so the
    # finally-block JSON still prints (SIGKILL is uncatchable — the soft
    # deadline below exists to finish well before any hard kill).
    def _on_term(signum, frame):
        raise SystemExit(f"terminated by signal {signum}")

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass

    out = {
        "metric": "clip_embed_imgs_per_sec_per_chip",
        "value": None,
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "flops_per_img": CLIP_VIT_B16_FLOPS_PER_IMG,
        "tflops_per_sec": None,
        "mfu": None,
        "peak_tflops": None,
        "secondary": {},
        "e2e": None,
        "error": None,
    }
    errors = []

    # Exactly-once JSON emission shared by the normal path and the
    # watchdog: backend bring-up can HANG (observed: jax.devices() blocked
    # >500 s with no exception — a failure mode retries never see), so a
    # daemon thread hard-emits the line and exits 0 if main() wedges past
    # the hard cap.  SIGTERM/exception paths go through the same helper.
    emit_lock = threading.Lock()
    emitted = threading.Event()
    done = threading.Event()

    def emit_json():
        with emit_lock:
            if emitted.is_set():
                return
            emitted.set()
            if errors:
                out["error"] = "; ".join(list(errors))
            # snapshot before serializing: the watchdog can fire while the
            # main thread inserts into out["secondary"], and json.dumps
            # iterating a mutating dict raises — which would suppress the
            # JSON line this function exists to guarantee.  dict copies
            # are single C-level ops (atomic under the GIL).
            snap = {**out, "secondary": dict(out["secondary"])}
            try:
                line = json.dumps(snap)
            except Exception as e:  # belt and braces: ALWAYS print a line
                line = json.dumps({
                    "metric": out["metric"], "value": None,
                    "unit": out["unit"], "vs_baseline": None,
                    "error": f"emit failed: {type(e).__name__}: {e}"})
            print(line, flush=True)

    hard_cap_s = float(os.environ.get(
        "SCD_BENCH_HARD_CAP_S",
        float(os.environ.get("SCD_BENCH_DEADLINE_S", 2700)) + 900))

    def watchdog():
        if not done.wait(hard_cap_s):
            errors.append(f"watchdog: still running after {hard_cap_s:.0f}s "
                          "(hung backend init or compile) — emitting and "
                          "exiting")
            print(f"[bench] {errors[-1]}", file=sys.stderr, flush=True)
            emit_json()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    # Soft deadline: remote compiles have huge variance (90-590 s observed
    # for one program); if the harness timeboxes this script, dying
    # mid-stage would lose the JSON line entirely.  Stages check the
    # elapsed budget and skip rather than start something they might not
    # finish — the headline metric always prints.
    t_start = time.perf_counter()
    deadline_s = float(os.environ.get("SCD_BENCH_DEADLINE_S", 2700))

    def budget_left(stage: str, need_s: float) -> bool:
        left = deadline_s - (time.perf_counter() - t_start)
        if left < need_s:
            print(f"[bench] skipping {stage}: {left:.0f}s of budget left "
                  f"(needs ~{need_s:.0f}s worst-case compile+run; set "
                  "SCD_BENCH_DEADLINE_S to raise)", file=sys.stderr)
            return False
        return True

    try:
        peak = init_backend()
        known_peak = np.isfinite(peak)
        # null (not NaN) for unknown device kinds — NaN isn't strict JSON
        out["peak_tflops"] = peak if known_peak else None

        from scd_tpu.utils.runtime import enable_compilation_cache

        enable_compilation_cache()

        try:
            imgs_per_sec = bench_clip_embed()
            tflops = imgs_per_sec * CLIP_VIT_B16_FLOPS_PER_IMG / 1e12
            mfu = tflops / peak if known_peak else float("nan")
            out["value"] = round(imgs_per_sec, 1)
            out["vs_baseline"] = round(
                imgs_per_sec / REFERENCE_NOMINAL_IMGS_PER_SEC, 2)
            out["tflops_per_sec"] = round(tflops, 1)
            out["mfu"] = round(mfu, 4) if known_peak else None
            print(f"[bench] clip_embed: {imgs_per_sec:.1f} imgs/sec/chip "
                  f"({tflops:.1f} TFLOP/s, MFU {mfu * 100:.1f}% of "
                  f"{peak:.0f} peak, "
                  f"{CLIP_VIT_B16_FLOPS_PER_IMG / 1e9:.2f} GFLOP/img at "
                  "2/MAC; extraction dp-shards over a mesh with zero "
                  "collectives — make_sharded_image_encoder projects "
                  f"~{imgs_per_sec * 8 / 1000:.1f}k imgs/s on v5e-8)",
                  file=sys.stderr)
        except Exception as e:  # headline must not kill the secondaries
            errors.append(f"headline: {type(e).__name__}: {e}")
            print(f"[bench] headline failed: {e}", file=sys.stderr)

        def secondary(name, need_s, fn, fmt):
            """Each secondary bench is individually fenced: one failure is
            recorded and the rest still run."""
            if not budget_left(name, need_s):
                return
            try:
                val = fn()
                out["secondary"][name] = (
                    [round(v, 2) for v in val] if isinstance(val, tuple)
                    else round(val, 2))
                print(f"[bench] {fmt(val)}", file=sys.stderr)
            except Exception as e:
                errors.append(f"{name}: {type(e).__name__}: {e}")
                print(f"[bench] {name} failed: {e}", file=sys.stderr)

        secondary(
            "clip_embed_int8_imgs_per_sec", 300,
            lambda: bench_clip_embed(dense_int8=True),
            lambda r: f"clip_embed W8A8 int8 dense: {r:.1f} imgs/sec/chip "
                      "(measured SLOWER than the bf16 tower on v5e — "
                      "published as the honest record for the --int8 knob; "
                      "feature-drift bounds in tests/test_models_extra.py)")
        secondary(
            "kmeans_iters_per_sec", 300, lambda: bench_kmeans_iter()[0],
            lambda km: f"kmeans_em_iter DEFAULT path (estep='auto' parity "
                       f"probe; N=65536,D=768,K=100->128pad): "
                       f"{km:.2f} iters/sec")
        secondary(
            "kmeans_iters_per_sec_exact", 300,
            lambda: bench_kmeans_iter(em_kwargs={"estep_passes": 3})[0],
            lambda km: f"kmeans_em_iter exact 3-pass variant: "
                       f"{km:.2f} iters/sec")
        secondary(
            "kmeans_iters_per_sec_2pass", 300,
            lambda: bench_kmeans_iter(em_kwargs={"estep_passes": 2})[0],
            lambda km: f"kmeans_em_iter 2-pass variant: {km:.2f} iters/sec")
        secondary(
            "kmeans_iters_per_sec_xbf16", 300,
            lambda: bench_kmeans_iter(em_kwargs={"x_bf16": True})[0],
            lambda km: f"kmeans_em_iter x-bf16-storage variant: "
                       f"{km:.2f} iters/sec")
        secondary(
            "vocab_topk_imgs_per_sec", 300, bench_vocab_topk,
            lambda tk: f"vocab softmax-topk (V=68k): {tk:.0f} imgs/sec")
        secondary(
            "text_prompts_per_sec", 300, bench_text_embed,
            lambda tx: f"clip text encoder (seq=32 EOT bucket): {tx:.0f} "
                       f"prompts/sec (68k-name x 80-template vocab in "
                       f"~{5.44e6 / tx / 60:.1f} min/chip; names axis "
                       "shards ~linearly over a mesh)")
        secondary(
            "vocab_build_prompts_per_sec", 300,
            lambda: bench_vocab_build(prefix=False),
            lambda vb: f"vocabulary build, full-row builder (DEFAULT; "
                       f"measured end-to-end incl. host tokenize/upload/"
                       f"fetch): {vb:.0f} prompts/sec (68k x 80 in "
                       f"~{5.44e6 / vb / 60:.1f} min/chip)")
        if os.environ.get("SCD_BENCH_PREFIX_VOCAB", "0") == "1":
            # opt-in: the prefix-KV-cached builder's cold compile is
            # ~636s on this transport — measured a warm TIE with the
            # full-row builder (see build_zeroshot_weights_prefix), so
            # it neither defaults in the pipeline nor in the bench.
            secondary(
                "vocab_build_prefix_prompts_per_sec", 1200,
                lambda: bench_vocab_build(prefix=True),
                lambda vb: f"vocabulary build, prefix-KV-cached opt-in: "
                           f"{vb:.0f} prompts/sec "
                           f"(~{5.44e6 / vb / 60:.1f} min/chip)")
        secondary(
            "loader_imgs_per_sec", 120, bench_image_loader,
            lambda lr: f"threaded JPEG loader (decode+preprocess, 8 "
                       f"threads): {lr:.0f} imgs/sec host-side "
                       f"({lr / 3300:.2f} chips fed at the 3.3k "
                       "imgs/s/chip encode rate; production TPU VMs scale "
                       "loader threads with host cores)")
        secondary(
            "packed_shard_imgs_per_sec", 120, bench_packed_shard_reader,
            lambda sr: f"packed uint8 shard reader (pre-decoded, one "
                       f"sequential read/shard): {sr:.0f} imgs/sec "
                       f"host-side ({sr / 3300:.2f} chips fed — decode "
                       "paid once at shard-writing time)")
        secondary(
            "extract_fed_packed_imgs_per_sec", 180,
            lambda: bench_fed_extract("packed"),
            lambda r: f"CLIP extraction FED from packed shards via "
                      f"host->device: {r:.0f} imgs/sec (tunnel-bound here "
                      "at ~50 MB/s uint8; see bench_fed_extract caveat)")
        secondary(
            "extract_fed_jpeg_imgs_per_sec", 300,
            lambda: bench_fed_extract("jpeg"),
            lambda r: f"CLIP extraction FED from the JPEG loader via "
                      f"host->device: {r:.0f} imgs/sec (host decode + "
                      "tunnel in the loop)")
        secondary(
            "constrained_estep_steps_per_sec", 300, bench_constrained_estep,
            lambda ce: f"constrained E-step, on-device sinkhorn+repair "
                       f"(N=65536,K=100): {ce:.1f} steps/sec "
                       f"({1000.0 / ce:.0f} ms/step; the exact host MCF "
                       "needs seconds at this shape)")
        secondary(
            "gcd_train_imgs_per_sec", 600, bench_gcd_train,
            lambda gt: f"gcd train step (ViT-B/16 bf16, fwd+bwd@block11"
                       f"+SGD): {gt:.0f} imgs/sec/chip")
        secondary(
            "gcd_train_int8frozen_imgs_per_sec", 600,
            lambda: bench_gcd_train(int8_frozen=True),
            lambda gt: f"gcd train step, int8 frozen trunk (blocks 0-10 "
                       f"W8A8, trainable bf16): {gt:.0f} imgs/sec/chip")
        secondary(
            "uno_e2e_imgs_per_sec", 900, bench_uno_e2e_step,
            lambda ue: f"uno_v2 e2e train step (ViT-B/16 bf16 full-backbone "
                       f"fwd+bwd, 2 views, 4 heads, sinkhorn "
                       f"pseudo-labels): {ue:.0f} imgs/sec/chip")

        if not os.environ.get("SCD_BENCH_SKIP_E2E") and budget_left(
                "e2e", 600):
            try:
                out["e2e"] = bench_e2e()
            except Exception as e:  # e2e must not kill the headline either
                errors.append(f"e2e: {type(e).__name__}: {e}")
                print(f"[bench] e2e failed: {e}", file=sys.stderr)
    except BaseException as e:  # incl. SystemExit from the SIGTERM handler
        errors.append(f"{type(e).__name__}: {e}")
        print(f"[bench] fatal: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        done.set()
        emit_json()


if __name__ == "__main__":
    main()
    sys.exit(0)
