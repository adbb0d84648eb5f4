"""Vision Transformer in Flax, covering both backbone families the pipeline
needs (reference Lx layer, SURVEY §2.6):

- **DINO ViT-B/16** (reference ``gcd/models/vision_transformer.py``):
  standard pre-norm ViT, GELU MLP, learned cls token + pos embed with
  bicubic interpolation for off-grid image sizes, CLS-token output.
- **CLIP visual ViT-B/16** (reference loads ``clip.load("ViT-B/16")``):
  same skeleton plus pre/post layernorms, QuickGELU activation, and a
  D->proj_dim output projection.

One parameterized module instead of two ports: the differences are config
flags.  All matmuls carry ``preferred_element_type=float32``; activations
can run bf16 (``compute_dtype``) with fp32 layernorms/accumulation — the
standard TPU recipe.  Attention uses ``jax.nn.dot_product_attention`` so XLA
lowers it to the fused path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    quick_gelu: bool = False  # CLIP uses x*sigmoid(1.702x)
    gelu_tanh: bool = False  # tanh-approx gelu (throughput option, see Mlp)
    pre_post_norm: bool = False  # CLIP: ln_pre / ln_post around the trunk
    output_proj: Optional[int] = None  # CLIP: project CLS to this dim
    patch_bias: bool = True  # CLIP conv has no bias
    # LayerNorm epsilon: DINO/timm ViTs train with 1e-6 (the flax
    # default); OpenAI CLIP uses torch's 1e-5 — a systematic O(1e-5)
    # activation drift over 24+ norms if mismatched
    norm_eps: float = 1e-6
    compute_dtype: Any = jnp.float32
    # W8A8 dynamic quantization of the dense layers (qkv/fc1, plus proj —
    # fc2 stays bf16, its 4x-wide input tiles badly).  Per-token
    # activation scales + per-output-channel weight scales, int32
    # accumulation; attention math and layernorms stay bf16/f32.
    # Inference-only knob (quantization is not differentiated); parameter
    # tree is IDENTICAL to the f32 path, so every checkpoint loader works
    # unchanged.  MEASURED r5 on v5e: the fused Pallas kernel wins 30-75%
    # per GEMM site but every composed ViT-B/16 tower still LOSES 8-24%
    # vs bf16 (pad-to-208 wall cost + pallas_call fusion barriers — see
    # README "Quantized inference").  Keep it off at this scale; the path
    # is parity-pinned for hardware/models where the tradeoff flips.
    dense_int8: bool = False
    # Rematerialize each transformer block under autodiff
    # (jax.checkpoint): activations are recomputed in the backward pass
    # instead of stored, cutting trunk activation memory from O(depth) to
    # O(1) blocks — at ViT-B/16 batch 256x2 views the [B,12,197,197]
    # attention scores alone are ~14 GB live without it.  ~1/3 extra
    # forward FLOPs; forward-only use (extraction/serving) is unaffected
    # because nothing is saved for backward anyway.  The parameter tree is
    # identical (flax lifted transforms preserve module paths), so every
    # checkpoint loader works unchanged.
    remat: bool = False
    # Quantize only blocks i < dense_int8_until (ignored when dense_int8
    # is already True).  The partial-freeze training recipe
    # (grad_from_block=11) never backpropagates into blocks 0-10 — their
    # forward is pure inference, so the frozen trunk can ride the int8
    # MXU path while trainable blocks keep exact bf16 gradients (the
    # frozen blocks' cotangents are dead code XLA eliminates).
    dense_int8_until: Optional[int] = None
    # Token-sequence padding for the int8 path.  ViT-B/16's L=197 is not
    # sublane-tile aligned (f32 tiles are (8,128), bf16 (16,128)), so a
    # [B, L, D] -> [B*L, D] flatten costs a full relayout copy of the
    # activations AND the dense output per quantized layer — measured r5
    # on v5e: 1.73 ms vs 0.44 ms for the SAME W8A8 GEMM fed 2-D.  Padding
    # L up to a multiple of 16 (197 -> 208, +5.6% FLOPs) makes the
    # flatten a free bitcast and lets every int8 site ride the fast 2-D
    # Pallas kernel (272 vs 158 TFLOP/s for the rank-3 one).  Pad KEYS
    # are masked to -inf in attention, so real-token outputs are
    # mathematically identical (exp(-inf)=0 exactly; only the contraction
    # length changes).  "auto" = pad to a multiple of 16 iff the int8
    # path is active; an int forces that length; 0/None never pads.
    pad_seq_to: Any = "auto"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def seq_pad_target(cfg: "ViTConfig", real_len: int) -> int:
    """Resolve ``cfg.pad_seq_to`` (see its comment) for a concrete
    sequence length; returns the padded length (>= real_len)."""
    p = cfg.pad_seq_to
    if p == "auto":
        int8_on = cfg.dense_int8 or cfg.dense_int8_until is not None
        return -(-real_len // 16) * 16 if int8_on else real_len
    return max(int(p or 0), real_len)


class Int8Dense(nn.Module):
    """Dense with W8A8 dynamic quantization for the MXU's int8 path.

    Weights quantize per OUTPUT channel (symmetric, amax/127), activations
    per TOKEN row, both in-graph: the weight-quant ops are loop-invariant
    inside the extraction scan and the activation pass is O(N*D) VPU work
    against an O(N*D*F) MXU matmul.  Param names/shapes match nn.Dense
    (``kernel``/``bias``) so checkpoints load identically.

    On TPU the whole layer — activation quantization, int8 matmul,
    dequant, bias, optional activation — runs as ONE Pallas kernel
    (``ops.pallas_kernels.dense_w8a8_fusedq_pallas``), because BOTH
    halves of the naive design lose on this hardware (all measured r5
    on v5e):  XLA's own int8 dot lowering does not reach the MXU int8
    path (0.42x the bf16 rate — why r4's --int8 knob LOST 14%), and a
    kernel fed PRE-quantized activations pays an XLA-side quant chain
    whose HBM round-trips (abs-max + round + int8 x / f32 s_x per
    layer) turn per-GEMM wins into an 18% tower loss.  The fused kernel
    reads bf16 activations directly — the same HBM traffic as the bf16
    dense it replaces — and quantizes in VMEM.  Off-TPU (and for
    untileable shapes) the XLA graph below is the reference semantics
    the kernels are tested against (quantization-boundary rounding may
    differ by 1 ulp of s_x between compilers — parity contracts are
    step-bounded, not bitwise; see tests/test_pallas_kernels.py).

    ``out_dtype``: the kernel writes this dtype straight out of the
    epilogue (an f32 [N, F] round-trip would cost more HBM than the int8
    matmul saves); None keeps the legacy f32 output."""

    features: int
    use_bias: bool = True
    out_dtype: Any = None
    # Epilogue activation fused into the kernel (None | "quick_gelu" |
    # "gelu_tanh" | "gelu"): XLA fuses GELU into its own matmul
    # epilogues, so an int8 fc1 WITHOUT this pays a separate elementwise
    # HBM pass over the [N, 4*width] output the bf16 dense never pays
    # (~0.4 ms/ViT-B block — most of the r5-measured int8 tower gap).
    # Fallback paths apply the same activation outside the kernel.
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        lead = x.shape[:-1]
        x32 = x.astype(jnp.float32)
        w32 = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True),
                          1e-12) / 127.0  # [1, out]
        wq = jnp.round(w32 / s_w).astype(jnp.int8)

        out_dtype = self.out_dtype or jnp.float32
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            from scd_tpu.ops.pallas_kernels import (
                dense_w8a8_fusedq_pallas, dense_w8a8_pallas,
                dense_w8a8_pallas_3d, w8a8_block_sizes, w8a8_block_sizes_3d,
                w8a8_fusedq_block_sizes)
            zero_b = jnp.zeros((self.features,), jnp.float32)
            # Primary path: the fused-activation-quant kernel.  x streams
            # in as bf16 (exactly what the bf16 dense it replaces would
            # read — XLA fuses the cast into the producing layernorm) and
            # quantizes in VMEM, so the int8 path adds ZERO HBM traffic
            # over bf16 while the MXU runs double-rate.  The XLA-side
            # quant chain below (abs-max + round + int8/scale HBM
            # round-trips per layer) measured r5 turned per-GEMM wins
            # into an 18% tower LOSS — it survives only as the
            # off-TPU/untileable-shape reference semantics.  Needs a 2-D
            # tile-aligned view: [B, L, D] flattens freely when L % 16
            # == 0 (ViTs opt in via ViTConfig.pad_seq_to, 197 -> 208).
            xv = None
            if x.ndim == 2:
                xv = x
            elif x.ndim == 3 and x.shape[1] % 16 == 0:
                xv = x.reshape(-1, in_dim)
            if xv is not None and w8a8_fusedq_block_sizes(
                    xv.shape[0], in_dim, self.features) is not None:
                y = dense_w8a8_fusedq_pallas(
                    xv.astype(jnp.bfloat16), wq, s_w,
                    bias if bias is not None else zero_b,
                    out_dtype=out_dtype, act=self.act)
                return y.reshape(*lead, self.features)
            # flatten-first for the pre-quantized 2-D kernel: same
            # alignment rule; flatten BEFORE quantizing so xq/s_x are
            # born 2-D (the 2-D kernel runs ~1.7x the rank-3 one,
            # 272 vs 158 TFLOP/s measured r5)
            if (x.ndim == 3 and x.shape[1] % 16 == 0
                    and w8a8_block_sizes(x.shape[0] * x.shape[1], in_dim,
                                         self.features) is not None):
                x32 = x32.reshape(-1, in_dim)

        s_x = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                          1e-12) / 127.0  # [..., 1]
        xq = jnp.round(
            jnp.clip(x32 / s_x, -127.0, 127.0)).astype(jnp.int8)

        y = None
        if on_tpu:
            if (xq.ndim == 2 and w8a8_block_sizes(
                    xq.shape[0], in_dim, self.features) is not None):
                y = dense_w8a8_pallas(
                    xq, wq, s_x, s_w,
                    bias if bias is not None else zero_b,
                    out_dtype=out_dtype)
            elif xq.ndim == 3:
                # rank-3 kernel: the fallback when L is NOT tile-aligned
                # — flattening there costs a relayout copy of x AND the
                # output per call, measured 4x the GEMM itself (see
                # _w8a8_kernel3)
                bb, ll = xq.shape[0], xq.shape[1]
                if w8a8_block_sizes_3d(bb, ll, in_dim,
                                       self.features) is not None:
                    y = dense_w8a8_pallas_3d(
                        xq, wq, s_x, s_w,
                        bias if bias is not None else zero_b,
                        out_dtype=out_dtype)

        if y is None:
            y = jax.lax.dot_general(
                xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * s_x * s_w
            if bias is not None:
                y = y + bias
            y = y.astype(out_dtype)
        if self.act is not None:
            # fallback paths apply the fused-path epilogue activation
            # outside the kernel (same math, at out_dtype)
            from scd_tpu.ops.pallas_kernels import _w8a8_act
            y = _w8a8_act(y, self.act)
        return y.reshape(*lead, self.features)


def _dense(cfg: "ViTConfig", features: int, name: str,
           int8_site: bool = True):
    """nn.Dense or its int8-quantized drop-in, per ``cfg.dense_int8``.

    ``int8_site=False`` keeps a layer bf16 even under dense_int8:
    quantization only pays where the int8 kernel's win exceeds the
    activation-quantization chain's cost.  Measured r5 on v5e (ViT-B
    shapes, N=25216, sound harness): qkv 285us int8 vs 554us bf16 and
    fc1 453 vs 739 are clear wins even after the ~110us quant chain;
    proj (768->768) is 181 vs 185 — a wash that the quant chain turns
    into a loss — and fc2's 3072-wide input makes ITS quant chain ~4x
    dearer (619+~440 vs 739).  So only qkv/fc1 quantize."""
    if cfg.dense_int8 and int8_site:
        # the kernel epilogue writes the compute dtype directly — the
        # callers' .astype(compute_dtype) becomes a no-op instead of an
        # f32 [N, F] HBM round-trip
        return Int8Dense(features, name=name, out_dtype=cfg.compute_dtype)
    return nn.Dense(features, dtype=cfg.compute_dtype, name=name)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.width * c.mlp_ratio)
        # exact-erf gelu is the DINO parity default but taxes the tower
        # ~21% on v5e (measured at ViT-B/16 b128: 2480 imgs/s exact vs
        # 2997 with gelu_tanh / 3016 with a sigmoid activation — the erf
        # chain upcasts and runs the VPU at f32 width).  gelu_tanh opts
        # into the tanh approximation, whose deviation from exact gelu
        # (<~0.3% abs) sits at the bf16 compute dtype's own rounding
        # floor (tests/test_models_extra.py pins the closeness).
        # exact-erf gelu CANNOT fuse into the kernel (Mosaic has no erf
        # lowering — NotImplementedError: erfc, verified r5), so it
        # stays an outside op under int8 too
        act = ("quick_gelu" if c.quick_gelu
               else ("gelu_tanh" if c.gelu_tanh else None))
        if c.dense_int8 and act is not None:
            # activation fused into the int8 kernel epilogue (see
            # Int8Dense.act); cast is a no-op (kernel writes compute
            # dtype directly)
            x = Int8Dense(hidden, name="fc1", out_dtype=c.compute_dtype,
                          act=act)(x).astype(c.compute_dtype)
        else:
            # cast back to the compute dtype: a f32 residual/activation
            # stream would double HBM traffic
            x = _dense(c, hidden, "fc1")(x).astype(c.compute_dtype)
            if c.quick_gelu:
                x = quick_gelu(x)
            else:
                x = nn.gelu(x, approximate=c.gelu_tanh)
        # fc2: its 4*width input makes the quant chain cost ~4x the win
        x = _dense(c, c.width, "fc2", int8_site=False)(x).astype(
            c.compute_dtype)
        return x


def _prefix_attention(q, k, v, pk, pv, scale, prefix_valid):
    """Causal attention whose queries also see a cached shared prefix.

    q/k/v: [B, S, H, d] suffix-token projections; pk/pv: [P, H, d] cached
    prefix keys/values SHARED across the batch (broadcast inside the
    einsums — the [B, P, H, d] expansion is never materialized in HBM);
    prefix_valid: [P] bool masking prefix PAD keys to -inf.  Key order
    [prefix, suffix] matches the full-sequence layout, so the softmax sees
    the same operands in the same order as the uncached forward (prefix
    activations in a causal tower depend only on prefix tokens, which is
    what makes the cache exact).  Scores stay at the compute dtype
    (bf16 on TPU — see ``_manual_attention_bf16``); softmax reductions
    accumulate in f32.
    """
    dt = q.dtype
    s_pre = jnp.einsum("bshd,phd->bhsp", q, pk) * jnp.asarray(scale, dt)
    s_pre = jnp.where(prefix_valid[None, None, None, :], s_pre, -jnp.inf)
    s_suf = jnp.einsum("bshd,bmhd->bhsm", q, k) * jnp.asarray(scale, dt)
    S = s_suf.shape[-1]
    tri = jnp.tril(jnp.ones((S, S), jnp.bool_))
    s_suf = jnp.where(tri[None, None], s_suf, -jnp.inf)
    s = jnp.concatenate([s_pre, s_suf], axis=-1)  # [B, H, S, P+S]
    m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp(s.astype(jnp.float32) - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
    P = pk.shape[0]
    out = jnp.einsum("bhsp,phd->bshd", p[..., :P], pv)
    return out + jnp.einsum("bhsm,bmhd->bshd", p[..., P:], v)


def _manual_attention_bf16(q, k, v, scale, causal, key_valid=None):
    """Softmax attention with bf16 score storage; reductions accumulate in
    f32 (reading bf16 from HBM) so stability costs no extra traffic.
    q/k/v: [B, L, H, d] -> [B, L, H, d].  ``key_valid`` ([L] bool or None)
    masks pad KEYS to -inf: exp(-inf)=0 exactly, so real-token outputs
    are unchanged by sequence padding (see ViTConfig.pad_seq_to)."""
    s = jnp.einsum("blhd,bmhd->bhlm", q, k) * jnp.bfloat16(scale)  # bf16
    if key_valid is not None:
        s = jnp.where(key_valid[None, None, None, :], s, -jnp.inf)
    if causal:
        L = s.shape[-1]
        tri = jnp.tril(jnp.ones((L, L), jnp.bool_))
        s = jnp.where(tri[None, None], s, -jnp.inf)
    m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp(s.astype(jnp.float32) - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(jnp.bfloat16)
    return jnp.einsum("bhlm,bmhd->blhd", p, v)


class Attention(nn.Module):
    cfg: ViTConfig
    # real (unpadded) sequence length when the trunk runs with
    # pad_seq_to padding: keys >= real_len are masked out so pad tokens
    # never leak into real ones (module attribute, not a call arg, so
    # the remat lift stays free of static_argnums)
    real_len: Optional[int] = None

    @nn.compact
    def __call__(self, x, causal: bool = False, prefix_kv=None,
                 prefix_valid=None, return_kv: bool = False):
        """``prefix_kv``: optional ((k, v) each [P, H, d]) cached prefix
        projections shared by the whole batch; queries attend
        [prefix, own-causal] (see ``_prefix_attention``).  ``return_kv``
        additionally returns this layer's (k, v) head projections — the
        cache a later prefix-consuming call feeds back in.  Both power the
        prefix-cached vocabulary build (``naming/zeroshot.py``)."""
        c = self.cfg
        B, L, D = x.shape
        head_dim = c.width // c.heads
        qkv = _dense(c, 3 * c.width, "qkv")(x).astype(c.compute_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        key_valid = None
        if self.real_len is not None and self.real_len < L:
            key_valid = jnp.arange(L) < self.real_len

        def heads(t):
            return t.reshape(B, L, c.heads, head_dim)

        kv_out = (heads(k), heads(v)) if return_kv else None
        if prefix_kv is not None:
            pk, pv = prefix_kv
            out = _prefix_attention(heads(q), heads(k), heads(v), pk, pv,
                                    float(head_dim) ** -0.5, prefix_valid)
        elif c.compute_dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
            # Manual attention with bf16 score storage: the [B, H, L, L]
            # score tensor is the tower's largest HBM round-trip (~1.9 GB
            # /layer at B=256 in f32) and the VPU softmax dominates over
            # the MXU at ViT sequence lengths.  Keeping scores bf16 halves
            # that traffic (~20% step-time win measured on v5e); max/sum
            # reductions accumulate in f32 so softmax stays stable.
            # (A fused Pallas kernel — ops/pallas_kernels.py
            # qkv_attention_pallas — measured SLOWER than this XLA path at
            # ViT-B shapes: per-head 64-lane slicing forces relayouts and
            # the small [L, 64] matmuls underfill the MXU.)
            out = _manual_attention_bf16(heads(q), heads(k), heads(v),
                                         float(head_dim) ** -0.5, causal,
                                         key_valid=key_valid)
        else:
            mask = None
            if causal:
                mask = jnp.tril(jnp.ones((L, L), jnp.bool_))[None, None]
            if key_valid is not None:
                km = key_valid[None, None, None, :]
                mask = km if mask is None else jnp.logical_and(mask, km)
            out = jax.nn.dot_product_attention(
                heads(q), heads(k), heads(v), mask=mask)
        out = out.reshape(B, L, D)
        # proj: 768->768 int8 is a measured wash before quant-chain cost
        out = _dense(c, c.width, "proj", int8_site=False)(out).astype(
            c.compute_dtype)
        return (out, kv_out) if return_kv else out


class Block(nn.Module):
    cfg: ViTConfig
    real_len: Optional[int] = None  # see Attention.real_len

    @nn.compact
    def __call__(self, x, causal: bool = False, prefix_kv=None,
                 prefix_valid=None, return_kv: bool = False):
        c = self.cfg
        y = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                         name="norm1")(x)
        attn = Attention(c, real_len=self.real_len,
                         name="attn")(y, causal=causal, prefix_kv=prefix_kv,
                                      prefix_valid=prefix_valid,
                                      return_kv=return_kv)
        kv = None
        if return_kv:
            attn, kv = attn
        x = x + attn
        y = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                         name="norm2")(x)
        x = x + Mlp(c, name="mlp")(y)
        return (x, kv) if return_kv else x


class VisionTransformerWithLinear(nn.Module):
    """ViT trunk + linear classifier on the CLS feature (reference
    ``vision_transformer.py:301-322``); returns (logits, features)."""

    cfg: "ViTConfig"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        feats = VisionTransformer(self.cfg, name="base_vit")(images)
        # the reference L2-normalizes before the head and returns the
        # NORMALIZED features (vision_transformer.py:316-319) — raw-scale
        # logits would shift the max-softmax OSR thresholding downstream
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = nn.Dense(self.num_classes, name="linear")(feats)
        return logits, feats


def interpolate_pos_embed(pos: jnp.ndarray, new_grid: int) -> jnp.ndarray:
    """Bicubic pos-embed interpolation for off-grid inputs (reference
    ``vision_transformer.py:175-191``).  ``pos``: [1, 1+g*g, D]."""
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    g = int(np.sqrt(patch_pos.shape[1]))
    if g == new_grid:
        return pos
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(1, g, g, d)
    grid = jax.image.resize(grid, (1, new_grid, new_grid, d), method="bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, new_grid * new_grid, d)],
                           axis=1)


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] (NHWC) -> features [B, width or output_proj]."""
        c = self.cfg
        B, H, W, _ = images.shape
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size),
                    use_bias=c.patch_bias, dtype=c.compute_dtype,
                    name="patch_embed")(images.astype(c.compute_dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, c.width)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.width)).astype(x.dtype), x],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.seq_len, c.width))
        x = x + interpolate_pos_embed(pos, gh).astype(x.dtype)

        # pad the sequence to a tile-aligned length for the int8 path
        # (see ViTConfig.pad_seq_to); pad keys are masked in attention,
        # pad rows are dead work that never feeds back into real tokens
        # (LN/MLP are per-token, the CLS readout is row 0)
        real_len = x.shape[1]
        pad_to = seq_pad_target(c, real_len)
        rl = None
        if pad_to > real_len:
            x = jnp.pad(x, ((0, 0), (0, pad_to - real_len), (0, 0)))
            rl = real_len

        if c.pre_post_norm:
            x = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                             name="ln_pre")(x)
        # causal is never passed here (vision trunk), so the remat-lifted
        # Block sees only array args and needs no static_argnums
        block_cls = nn.remat(Block) if c.remat else Block
        for i in range(c.depth):
            bc = c
            if c.dense_int8_until is not None and not c.dense_int8:
                bc = dataclasses.replace(c,
                                         dense_int8=i < c.dense_int8_until)
            x = block_cls(bc, real_len=rl, name=f"block_{i}")(x)
        # final norm on the CLS row only: LayerNorm is per-token, so
        # norm(x)[:, 0] == norm(x[:, :1])[:, 0] exactly — the DINO
        # reference norms all 197 tokens and keeps 1
        # (vision_transformer.py forward); the other 196 are dead work
        final = "ln_post" if c.pre_post_norm else "norm"
        x = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                         name=final)(x[:, :1])[:, 0]

        if c.output_proj is not None:
            proj = self.param("proj", nn.initializers.normal(c.width ** -0.5),
                              (c.width, c.output_proj))
            x = jnp.dot(x.astype(jnp.float32), proj,
                        preferred_element_type=jnp.float32)
        return x.astype(jnp.float32)
