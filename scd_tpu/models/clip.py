"""CLIP ViT-B/16 (image + text) in Flax, with OpenAI checkpoint loading.

Both encoders are load-bearing for the pipeline (reference
``main_unsup.py:237`` image feats, ``clip_lang_util.py:96-108`` vocabulary
text embeddings), so this is a faithful functional re-implementation —
QuickGELU, pre-norm blocks, causal text transformer, EOT-token pooling,
learned logit scale — structured for TPU (bf16 compute / fp32 layernorm,
fused attention) rather than a port of the torch module tree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from scd_tpu.models.vit import (Block, ViTConfig, VisionTransformer,
                                seq_pad_target)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: ViTConfig
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_depth: int = 12
    text_heads: int = 8
    embed_dim: int = 512
    compute_dtype: Any = jnp.float32


def clip_vit_b16_config(compute_dtype=jnp.float32,
                        dense_int8: bool = False) -> CLIPConfig:
    return CLIPConfig(
        vision=ViTConfig(image_size=224, patch_size=16, width=768, depth=12,
                         heads=12, quick_gelu=True, pre_post_norm=True,
                         output_proj=512, patch_bias=False,
                         dense_int8=dense_int8,
                         norm_eps=1e-5,  # torch nn.LayerNorm default: the
                         # eps the OpenAI weights were trained with
                         compute_dtype=compute_dtype),
        compute_dtype=compute_dtype,
    )


class TextTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, prefix_kv=None, p_len=None,
                 return_prefix_kv: bool = False) -> jnp.ndarray:
        """tokens: [B, L] int32 -> text features [B, embed_dim] (unnormalized).

        Prefix-cache modes (the prefix-cached vocabulary build,
        ``naming/zeroshot.py::build_zeroshot_weights_prefix``):

        * ``return_prefix_kv=True``: tokens are PREFIX rows ([T, P],
          SOT-framed, zero-padded); returns the per-layer (k, v) head
          projections as a ``(k_stack, v_stack)`` pair, each
          [depth, T, P, heads, head_dim].  Causal masking means prefix
          activations never see the padding, so the cache is exact.
        * ``prefix_kv=((k, v) each [depth, P, H, d])`` + ``p_len`` ([]
          int32, the real prefix length): tokens are SUFFIX rows
          ([B, S] — name + template-suffix + EOT, zero-padded); they run at
          positions ``p_len + j`` attending [cached prefix, own causal].
          Output matches the full-sequence forward on
          ``prefix + suffix`` rows (same key order, same dtypes).
        """
        c = self.cfg
        B, L = tokens.shape
        tok_emb = self.param("token_embedding", nn.initializers.normal(0.02),
                             (c.vocab_size, c.text_width))
        pos_emb = self.param("pos_embed", nn.initializers.normal(0.01),
                             (c.context_length, c.text_width))
        if prefix_kv is None:
            x = tok_emb[tokens] + pos_emb[None, :L]
        else:
            # suffix rows sit at positions p_len .. p_len+L-1
            pos = jax.lax.dynamic_slice_in_dim(pos_emb, p_len, L, axis=0)
            x = tok_emb[tokens] + pos[None]
        x = x.astype(c.compute_dtype)

        blk_cfg = ViTConfig(width=c.text_width, depth=c.text_depth,
                            heads=c.text_heads, quick_gelu=True,
                            norm_eps=1e-5,  # torch default (see vision cfg)
                            # one knob quantizes both towers: the 5.4M-
                            # prompt vocabulary build is as dense-bound as
                            # extraction (see ViTConfig.dense_int8)
                            dense_int8=c.vision.dense_int8,
                            compute_dtype=c.compute_dtype)
        # tile-align the sequence for the int8 path (77 -> 80; see
        # ViTConfig.pad_seq_to).  No key mask needed: pad rows sit at the
        # END and the causal mask already hides keys j > i from every
        # real query; EOT pooling below indexes tokens < L only.
        # (Prefix-cache modes skip it: the builder falls back to the plain
        # path when the int8 knob is on.)
        pad_to = seq_pad_target(blk_cfg, L)
        if pad_to > L and prefix_kv is None and not return_prefix_kv:
            x = jnp.pad(x, ((0, 0), (0, pad_to - L), (0, 0)))
        prefix_valid = None
        if prefix_kv is not None:
            prefix_valid = jnp.arange(prefix_kv[0].shape[1]) < p_len
        kvs = []
        for i in range(c.text_depth):
            blk = Block(blk_cfg, name=f"block_{i}")
            layer_kv = None if prefix_kv is None else (
                prefix_kv[0][i], prefix_kv[1][i])
            x = blk(x, causal=True, prefix_kv=layer_kv,
                    prefix_valid=prefix_valid, return_kv=return_prefix_kv)
            if return_prefix_kv:
                x, kv = x
                kvs.append(kv)
        if return_prefix_kv:
            return (jnp.stack([k for k, _ in kvs]),
                    jnp.stack([v for _, v in kvs]))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="ln_final")(x)

        # pool at the EOT token (highest token id per row, CLIP convention)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection",
                          nn.initializers.normal(c.text_width ** -0.5),
                          (c.text_width, c.embed_dim))
        return jnp.dot(pooled.astype(jnp.float32), proj,
                       preferred_element_type=jnp.float32)


class CLIPModel(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTransformer(self.cfg.vision)
        self.text = TextTransformer(self.cfg)
        self.logit_scale = self.param("logit_scale",
                                      lambda *_: jnp.asarray(np.log(1 / 0.07),
                                                             jnp.float32))

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def encode_text_prefix(self, tokens):
        """Prefix rows [T, P] -> per-layer KV cache (see TextTransformer)."""
        return self.text(tokens, return_prefix_kv=True)

    def encode_text_suffix(self, tokens, prefix_kv, p_len):
        """Suffix rows [B, S] + one template's cache -> [B, D] features."""
        return self.text(tokens, prefix_kv=prefix_kv, p_len=p_len)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


# ----------------------------------------------------------- weight loading

def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def load_openai_clip_weights(state_dict: Dict[str, Any],
                             cfg: Optional[CLIPConfig] = None) -> Dict:
    """Convert an OpenAI CLIP ViT state dict (torch tensor names) into this
    module's Flax param tree.

    Accepts either torch tensors or numpy arrays as values.  Key layout
    follows the public OpenAI CLIP release (``visual.transformer.resblocks.N.
    attn.in_proj_weight`` etc.).
    """
    cfg = cfg or clip_vit_b16_config()
    sd = {k: _t(v.cpu().numpy() if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}

    def block_params(prefix: str, width: int) -> Dict:
        w_in = sd[f"{prefix}.attn.in_proj_weight"]  # [3D, D]
        b_in = sd[f"{prefix}.attn.in_proj_bias"]
        return {
            "norm1": {"scale": sd[f"{prefix}.ln_1.weight"],
                      "bias": sd[f"{prefix}.ln_1.bias"]},
            "norm2": {"scale": sd[f"{prefix}.ln_2.weight"],
                      "bias": sd[f"{prefix}.ln_2.bias"]},
            "attn": {
                "qkv": {"kernel": w_in.T, "bias": b_in},
                "proj": {"kernel": sd[f"{prefix}.attn.out_proj.weight"].T,
                         "bias": sd[f"{prefix}.attn.out_proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": sd[f"{prefix}.mlp.c_fc.weight"].T,
                        "bias": sd[f"{prefix}.mlp.c_fc.bias"]},
                "fc2": {"kernel": sd[f"{prefix}.mlp.c_proj.weight"].T,
                        "bias": sd[f"{prefix}.mlp.c_proj.bias"]},
            },
        }

    visual = {
        "patch_embed": {
            # torch conv [D, 3, P, P] -> flax [P, P, 3, D]
            "kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0),
        },
        "cls_token": sd["visual.class_embedding"].reshape(1, 1, -1),
        "pos_embed": sd["visual.positional_embedding"][None],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                   "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"],
                    "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
    }
    for i in range(cfg.vision.depth):
        visual[f"block_{i}"] = block_params(
            f"visual.transformer.resblocks.{i}", cfg.vision.width)

    text = {
        "token_embedding": sd["token_embedding.weight"],
        "pos_embed": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(cfg.text_depth):
        text[f"block_{i}"] = block_params(f"transformer.resblocks.{i}",
                                          cfg.text_width)

    return {"params": {"visual": visual, "text": text,
                       "logit_scale": sd["logit_scale"].reshape(())}}
