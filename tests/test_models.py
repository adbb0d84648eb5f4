"""Model tests: ViT mechanics, CLIP text causality/pooling, weight-converter
shape contracts, tokenizer behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.models import (
    CLIPModel,
    HashTokenizer,
    VisionTransformer,
    clip_vit_b16_config,
    dino_vit_b16_config,
    load_dino_weights,
    load_openai_clip_weights,
)
from scd_tpu.models.vit import ViTConfig, interpolate_pos_embed


def tiny_vit_cfg(**kw):
    base = dict(image_size=32, patch_size=8, width=64, depth=2, heads=4)
    base.update(kw)
    return ViTConfig(**base)


def tiny_clip_cfg():
    from scd_tpu.models.clip import CLIPConfig

    return CLIPConfig(
        vision=tiny_vit_cfg(quick_gelu=True, pre_post_norm=True,
                            output_proj=32, patch_bias=False),
        vocab_size=128, context_length=16, text_width=32, text_depth=2,
        text_heads=4, embed_dim=32)


def test_dino_style_vit_forward(rng):
    cfg = tiny_vit_cfg()
    model = VisionTransformer(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (2, 64)
    # deterministic
    out2 = model.apply(params, imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_clip_style_vit_projects(rng):
    cfg = tiny_vit_cfg(quick_gelu=True, pre_post_norm=True, output_proj=32,
                       patch_bias=False)
    model = VisionTransformer(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    assert model.apply(params, imgs).shape == (2, 32)


def test_pos_embed_interpolation(rng):
    pos = jnp.asarray(rng.standard_normal((1, 1 + 16, 8)), jnp.float32)  # 4x4
    out = interpolate_pos_embed(pos, 8)  # -> 8x8
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pos[:, 0]))
    # identity when grid matches
    same = interpolate_pos_embed(pos, 4)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))


def test_vit_offgrid_input_uses_interpolation(rng):
    cfg = tiny_vit_cfg()
    model = VisionTransformer(cfg)
    big = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), big)
    small = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    out = model.apply(params, small)  # 2x2 grid vs trained 4x4
    assert out.shape == (1, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_text_eot_pooling_ignores_padding(rng):
    cfg = tiny_clip_cfg()
    model = CLIPModel(cfg)
    toks = np.zeros((1, 16), np.int32)
    toks[0, :5] = [126, 5, 9, 3, 127]  # SOT ... EOT at position 4
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, jnp.asarray(toks))
    base = model.apply(params, jnp.asarray(toks), method=CLIPModel.encode_text)
    # tokens after EOT must not influence the pooled feature (causal mask)
    toks2 = toks.copy()
    toks2[0, 6:10] = [7, 8, 9, 10]
    out2 = model.apply(params, jnp.asarray(toks2), method=CLIPModel.encode_text)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2), atol=1e-5)


def test_clip_similarity_shape(rng):
    cfg = tiny_clip_cfg()
    model = CLIPModel(cfg)
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 126, (5, 16)),
                       jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    sims = model.apply(params, imgs, toks)
    assert sims.shape == (3, 5)


def _fake_openai_sd():
    """Random state dict with the OpenAI CLIP ViT-B/16 key layout."""
    rng = np.random.default_rng(0)
    d, td, p = 768, 512, 16

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {
        "visual.conv1.weight": r(d, 3, p, p),
        "visual.class_embedding": r(d),
        "visual.positional_embedding": r(197, d),
        "visual.ln_pre.weight": r(d), "visual.ln_pre.bias": r(d),
        "visual.ln_post.weight": r(d), "visual.ln_post.bias": r(d),
        "visual.proj": r(d, td),
        "token_embedding.weight": r(49408, td),
        "positional_embedding": r(77, td),
        "ln_final.weight": r(td), "ln_final.bias": r(td),
        "text_projection": r(td, td),
        "logit_scale": np.asarray(4.6, np.float32),
    }
    for pre, width, depth in (("visual.transformer.resblocks", d, 12),
                              ("transformer.resblocks", td, 12)):
        for i in range(depth):
            b = f"{pre}.{i}"
            sd[f"{b}.attn.in_proj_weight"] = r(3 * width, width)
            sd[f"{b}.attn.in_proj_bias"] = r(3 * width)
            sd[f"{b}.attn.out_proj.weight"] = r(width, width)
            sd[f"{b}.attn.out_proj.bias"] = r(width)
            sd[f"{b}.ln_1.weight"] = r(width)
            sd[f"{b}.ln_1.bias"] = r(width)
            sd[f"{b}.ln_2.weight"] = r(width)
            sd[f"{b}.ln_2.bias"] = r(width)
            sd[f"{b}.mlp.c_fc.weight"] = r(4 * width, width)
            sd[f"{b}.mlp.c_fc.bias"] = r(4 * width)
            sd[f"{b}.mlp.c_proj.weight"] = r(width, 4 * width)
            sd[f"{b}.mlp.c_proj.bias"] = r(width)
    return sd


@pytest.mark.slow
def test_openai_weight_conversion_runs():
    cfg = clip_vit_b16_config()
    variables = load_openai_clip_weights(_fake_openai_sd(), cfg)
    model = CLIPModel(cfg)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32).at[0, 0].set(49406).at[0, 1].set(49407)
    img_f = model.apply(variables, imgs, method=CLIPModel.encode_image)
    txt_f = model.apply(variables, toks, method=CLIPModel.encode_text)
    assert img_f.shape == (1, 512) and txt_f.shape == (1, 512)
    assert np.isfinite(np.asarray(img_f)).all()


def _fake_dino_sd():
    rng = np.random.default_rng(1)
    d = 768

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {
        "patch_embed.proj.weight": r(d, 3, 16, 16),
        "patch_embed.proj.bias": r(d),
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, 197, d),
        "norm.weight": r(d), "norm.bias": r(d),
    }
    for i in range(12):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = r(d)
        sd[f"{p}.norm1.bias"] = r(d)
        sd[f"{p}.norm2.weight"] = r(d)
        sd[f"{p}.norm2.bias"] = r(d)
        sd[f"{p}.attn.qkv.weight"] = r(3 * d, d)
        sd[f"{p}.attn.qkv.bias"] = r(3 * d)
        sd[f"{p}.attn.proj.weight"] = r(d, d)
        sd[f"{p}.attn.proj.bias"] = r(d)
        sd[f"{p}.mlp.fc1.weight"] = r(4 * d, d)
        sd[f"{p}.mlp.fc1.bias"] = r(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = r(d, 4 * d)
        sd[f"{p}.mlp.fc2.bias"] = r(d)
    return sd


@pytest.mark.slow
def test_dino_weight_conversion_runs():
    cfg = dino_vit_b16_config()
    variables = load_dino_weights(_fake_dino_sd(), cfg)
    model = VisionTransformer(cfg)
    out = model.apply(variables, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert out.shape == (1, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_hash_tokenizer():
    tok = HashTokenizer()
    batch = tok(["a photo of a dog.", "a photo of a cat."])
    assert batch.shape == (2, 77)
    assert (batch[:, 0] == tok.sot).all()
    # EOT is the max id -> argmax pooling finds it
    assert (batch.max(axis=1) == tok.eot).all()
    # deterministic
    np.testing.assert_array_equal(batch, tok(["a photo of a dog.",
                                              "a photo of a cat."]))


def test_hash_tokenizer_prompt_tokens_match_full():
    """HashTokenizer's compositional splice (shared with CLIPTokenizer)
    equals its own full per-pair encode, including punctuation-glued
    templates, hazard pairs, and non-'{}' placeholders."""
    tok = HashTokenizer(vocab_size=997)
    names = ["dog", "ice bear", "ph.d.", "", "o'neill", "x" * 5]
    templates = ["a photo of a {}.", "itap of the {} thing",
                 "art of the {0}", "graffiti {}s", "{} in a video game."]
    spliced = tok.prompt_tokens(templates, names)
    full = tok([t.format(n) for n in names for t in templates])
    np.testing.assert_array_equal(spliced, full)


def test_clip_tokenizer_with_synthetic_merges(tmp_path):
    from scd_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode

    # minimal merges file: header + a few merges
    merges = "#version: 0.2\nh e\nhe l\nhel l\nhell o</w>\n"
    path = tmp_path / "merges.txt"
    path.write_text(merges)
    tok = CLIPTokenizer(str(path))
    ids = tok.encode("hello")
    # "hello" fully merges into a single token
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"
    batch = tok(["hello hello"])
    assert batch.shape == (1, 77)
    assert batch[0, 0] == tok.encoder["<|startoftext|>"]
