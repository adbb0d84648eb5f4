"""ResNet-50 extractor: BN-folding parity against a torch eval-mode
reference, loader/shape checks, and the new ViT-S/T config factories
(reference ``gcd/methods/clustering/extract_features.py:95-187``,
``gcd/models/vision_transformer.py:243-262``)."""

import numpy as np
import pytest

from scd_tpu.models import ResNet50, ResNet50Config, load_resnet50_weights


def _tiny_cfg():
    import jax.numpy as jnp

    return ResNet50Config(layers=(1, 1), width=8, compute_dtype=jnp.float32)


def _fabricate_sd(cfg: ResNet50Config, seed: int = 0):
    """Random torch-layout state dict (conv [out,in,kh,kw] + eval-mode BN
    stats) for the given config — the same key set torchvision/dino/timm
    resnet50 checkpoints carry."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv_bn(prefix_c, prefix_b, c_out, c_in, k):
        sd[f"{prefix_c}.weight"] = rng.randn(c_out, c_in, k, k).astype(
            np.float32) * 0.1
        sd[f"{prefix_b}.weight"] = rng.uniform(
            0.5, 1.5, c_out).astype(np.float32)
        sd[f"{prefix_b}.bias"] = rng.randn(c_out).astype(np.float32) * 0.1
        sd[f"{prefix_b}.running_mean"] = rng.randn(c_out).astype(
            np.float32) * 0.1
        sd[f"{prefix_b}.running_var"] = rng.uniform(
            0.5, 2.0, c_out).astype(np.float32)

    conv_bn("conv1", "bn1", cfg.width, 3, 7)
    c_in = cfg.width
    for i, n_blocks in enumerate(cfg.layers):
        planes = cfg.stage_width(i)
        for j in range(n_blocks):
            p = f"layer{i + 1}.{j}"
            conv_bn(f"{p}.conv1", f"{p}.bn1", planes, c_in, 1)
            conv_bn(f"{p}.conv2", f"{p}.bn2", planes, planes, 3)
            conv_bn(f"{p}.conv3", f"{p}.bn3", planes * 4, planes, 1)
            if j == 0:
                conv_bn(f"{p}.downsample.0", f"{p}.downsample.1",
                        planes * 4, c_in, 1)
            c_in = planes * 4
    # classifier keys must be tolerated (timm/torchvision carry them)
    sd["fc.weight"] = rng.randn(10, c_in).astype(np.float32)
    sd["fc.bias"] = rng.randn(10).astype(np.float32)
    return sd


def _torch_forward(sd, cfg: ResNet50Config, x_nchw):
    """Eval-mode reference with EXPLICIT BatchNorm (the semantics the
    folded loader must reproduce)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def cbr(x, c, b, stride, pad, relu=True):
        x = F.conv2d(x, t[f"{c}.weight"], None, stride=stride, padding=pad)
        x = F.batch_norm(x, t[f"{b}.running_mean"], t[f"{b}.running_var"],
                         t[f"{b}.weight"], t[f"{b}.bias"], training=False,
                         eps=1e-5)
        return F.relu(x) if relu else x

    x = torch.from_numpy(x_nchw)
    x = cbr(x, "conv1", "bn1", 2, 3)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for i, n_blocks in enumerate(cfg.layers):
        for j in range(n_blocks):
            p = f"layer{i + 1}.{j}"
            stride = 2 if (j == 0 and i > 0) else 1
            y = cbr(x, f"{p}.conv1", f"{p}.bn1", 1, 0)
            y = cbr(y, f"{p}.conv2", f"{p}.bn2", stride, 1)
            y = cbr(y, f"{p}.conv3", f"{p}.bn3", 1, 0, relu=False)
            if j == 0:
                x = cbr(x, f"{p}.downsample.0", f"{p}.downsample.1",
                        stride, 0, relu=False)
            x = F.relu(y + x)
    return x.mean(dim=(2, 3)).numpy()


def test_folded_forward_matches_torch_eval_bn():
    torch = pytest.importorskip("torch")  # noqa: F841
    cfg = _tiny_cfg()
    sd = _fabricate_sd(cfg)
    x = np.random.RandomState(1).rand(2, 33, 33, 3).astype(np.float32)

    model = ResNet50(cfg)
    variables = load_resnet50_weights(sd, cfg)
    got = np.asarray(model.apply(variables, x))
    want = _torch_forward(sd, cfg, x.transpose(0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resnet50_full_config_loads_and_runs():
    cfg = ResNet50Config()
    sd = _fabricate_sd(cfg, seed=3)
    variables = load_resnet50_weights(sd, cfg)
    x = np.zeros((1, 224, 224, 3), np.float32)
    feats = np.asarray(ResNet50(cfg).apply(variables, x))
    assert feats.shape == (1, 2048)
    assert np.isfinite(feats).all()


def test_resnet50_loader_rejects_truncated_checkpoint():
    cfg = _tiny_cfg()
    sd = _fabricate_sd(cfg)
    del sd["layer2.0.conv2.weight"]
    with pytest.raises(KeyError):
        load_resnet50_weights(sd, cfg)


def test_vit_s16_t16_config_factories():
    from scd_tpu.models import dino_vit_s16_config, dino_vit_t16_config

    s, t = dino_vit_s16_config(), dino_vit_t16_config()
    assert (s.width, s.heads, s.depth) == (384, 6, 12)
    assert (t.width, t.heads, t.depth) == (192, 3, 12)


def test_vit_s_loader_roundtrip_tiny():
    """load_dino_weights drives depth/width off the config, so a ViT-S
    style state dict at a small test depth exercises the same mapping."""
    import jax.numpy as jnp

    from scd_tpu.models import VisionTransformer, ViTConfig, \
        load_dino_weights

    cfg = ViTConfig(image_size=32, patch_size=16, width=384, depth=2,
                    heads=6, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    n_patch = (32 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": rng.randn(384, 3, 16, 16).astype(
            np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(384, np.float32),
        "cls_token": rng.randn(1, 1, 384).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, n_patch + 1, 384).astype(np.float32) * .02,
        "norm.weight": np.ones(384, np.float32),
        "norm.bias": np.zeros(384, np.float32),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": np.ones(384, np.float32),
            f"{p}.norm1.bias": np.zeros(384, np.float32),
            f"{p}.norm2.weight": np.ones(384, np.float32),
            f"{p}.norm2.bias": np.zeros(384, np.float32),
            f"{p}.attn.qkv.weight": rng.randn(1152, 384).astype(
                np.float32) * 0.02,
            f"{p}.attn.qkv.bias": np.zeros(1152, np.float32),
            f"{p}.attn.proj.weight": rng.randn(384, 384).astype(
                np.float32) * 0.02,
            f"{p}.attn.proj.bias": np.zeros(384, np.float32),
            f"{p}.mlp.fc1.weight": rng.randn(1536, 384).astype(
                np.float32) * 0.02,
            f"{p}.mlp.fc1.bias": np.zeros(1536, np.float32),
            f"{p}.mlp.fc2.weight": rng.randn(384, 1536).astype(
                np.float32) * 0.02,
            f"{p}.mlp.fc2.bias": np.zeros(384, np.float32),
        })
    variables = load_dino_weights(sd, cfg)
    feats = np.asarray(VisionTransformer(cfg).apply(
        variables, np.zeros((2, 32, 32, 3), np.float32)))
    assert feats.shape == (2, 384)
    assert np.isfinite(feats).all()

    # the PASS checkpoint convention (reference extract_features.py:109-127):
    # weights nested under 'teacher' with module./backbone. prefixes and
    # training-only head.* keys — must load to the identical tree
    import jax

    wrapped = {"teacher": {f"module.backbone.{k}": v for k, v in sd.items()}}
    wrapped["teacher"]["module.head.mlp.weight"] = np.zeros((4, 384),
                                                            np.float32)
    wrapped["optimizer"] = {"lr": 0.1}
    v2 = load_dino_weights(wrapped, cfg)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.array_equal(a, b), variables, v2))
