"""ResNet-50 feature extractor (torchvision layout) with load-time BN folding.

Reference ``gcd/methods/clustering/extract_features.py:129-141`` extracts
frozen 2048-d features with ``torch.hub dino_resnet50`` (and
``timm resnet50`` at :166-187) — both the torchvision ResNet-50 layout with
``fc`` replaced by identity.  Extraction is inference-only, so instead of
porting BatchNorm we FOLD every (conv, BN) pair into the conv at weight-load
time: ``w' = w * gamma/sqrt(var+eps)``, ``b' = beta - gamma*mean/sqrt(var+eps)``
(conv is linear, so this is exact in f32).  The network XLA sees is pure
conv+bias+relu — no batch-stat reads, fewer elementwise ops to fuse, and the
MXU conv path stays dense.  That is the TPU-first design: the reference pays
a BN kernel per conv at eval; here BN costs zero.

``load_resnet50_weights`` accepts both ``dino_resnet50`` and torchvision /
timm ``resnet50`` state dicts (same key layout; classifier ``fc.*`` keys are
ignored).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scd_tpu.models.dino import _t as _np  # torch tensor -> f32 numpy


@dataclasses.dataclass(frozen=True)
class ResNet50Config:
    """Bottleneck ResNet.  Defaults are ResNet-50; ``layers``/``width`` are
    parameterizable so tests can run a tiny variant of the same code path."""
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64            # stem channels; stage c_out = width*4*2^i
    compute_dtype: Any = jnp.float32

    def stage_width(self, i: int) -> int:
        return self.width * (2 ** i)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut, BN folded.

    torchvision convention: the stride sits on conv2 (the 3x3), not conv1.
    """
    cfg: ResNet50Config
    planes: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x):
        dt = self.cfg.compute_dtype
        y = nn.Conv(self.planes, (1, 1), use_bias=True, dtype=dt,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=True, dtype=dt,
                    name="conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=True, dtype=dt,
                    name="conv3")(y)
        if self.project:
            x = nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=True,
                        dtype=dt, name="down")(x)
        return nn.relu(y + x)


class ResNet50(nn.Module):
    """Pooled-feature tower: images [N, H, W, 3] -> [N, width*32] f32
    (2048-d at the ResNet-50 default), matching the reference's
    ``model.fc = Identity`` extraction output."""
    cfg: ResNet50Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x.astype(c.compute_dtype)
        x = nn.Conv(c.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=True,
                    dtype=c.compute_dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(c.layers):
            planes = c.stage_width(i)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = Bottleneck(c, planes, stride=stride,
                               project=(j == 0),
                               name=f"layer{i + 1}_{j}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)


def _fold(sd: Dict[str, np.ndarray], conv: str, bn: str,
          eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Fold BN(conv(x)) into one conv: exact for inference-mode BN."""
    w = sd[f"{conv}.weight"]                      # [out, in, kh, kw] torch
    gamma, beta = sd[f"{bn}.weight"], sd[f"{bn}.bias"]
    mean, var = sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"]
    scale = gamma / np.sqrt(var + eps)            # [out]
    kernel = (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)  # HWIO
    bias = beta - mean * scale
    return {"kernel": kernel, "bias": bias}


def load_resnet50_weights(state_dict: Dict[str, Any],
                          cfg: Optional[ResNet50Config] = None,
                          compute_dtype=None) -> Dict:
    """torchvision/dino/timm ``resnet50`` state dict -> folded Flax params.

    Ignores classifier keys (``fc.*``); raises KeyError on a missing
    conv/BN pair so a truncated checkpoint fails loudly."""
    cfg = cfg or ResNet50Config(compute_dtype=compute_dtype or jnp.float32)
    sd = {k: _np(v) for k, v in state_dict.items()
          if not k.startswith("fc.")}

    params: Dict[str, Any] = {"conv1": _fold(sd, "conv1", "bn1")}
    for i, n_blocks in enumerate(cfg.layers):
        for j in range(n_blocks):
            p = f"layer{i + 1}.{j}"
            blk = {f"conv{k}": _fold(sd, f"{p}.conv{k}", f"{p}.bn{k}")
                   for k in (1, 2, 3)}
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = _fold(sd, f"{p}.downsample.0",
                                    f"{p}.downsample.1")
            params[f"layer{i + 1}_{j}"] = blk
    return {"params": params}
