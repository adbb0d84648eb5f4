"""Two-head ResNet (the AutoNovel baseline backbone).

Reference ``gcd/models/resnet_twohead.py:14-79``: a CIFAR-style ResNet-18
(3x3 stem, four BasicBlock stages 64/128/256/512) with two linear heads —
one over labelled classes, one over unlabelled.

TPU-first: NHWC layout, GroupNorm instead of BatchNorm (batch-size
independent, no cross-replica batch-stat sync needed under SPMD data
parallelism), bf16-capable compute dtype.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """Pre-activation-free basic residual block (reference
    ``resnet_twohead.py:49-71``)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="shortcut")(x)
            x = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name="shortcut_norm")(x)
        return nn.relu(x + y)


class ResNetTwoHead(nn.Module):
    """ResNet-18 trunk + (labelled, unlabelled) heads; returns
    (out_labelled, out_unlabelled, features) like the reference's
    ``forward(..., output='both')`` path."""

    num_labeled_classes: int = 5
    num_unlabeled_classes: int = 5
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        for stage, (planes, n) in enumerate(
                zip((64, 128, 256, 512), self.num_blocks)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BasicBlock(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        out1 = nn.Dense(self.num_labeled_classes, name="head1")(feats)
        out2 = nn.Dense(self.num_unlabeled_classes, name="head2")(feats)
        return out1, out2, feats
