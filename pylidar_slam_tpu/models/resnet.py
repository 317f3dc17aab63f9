"""ResNet encoder (flax.linen) for pose regression.

Architecture mirrors the reference's encoder (slam/models/_resnet.py:40-133,
itself adapted from torchvision): 7x7 stride-2 stem WITHOUT normalization,
3x3 max-pool, four stages of BasicBlock/Bottleneck (with BatchNorm inside the
blocks), depth table {18, 34, 50}.  Channels-last NHWC layout (the TPU-native
convolution layout).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "sin": jnp.sin,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise KeyError(f"Unknown activation '{name}'. Known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    activation: str = "relu"
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False)(x)
        out = norm()(out)
        out = act(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            # The reference's downsample is a bare conv1x1 (no norm),
            # _resnet.py:34-38 + 86-92.
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
        return act(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    activation: str = "relu"
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = norm()(out)
        out = act(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False)(out)
        out = norm()(out)
        out = act(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
        return act(out + identity)


_MODEL_TABLE = {
    18: ([2, 2, 2, 2], BasicBlock),
    34: ([3, 4, 6, 3], BasicBlock),
    50: ([3, 4, 6, 3], Bottleneck),
}


class ResNetEncoder(nn.Module):
    """Four-stage ResNet encoder; returns the last stage's feature map."""
    model: int = 18
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.model not in _MODEL_TABLE:
            raise KeyError(f"Unsupported resnet_model {self.model} "
                           f"(choose from {sorted(_MODEL_TABLE)})")
        layers, block = _MODEL_TABLE[self.model]
        act = get_activation(self.activation)

        # Stem: 7x7 stride 2, no normalization (reference _resnet.py:57-60)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = act(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if stage == 0 else 2
            x = block(planes, stride=stride, activation=self.activation)(x, train)
            for _ in range(1, blocks):
                x = block(planes, activation=self.activation)(x, train)
        return x
