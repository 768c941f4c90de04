"""torchvision-layout ResNet-50 feature pyramid for DKM.

Parity target: ref networks/dkm/models/encoders.py:30-70 — full ResNet-50
(7x7/2 stem + maxpool + layer1..4) returning features at strides
{1, 2, 4, 8, 16, 32}; BatchNorm frozen at eval (freeze_bn, encoders.py:64-69
— load-bearing for ported weights, SURVEY §7 hard part (f)).

Param naming mirrors torchvision state_dict keys for transparent porting.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not self.train,
                                       momentum=0.9, epsilon=1e-5, dtype=dt,
                                       name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=dt,
                      name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            idn = nn.Conv(self.planes * 4, (1, 1),
                          strides=(self.stride, self.stride),
                          use_bias=False, dtype=dt, name="down_conv")(x)
            idn = bn("down_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class ResNet50Pyramid(nn.Module):
    """Full ResNet-50, returns {1, 2, 4, 8, 16, 32} stride features (NHWC)."""

    train: bool = False  # freeze_bn semantics: BN always uses running stats
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        feats = {1: x}
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        feats[2] = h
        # torch maxpool(3, 2, padding=1)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(h, planes, blocks, stride, name):
            h = Bottleneck(planes, stride, downsample=True, train=False,
                           dtype=self.dtype, name=f"{name}_0")(h)
            for i in range(1, blocks):
                h = Bottleneck(planes, 1, train=False, dtype=self.dtype,
                               name=f"{name}_{i}")(h)
            return h

        h = layer(h, 64, 3, 1, "layer1")
        feats[4] = h
        h = layer(h, 128, 4, 2, "layer2")
        feats[8] = h
        h = layer(h, 256, 6, 2, "layer3")
        feats[16] = h
        h = layer(h, 512, 3, 2, "layer4")
        feats[32] = h
        return feats
