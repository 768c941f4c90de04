"""ResNet-50 bottleneck FPN backbone for gim_loftr (1/8 + 1/2 features).

Parity target: /root/reference/networks/loftr/backbone/resnet.py:247-329 —
NOTE this is GIM's RGB ResNet-50 variant (Bottleneck [3,4,6,3], 7x7/2 stem,
NO maxpool, truncated after layer3), not the original grayscale LoFTR
backbone. FPN heads: 1x1 lateral convs + 3x3/BN/LeakyReLU refine, bilinear
align_corners=True upsampling. Outputs: coarse 256ch @1/8, fine 128ch @1/2.

Layout: NHWC. BatchNorm uses running stats at eval; pass axis_name for
cross-device sync when training (the jax analog of sync_batchnorm=True,
ref test.py:196).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck (stride on the 3x3)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    axis_name: str | None = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not self.train,
                                       momentum=0.9, epsilon=1e-5,
                                       axis_name=self.axis_name, dtype=dt,
                                       name=name)
        width = self.planes
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=dt,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        # explicit ((1,1),(1,1)): torch pads symmetrically for stride-2 3x3,
        # flax "SAME" would pad (0,1) and shift the grid
        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(width * 4, (1, 1), use_bias=False, dtype=dt,
                      name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            idn = nn.Conv(width * 4, (1, 1),
                          strides=(self.stride, self.stride),
                          use_bias=False, dtype=dt, name="down_conv")(x)
            idn = bn("down_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class ResNet50Trunk(nn.Module):
    """conv1(7x7/2) + layer1..3, no maxpool (ref resnet.py:158-169,230-235)."""

    train: bool = False
    axis_name: str | None = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        bn = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                          epsilon=1e-5, axis_name=self.axis_name,
                          dtype=self.dtype, name="bn1")
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x0 = nn.relu(bn(x))

        def layer(x, planes, blocks, stride, name):
            x = Bottleneck(planes, stride, downsample=True, train=self.train,
                           axis_name=self.axis_name, dtype=self.dtype,
                           name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, 1, train=self.train,
                               axis_name=self.axis_name, dtype=self.dtype,
                               name=f"{name}_{i}")(x)
            return x

        x1 = layer(x0, 64, 3, 1, "layer1")    # 1/2, 256ch
        x2 = layer(x1, 128, 4, 2, "layer2")   # 1/4, 512ch
        x3 = layer(x2, 256, 6, 2, "layer3")   # 1/8, 1024ch
        return x1, x2, x3


import numpy as np


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear-interpolation operator."""
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (pos - lo).astype(np.float32)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), lo] += 1.0 - w
    M[np.arange(n_out), hi] += w
    return M


def _interp_taps(n_in: int, n_out: int):
    """align_corners=True positions as 2-tap (lo, hi, w) arrays."""
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(pos).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (pos - lo).astype(np.float32)
    return lo, hi, w


def _upsample2x_align_corners(x):
    """Bilinear 2x with align_corners=True (torch F.interpolate parity).

    Two implementations, identical numerics:
    - matmul: two dense interpolation-operator einsums. Always correct on
      TPU, but burns 2H*H*W*C MACs per axis in what is really a 2-tap
      blend (~55 GFLOP/pair @832, ~390 @1600 across the two FPN
      upsamples).
    - gather (default on TPU): 2 static row-gathers per axis + VPU blend.
      Gathers are on the MAJOR (row) axis of (B, H, W*C) — the
      known-good take_along_axis regime (docs/PERF.md round 2), NOT the
      scalar-dynamic-slice minor-dim pathology. The W axis is done by
      transposing H<->W first so both interps gather rows.
    Select with GIM_TPU_GATHER_UPSAMPLE=0/1 (A/B'd on chip, round 4)."""
    import os

    B, H, W, C = x.shape
    if os.environ.get("GIM_TPU_GATHER_UPSAMPLE", "0") == "1":
        def interp_rows(t):                      # (B, N, M, C) -> 2N on axis 1
            n = t.shape[1]
            lo, hi, w = _interp_taps(n, 2 * n)
            xa = jnp.take(t, jnp.asarray(lo), axis=1)
            xb = jnp.take(t, jnp.asarray(hi), axis=1)
            wv = jnp.asarray(w, t.dtype)[None, :, None, None]
            return xa + (xb - xa) * wv

        x = interp_rows(x)
        x = jnp.transpose(interp_rows(jnp.transpose(x, (0, 2, 1, 3))),
                          (0, 2, 1, 3))
        return x
    Mh = jnp.asarray(_interp_matrix(H, 2 * H), x.dtype)
    Mw = jnp.asarray(_interp_matrix(W, 2 * W), x.dtype)
    if os.environ.get("GIM_TPU_UPSAMPLE_V2", "0") == "1":
        # same operators, phrased as clean 2D matmuls on a flattened
        # minor dim: (2N, N) @ (N, rest) with the contraction on the
        # leading axis of the data — no mid-axis contraction for XLA's
        # layout assignment to shuffle around (the @1600 ledger blames
        # "upsample matmuls transpose H to contract"). One explicit
        # H<->W transpose moves W to the major position for the second
        # interp; A/B'd on chip vs the einsum form.
        x = jnp.einsum("oh,bhm->bom", Mh,
                       x.reshape(B, H, W * C)).reshape(B, 2 * H, W, C)
        x = jnp.transpose(x, (0, 2, 1, 3))            # (B, W, 2H, C)
        x = jnp.einsum("ow,bwm->bom", Mw,
                       x.reshape(B, W, 2 * H * C)).reshape(B, 2 * W, 2 * H, C)
        return jnp.transpose(x, (0, 2, 1, 3))
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    x = jnp.einsum("ow,bhwc->bhoc", Mw, x)
    return x


class ResNetFPN(nn.Module):
    """FPN over the ResNet-50 trunk (ref resnet.py:274-329)."""

    block_dims: tuple[int, ...] = (64, 128, 196, 256, 512, 1024)
    train: bool = False
    axis_name: str | None = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        bd = self.block_dims
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not self.train,
                                       momentum=0.9, epsilon=1e-5,
                                       axis_name=self.axis_name, dtype=dt,
                                       name=name)
        x = x.astype(dt)
        x1, x2, x3 = ResNet50Trunk(self.train, self.axis_name, dt,
                                   name="encode")(x)

        x3_out = nn.Conv(bd[3], (1, 1), use_bias=False, dtype=dt,
                         name="layer3_outconv")(x3)

        x3_2x = _upsample2x_align_corners(x3_out)
        x2_out = nn.Conv(bd[3], (1, 1), use_bias=False, dtype=dt,
                         name="layer2_outconv")(x2)
        h = nn.Conv(bd[3], (3, 3), padding="SAME", use_bias=False, dtype=dt,
                    name="layer2_outconv2_0")(x2_out + x3_2x)
        h = nn.leaky_relu(bn("layer2_outconv2_bn")(h), 0.01)
        x2_out = nn.Conv(bd[2], (3, 3), padding="SAME", use_bias=False, dtype=dt,
                         name="layer2_outconv2_1")(h)

        x2_2x = _upsample2x_align_corners(x2_out)
        x1_out = nn.Conv(bd[2], (1, 1), use_bias=False, dtype=dt,
                         name="layer1_outconv")(x1)
        h = nn.Conv(bd[2], (3, 3), padding="SAME", use_bias=False, dtype=dt,
                    name="layer1_outconv2_0")(x1_out + x2_2x)
        h = nn.leaky_relu(bn("layer1_outconv2_bn")(h), 0.01)
        x1_out = nn.Conv(bd[1], (3, 3), padding="SAME", use_bias=False, dtype=dt,
                         name="layer1_outconv2_1")(h)

        return x3_out, x1_out  # coarse 1/8 (256), fine 1/2 (128)
