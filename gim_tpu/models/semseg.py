"""Semantic segmentation (ADE20K, 150 classes) for dynamic-object masking.

Parity target: the vendored CSAIL mit_semseg stack the reference uses to
mask {sky, person, car} in the video factory and reconstruction
(ref networks/mit_semseg/models/models.py:21-120, resnet.py:97-147
deep-stem ResNet-50, dilated layer3/4 for 1/8 output stride;
PPM decoder models.py:389-436; inference wrapper
hloc/utils/__init__.py:41-49 and video_preprocessor.py:34-44,624-633).

The legacy SyncBatchNorm/DataParallel machinery of the vendored lib is
inference-dead (SURVEY §2.5) and intentionally not reproduced — eval-mode
BN uses running stats; training BN syncs for free under pjit sharding.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# 0-based ADE20K ids of the classes masked by the reference pipeline
MASKED_CLASSES = {"sky": 2, "person": 12, "car": 20}


class DilatedBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        bn = lambda n: nn.BatchNorm(use_running_average=True, momentum=0.9,
                                    epsilon=1e-5, name=n)
        d = self.dilation
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((d, d), (d, d)), kernel_dilation=(d, d),
                      use_bias=False, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            idn = nn.Conv(self.planes * 4, (1, 1),
                          strides=(self.stride,) * 2, use_bias=False,
                          name="down_conv")(x)
            idn = bn("down_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class ResNet50DilatedEncoder(nn.Module):
    """Deep-stem ResNet-50, layer3 dil 2 / layer4 dil 4, 1/8 stride
    (resnet50dilated, dilate_scale 8)."""

    @nn.compact
    def __call__(self, x):
        bn = lambda n: nn.BatchNorm(use_running_average=True, momentum=0.9,
                                    epsilon=1e-5, name=n)
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(128, (3, 3), padding="SAME", use_bias=False,
                    name="conv3")(h)
        h = nn.relu(bn("bn3")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(h, planes, blocks, stride, dilation, name):
            h = DilatedBottleneck(planes, stride, dilation, downsample=True,
                                  name=f"{name}_0")(h)
            for i in range(1, blocks):
                h = DilatedBottleneck(planes, 1, dilation,
                                      name=f"{name}_{i}")(h)
            return h

        h = layer(h, 64, 3, 1, 1, "layer1")
        h = layer(h, 128, 4, 2, 1, "layer2")
        h = layer(h, 256, 6, 1, 2, "layer3")   # dilated, stride 1
        h = layer(h, 512, 3, 1, 4, "layer4")   # dilated, stride 1
        return h                               # (B, H/8, W/8, 2048)


class PPMDecoder(nn.Module):
    """Pyramid pooling decoder (PPM, ref models.py:389-436)."""

    num_classes: int = 150
    fc_dim: int = 2048
    pool_scales: tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, conv5):
        B, H, W, C = conv5.shape
        outs = [conv5]
        for si, scale in enumerate(self.pool_scales):
            # adaptive average pool to (scale, scale); maps smaller than the
            # scale keep their native resolution (resized below anyway)
            ph, pw = max(H // scale, 1), max(W // scale, 1)
            pooled = nn.avg_pool(conv5, (ph, pw), strides=(ph, pw))
            pooled = pooled[:, :min(scale, H), :min(scale, W)]
            h = nn.Conv(512, (1, 1), use_bias=False,
                        name=f"ppm_{si}_conv")(pooled)
            h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name=f"ppm_{si}_bn")(h)
            h = nn.relu(h)
            h = jax.image.resize(h, (B, H, W, 512), "bilinear")
            outs.append(h)
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(512, (3, 3), padding="SAME", use_bias=False,
                    name="last_conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name="last_bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


class SegmentationModel(nn.Module):
    num_classes: int = 150

    @nn.compact
    def __call__(self, rgb_nchw: jax.Array) -> jax.Array:
        """rgb: (B, 3, H, W) float [0,1]. Returns per-pixel logits at
        input resolution (B, H, W, num_classes)."""
        B, _, H, W = rgb_nchw.shape
        x = jnp.transpose(rgb_nchw, (0, 2, 3, 1))
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = (x - mean) / std
        feat = ResNet50DilatedEncoder(name="encoder")(x)
        logits = PPMDecoder(self.num_classes, name="decoder")(feat)
        return jax.image.resize(
            logits, (B, H, W, self.num_classes), "bilinear")


def init_params(rng: jax.Array, input_hw=(64, 64)) -> Any:
    model = SegmentationModel()
    z = jnp.zeros((1, 3, *input_hw))
    return jax.jit(model.init)(rng, z)


def make_segmenter(variables, img_size: int = 640,
                   classes: tuple[int, ...] = tuple(MASKED_CLASSES.values())):
    """`segment(rgb uint8) -> bool mask` of dynamic/textureless classes
    (the interface of ref hloc/utils/__init__.py:41-49)."""
    import cv2

    model = SegmentationModel()
    fwd = jax.jit(lambda v, x: jnp.argmax(model.apply(v, x), axis=-1))

    def segment(rgb: np.ndarray) -> np.ndarray:
        h, w = rgb.shape[:2]
        s = img_size / max(h, w)
        nh = max(int(round(h * s)) // 8 * 8, 8)
        nw = max(int(round(w * s)) // 8 * 8, 8)
        small = cv2.resize(rgb, (nw, nh)).astype(np.float32) / 255.0
        x = jnp.asarray(np.transpose(small, (2, 0, 1))[None])
        pred = np.asarray(fwd(variables, x))[0]
        mask = np.isin(pred, np.asarray(classes))
        return cv2.resize(mask.astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_NEAREST).astype(bool)

    return segment
