"""SuperPoint detector/descriptor, TPU-native.

Functional parity target: /root/reference/networks/lightglue/superpoint.py
(VGG-style 8-layer encoder :176-202, 65-channel cell softmax score head
:229-235, 256-d descriptor head :236-241, maxpool NMS :61-81, sparse
extraction :243-349). Dynamic keypoint selection is replaced by capped
top-k + validity masks; the demo config uses detection_threshold 0 with
force_num_keypoints (ref demo.py:338-349), which this matches exactly.

Layout: NHWC internally (TPU-native); API takes (B, 1|3, H, W) float [0,1]
to preserve the reference's tensor contract.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.config import SuperPointConfig
from gim_tpu.ops.detect import remove_borders, simple_nms, topk_keypoints
from gim_tpu.ops.sampling import safe_l2_normalize, sample_descriptors


class SuperPointNet(nn.Module):
    """Dense heads only; sparse extraction happens in `extract`."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, image_nhwc: jax.Array, return_logits: bool = False):
        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        x = image_nhwc
        conv = lambda c, k, name: nn.Conv(c, (k, k), padding="SAME", name=name)
        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(conv(c1, 3, "conv1a")(x))
        x = nn.relu(conv(c1, 3, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(c2, 3, "conv2a")(x))
        x = nn.relu(conv(c2, 3, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(c3, 3, "conv3a")(x))
        x = nn.relu(conv(c3, 3, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(c4, 3, "conv4a")(x))
        x = nn.relu(conv(c4, 3, "conv4b")(x))

        # detector head: 65-way cell softmax, drop dustbin, 8x8 pixel shuffle
        cpa = nn.relu(conv(c5, 3, "convPa")(x))
        logits = nn.Conv(65, (1, 1), name="convPb")(cpa)
        scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
        b, hc, wc, _ = scores.shape
        scores = scores.reshape(b, hc, wc, 8, 8)
        scores = jnp.transpose(scores, (0, 1, 3, 2, 4)).reshape(b, hc * 8, wc * 8)

        # descriptor head
        cda = nn.relu(conv(c5, 3, "convDa")(x))
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDb")(cda)
        # safe normalize: a ReLU-dead cda position + zero-init convDb bias
        # makes desc an EXACT zero vector, whose ||x||-divide VJP is NaN —
        # this was the round-4 joint-train NaN (see ops/sampling.py)
        desc = safe_l2_normalize(desc, axis=-1)
        if return_logits:
            # training path: the 65-way cell logits (incl. dustbin) feed the
            # detector CE loss (train/lightglue_loop.py)
            return scores, desc, logits
        return scores, desc


def init_params(rng: jax.Array, cfg: SuperPointConfig,
                input_hw=(64, 64)) -> Any:
    net = SuperPointNet(descriptor_dim=cfg.descriptor_dim)
    # jit: eager init dispatches every op separately (minutes on a tunneled TPU)
    return jax.jit(net.init)(rng, jnp.zeros((1, *input_hw, 1)))


def extract(params: Any, image: jax.Array, cfg: SuperPointConfig,
            image_hw: jax.Array | None = None,
            pad_rng: jax.Array | None = None) -> dict:
    """Full SuperPoint: dense heads + NMS + static top-k + descriptor sampling.

    image: (B, C, H, W) float [0,1]; C=1 gray or C=3 RGB (converted with
    the detector's luma weights, ref superpoint.py:209-211).
    image_hw: (B, 2) true content (h, w) when the canvas is padded.
    Returns keypoints (B,K,2 xy, +0.5 center), scores (B,K), valid (B,K),
    descriptors (B,K,D).
    """
    if image.shape[1] == 3:
        w = jnp.array([0.299, 0.587, 0.114], image.dtype).reshape(1, 3, 1, 1)
        image = jnp.sum(image * w, axis=1, keepdims=True)
    nhwc = jnp.transpose(image, (0, 2, 3, 1))
    net = SuperPointNet(descriptor_dim=cfg.descriptor_dim)
    scores, desc = net.apply(params, nhwc)

    scores = simple_nms(scores, cfg.nms_radius)
    scores = remove_borders(scores, cfg.remove_borders, image_hw)
    kpts, kscores, valid = topk_keypoints(
        scores, cfg.max_num_keypoints, cfg.detection_threshold,
        pad_rng=pad_rng if cfg.force_num_keypoints else None,
        bounds_hw=image_hw)

    desc_chw = jnp.transpose(desc, (0, 3, 1, 2))  # (B, D, Hc, Wc)
    d = sample_descriptors(kpts, desc_chw, 8, legacy=cfg.legacy_sampling)
    return {
        "keypoints": kpts + 0.5,
        "scores": kscores,
        "valid": valid,
        "descriptors": d,
    }
