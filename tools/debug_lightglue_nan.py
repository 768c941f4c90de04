"""Repro the round-4 lightglue joint-train NaN on CPU with the real store."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.config import GimConfig
from gim_tpu.api import Matcher
from gim_tpu.data.walk import WalkDataset
from gim_tpu.data.video import FrameCache
from gim_tpu.train.lightglue_loop import lightglue_loss

IMG = int(os.environ.get("IMG", 320))
ROOT = "/root/repo/.loopwork/labels/synthtrain/propagate"
VIDEO = "/root/repo/.loopwork/synthtrain.avi"


def main():
    cache = FrameCache(VIDEO, ROOT + "/_frames")
    ds = WalkDataset(cache.frame, ROOT, IMG, 1024, augmentation=None, seed=0)
    print("pairs:", len(ds))
    samples = []
    i = 0
    while len(samples) < 2:
        s = ds[i]
        i += 1
        if s is not None:
            samples.append(s)
    batch = {
        "color0": jnp.asarray(np.stack([s.color0 for s in samples])),
        "color1": jnp.asarray(np.stack([s.color1 for s in samples])),
        "labels": jnp.asarray(np.stack([s.labels for s in samples])),
        "label_valid": jnp.asarray(np.stack([s.label_valid for s in samples])),
    }
    for k, v in batch.items():
        print(k, v.shape, v.dtype,
              "finite" if bool(jnp.all(jnp.isfinite(v.astype(jnp.float32))))
              else "NONFINITE")
    print("n_valid labels:", np.asarray(batch["label_valid"]).sum(1))

    cfg = GimConfig()
    variables = Matcher("gim_lightglue", cfg,
                        rng=jax.random.PRNGKey(0)).variables

    (loss, logs), grads = jax.value_and_grad(
        lambda v: lightglue_loss(cfg, v, batch), has_aux=True)(variables)
    print("loss:", {k: float(v) for k, v in logs.items()})
    bad = []
    for p, g in jax.tree_util.tree_leaves_with_path(grads):
        if not bool(jnp.all(jnp.isfinite(g))):
            bad.append(jax.tree_util.keystr(p))
    print("nonfinite grads:", len(bad))
    for b in bad[:20]:
        print("  ", b)


if __name__ == "__main__":
    main()
