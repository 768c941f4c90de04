"""Repro + localize the round-4 lightglue joint-train NaN on the real store.

Runs the EXACT train-loop step (same batch sampler seeds, same optimizer)
but with a debug step that also reports per-submodule grad finiteness, and
stops at the first non-finite loss, printing the offending grad leaves.

  IMG=320 STEPS=60 python -m tools.debug_lightglue_nan
  JAX_PLATFORMS=cpu IMG=160 python -m tools.debug_lightglue_nan
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.config import GimConfig
from gim_tpu.api import Matcher
from gim_tpu.data.walk import WalkDataset
from gim_tpu.data.video import FrameCache
from gim_tpu.train.lightglue_loop import lightglue_loss
from gim_tpu.train.loop import make_optimizer

IMG = int(os.environ.get("IMG", 320))
STEPS = int(os.environ.get("STEPS", 60))
BS = int(os.environ.get("BS", 2))
AUG = os.environ.get("AUG", "dark")
ROOT = "/root/repo/.loopwork/labels/synthtrain/propagate"
VIDEO = "/root/repo/.loopwork/synthtrain.avi"


def grad_finite_report(grads):
    """{path: all_finite} per grad leaf, as a dict of device bools."""
    flags = {}
    for p, g in jax.tree_util.tree_leaves_with_path(grads):
        flags[jax.tree_util.keystr(p)] = jnp.all(jnp.isfinite(g))
    return flags


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def debug_step(cfg, tx, variables, opt_state, batch):
    import optax

    (loss, logs), grads = jax.value_and_grad(
        lambda v: lightglue_loss(cfg, v, batch), has_aux=True)(variables)
    flags = grad_finite_report(grads)
    updates, opt_state = tx.update(grads, opt_state, variables)
    new_vars = optax.apply_updates(variables, updates)
    return new_vars, opt_state, logs, flags


def main():
    # frame cache lives beside the store, not inside the propagate dir
    # (ADVICE r4: a propagate-dir cleanup must not eat the cache) —
    # the same location cli/train.py uses
    cache = FrameCache(VIDEO, os.path.normpath(
        os.path.join(ROOT, os.pardir, "_frames")))
    aug = None if AUG == "none" else AUG
    ds = WalkDataset(cache.frame, ROOT, IMG, 1024, augmentation=aug, seed=0)
    print(f"pairs: {len(ds)} img {IMG} bs {BS} aug {AUG}", flush=True)

    cfg = GimConfig()
    variables = Matcher("gim_lightglue", cfg,
                        rng=jax.random.PRNGKey(cfg.trainer.seed)).variables
    tx = make_optimizer(cfg.trainer, 1, BS, steps_per_epoch=max(len(ds), 1))
    opt_state = tx.init(variables)

    rng = np.random.default_rng(cfg.trainer.seed)

    def make_batch():
        samples = []
        while len(samples) < BS:
            s = ds[int(rng.integers(0, len(ds)))]
            if s is not None:
                samples.append(s)
        return {
            "color0": jnp.asarray(np.stack([s.color0 for s in samples])),
            "color1": jnp.asarray(np.stack([s.color1 for s in samples])),
            "labels": jnp.asarray(np.stack([s.labels for s in samples])),
            "label_valid": jnp.asarray(
                np.stack([s.label_valid for s in samples])),
        }

    for step in range(STEPS):
        batch = make_batch()
        variables, opt_state, logs, flags = debug_step(
            cfg, tx, variables, opt_state, batch)
        vals = {k: float(v) for k, v in logs.items()}
        bad = [k for k, v in flags.items() if not bool(v)]
        print(f"step {step + 1}: " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(vals.items()))
            + (f"  NONFINITE_GRADS={len(bad)}" if bad else ""), flush=True)
        if bad:
            print("first 30 non-finite grad leaves:")
            for b in bad[:30]:
                print("  ", b)
            break
        if not all(np.isfinite(v) for v in vals.values()):
            print("loss non-finite but all grads finite — params already "
                  "poisoned in an earlier step?")
            break
    else:
        print("no non-finite step observed")


if __name__ == "__main__":
    main()
