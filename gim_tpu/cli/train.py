"""Training CLI (gim_loftr on WALK pseudo-labels).

Reference surface: the train-gim-* branches' `python train.py --weight
gim_loftr --maxlen ... --img_size 840 --batch_size 1 --lr 1e-3`
(ref README.md:220-233, test.py arg surface, SURVEY §3.3). The TPU-native
loop is pjit data-parallel over the mesh's `data` axis with the reference's
LR scaling rule / warmup / MultiStep decay / grad clip (trainer/config.py)
and orbax checkpointing (the reference disables PL checkpointing at eval,
test.py:202; training keeps the standard ckpt/resume contract).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weight", default="gim_loftr", choices=["gim_loftr"])
    p.add_argument("--labels_root", required=True,
                   help="propagated pseudo-label root (see datasets.walk)")
    p.add_argument("--video", required=True, help="source video (frames)")
    p.add_argument("--img_size", type=int, default=840)
    p.add_argument("--batch_size", type=int, default=1, help="per device")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--max_labels", type=int, default=20000)
    p.add_argument("--ckpt_dir", default="checkpoints/gim_loftr")
    p.add_argument("--log_interval", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gim_tpu.config import GimConfig, LoFTRConfig, replace
    from gim_tpu.data.video import FrameCache
    from gim_tpu.data.walk import WalkDataset
    from gim_tpu.models.loftr import init_params
    from gim_tpu.parallel.mesh import make_mesh
    from gim_tpu.train.loop import loftr_train_step, make_optimizer

    n_dev = len(jax.devices())
    mesh = make_mesh(data_axis=n_dev, model_axis=1)
    cfg = GimConfig(loftr=LoFTRConfig(max_matches=1024))

    cache = FrameCache(args.video, os.path.join(args.labels_root, "_frames"))
    ds = WalkDataset(cache.frame, args.labels_root, args.img_size,
                     args.max_labels)
    if len(ds) == 0:
        raise SystemExit("no propagated labels found; run "
                         "gim_tpu.cli.video_preprocessor + propagate first")
    print(f"[train] {len(ds)} training pairs, {n_dev} devices")

    variables = init_params(jax.random.PRNGKey(cfg.trainer.seed), cfg.loftr,
                            (args.img_size, args.img_size))
    tx = make_optimizer(cfg.trainer, n_dev, args.batch_size,
                        steps_per_epoch=max(len(ds), 1))
    opt_state = tx.init(variables["params"])

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    variables = jax.device_put(variables, repl)
    opt_state = jax.device_put(opt_state, repl)

    # orbax checkpointing (resume contract)
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
    start = 0
    if mgr.latest_step() is not None:
        start = mgr.latest_step()
        restored = mgr.restore(start, args=ocp.args.StandardRestore(
            {"variables": variables, "opt_state": opt_state}))
        variables = restored["variables"]
        opt_state = restored["opt_state"]
        print(f"[train] resumed from step {start}")

    B = n_dev * args.batch_size
    rng = np.random.default_rng(cfg.trainer.seed)

    def make_batch():
        samples = []
        while len(samples) < B:
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

    t0 = time.time()
    with mesh:
        for step in range(start, args.max_steps):
            batch = jax.device_put(make_batch(), data_sh)
            variables, opt_state, logs = loftr_train_step(
                cfg, tx, variables, opt_state, batch)
            if (step + 1) % args.log_interval == 0:
                dt = time.time() - t0
                print(f"[train] step {step + 1} loss {float(logs['loss']):.4f}"
                      f" (coarse {float(logs['loss_c']):.4f} fine "
                      f"{float(logs['loss_f']):.4f}) {dt:.1f}s", flush=True)
                mgr.save(step + 1, args=ocp.args.StandardSave(
                    {"variables": variables, "opt_state": opt_state}))
    mgr.wait_until_finished()
    print("[train] done")


if __name__ == "__main__":
    main()
