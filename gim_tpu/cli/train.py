"""Training CLI (all four heads on WALK pseudo-labels).

Reference surface: the train-gim-* branches' `python train.py --weight
gim_{loftr,lightglue,dkm,roma} --maxlen ... --img_size 840 --batch_size 1`
(ref README.md:220-246, test.py arg surface, SURVEY §3.3). The TPU-native
loop is pjit data-parallel over the mesh's `data` axis with the reference's
LR scaling rule / warmup / MultiStep decay / grad clip (trainer/config.py)
and orbax checkpointing (the reference disables PL checkpointing at eval,
test.py:202; training keeps the standard ckpt/resume contract).

Per-head configs mirror the README training recipes: loftr 840px,
lightglue 1024px, dkm 896x672, roma 672px (ref README.md:220-246).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weight", default="gim_loftr",
                   choices=["gim_loftr", "gim_lightglue", "gim_dkm",
                            "gim_roma"])
    p.add_argument("--labels_root", required=True,
                   help="propagated pseudo-label root (see datasets.walk)")
    p.add_argument("--video", required=True, help="source video (frames)")
    p.add_argument("--img_size", type=int, default=None,
                   help="default per head: loftr 840, lightglue 1024, "
                        "dkm 672, roma 672 (ref README.md:220-246)")
    p.add_argument("--batch_size", type=int, default=1, help="per device")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--max_labels", type=int, default=20000)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--save_interval", type=int, default=200)
    p.add_argument("--lr", type=float, default=None,
                   help="override the effective LR (bypasses the linear "
                        "scaling rule — for short synthetic-domain runs)")
    p.add_argument("--warmup_steps", type=int, default=None,
                   help="override the effective warmup step count")
    p.add_argument("--milestones", type=int, nargs="+", default=None,
                   help="override LR-decay milestones, in EPOCHS "
                        "(epoch = one pass over the pair list). The "
                        "reference defaults (trainer/config.py MSLR) "
                        "assume ~1e4-step epochs; on small synthetic "
                        "stores they collapse the LR within ~1.5k steps")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batch-prefetch worker threads (0 = synchronous)")
    p.add_argument("--augmentation", default="dark",
                   choices=["dark", "mobile", "none"],
                   help="photometric augmentation (ref WALK train uses "
                        "'dark', datasets/walk/__init__.py:32)")
    p.add_argument("--on_nonfinite", default="abort",
                   choices=["abort", "skip"],
                   help="divergence guard (SURVEY §5 failure detection): "
                        "every step's loss is checked; 'abort' raises on "
                        "the first non-finite loss, 'skip' reverts the "
                        "update and skips the batch (aborts after "
                        "--max_nonfinite consecutive skips)")
    p.add_argument("--max_nonfinite", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gim_tpu.config import GimConfig, LoFTRConfig, replace
    from gim_tpu.data.video import FrameCache
    from gim_tpu.data.walk import WalkDataset
    from gim_tpu.parallel.mesh import make_mesh
    from gim_tpu.train.loop import loftr_train_step, make_optimizer

    n_dev = len(jax.devices())
    mesh = make_mesh(data_axis=n_dev, model_axis=1)

    default_sizes = {"gim_loftr": 840, "gim_lightglue": 1024,
                     "gim_dkm": 672, "gim_roma": 672}
    args.img_size = args.img_size or default_sizes[args.weight]
    args.ckpt_dir = args.ckpt_dir or f"checkpoints/{args.weight}"

    cfg = GimConfig(loftr=LoFTRConfig(max_matches=1024))
    if args.weight == "gim_loftr":
        from gim_tpu.models.loftr import init_params

        init = lambda k: init_params(k, cfg.loftr,
                                     (args.img_size, args.img_size))
        step_fn = loftr_train_step
    elif args.weight == "gim_lightglue":
        from gim_tpu.api import Matcher
        from gim_tpu.train.lightglue_loop import lightglue_train_step

        init = lambda k: Matcher("gim_lightglue", cfg, rng=k).variables
        step_fn = lightglue_train_step
    elif args.weight == "gim_dkm":
        from gim_tpu.models.dkm import init_params as dkm_init
        from gim_tpu.train.dense_losses import dkm_train_step

        # README.md:242: gim-dkm trains at 896x672 (w x h); the model
        # resolution follows --img_size so training compute actually runs
        # at the requested size (train_corresps resizes to h/w_resized)
        cfg = replace(cfg, dkm=replace(cfg.dkm, upsample_preds=False,
                                       h_resized=args.img_size,
                                       w_resized=args.img_size))
        init = lambda k: dkm_init(k, cfg.dkm, input_hw=(args.img_size,
                                                        args.img_size))
        step_fn = dkm_train_step
    else:  # gim_roma
        from gim_tpu.models.roma import init_params as roma_init
        from gim_tpu.train.dense_losses import roma_train_step

        cfg = replace(cfg, roma=replace(cfg.roma, upsample_preds=False))
        init = lambda k: roma_init(k, cfg.roma)
        step_fn = roma_train_step

    # effective-LR / warmup overrides: rewrite the canonical quantities so
    # true_lr()/true_warmup() come out at the requested values
    if (args.lr is not None or args.warmup_steps is not None
            or args.milestones is not None):
        t = cfg.trainer
        world = n_dev * args.batch_size
        t = replace(
            t,
            canonical_bs=world,
            canonical_lr=(args.lr if args.lr is not None
                          else t.true_lr(n_dev, args.batch_size)),
            warmup_steps=(args.warmup_steps if args.warmup_steps is not None
                          else t.true_warmup(n_dev, args.batch_size)),
            scheduler_milestones=(tuple(args.milestones)
                                  if args.milestones is not None
                                  else t.scheduler_milestones))
        cfg = replace(cfg, trainer=t)

    # cache BESIDE the store, not inside it (ADVICE r4: a cleanup that
    # re-lists the propagate dir must not trip over / wipe the frame cache)
    cache_dir = os.path.normpath(
        os.path.join(args.labels_root, os.pardir, "_frames"))
    cache = FrameCache(args.video, cache_dir)
    ds = WalkDataset(cache.frame, args.labels_root, args.img_size,
                     args.max_labels,
                     augmentation=(None if args.augmentation == "none"
                                   else args.augmentation))
    if len(ds) == 0:
        raise SystemExit("no propagated labels found; run "
                         "gim_tpu.cli.video_preprocessor + propagate first")
    print(f"[train] {args.weight}: {len(ds)} training pairs, "
          f"{n_dev} devices")

    variables = init(jax.random.PRNGKey(cfg.trainer.seed))
    tx = make_optimizer(cfg.trainer, n_dev, args.batch_size,
                        steps_per_epoch=max(len(ds), 1))
    # lightglue optimizes the FULL variables (SuperPoint bootstraps jointly
    # from scratch — train/lightglue_loop.py module docstring)
    opt_target = (variables if args.weight == "gim_lightglue"
                  else variables["params"])
    opt_state = tx.init(opt_target)

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

    def make_batch(dset, rng):
        samples = []
        while len(samples) < B:
            s = dset[int(rng.integers(0, len(dset)))]
            if s is not None:
                samples.append(s)
        return {
            "color0": np.stack([s.color0 for s in samples]),
            "color1": np.stack([s.color1 for s in samples]),
            "labels": np.stack([s.labels for s in samples]),
            "label_valid": np.stack([s.label_valid for s in samples]),
        }

    # Threaded batch prefetch: the step is input-bound (measured: device
    # ~0.02-0.2 s vs ~1.3-2 s host decode+augment per batch on the 1-core
    # host), and cv2/numpy release the GIL, so building the next batches
    # while the device runs recovers most of the host time. Each producer
    # gets its own WalkDataset (np.random.Generator is not thread-safe);
    # they share the FrameCache (GIL-atomic dict ops).
    import queue as _queue
    import threading

    def make_ds(seed):
        return WalkDataset(cache.frame, args.labels_root, args.img_size,
                           args.max_labels,
                           augmentation=(None if args.augmentation == "none"
                                         else args.augmentation), seed=seed)

    bq: "_queue.Queue" = _queue.Queue(maxsize=max(args.prefetch, 1) * 2)
    stop_flag = threading.Event()

    def _producer(worker_id):
        dset = make_ds(cfg.trainer.seed + 1 + worker_id)
        rng = np.random.default_rng(cfg.trainer.seed + 1000 + worker_id)
        while not stop_flag.is_set():
            b = make_batch(dset, rng)
            while not stop_flag.is_set():
                try:
                    bq.put(b, timeout=1.0)
                    break
                except _queue.Full:
                    pass

    producers = [threading.Thread(target=_producer, args=(i,), daemon=True)
                 for i in range(max(args.prefetch, 0))]
    for th in producers:
        th.start()
    main_rng = np.random.default_rng(cfg.trainer.seed)

    def next_batch():
        return bq.get() if producers else make_batch(ds, main_rng)

    t0 = time.time()
    nonfinite_streak = 0
    with mesh:
        for step in range(start, args.max_steps):
            batch = jax.device_put(next_batch(), data_sh)
            prev = (variables, opt_state)
            variables, opt_state, logs = step_fn(
                cfg, tx, variables, opt_state, batch)
            # Divergence guard: a scalar fetch per step is ~free (the loop
            # is host-input-bound) and stops a NaN run at step 1 instead of
            # hours later (round-4 lightglue arm burned 280+ NaN steps).
            loss_val = float(logs["loss"])
            if not np.isfinite(loss_val):
                nonfinite_streak += 1
                detail = " ".join(f"{k}={float(v):.4g}"
                                  for k, v in sorted(logs.items()))
                msg = (f"[train] NON-FINITE loss at step {step + 1}: "
                       f"{detail}")
                if (args.on_nonfinite == "abort"
                        or nonfinite_streak > args.max_nonfinite):
                    stop_flag.set()
                    raise SystemExit(
                        msg + " — aborting (run tools/debug_lightglue_nan.py"
                        " or the head's repro to find the first non-finite"
                        " grad leaf)")
                print(msg + f" — reverting update and skipping batch "
                      f"({nonfinite_streak}/{args.max_nonfinite})",
                      flush=True)
                variables, opt_state = prev
                continue
            nonfinite_streak = 0
            if (step + 1) % args.log_interval == 0:
                dt = time.time() - t0
                extra = " ".join(f"{k} {float(v):.4f}"
                                 for k, v in sorted(logs.items())
                                 if k != "loss")
                print(f"[train] step {step + 1} loss "
                      f"{float(logs['loss']):.4f} ({extra}) {dt:.1f}s",
                      flush=True)
            if (step + 1) % args.save_interval == 0:
                mgr.save(step + 1, args=ocp.args.StandardSave(
                    {"variables": variables, "opt_state": opt_state}))
    stop_flag.set()
    if args.max_steps % args.save_interval != 0 and args.max_steps > start:
        mgr.save(args.max_steps, args=ocp.args.StandardSave(
            {"variables": variables, "opt_state": opt_state}))
    mgr.wait_until_finished()
    print(f"[train] done; checkpoints at {args.ckpt_dir}")


if __name__ == "__main__":
    main()
