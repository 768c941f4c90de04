"""Grad-path HBM check: AOT-compile a head's TRAIN step at the learned-loop
shape and print XLA's memory analysis — run this before flipping any perf
flag default or changing a training shape (VERDICT r4 weak #2: the
packed-corr default was A/B'd on inference only and the training run then
OOM'd on chip; this makes the grad-path cost a one-command query).

Compile-only: params/batch are abstract (jax.eval_shape), nothing executes.

  python -m tools.profile.grad_mem_check --head gim_dkm --img 640 --bs 1
  GIM_TPU_PACKED_CORR_ROWS=0 python -m tools.profile.grad_mem_check ...
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--head", default="gim_dkm",
                   choices=["gim_loftr", "gim_lightglue", "gim_dkm",
                            "gim_roma"])
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--max_labels", type=int, default=20000)
    p.add_argument("--budget_gb", type=float, default=15.0,
                   help="fail (exit 1) if peak HBM exceeds this")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gim_tpu.config import GimConfig, LoFTRConfig, replace
    from gim_tpu.train.loop import make_optimizer

    cfg = GimConfig(loftr=LoFTRConfig(max_matches=1024))
    rng = jax.random.PRNGKey(0)
    sz = args.img

    if args.head == "gim_loftr":
        from gim_tpu.train.loop import loftr_train_step as step_fn

        def init_fn():
            from gim_tpu.models.loftr import init_params
            return jax.eval_shape(lambda k: init_params(k, cfg.loftr,
                                                        (sz, sz)), rng)
    elif args.head == "gim_lightglue":
        from gim_tpu.train.lightglue_loop import (
            lightglue_train_step as step_fn)

        def init_fn():
            from gim_tpu.api import Matcher
            return jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                Matcher("gim_lightglue", cfg, rng=rng).variables)
    elif args.head == "gim_dkm":
        from gim_tpu.models.dkm import init_params as dkm_init
        from gim_tpu.train.dense_losses import dkm_train_step as step_fn

        cfg = replace(cfg, dkm=replace(cfg.dkm, upsample_preds=False,
                                       h_resized=sz, w_resized=sz))

        def init_fn():
            return jax.eval_shape(
                lambda k: dkm_init(k, cfg.dkm, input_hw=(sz, sz)), rng)
    else:
        from gim_tpu.models.roma import init_params as roma_init
        from gim_tpu.train.dense_losses import roma_train_step as step_fn

        cfg = replace(cfg, roma=replace(cfg.roma, upsample_preds=False))

        def init_fn():
            return jax.eval_shape(lambda k: roma_init(k, cfg.roma), rng)

    variables = init_fn()
    tx = make_optimizer(cfg.trainer, 1, args.bs, steps_per_epoch=100)
    opt_target = (variables if args.head == "gim_lightglue"
                  else variables["params"])
    opt_state = jax.eval_shape(tx.init, opt_target)

    B = args.bs
    batch = {
        "color0": jax.ShapeDtypeStruct((B, 3, sz, sz), jnp.float32),
        "color1": jax.ShapeDtypeStruct((B, 3, sz, sz), jnp.float32),
        "labels": jax.ShapeDtypeStruct((B, args.max_labels, 4), jnp.float32),
        "label_valid": jax.ShapeDtypeStruct((B, args.max_labels), bool),
    }

    print(f"[grad_mem] lowering {args.head} train step @ {sz}px bs{B} ...",
          flush=True)
    lowered = step_fn.lower(cfg, tx, variables, opt_state, batch)
    print("[grad_mem] compiling ...", flush=True)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gb = 1024 ** 3
    peak = None
    if m is not None:
        # field names differ across jax versions; print what exists
        for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes",
                     "peak_memory_in_bytes"):
            v = getattr(m, name, None)
            if v is not None:
                print(f"[grad_mem] {name}: {v / gb:.3f} GiB")
        temp = getattr(m, "temp_size_in_bytes", 0) or 0
        arg = getattr(m, "argument_size_in_bytes", 0) or 0
        out = getattr(m, "output_size_in_bytes", 0) or 0
        alias = getattr(m, "alias_size_in_bytes", 0) or 0
        peak = getattr(m, "peak_memory_in_bytes", None)
        if peak is None:
            peak = temp + arg + out - alias
        print(f"[grad_mem] PEAK ~= {peak / gb:.3f} GiB "
              f"(budget {args.budget_gb})")
    else:
        print("[grad_mem] memory_analysis unavailable on this backend")
    if peak is not None and peak > args.budget_gb * gb:
        raise SystemExit(f"[grad_mem] OVER BUDGET: {peak / gb:.2f} GiB "
                         f"> {args.budget_gb} GiB")
    print("[grad_mem] OK")


if __name__ == "__main__":
    main()
