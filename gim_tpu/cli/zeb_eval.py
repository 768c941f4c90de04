"""ZEB benchmark evaluation CLI.

Reference-compatible surface (ref test.py:64-128):
`python -m gim_tpu.cli.zeb_eval --weight gim_loftr --version 50h --tests GL3D
 --data_root <root> [--img_size 840] [--batch_size 1] [--max_samples N]`
writes `dump/zeb/[T] {weight} {scene:>15} {version}.txt` and prints the
aggregate AUC. `--synthetic` generates a small self-contained two-plane
benchmark first (no dataset download needed) — the harness's own
validation path.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_matcher(weight: str, ckpt: str | None, img_size: int,
                  dtype: str = "float32"):
    """Returns match(batch)->MatchResult."""
    import jax
    import jax.numpy as jnp

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig, replace as cfg_replace

    if weight == "root_sift":
        matcher = Matcher("root_sift")

        def match(batch):
            return matcher.match(
                jnp.asarray(batch["color0"]), jnp.asarray(batch["color1"]),
                jnp.asarray(batch["scale0"]), jnp.asarray(batch["scale1"]))

        return match

    cfg = GimConfig()
    if dtype != "float32":
        for head in ("loftr", "dkm", "roma"):
            cfg = cfg_replace(cfg, **{head: cfg_replace(getattr(cfg, head),
                                                        dtype=dtype)})
    # the reference keeps ALL mutual matches above threshold; our static
    # cap must scale with the coarse-cell count so KITTI-1240/ETH3D-1600
    # runs don't truncate (VERDICT round-1 weak item 6). ~840px -> 4096,
    # 1240 -> 8192, 1600 -> 16384.
    cells = (img_size // 8) ** 2
    cap = 4096
    while cap < cells // 2 and cap < 16384:
        cap *= 2
    # the merged 2-sweep Pallas matching beats dense at every size on TPU
    # and never materializes the L x S conf matrix (docs/PERF.md round 2)
    cfg = cfg_replace(cfg, loftr=cfg_replace(
        cfg.loftr, max_matches=cap,
        fused_matching=jax.default_backend() == "tpu"))
    if ckpt:
        matcher = Matcher.from_checkpoint(weight, ckpt, cfg)
    else:
        print(f"[zeb_eval] WARNING: no --ckpt; {weight} runs with random "
              "weights (harness validation only)")
        matcher = Matcher(weight, cfg)

    def match(batch):
        return matcher.match(
            jnp.asarray(batch["color0"]), jnp.asarray(batch["color1"]),
            jnp.asarray(batch["scale0"]), jnp.asarray(batch["scale1"]),
            jnp.asarray(batch["mask0"]) if "mask0" in batch else None,
            jnp.asarray(batch["mask1"]) if "mask1" in batch else None)

    return match


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weight", default="root_sift",
                   choices=["gim_roma", "gim_dkm", "gim_loftr",
                            "gim_lightglue", "root_sift"])
    p.add_argument("--version", default="v0")
    p.add_argument("--tests", default="GL3D")
    p.add_argument("--data_root", default="data")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--out_dir", default="dump/zeb")
    p.add_argument("--padding", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="square-canvas padding + mask (ref datasets/utils.py"
                        ":56-72); --no-padding feeds the bare resized frame")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seq", default=None,
                   help="explicit sequence dir under <data_root>/zeb "
                        "(required when the root holds several ad-hoc dirs)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic two-plane benchmark first")
    p.add_argument("--synthetic_pairs", type=int, default=24,
                   help="pair count for --synthetic (AUC over a handful "
                        "of pairs is too quantized to support claims)")
    p.add_argument("--overwrite", action="store_true",
                   help="re-run even if the dump file already exists")
    p.add_argument("--ransac", default="MAGSAC",
                   choices=["RANSAC", "FAST", "MAGSAC", "PROSAC", "DEFAULT",
                            "ACCURATE", "PARALLEL"],
                   help="RANSAC-zoo preset (ref test.py:51-59) mapped onto "
                        "the on-chip solver")
    args = p.parse_args(argv)

    from gim_tpu.data import zeb as Z
    from gim_tpu.eval import zeb as E
    from gim_tpu.geometry.pose import error_auc_trapezoid

    # skip-if-dump-exists (ref test.py:224-230)
    import os

    spec_early = Z.BENCHMARKS[args.tests]
    existing = E.dump_path(args.out_dir, args.weight, spec_early.scene,
                           args.version)
    if os.path.exists(existing) and not args.overwrite:
        print(f"[zeb_eval] {existing} exists; skipping "
              "(pass --overwrite to re-run)")
        return None

    if args.synthetic:
        import tempfile

        from gim_tpu.data.synthetic import write_synthetic_benchmark

        args.data_root = tempfile.mkdtemp(prefix="gim_tpu_synth_")
        write_synthetic_benchmark(args.data_root,
                                  n_pairs=args.synthetic_pairs)
        print(f"[zeb_eval] synthetic benchmark at {args.data_root}")

    spec = Z.BENCHMARKS[args.tests]
    img_size = args.img_size or spec.img_size
    pairs = Z.load_benchmark(args.data_root, args.tests, args.max_samples,
                             seq=args.seq)
    if not pairs:
        raise SystemExit(f"no pairs found under {args.data_root}/zeb")

    # multihost: shard the pair list by process (the DistributedSampler
    # analog, SURVEY §2.8 row 1); padded duplicates at the tail are dropped
    # by the identifier dedup after gather_rows_multihost.
    import jax

    n_proc, pid = jax.process_count(), jax.process_index()
    if n_proc > 1:
        # coordination-service barrier (gRPC, long timeout) — never a Gloo
        # device collective, whose ~30 s non-configurable connect window
        # trips under per-rank compile skew; the metric gather below rides
        # the same KV store (gather_rows_multihost)
        E.barrier_multihost("zeb_eval_start")
        per = -(-len(pairs) // n_proc)
        padded = pairs + pairs[:per * n_proc - len(pairs)]
        pairs = padded[pid::n_proc]
    print(f"[zeb_eval] {len(pairs)} pairs (proc {pid}/{n_proc}), "
          f"img_size {img_size}")

    match = build_matcher(args.weight, args.ckpt, img_size, args.dtype)

    def batches():
        B = args.batch_size
        for i in range(0, len(pairs), B):
            chunk = pairs[i:i + B]
            while len(chunk) < B:  # pad; dedup drops repeats
                chunk.append(chunk[-1])
            yield Z.batch_pairs([Z.load_pair_images(c, img_size, 8,
                                                    args.padding)
                                 for c in chunk])

    n_hyp, use_conf = E.RANSAC_ZOO[args.ransac]
    t0 = time.time()
    rows = E.evaluate(match, batches(), num_hypotheses=n_hyp,
                      use_conf=use_conf)
    dt = time.time() - t0
    rows = E.gather_rows_multihost(rows)
    rows_u = E.dedup_rows(rows)
    print(f"[zeb_eval] {len(rows_u)} unique pairs in {dt:.1f}s "
          f"({len(rows_u) / dt:.2f} pairs/s)")

    if pid == 0:
        path = E.write_dump(rows, args.out_dir, args.weight, spec.scene,
                            args.version)
        print(f"[zeb_eval] wrote {path}")

    aucs = error_auc_trapezoid([r["R_errs"] for r in rows_u],
                               [r["t_errs"] for r in rows_u], (5.0,))
    prec = np.mean([np.mean(r["epi_errs"] < 5e-4) if len(r["epi_errs"])
                    else 0.0 for r in rows_u])
    print(f"[zeb_eval] {spec.scene}: auc@5 {aucs['auc@5.0']:.4f}  "
          f"mean Bef.Prec {prec:.4f}")
    return aucs


if __name__ == "__main__":
    main()
