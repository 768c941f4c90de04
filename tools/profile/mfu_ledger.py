"""FLOPs/MFU ledger for gim_loftr (VERDICT round-2 item 5).

Counts per-stage FLOPs by LOWERING each stage (XLA cost analysis — no
device needed, runs on the CPU backend) at the ZEB eval resolutions
832/1216/1600, then combines them with measured TPU throughput to state
model FLOPs utilization:

    MFU = (FLOPs/pair * pairs/s) / chip peak FLOP/s

Usage (CPU, fast):
    JAX_PLATFORMS=cpu python tools/profile/mfu_ledger.py --img 832 --bs 8 \
        --pairs_per_s 37.9 --peak_tflops 197

Peak bf16 dense TFLOP/s by chip: v4 275, v5e 197, v5p 459, v6e 918.
The bench chip (BENCH_r*.json) is a v5e unless noted.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp


def flops_of(fn, *args) -> float:
    """FLOPs estimate from XLA cost analysis (CPU compile)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if cost is None:
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=832)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--pairs_per_s", type=float, default=None,
                   help="measured end-to-end throughput at this config")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip peak bf16 dense TFLOP/s (v5e 197)")
    args = p.parse_args()

    from gim_tpu.config import LoFTRConfig
    from gim_tpu.models.loftr.backbone import ResNetFPN
    from gim_tpu.models.loftr.transformer import LocalFeatureTransformer

    S, B = args.img, args.bs
    L = (S // 8) ** 2
    cfg = LoFTRConfig(dtype="bfloat16")
    key = jax.random.PRNGKey(0)

    ledger: dict[str, float] = {}

    # backbone: one forward over the 2B-image concat batch (RGB)
    bb = ResNetFPN(dtype="bfloat16")
    x = jnp.zeros((2 * B, S, S, 3), jnp.bfloat16)
    vb = jax.eval_shape(bb.init, key, x)
    vb = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), vb)
    ledger["backbone (2B imgs)"] = flops_of(
        lambda v, xx: bb.apply(v, xx), vb, x)

    # coarse transformer: 4 (self, cross) linear-attention pairs
    tr = LocalFeatureTransformer(d_model=256, nhead=8, n_pairs=4,
                                 attention="linear", dtype="bfloat16")
    f0 = jnp.zeros((B, L, 256), jnp.bfloat16)
    vt = jax.eval_shape(tr.init, key, f0, f0)
    vt = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), vt)
    ledger["coarse transformer"] = flops_of(
        lambda v, a, b: tr.apply(v, a, b), vt, f0, f0)

    # coarse matching: similarity matmul + dual softmax (dense form)
    def matching(a, b):
        sim = jnp.einsum("bld,bsd->bls", a, b) / (0.1 * 256)
        return jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 2)

    ledger["dual-softmax match"] = flops_of(matching, f0, f0)

    # fine stage: window gather + 1-layer transformer + expectation,
    # approximated by its dominant matmuls at max_matches=2048, w=5
    M, Wn, Df = 2048, 25, 128
    ff = jnp.zeros((B, M * Wn, Df), jnp.bfloat16)
    trf = LocalFeatureTransformer(d_model=Df, nhead=8, n_pairs=1,
                                  attention="linear", dtype="bfloat16")
    vf = jax.eval_shape(trf.init, key, ff, ff)
    vf = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), vf)
    ledger["fine transformer"] = flops_of(
        lambda v, a, b: trf.apply(v, a, b), vf, ff, ff)

    total = sum(ledger.values())
    print(f"# gim_loftr FLOPs ledger @ {S}px bs{B} (L={L})")
    for k, v in ledger.items():
        print(f"  {k:24s} {v/1e9:10.1f} GFLOP/batch "
              f"({v/B/1e9:7.1f} /pair, {100*v/total:5.1f}%)")
    print(f"  {'TOTAL':24s} {total/1e9:10.1f} GFLOP/batch "
          f"({total/B/1e9:7.1f} /pair)")

    if args.pairs_per_s:
        per_pair = total / B
        achieved = per_pair * args.pairs_per_s
        mfu = achieved / (args.peak_tflops * 1e12)
        print(f"\n  measured {args.pairs_per_s:.2f} pairs/s -> "
              f"{achieved/1e12:.2f} TFLOP/s achieved")
        print(f"  MFU vs {args.peak_tflops:.0f} TFLOP/s peak: "
              f"{100*mfu:.2f}%")


if __name__ == "__main__":
    main()
