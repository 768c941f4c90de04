"""Convert reference torch checkpoints to native flax msgpack bundles.

`python -m gim_tpu.cli.convert_ckpt --model gim_loftr \
    --ckpt weights/gim_loftr_50h.ckpt --out weights/gim_loftr_50h.msgpack`

The msgpack bundle loads in milliseconds without torch and is the native
weight format of this framework (the .ckpt path stays supported through
gim_tpu.api.Matcher.from_checkpoint for drop-in reference compatibility).
"""

from __future__ import annotations

import argparse


def convert(model: str, ckpt: str, out: str, dinov2: str | None = None):
    import flax.serialization

    from gim_tpu.weights import port

    sd = port.load_torch_state_dict(ckpt)
    if model == "gim_lightglue":
        sp_sd, lg_sd = port.split_gim_lightglue(sd)
        variables = {"superpoint": port.port_superpoint(sp_sd),
                     "lightglue": port.port_lightglue(lg_sd)}
    elif model == "gim_loftr":
        variables = port.port_loftr(sd)
    elif model == "gim_dkm":
        variables = port.port_dkm(sd)
    elif model == "gim_roma":
        dino_sd = port.load_torch_state_dict(dinov2) if dinov2 else None
        variables = port.port_roma(sd, dino_sd)
    elif model == "semseg":
        dec = port.load_torch_state_dict(dinov2)  # decoder path via --dinov2
        variables = port.port_semseg(sd, dec)
    else:
        raise SystemExit(f"unknown model {model}")

    with open(out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(variables))
    print(f"[convert] wrote {out}")
    return variables


def load_msgpack(path: str):
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["gim_lightglue", "gim_loftr", "gim_dkm",
                            "gim_roma", "semseg"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dinov2", default=None,
                   help="dinov2 ckpt (gim_roma) / decoder ckpt (semseg)")
    args = p.parse_args(argv)
    convert(args.model, args.ckpt, args.out, args.dinov2)


if __name__ == "__main__":
    main()
