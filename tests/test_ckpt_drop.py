"""Weights-day drop readiness (VERDICT round-2 item 9).

Real gim_* checkpoints are LFS-stripped from this environment, so these
tests fabricate on-disk .ckpt files in the exact serialized layout
pytorch-lightning writes (top-level epoch/global_step/optimizer_states +
'state_dict' with the 'model.'/'superpoint.' attribute prefixes,
ref trainer/lightning.py:68-99) from the REFERENCE's own graphs, then
prove the full user path: file -> Matcher.from_checkpoint -> one eval
batch -> finite numbers, and file -> cli.convert_ckpt -> msgpack ->
identical variables. The day real ckpts appear, this path is one command
and already tested.
"""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import ref_shims

ref_shims.install()


def _lightning_ckpt(path, state_dict):
    """Serialize exactly like pl.Trainer.save_checkpoint: tensors under
    'state_dict', bookkeeping keys at top level."""
    torch.save({
        "epoch": 9,
        "global_step": 146600,
        "pytorch-lightning_version": "1.4.9",
        "state_dict": state_dict,
        "optimizer_states": [{}],
        "lr_schedulers": [{}],
        "callbacks": {},
    }, path)
    return path


def _check_convert_roundtrip(model, ckpt, out, variables, dinov2=None):
    from gim_tpu.cli.convert_ckpt import convert, load_msgpack

    conv = convert(model, ckpt, out, dinov2)
    restored = load_msgpack(out)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    flat_c = dict(jax.tree_util.tree_leaves_with_path(conv))
    assert len(flat_a) == len(flat_b) == len(flat_c)
    for p, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[p]))


@pytest.mark.slow
def test_gim_loftr_ckpt_file_to_numbers(tmp_path):
    torch.manual_seed(10)
    from networks.loftr.loftr import LoFTR as RefLoFTR
    from networks.loftr.config import get_cfg_defaults

    def _lower(c):
        if isinstance(c, dict):
            return {k.lower(): _lower(v) for k, v in c.items()}
        return c

    cfg = _lower(dict(get_cfg_defaults()))["loftr"]
    cfg["weight"] = None
    ref = RefLoFTR(cfg)
    # lightning holds the matcher as self.model -> 'model.' prefix
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    ckpt = _lightning_ckpt(str(tmp_path / "gim_loftr_50h.ckpt"), sd)

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig, LoFTRConfig

    m = Matcher.from_checkpoint(
        "gim_loftr", ckpt, GimConfig(loftr=LoFTRConfig(max_matches=64,
                                                       match_threshold=1e-4)))
    img = jnp.asarray(np.random.default_rng(0).random((1, 3, 64, 64),
                                                      ).astype(np.float32))
    res = m.match(img, img)
    assert np.isfinite(np.asarray(res.kpts0)).all()
    assert int(np.asarray(res.valid).sum()) > 0   # identical pair matches

    _check_convert_roundtrip("gim_loftr", ckpt,
                             str(tmp_path / "loftr.msgpack"), m.variables)


@pytest.mark.slow
def test_gim_lightglue_ckpt_file_to_numbers(tmp_path):
    torch.manual_seed(11)
    from networks.lightglue.superpoint import SuperPoint as RefSuperPoint
    from networks.lightglue.models.matchers.lightglue import (
        LightGlue as RefLightGlue)

    det = RefSuperPoint({"max_num_keypoints": 2048,
                         "force_num_keypoints": True,
                         "detection_threshold": 0.0, "nms_radius": 3,
                         "trainable": False})
    lgm = RefLightGlue({"filter_threshold": 0.1, "flash": False})
    sd = {f"superpoint.{k}": v for k, v in det.state_dict().items()}
    sd.update({f"model.{k}": v for k, v in lgm.state_dict().items()})
    ckpt = _lightning_ckpt(str(tmp_path / "gim_lightglue_100h.ckpt"), sd)

    from gim_tpu.api import Matcher
    from gim_tpu.config import (GimConfig, LightGlueConfig, SuperPointConfig)

    cfg = GimConfig(superpoint=SuperPointConfig(max_num_keypoints=256),
                    lightglue=LightGlueConfig(filter_threshold=0.0))
    m = Matcher.from_checkpoint("gim_lightglue", ckpt, cfg)
    img = jnp.asarray(np.random.default_rng(1).random((1, 3, 128, 160),
                                                      ).astype(np.float32))
    res = m.match(img, img)
    assert np.isfinite(np.asarray(res.kpts0)).all()

    _check_convert_roundtrip("gim_lightglue", ckpt,
                             str(tmp_path / "lg.msgpack"), m.variables)


@pytest.mark.slow
def test_gim_dkm_ckpt_file_to_numbers(tmp_path):
    torch.manual_seed(12)
    from networks.dkm.models.model_zoo.DKMv3 import DKMv3

    ref = DKMv3(None, 64, 80, upsample_preds=False)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    # the encoder deletes net.fc at construction (ref encoders.py:43) so
    # real ckpts lack it, but the reference load path defensively DROPS
    # any encoder.net.fc keys (ref trainer/lightning.py:73-77) — inject
    # them to prove our port does the same
    sd["model.encoder.net.fc.weight"] = torch.zeros(1000, 2048)
    sd["model.encoder.net.fc.bias"] = torch.zeros(1000)
    ckpt = _lightning_ckpt(str(tmp_path / "gim_dkm_100h.ckpt"), sd)

    from gim_tpu.api import Matcher
    from gim_tpu.config import DKMConfig, GimConfig

    cfg = GimConfig(dkm=DKMConfig(h_resized=64, w_resized=80,
                                  upsample_preds=False))
    m = Matcher.from_checkpoint("gim_dkm", ckpt, cfg)
    img = jnp.asarray(np.random.default_rng(2).random((1, 3, 64, 80),
                                                      ).astype(np.float32))
    res = m.match(img, img)
    assert np.isfinite(np.asarray(res.conf)).all()

    _check_convert_roundtrip("gim_dkm", ckpt,
                             str(tmp_path / "dkm.msgpack"), m.variables)


@pytest.mark.slow
def test_gim_roma_ckpt_with_sidecar_dinov2(tmp_path):
    """gim_roma ckpts ship WITHOUT the frozen DINOv2 backbone (the
    reference pulls it from torch.hub, ref roma.py:592-595);
    from_checkpoint picks up the sidecar dinov2_vitl14_pretrain.pth in the
    ckpt's directory."""
    torch.manual_seed(13)
    from networks.roma.roma import RoMa
    from networks.roma.dino import vit_large

    vit = vit_large(patch_size=14, img_size=518, init_values=1.0,
                    block_chunks=0)
    dino_sd = vit.state_dict()
    orig = torch.hub.load_state_dict_from_url
    torch.hub.load_state_dict_from_url = lambda *a, **kw: dino_sd
    try:
        ref = RoMa(img_size=[112])
    finally:
        torch.hub.load_state_dict_from_url = orig

    sd = {f"model.{k}": v for k, v in ref.state_dict().items()
          if "encoder.cnn.dinov2_vitl14" not in k}
    ckpt = _lightning_ckpt(str(tmp_path / "gim_roma_100h.ckpt"), sd)
    torch.save(dino_sd, str(tmp_path / "dinov2_vitl14_pretrain.pth"))

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig, RoMaConfig

    cfg = GimConfig(roma=RoMaConfig(coarse_res=112, upsample_preds=False))
    m = Matcher.from_checkpoint("gim_roma", ckpt, cfg)
    img = jnp.asarray(np.random.default_rng(3).random((1, 3, 112, 112),
                                                      ).astype(np.float32))
    res = m.match(img, img)
    assert np.isfinite(np.asarray(res.conf)).all()

    _check_convert_roundtrip("gim_roma", ckpt,
                             str(tmp_path / "roma.msgpack"), m.variables,
                             dinov2=str(tmp_path /
                                        "dinov2_vitl14_pretrain.pth"))
