"""Torch checkpoint -> flax params conversion.

Implements the reference's load-bearing key-remap conventions
(ref demo.py:355-395, trainer/lightning.py:68-99):
- unwrap 'state_dict',
- gim_lightglue ckpts hold detector under 'superpoint.' and matcher under
  'model.',
- gim_dkm/gim_roma strip 'model.' and drop 'encoder.net.fc',
- gim_loftr ckpts load as-is (keys already match).

Tensor layout conversion: torch Conv2d OIHW -> flax HWIO; torch Linear
(out, in) -> flax Dense (in, out); LayerNorm weight -> scale.
torch is used host-side for deserialization only.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def split_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class Mapper:
    """Accumulates torch-key -> flax-path assignments, tracks leftovers."""

    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.tree: dict = {}
        self.stats: dict = {}

    def conv(self, tkey: str, fpath: str, bias: bool = True):
        _set(self.tree, fpath + "/kernel", conv_kernel(self.sd.pop(tkey + ".weight")))
        if bias and tkey + ".bias" in self.sd:
            _set(self.tree, fpath + "/bias", self.sd.pop(tkey + ".bias"))

    def dense(self, tkey: str, fpath: str):
        _set(self.tree, fpath + "/kernel", dense_kernel(self.sd.pop(tkey + ".weight")))
        if tkey + ".bias" in self.sd:
            _set(self.tree, fpath + "/bias", self.sd.pop(tkey + ".bias"))

    def layernorm(self, tkey: str, fpath: str):
        _set(self.tree, fpath + "/scale", self.sd.pop(tkey + ".weight"))
        _set(self.tree, fpath + "/bias", self.sd.pop(tkey + ".bias"))

    def batchnorm(self, tkey: str, fpath: str):
        """torch BN -> flax BatchNorm: scale/bias into params, running
        mean/var into the batch_stats collection."""
        _set(self.tree, fpath + "/scale", self.sd.pop(tkey + ".weight"))
        _set(self.tree, fpath + "/bias", self.sd.pop(tkey + ".bias"))
        _set(self.stats, fpath + "/mean", self.sd.pop(tkey + ".running_mean"))
        _set(self.stats, fpath + "/var", self.sd.pop(tkey + ".running_var"))
        self.sd.pop(tkey + ".num_batches_tracked", None)

    def raw(self, tkey: str, fpath: str, fn: Callable = lambda x: x):
        _set(self.tree, fpath, fn(self.sd.pop(tkey)))

    def drop(self, *patterns: str):
        for k in list(self.sd):
            if any(p in k for p in patterns):
                self.sd.pop(k)


# ---------------------------------------------------------------------------
# gim_lightglue
# ---------------------------------------------------------------------------

def split_gim_lightglue(sd: dict) -> tuple[dict, dict]:
    """A gim_lightglue ckpt -> (superpoint_sd, lightglue_sd)
    (ref demo.py:378-395)."""
    return split_prefix(sd, "superpoint."), split_prefix(sd, "model.")


def port_superpoint(sd: dict) -> dict:
    """SuperPoint torch state dict -> flax params for SuperPointNet."""
    m = Mapper(sd)
    for name in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]:
        m.conv(name, name)
    assert not m.sd, f"unmapped superpoint keys: {list(m.sd)[:8]}"
    return {"params": m.tree}


def port_lightglue(sd: dict, n_layers: int = 9) -> dict:
    """LightGlue torch state dict -> flax params for models.lightglue.LightGlue.

    Only the static-depth eval path is populated: per-layer token_confidence
    heads and intermediate log_assignment heads (early-exit machinery, off by
    default ref :316-317) are dropped except the final assignment.
    """
    m = Mapper(sd)
    m.dense("posenc.Wr", "posenc/Wr")
    if any(k.startswith("input_proj.") for k in m.sd):
        m.dense("input_proj", "input_proj")
    for i in range(n_layers):
        sa = f"transformers.{i}.self_attn"
        m.dense(f"{sa}.Wqkv", f"self_{i}/Wqkv")
        m.dense(f"{sa}.out_proj", f"self_{i}/out_proj")
        m.dense(f"{sa}.ffn.0", f"self_{i}/ffn/fc1")
        m.layernorm(f"{sa}.ffn.1", f"self_{i}/ffn/norm")
        m.dense(f"{sa}.ffn.3", f"self_{i}/ffn/fc2")
        ca = f"transformers.{i}.cross_attn"
        m.dense(f"{ca}.to_qk", f"cross_{i}/to_qk")
        m.dense(f"{ca}.to_v", f"cross_{i}/to_v")
        m.dense(f"{ca}.to_out", f"cross_{i}/to_out")
        m.dense(f"{ca}.ffn.0", f"cross_{i}/ffn/fc1")
        m.layernorm(f"{ca}.ffn.1", f"cross_{i}/ffn/norm")
        m.dense(f"{ca}.ffn.3", f"cross_{i}/ffn/fc2")
    last = n_layers - 1
    m.dense(f"log_assignment.{last}.final_proj", "assign_final/final_proj")
    m.dense(f"log_assignment.{last}.matchability", "assign_final/matchability")
    m.drop("log_assignment.", "token_confidence.", "confidence_thresholds")
    assert not m.sd, f"unmapped lightglue keys: {list(m.sd)[:8]}"
    return {"params": m.tree}


# ---------------------------------------------------------------------------
# gim_loftr
# ---------------------------------------------------------------------------

def normalize_gim_loftr(sd: dict) -> dict:
    """Strip the ckpt's 'model.'/'matcher.' prefixes
    (ref networks/loftr/loftr.py:93-99)."""
    out = {}
    for k, v in sd.items():
        for p in ("model.", "matcher."):
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _port_resnet50_trunk(m: "Mapper", tprefix: str, fprefix: str):
    m.conv(f"{tprefix}.conv1", f"{fprefix}/conv1", bias=False)
    m.batchnorm(f"{tprefix}.bn1", f"{fprefix}/bn1")
    for li, blocks in (("1", 3), ("2", 4), ("3", 6)):
        for b in range(blocks):
            t = f"{tprefix}.layer{li}.{b}"
            f = f"{fprefix}/layer{li}_{b}"
            for c in ("1", "2", "3"):
                m.conv(f"{t}.conv{c}", f"{f}/conv{c}", bias=False)
                m.batchnorm(f"{t}.bn{c}", f"{f}/bn{c}")
            if f"{t}.downsample.0.weight" in m.sd:
                m.conv(f"{t}.downsample.0", f"{f}/down_conv", bias=False)
                m.batchnorm(f"{t}.downsample.1", f"{f}/down_bn")


def _port_loftr_transformer(m: "Mapper", tprefix: str, fprefix: str,
                            n_pairs: int):
    """ModuleList layers alternate self,cross (ref transformer.py:70-72)."""
    for i in range(n_pairs):
        for which, idx in (("self", 2 * i), ("cross", 2 * i + 1)):
            t = f"{tprefix}.layers.{idx}"
            f = f"{fprefix}/{which}_{i}"
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                m.dense(f"{t}.{p}", f"{f}/{p}")
            m.dense(f"{t}.mlp.0", f"{f}/mlp1")
            m.dense(f"{t}.mlp.2", f"{f}/mlp2")
            m.layernorm(f"{t}.norm1", f"{f}/norm1")
            m.layernorm(f"{t}.norm2", f"{f}/norm2")


def port_loftr(sd: dict, n_pairs_coarse: int = 4,
               n_pairs_fine: int = 1) -> dict:
    """gim_loftr torch state dict -> flax variables for LoFTRMatcher."""
    m = Mapper(normalize_gim_loftr(sd))
    # backbone
    _port_resnet50_trunk(m, "backbone.encode", "backbone/encode")
    for name in ("layer3_outconv", "layer2_outconv", "layer1_outconv"):
        m.conv(f"backbone.{name}", f"backbone/{name}", bias=False)
    for lo in ("layer2_outconv2", "layer1_outconv2"):
        m.conv(f"backbone.{lo}.0", f"backbone/{lo}_0", bias=False)
        m.batchnorm(f"backbone.{lo}.1", f"backbone/{lo}_bn")
        m.conv(f"backbone.{lo}.3", f"backbone/{lo}_1", bias=False)
    # transformers
    _port_loftr_transformer(m, "loftr_coarse", "loftr_coarse", n_pairs_coarse)
    _port_loftr_transformer(m, "loftr_fine", "loftr_fine", n_pairs_fine)
    # fine preprocess — present only when FINE_CONCAT_COARSE_FEAT (the
    # gim_loftr config leaves it False, ref networks/loftr/config.py:14,
    # so these keys normally don't exist)
    if "fine_preprocess.down_proj.weight" in m.sd:
        m.dense("fine_preprocess.down_proj", "fine_preprocess/down_proj")
        m.dense("fine_preprocess.merge_feat", "fine_preprocess/merge_feat")
    m.drop("coarse_matching.", "fine_matching.", "pos_encoding.")
    assert not m.sd, f"unmapped loftr keys: {list(m.sd)[:8]}"
    return {"params": m.tree, "batch_stats": m.stats}


# ---------------------------------------------------------------------------
# gim_dkm
# ---------------------------------------------------------------------------

def _port_torchvision_resnet50(m: "Mapper", tprefix: str, fprefix: str):
    """torchvision resnet50 keys -> gim_tpu.models.dkm.encoder paths."""
    m.conv(f"{tprefix}.conv1", f"{fprefix}/conv1", bias=False)
    m.batchnorm(f"{tprefix}.bn1", f"{fprefix}/bn1")
    for li, blocks in (("1", 3), ("2", 4), ("3", 6), ("4", 3)):
        for b in range(blocks):
            t = f"{tprefix}.layer{li}.{b}"
            f = f"{fprefix}/layer{li}_{b}"
            for cc in ("1", "2", "3"):
                m.conv(f"{t}.conv{cc}", f"{f}/conv{cc}", bias=False)
                m.batchnorm(f"{t}.bn{cc}", f"{f}/bn{cc}")
            if f"{t}.downsample.0.weight" in m.sd:
                m.conv(f"{t}.downsample.0", f"{f}/down_conv", bias=False)
                m.batchnorm(f"{t}.downsample.1", f"{f}/down_bn")


def _port_conv_refiner(m: "Mapper", tprefix: str, fprefix: str,
                       hidden_blocks: int = 8, has_corr: bool = True):
    """ConvRefiner Sequential blocks (conv=0, bn=1, conv2=3)
    (ref dkm.py:50-73)."""
    m.conv(f"{tprefix}.block1.0", f"{fprefix}/block1_conv1")
    m.batchnorm(f"{tprefix}.block1.1", f"{fprefix}/block1_bn")
    m.conv(f"{tprefix}.block1.3", f"{fprefix}/block1_conv2")
    for i in range(hidden_blocks):
        m.conv(f"{tprefix}.hidden_blocks.{i}.0", f"{fprefix}/hidden_{i}_conv1")
        m.batchnorm(f"{tprefix}.hidden_blocks.{i}.1", f"{fprefix}/hidden_{i}_bn")
        m.conv(f"{tprefix}.hidden_blocks.{i}.3", f"{fprefix}/hidden_{i}_conv2")
    m.conv(f"{tprefix}.out_conv", f"{fprefix}/out_conv")
    m.conv(f"{tprefix}.disp_emb", f"{fprefix}/disp_emb")


def port_dkm(sd: dict) -> dict:
    """gim_dkm torch state dict -> flax variables for DKMMatcher.

    Remap conventions per ref demo.py:355-363: strip 'model.', drop
    'encoder.net.fc'."""
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items() if "encoder.net.fc" not in k}
    m = Mapper(sd)
    _port_torchvision_resnet50(m, "encoder.net", "encoder")
    for s in ("32", "16"):
        m.conv(f"decoder.proj.{s}", f"decoder/proj_{s}")
        m.conv(f"decoder.gps.{s}.pos_conv", f"decoder/gp_{s}/pos_conv")
        d = f"decoder.embedding_decoder"
        f = f"decoder/dfn_{s}"
        m.conv(f"{d}.feat_input_modules.{s}", f"{f}/feat_input")
        for rrb in ("rrb_d", "rrb_u"):
            # DFN stores the dicts as self.rrb_d / self.rrb_u (dkm.py:229-231)
            m.conv(f"{d}.{rrb}.{s}.conv1", f"{f}/{rrb}/conv1")
            m.conv(f"{d}.{rrb}.{s}.conv2", f"{f}/{rrb}/conv2")
            m.batchnorm(f"{d}.{rrb}.{s}.bn", f"{f}/{rrb}/bn")
            m.conv(f"{d}.{rrb}.{s}.conv3", f"{f}/{rrb}/conv3")
        m.conv(f"{d}.cab.{s}.conv1", f"{f}/cab/conv1")
        m.conv(f"{d}.cab.{s}.conv2", f"{f}/cab/conv2")
        m.conv(f"{d}.terminal_module.{s}", f"{f}/terminal")
    for s, hb in (("16", 8), ("8", 8), ("4", 8), ("2", 8), ("1", 8)):
        _port_conv_refiner(m, f"decoder.conv_refiner.{s}",
                           f"decoder/refiner_{s}", hb)
    assert not m.sd, f"unmapped dkm keys: {list(m.sd)[:8]}"
    return {"params": m.tree, "batch_stats": m.stats}


# ---------------------------------------------------------------------------
# gim_roma + DINOv2
# ---------------------------------------------------------------------------

def _port_vit_block(m: "Mapper", t: str, f: str, layerscale: bool):
    m.layernorm(f"{t}.norm1", f"{f}/norm1")
    m.dense(f"{t}.attn.qkv", f"{f}/attn/qkv")
    m.dense(f"{t}.attn.proj", f"{f}/attn/proj")
    if layerscale:
        m.raw(f"{t}.ls1.gamma", f"{f}/ls1/gamma")
    m.layernorm(f"{t}.norm2", f"{f}/norm2")
    m.dense(f"{t}.mlp.fc1", f"{f}/mlp/fc1")
    m.dense(f"{t}.mlp.fc2", f"{f}/mlp/fc2")
    if layerscale:
        m.raw(f"{t}.ls2.gamma", f"{f}/ls2/gamma")


def port_dinov2(sd: dict, depth: int = 24) -> dict:
    """dinov2_vitl14_pretrain.pth -> flax params for models.dinov2.DinoViT.
    (The gim_roma ckpt does NOT contain these — the reference hides the ViT
    from DDP in a plain list, ref roma.py:612, and loads it from torch.hub.)"""
    m = Mapper(sd)
    m.raw("cls_token", "cls_token")
    m.raw("pos_embed", "pos_embed")
    m.conv("patch_embed.proj", "patch_embed")
    for i in range(depth):
        _port_vit_block(m, f"blocks.{i}", f"block_{i}", layerscale=True)
    m.layernorm("norm", "norm")
    m.drop("mask_token")
    assert not m.sd, f"unmapped dinov2 keys: {list(m.sd)[:8]}"
    return {"params": m.tree}


# torchvision vgg19_bn conv layer indices within features[:40]
_VGG19_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 23, 27, 30, 33, 36]


def port_roma(sd: dict, dinov2_sd: dict | None = None,
              n_decoder_blocks: int = 5) -> dict:
    """gim_roma torch state dict -> flax variables for RoMaMatcher.
    `dinov2_sd`: the separate DINOv2 hub checkpoint (required for a working
    matcher; without it the ViT keeps init weights)."""
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    m = Mapper(sd)
    # VGG19-bn fine encoder
    for j, idx in enumerate(_VGG19_CONV_IDX):
        m.conv(f"encoder.cnn.layers.{idx}", f"vgg/conv_{j}")
        m.batchnorm(f"encoder.cnn.layers.{idx + 1}", f"vgg/bn_{j}")
    # transformer match decoder
    for i in range(n_decoder_blocks):
        _port_vit_block(m, f"decoder.embedding_decoder.blocks.{i}",
                        f"decoder/coordinate_decoder/block_{i}",
                        layerscale=False)
    m.dense("decoder.embedding_decoder.to_out",
            "decoder/coordinate_decoder/to_out")
    # GP + projections + refiners
    m.conv("decoder.gps.16.pos_conv", "decoder/gp_16/pos_conv")
    for s in ("16", "8", "4", "2", "1"):
        m.conv(f"decoder.proj.{s}.0", f"decoder/proj_{s}_conv")
        m.batchnorm(f"decoder.proj.{s}.1", f"decoder/proj_{s}_bn")
        _port_conv_refiner(m, f"decoder.conv_refiner.{s}",
                           f"decoder/refiner_{s}", 8)
    assert not m.sd, f"unmapped roma keys: {list(m.sd)[:8]}"
    out = {"params": {"decoder": m.tree.pop("decoder"),
                      "vgg": m.tree.pop("vgg")},
           "batch_stats": m.stats}
    if dinov2_sd is not None:
        dino = port_dinov2(dinov2_sd)
        out["params"]["dino"] = dino["params"]
    return out


# ---------------------------------------------------------------------------
# mit_semseg (ADE20K segmentation: encoder_epoch_20.pth + decoder_epoch_20.pth)
# ---------------------------------------------------------------------------

def port_semseg(encoder_sd: dict, decoder_sd: dict) -> dict:
    """CSAIL resnet50dilated encoder + ppm_deepsup decoder checkpoints ->
    flax variables for models.semseg.SegmentationModel. The deepsup branch
    (cbr_deepsup/conv_last_deepsup) is training-only and dropped."""
    m = Mapper(encoder_sd)
    for i in ("1", "2", "3"):
        m.conv(f"conv{i}", f"encoder/conv{i}", bias=False)
        m.batchnorm(f"bn{i}", f"encoder/bn{i}")
    for li, blocks in (("1", 3), ("2", 4), ("3", 6), ("4", 3)):
        for b in range(blocks):
            t = f"layer{li}.{b}"
            f = f"encoder/layer{li}_{b}"
            for cc in ("1", "2", "3"):
                m.conv(f"{t}.conv{cc}", f"{f}/conv{cc}", bias=False)
                m.batchnorm(f"{t}.bn{cc}", f"{f}/bn{cc}")
            if f"{t}.downsample.0.weight" in m.sd:
                m.conv(f"{t}.downsample.0", f"{f}/down_conv", bias=False)
                m.batchnorm(f"{t}.downsample.1", f"{f}/down_bn")
    m.drop("fc.")
    assert not m.sd, f"unmapped semseg encoder keys: {list(m.sd)[:8]}"

    d = Mapper(decoder_sd)
    for i in range(4):  # pool scales (1, 2, 3, 6)
        d.conv(f"ppm.{i}.1", f"decoder/ppm_{i}_conv", bias=False)
        d.batchnorm(f"ppm.{i}.2", f"decoder/ppm_{i}_bn")
    d.conv("conv_last.0", "decoder/last_conv", bias=False)
    d.batchnorm("conv_last.1", "decoder/last_bn")
    d.conv("conv_last.4", "decoder/cls")
    d.drop("cbr_deepsup", "conv_last_deepsup", "dropout_deepsup")
    assert not d.sd, f"unmapped semseg decoder keys: {list(d.sd)[:8]}"

    params = {**m.tree, **d.tree}
    stats = {**m.stats, **d.stats}
    return {"params": params, "batch_stats": stats}
