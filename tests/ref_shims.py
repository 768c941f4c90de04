"""Test-time dependency shims so the REFERENCE's own torch models
(/root/reference/networks) can be imported as parity oracles in this
environment, which lacks torchvision / xformers / kornia / yacs / loguru.

The shims reproduce only the public semantics the reference exercises:
- torchvision.models.resnet50 / vgg19_bn with torchvision's exact module
  naming (state-dict compatible — the weight-port rules depend on it),
- xformers.ops.memory_efficient_attention / unbind / SwiGLU,
- kornia dsnt.spatial_expectation2d + create_meshgrid,
- yacs CfgNode, loguru/joblib stubs.

This module is test infrastructure: it ships no reference code, it lets
tests instantiate the reference graphs (random weights) as oracles for
full-model torch-vs-JAX parity (VERDICT round-1 item 2).
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision.models — ResNet-50 and VGG19-BN with torchvision naming
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3),
                 replace_stride_with_dilation=None):
        super().__init__()
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2,
                                       replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], 2,
                                       replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], 2,
                                       replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              previous_dilation)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes,
                               dilation=self.dilation)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)


def _resnet50(pretrained=False, weights=None,
              replace_stride_with_dilation=None, **kw):
    assert not pretrained and weights is None, \
        "shim provides architecture only (no downloads in this env)"
    return _ResNet((3, 4, 6, 3), replace_stride_with_dilation)


_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class _VGG(nn.Module):
    def __init__(self):
        super().__init__()
        layers, cin = [], 3
        for v in _VGG19_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(cin, v, 3, padding=1),
                           nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
                cin = v
        self.features = nn.Sequential(*layers)


def _vgg19_bn(pretrained=False, **kw):
    assert not pretrained
    return _VGG()


# ---------------------------------------------------------------------------
# xformers.ops
# ---------------------------------------------------------------------------

def _memory_efficient_attention(q, k, v, attn_bias=None):
    """xformers layout (B, M, H, K) -> (B, M, H, K), exact math."""
    scale = q.shape[-1] ** -0.5
    scores = torch.einsum("bmhk,bnhk->bhmn", q, k) * scale
    if attn_bias is not None:
        scores = scores + attn_bias
    attn = scores.softmax(dim=-1)
    return torch.einsum("bhmn,bnhk->bmhk", attn, v)


class _SwiGLU(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 bias=True):
        super().__init__()
        hidden_features = hidden_features or in_features
        out_features = out_features or in_features
        self.w12 = nn.Linear(in_features, 2 * hidden_features, bias=bias)
        self.w3 = nn.Linear(hidden_features, out_features, bias=bias)

    def forward(self, x):
        x12 = self.w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        return self.w3(F.silu(x1) * x2)


# ---------------------------------------------------------------------------
# kornia (dsnt + create_meshgrid, exact semantics used by LoFTR)
# ---------------------------------------------------------------------------

def _create_meshgrid(height, width, normalized_coordinates=True,
                     device=None, dtype=None):
    if normalized_coordinates:
        xs = torch.linspace(-1, 1, width, device=device, dtype=dtype)
        ys = torch.linspace(-1, 1, height, device=device, dtype=dtype)
    else:
        xs = torch.arange(width, device=device, dtype=dtype or torch.float32)
        ys = torch.arange(height, device=device, dtype=dtype or torch.float32)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1)[None]      # (1, H, W, 2)


def _spatial_expectation2d(input, normalized_coordinates=True):
    """input: (B, C, H, W) probability maps -> (B, C, 2) expected (x, y)."""
    B, C, H, W = input.shape
    grid = _create_meshgrid(H, W, normalized_coordinates,
                            input.device, input.dtype)   # (1, H, W, 2)
    p = input.reshape(B, C, H * W)
    g = grid.reshape(1, H * W, 2)
    ex = (p * g[..., 0].unsqueeze(1)).sum(-1)
    ey = (p * g[..., 1].unsqueeze(1)).sum(-1)
    return torch.stack([ex, ey], dim=-1)


# ---------------------------------------------------------------------------
# omegaconf (the exact API surface networks/lightglue exercises:
# create/merge/set_struct/set_readonly + read_write/open_dict contexts +
# attribute access over nested nodes)
# ---------------------------------------------------------------------------

class _OCNode(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _oc_create(obj=None):
    if obj is None:
        return _OCNode()
    if isinstance(obj, dict):
        return _OCNode({k: _oc_create(v) if isinstance(v, dict) else v
                        for k, v in obj.items()})
    return obj


def _oc_merge(*confs):
    out = _OCNode()

    def merge(a, b):
        for k, v in dict(b).items():
            if isinstance(v, dict) and isinstance(a.get(k), dict):
                merge(a[k], v)
            else:
                a[k] = _oc_create(v) if isinstance(v, dict) else v

    for c in confs:
        merge(out, c if isinstance(c, dict) else dict(c))
    return out


class _OmegaConf:
    create = staticmethod(_oc_create)
    merge = staticmethod(_oc_merge)

    @staticmethod
    def set_struct(conf, flag):
        pass

    @staticmethod
    def set_readonly(conf, flag):
        pass

    @staticmethod
    def to_container(conf, resolve=True):
        return {k: (_OmegaConf.to_container(v) if isinstance(v, dict) else v)
                for k, v in conf.items()}


import contextlib


@contextlib.contextmanager
def _oc_ctx(conf):
    yield conf


# ---------------------------------------------------------------------------
# yacs / loguru / joblib stubs
# ---------------------------------------------------------------------------

class _CfgNode(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        def merge(a, b):
            for k, v in b.items():
                if isinstance(v, dict) and isinstance(a.get(k), dict):
                    merge(a[k], v)
                else:
                    a[k] = v

        merge(self, other)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install():
    """Register shims in sys.modules and put /root/reference on sys.path.
    Idempotent. Must run before importing `networks.*`."""
    global _installed
    if _installed:
        return
    _installed = True

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        models = _mod("torchvision.models", resnet50=_resnet50,
                      vgg19_bn=_vgg19_bn,
                      resnet18=None, resnet101=None, wide_resnet50_2=None)

        class _Resize(nn.Module):
            def __init__(self, size, interpolation=None, **kw):
                super().__init__()
                self.size = size

            def forward(self, x):
                return F.interpolate(x[None] if x.dim() == 3 else x,
                                     size=self.size, mode="bilinear",
                                     align_corners=False).squeeze(0)

        class _Normalize(nn.Module):
            def __init__(self, mean, std, **kw):
                super().__init__()
                self.mean, self.std = mean, std

            def forward(self, x):
                mean = torch.tensor(self.mean, device=x.device)[:, None, None]
                std = torch.tensor(self.std, device=x.device)[:, None, None]
                return (x - mean) / std

        class _Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class _ToTensor:
            def __call__(self, x):
                import numpy as np

                return torch.from_numpy(np.asarray(x)).permute(2, 0, 1) / 255.

        transforms = _mod("torchvision.transforms", Resize=_Resize,
                          Normalize=_Normalize, Compose=_Compose,
                          ToTensor=_ToTensor)

        class _InterpolationMode:
            BILINEAR = "bilinear"
            BICUBIC = "bicubic"
            NEAREST = "nearest"

        _mod("torchvision.transforms.functional",
             InterpolationMode=_InterpolationMode)
        transforms.functional = sys.modules["torchvision.transforms.functional"]
        tv.models = models
        tv.transforms = transforms

    if "xformers" not in sys.modules:
        xf = _mod("xformers")
        ops = _mod("xformers.ops",
                   memory_efficient_attention=_memory_efficient_attention,
                   unbind=torch.unbind, SwiGLU=_SwiGLU)
        xf.ops = ops

    if "kornia" not in sys.modules:
        kornia = _mod("kornia")
        geometry = _mod("kornia.geometry")
        dsnt = _mod("kornia.geometry.subpix.dsnt",
                    spatial_expectation2d=_spatial_expectation2d)
        subpix = _mod("kornia.geometry.subpix", dsnt=dsnt)
        utils = _mod("kornia.utils")
        grid = _mod("kornia.utils.grid", create_meshgrid=_create_meshgrid)
        aug = _mod("kornia.augmentation")
        kornia.geometry = geometry
        geometry.subpix = subpix
        kornia.utils = utils
        utils.grid = grid
        kornia.augmentation = aug

    if "omegaconf" not in sys.modules:
        _mod("omegaconf", OmegaConf=_OmegaConf, read_write=_oc_ctx,
             open_dict=_oc_ctx, DictConfig=_OCNode)

    if "yacs" not in sys.modules:
        yacs = _mod("yacs")
        config = _mod("yacs.config", CfgNode=_CfgNode)
        yacs.config = config

    if "loguru" not in sys.modules:
        class _Logger:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        _mod("loguru", logger=_Logger(), _Logger=_Logger)

    if "joblib" not in sys.modules:
        _mod("joblib", Parallel=None, delayed=None)
