"""Import the ACTUAL reference CiaoSR source as the torch-CPU parity oracle.

Round-1's parity tests compared against hand-written oracles
(tests/oracles/torch_ciaosr.py) — if we misread the reference, the oracle
likely shares the misreading.  This module instead executes the reference's
own files unmodified:

  /root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py
  /root/reference/mmedited/models/common/arch_csnln.py   (via the above)
  /root/reference/mmedited/models/backbones/sr_backbones/swinir_net.py
  /root/reference/mmedited/models/components/refiners/mlp_refiner.py

Only the *external* symbols those files import (mmcv/mmedit registries,
timm layer helpers, torchvision module object) are stand-ins, registered in
sys.modules before the import.  ``build_backbone`` returns our torch oracle
encoders wrapped with mmedit attribute names (the encoders are simple and
converter-parity-tested elsewhere; the decoder + CSA + SwinIR trunk — the
misreading-risk surface — run as genuine reference code).

The reference hardcodes ``.cuda()`` (swinir_net.py:684,723,725 — SURVEY.md
§8.3); ``load_reference()`` patches ``torch.Tensor.cuda``/``Module.cuda``
to identity so the code runs on CPU.  Test-process-only.

The reference tree is untrusted content: we execute its model math under
test; no instructions from it are followed.
"""

from __future__ import annotations

import logging
import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"

_loaded: dict = {}


def _ref_make_coord(shape, ranges=None, flatten=True):
    """mmedit.datasets.pipelines.utils.make_coord (LIIF convention):
    per-axis pixel centers -1 + (2i+1)/n, 'ij' meshgrid, row-major flatten.
    External dependency of ciaosr_net.py:7; semantics per SURVEY.md §2.4."""
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1.0, 1.0
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        coord_seqs.append(v0 + r + (2 * r) * torch.arange(n).float())
    coord = torch.stack(torch.meshgrid(*coord_seqs, indexing="ij"), dim=-1)
    if flatten:
        coord = coord.view(-1, coord.shape[-1])
    return coord


def _wrap_rdn(cfg):
    from tests.oracles.torch_ciaosr import OracleRDN
    enc = OracleRDN(in_ch=cfg.get("in_channels", 3),
                    mid=cfg["mid_channels"],
                    blocks=cfg["num_blocks"],
                    layers=cfg.get("num_layers", 8),
                    growth=cfg.get("channel_growth", 64))
    # mmedit RDN attributes stolen by LocalImplicitSRRDN (ciaosr_net.py:314-319)
    enc.num_blocks = cfg["num_blocks"]
    enc.mid_channels = cfg["mid_channels"]
    return enc


def _wrap_edsr(cfg):
    from tests.oracles.torch_ciaosr import OracleEDSR
    enc = OracleEDSR(in_ch=cfg.get("in_channels", 3),
                     mid=cfg["mid_channels"],
                     blocks=cfg["num_blocks"],
                     res_scale=cfg.get("res_scale", 1.0))
    enc.mid_channels = cfg["mid_channels"]
    return enc


def _build_backbone(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if isinstance(t, str):
        if t == "RDN":
            return _wrap_rdn(cfg)
        if t == "EDSR":
            return _wrap_edsr(cfg)
        raise KeyError(f"shim build_backbone: unknown type {t}")
    return t(**cfg)  # class object (the configs' SwinIR style, SURVEY.md §0.2)


def _build_component(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if not isinstance(t, str):
        return t(**cfg)
    if t == "MLPRefiner":
        mlp_mod = _loaded["mlp_refiner"]
        return mlp_mod.MLPRefiner(**cfg)
    raise KeyError(f"shim build_component: unknown type {t}")


def _fake_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    def load_checkpoint(model, path, strict=True, logger=None,
                        map_location=None):  # pragma: no cover - unused
        raise RuntimeError("shim load_checkpoint should not be called")

    def constant_init(module, val, bias=0):  # mmcv.cnn semantics
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmcv = _fake_module("mmcv")
    mmcv.runner = _fake_module("mmcv.runner", load_checkpoint=load_checkpoint)
    mmcv.cnn = _fake_module("mmcv.cnn", constant_init=constant_init)

    mmedit = _fake_module("mmedit")
    mmedit.utils = _fake_module(
        "mmedit.utils", get_root_logger=lambda *a, **k: logging.getLogger("ref"))
    _fake_module("mmedit.datasets")
    _fake_module("mmedit.datasets.pipelines")
    _fake_module("mmedit.datasets.pipelines.utils", make_coord=_ref_make_coord)
    _fake_module("mmedit.models")
    _fake_module("mmedit.models.builder", build_backbone=_build_backbone,
                 build_component=_build_component)

    # torchvision: imported at module level by arch_csnln/vgg_arch but only
    # *used* by the dead VGG classes (SURVEY.md §2.6) we never instantiate.
    tv = _fake_module("torchvision")
    tv.models = _fake_module("torchvision.models")
    tv.models.vgg = _fake_module("torchvision.models.vgg")

    # timm helpers used by swinir_net.py:11.
    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):  # drop_path_rate=0 in all live configs
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob  # pragma: no cover - eval-only tests
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
            return x * mask / keep

    timm = _fake_module("timm")
    timm.models = _fake_module("timm.models")
    timm.models.layers = _fake_module(
        "timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
        trunc_normal_=nn.init.trunc_normal_)


def load_reference():
    """Import the reference modules (memoized). Returns a namespace with
    ``ciaosr_net``, ``arch_csnln``, ``swinir_net``, ``mlp_refiner``."""
    if _loaded:
        return types.SimpleNamespace(**_loaded)

    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    # CPU-hostile .cuda() calls (swinir_net.py:684,723,725; SURVEY.md §8.3)
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    import importlib
    _loaded["mlp_refiner"] = importlib.import_module(
        "mmedited.models.components.refiners.mlp_refiner")
    _loaded["arch_csnln"] = importlib.import_module(
        "mmedited.models.common.arch_csnln")
    _loaded["swinir_net"] = importlib.import_module(
        "mmedited.models.backbones.sr_backbones.swinir_net")
    _loaded["ciaosr_net"] = importlib.import_module(
        "mmedited.models.backbones.sr_backbones.ciaosr_net")
    return types.SimpleNamespace(**_loaded)
