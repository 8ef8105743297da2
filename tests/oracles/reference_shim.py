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
                        map_location=None):
        # PerceptualVGG.init_weights loads 'torchvision://vgg19'
        # (perceptual_loss.py:82-88); the shim keeps the factory's random
        # init — the parity tests export those exact weights to our side
        if isinstance(path, str) and path.startswith("torchvision://"):
            return None
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


# --------------------------------------------------------------------------
# Restorer layer (round 3): import the reference's OWN restorers + metrics —
# mmedited/models/restorers/{basic_restorer,ciaosr,real_ciaosr}.py and
# mmedited/core/evaluation/metrics.py — under additional external stand-ins
# (mmedit BaseModel/SRGAN, mmedit losses, mmcv helpers).  The stand-ins
# replicate documented mmediting-0.11 semantics (SURVEY.md §0.2: strings in
# configs resolve to external mmedit classes); everything CiaoSR-specific
# (tiling, normalization, loss routing, gating, EMA, metric protocol) runs
# as genuine reference code.
# --------------------------------------------------------------------------

class RefCfg(dict):
    """mmcv.Config stand-in: attribute access + dict protocol, as the
    reference restorers use on test_cfg/train_cfg (ciaosr.py:222-224,
    basic_restorer.py:111-124)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


class _RefBaseModel(nn.Module):
    """mmedit.models.base.BaseModel stand-in: nn.Module + parse_losses
    (mean per entry, total = sum of entries with 'loss' in the key,
    log_vars as floats — mmedit BaseModel semantics, single-process)."""

    def parse_losses(self, losses):
        from collections import OrderedDict
        log_vars = OrderedDict()
        for name, value in losses.items():
            log_vars[name] = (value.mean() if torch.is_tensor(value)
                              else sum(v.mean() for v in value))
        loss = sum(v for k, v in log_vars.items() if "loss" in k)
        log_vars["loss"] = loss
        out = OrderedDict((k, float(v.item())) for k, v in log_vars.items())
        return loss, out

    def init_weights(self, pretrained=None):
        if pretrained is not None:  # pragma: no cover
            raise RuntimeError("shim: no pretrained loading")

    def forward(self, *a, **k):  # overridden by subclasses
        raise NotImplementedError


class _RefL1Loss(nn.Module):
    """mmedit L1Loss (mean reduction)."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        super().__init__()
        assert reduction == "mean"
        self.loss_weight = loss_weight

    def forward(self, pred, target, **kw):
        return self.loss_weight * torch.abs(pred - target).mean()


class _RefGANLoss(nn.Module):
    """mmedit GANLoss, vanilla flavor (BCE-with-logits); generator loss
    scaled by loss_weight, discriminator always 1.0 — the semantics our
    losses/gan.py re-derives (reference gan_loss.py:12-131)."""

    def __init__(self, gan_type="vanilla", real_label_val=1.0,
                 fake_label_val=0.0, loss_weight=1.0):
        super().__init__()
        assert gan_type == "vanilla", "shim supports the 002 config flavor"
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        self.loss = nn.BCEWithLogitsLoss()

    def forward(self, input, target_is_real, is_disc=False):
        val = self.real_label_val if target_is_real else self.fake_label_val
        target = input.new_ones(input.size()) * val
        loss = self.loss(input, target)
        return loss if is_disc else loss * self.loss_weight


def _build_loss(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if not isinstance(t, str):
        return t(**cfg)
    if t == "L1Loss":
        return _RefL1Loss(**cfg)
    if t == "GANLoss":
        return _RefGANLoss(**cfg)
    raise KeyError(f"shim build_loss: unknown type {t}")


class _RefSRGAN(_RefBaseModel):
    """mmedit.models.restorers.srgan.SRGAN stand-in: the base-class ctor
    surface RealCiaoSR relies on (generator/disc/losses via builders,
    disc_steps/disc_init_steps from train_cfg, step_counter attr it
    deletes and re-registers, real_ciaosr.py:63-96)."""

    def __init__(self, generator, discriminator=None, gan_loss=None,
                 pixel_loss=None, perceptual_loss=None, train_cfg=None,
                 test_cfg=None, pretrained=None):
        super().__init__()
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        self.generator = _build_backbone(generator)
        self.discriminator = (_build_component(discriminator)
                              if discriminator else None)
        self.gan_loss = _build_loss(gan_loss) if gan_loss else None
        self.pixel_loss = _build_loss(pixel_loss) if pixel_loss else None
        self.perceptual_loss = (_build_loss(perceptual_loss)
                                if perceptual_loss else None)
        self.disc_steps = (1 if train_cfg is None
                           else train_cfg.get("disc_steps", 1))
        self.disc_init_steps = (0 if train_cfg is None
                                else train_cfg.get("disc_init_steps", 0))
        self.step_counter = 0
        self.fp16_enabled = False
        self.init_weights(pretrained)


def load_reference_restorers():
    """Import the reference restorer + metrics modules (memoized).
    Returns a namespace also containing everything from load_reference()."""
    load_reference()
    if "ciaosr_restorer" in _loaded:
        return types.SimpleNamespace(**_loaded)

    import numpy as np

    from ciaosr_tpu.core import color as our_color
    from ciaosr_tpu.core.color import bgr2ycbcr

    def _mm_tensor2img(tensor, out_type=np.uint8, min_max=(0, 1)):
        # mmedit tensor2img for the shapes the restorers emit (1,C,H,W):
        # clamp to min_max, CHW→HWC, RGB→BGR, ×255 round (batch-1 case)
        t = tensor.detach().float().cpu()
        if t.ndim == 4:
            assert t.shape[0] == 1, "shim tensor2img: batch-1 only"
            t = t[0]
        img = t.numpy().transpose(1, 2, 0)
        return our_color.tensor2img(img, out_type=out_type, min_max=min_max)

    mmcv = sys.modules["mmcv"]
    mmcv.bgr2ycbcr = bgr2ycbcr

    def auto_fp16(apply_to=None):
        def deco(fn):
            return fn
        return deco

    sys.modules["mmcv.runner"].auto_fp16 = auto_fp16
    _fake_module("mmcv.parallel", is_module_wrapper=lambda m: False)

    def set_requires_grad(nets, requires_grad=False):
        if not isinstance(nets, list):
            nets = [nets]
        for net in nets:
            if net is not None:
                for p in net.parameters():
                    p.requires_grad = requires_grad

    _fake_module("mmedit.models.common",
                 set_requires_grad=set_requires_grad)
    _fake_module("mmedit.models.base", BaseModel=_RefBaseModel)
    sys.modules["mmedit.models.builder"].build_loss = _build_loss
    _fake_module("mmedit.models.restorers")
    _fake_module("mmedit.models.restorers.srgan", SRGAN=_RefSRGAN)
    _fake_module("thop", profile=lambda *a, **k: (0, 0))

    # reference metrics.py externals: MATLABLikeResize / gauss_gradient are
    # touched only by niqe/matting paths we don't drive here
    _fake_module("mmedit.datasets.pipelines.matlab_like_resize",
                 MATLABLikeResize=type("MATLABLikeResize", (), {}))
    _fake_module("mmedit.core.evaluation")
    _fake_module("mmedit.core.evaluation.metric_utils",
                 gauss_gradient=None)

    import importlib
    ref_metrics = importlib.import_module("mmedited.core.evaluation.metrics")
    _loaded["ref_metrics"] = ref_metrics

    # mmedit.core: psnr/ssim from the REFERENCE's own vendored metrics
    # (functionally what the external registry resolves to, SURVEY §2.7)
    _fake_module("mmedit.core", psnr=ref_metrics.psnr, ssim=ref_metrics.ssim,
                 tensor2img=_mm_tensor2img)

    _loaded["basic_restorer"] = importlib.import_module(
        "mmedited.models.restorers.basic_restorer")
    _loaded["ciaosr_restorer"] = importlib.import_module(
        "mmedited.models.restorers.ciaosr")
    _loaded["real_ciaosr"] = importlib.import_module(
        "mmedited.models.restorers.real_ciaosr")
    return types.SimpleNamespace(**_loaded)


def load_reference_perceptual():
    """Import the reference's perceptual_loss.py (memoized) with a
    torchvision vgg19 FACTORY stub: builds the genuine torchvision
    vgg19.features layer plan ([2,2,4,4,4] conv blocks + maxpools) with
    RANDOM weights under the caller's torch seed — no download.  The
    PerceptualVGG / PerceptualLoss classes themselves run as reference
    code (perceptual_loss.py:12-221)."""
    load_reference()
    if "perceptual_loss" in _loaded:
        return types.SimpleNamespace(**_loaded)

    def _vgg19_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_c = v
        return nn.Sequential(*layers)

    class _VGGHolder(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg19_features()

    sys.modules["torchvision.models.vgg"].vgg19 = lambda **kw: _VGGHolder()

    import importlib
    _loaded["perceptual_loss"] = importlib.import_module(
        "mmedited.models.losses.perceptual_loss")
    return types.SimpleNamespace(**_loaded)


def load_reference_aux():
    """Import the reference's generate_assistant (GCC1/GCC2) and gan_loss
    (GANLoss incl. smgan + GaussianBlur) modules (memoized). Returns a
    namespace also containing everything from load_reference()."""
    load_reference()
    if "generate_assistant" not in _loaded:
        import importlib
        _loaded["generate_assistant"] = importlib.import_module(
            "mmedited.datasets.pipelines.generate_assistant")
        _loaded["gan_loss"] = importlib.import_module(
            "mmedited.models.losses.gan_loss")
    return types.SimpleNamespace(**_loaded)
