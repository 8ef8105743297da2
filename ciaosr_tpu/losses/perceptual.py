"""Perceptual (VGG19 feature) + style (Gram) loss.

Behavioral spec: PerceptualLoss at
/root/reference/mmedited/models/losses/perceptual_loss.py:92-221 and the
002 config (layer_weights {'2':0.1,'7':0.1,'16':1,'25':1,'34':1}, L1
criterion, style off; configs/002_real_gan_...py:69-81).

Weights: pretrained VGG19 cannot be downloaded here; pass
``pretrained=/path/to/vgg19.pth`` (a torchvision state_dict) in the config
— it is converted on first use. Without it, constructing the loss raises.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ciaosr_tpu.config.registry import LOSSES
from ciaosr_tpu.models.vgg import VGG19Features, convert_vgg19


def _gram(feat: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


@LOSSES.register(name="PerceptualLoss")
class PerceptualLoss:
    def __init__(self, layer_weights: dict, vgg_type: str = "vgg19",
                 use_input_norm: bool = True, perceptual_weight: float = 1.0,
                 style_weight: float = 0.0, norm_img: bool = True,
                 criterion: str = "l1", pretrained: str | None = None):
        if vgg_type != "vgg19":
            raise ValueError("only vgg19 is supported")
        self.layer_weights = {int(k): float(v)
                              for k, v in layer_weights.items()}
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.norm_img = norm_img
        self.criterion = criterion
        self.net = VGG19Features(
            layer_name_list=tuple(sorted(self.layer_weights)),
            use_input_norm=use_input_norm)

        self._pretrained = pretrained
        self._params = None

    @property
    def params(self):
        """Lazily load+convert VGG19 weights on first use, so configs build
        (and fail fast with a clear error at the first training step)."""
        if self._params is None:
            path = self._pretrained or os.environ.get("CIAOSR_VGG19_WEIGHTS")
            if path == "synthetic" or (not path and os.environ.get(
                    "CIAOSR_VGG19_SYNTHETIC")):
                # weight-less environments (endurance soaks, cost
                # benchmarks): seeded random VGG19 features — the step
                # cost and loss plumbing are identical, the features are
                # untrained. NEVER silently: this is an explicit opt-in.
                import logging
                import jax
                logging.getLogger(__name__).warning(
                    "PerceptualLoss: using SYNTHETIC (random) VGG19 "
                    "weights — perceptual values are not comparable to "
                    "the reference's pretrained features")
                # the lazy property can first fire INSIDE a train-step
                # trace: force concrete (compile-time) evaluation so the
                # synthetic params are constants, not leaked tracers
                with jax.ensure_compile_time_eval():
                    self._params = self.net.init(
                        jax.random.PRNGKey(7),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
                return self._params
            if not path or not os.path.exists(path):
                raise FileNotFoundError(
                    "PerceptualLoss needs pretrained VGG19 weights. Pass "
                    "pretrained=<path to torchvision vgg19 .pth> in the "
                    "loss config or set CIAOSR_VGG19_WEIGHTS (or "
                    "CIAOSR_VGG19_SYNTHETIC=1 for explicitly-synthetic "
                    "soak/benchmark runs). (No network access: the "
                    "reference downloads them via torchvision.)")
            import torch
            sd = torch.load(path, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            self._params = convert_vgg19(sd)
        return self._params

    def _crit(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        return jnp.mean((a - b) ** 2)

    def __call__(self, x: jnp.ndarray, gt: jnp.ndarray):
        """x, gt: (B,H,W,3). norm_img maps [-1,1] → [0,1] unconditionally
        (perceptual_loss.py:170-172 semantics)."""
        if self.norm_img:
            x = (x + 1.0) * 0.5
            gt = (gt + 1.0) * 0.5
        fx = self.net.apply(self.params, x)
        fgt = self.net.apply(self.params, jnp.asarray(gt))
        percep = sum(self.layer_weights[k] * self._crit(fx[k], fgt[k])
                     for k in self.layer_weights) * self.perceptual_weight \
            if self.perceptual_weight > 0 else None
        style = sum(self.layer_weights[k] * self._crit(_gram(fx[k]),
                                                       _gram(fgt[k]))
                    for k in self.layer_weights) * self.style_weight \
            if self.style_weight > 0 else None
        return percep, style
