"""Implicit MLPs — the imnet_q/k/v heads of the CiaoSR decoder.

Behavioral spec: MLPRefiner (Linear→ReLU ×N → Linear) at
/root/reference/mmedited/models/components/refiners/mlp_refiner.py:65-120
(the registered external copy is what actually runs; same math).
Applies over the last axis of any-rank inputs (the reference flattens
leading dims; unnecessary here).

Setup-based so the decoder's dense-grid path can split the first layer
out (``first_layer_params`` + ``tail``): for grid decoding, the
feature part of layer 0 is hoisted out of the phase loop and computed
once per image.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import COMPONENTS
from ciaosr_tpu.utils.init import torch_kernel_init, torch_bias_init


@COMPONENTS.register(name="MLPRefiner")
class ImplicitMLP(nn.Module):
    """Plain MLP head. ``in_dim`` is used only for torch-matching bias
    init bounds; reference configs carry it even though the net overwrites
    it (ciaosr_net.py:61-76, SURVEY.md §8.1)."""

    out_dim: int
    hidden_list: Sequence[int] = ()
    in_dim: int | None = None
    act: str = "relu"
    dtype: Any = None  # computation dtype (params stay float32)

    def setup(self):
        dims = list(self.hidden_list)
        fan_ins = [self.in_dim] + dims[:-1] if dims else []
        self.layers = [
            nn.Dense(h, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(fan_ins[i])
                     if fan_ins[i] else nn.initializers.zeros,
                     dtype=self.dtype, name=f"layers_{i}")
            for i, h in enumerate(dims)]
        out_fan = dims[-1] if dims else (self.in_dim or 1)
        self.out = nn.Dense(self.out_dim, kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(out_fan),
                            dtype=self.dtype, name="out")

    def _act(self, x):
        if self.act == "relu":
            return nn.relu(x)
        if self.act == "sin":
            return jnp.sin(x)
        if self.act == "cos":
            return jnp.cos(x)
        raise ValueError(f"unknown act {self.act}")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = self._act(layer(x))
        return self.out(x)

    def tail(self, h: jnp.ndarray) -> jnp.ndarray:
        """Continue after the first activation (h = act(layer0(x)))."""
        for layer in self.layers[1:]:
            h = self._act(layer(h))
        return self.out(h)