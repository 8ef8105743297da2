"""Implicit MLPs — the imnet_q/k/v heads of the CiaoSR decoder.

Behavioral spec: MLPRefiner (Linear→ReLU ×N → Linear) at
/root/reference/mmedited/models/components/refiners/mlp_refiner.py:65-120
(the registered external copy is what actually runs; same math).
Applies over the last axis of any-rank inputs (the reference flattens
leading dims; unnecessary here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import COMPONENTS
from ciaosr_tpu.utils.init import torch_kernel_init, torch_bias_init


@COMPONENTS.register(name="MLPRefiner")
class ImplicitMLP(nn.Module):
    """Plain MLP head. ``in_dim`` is inferred from the input; kept as an
    (optional, validated) field because reference configs carry it even
    though the net overwrites it (ciaosr_net.py:61-76, SURVEY.md §8.1)."""

    out_dim: int
    hidden_list: Sequence[int] = ()
    in_dim: int | None = None  # accepted for config parity; validated only
    act: str = "relu"
    dtype: Any = None  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.hidden_list):
            x = nn.Dense(h, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]),
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if self.act == "relu":
                x = nn.relu(x)
            elif self.act == "sin":
                x = jnp.sin(x)
            elif self.act == "cos":
                x = jnp.cos(x)
            else:
                raise ValueError(f"unknown act {self.act}")
        return nn.Dense(self.out_dim, kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(x.shape[-1]),
                        dtype=self.dtype, name="out")(x)
