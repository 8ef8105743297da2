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
import numpy as np

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


def positional_encoding_1d(n: int, channels: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Interleaved sin/cos 1-D positional encoding, (n, channels).

    Behavioral spec: PositionalEncoding1D at
    /root/reference/mmedited/models/components/refiners/mlp_refiner.py:14-54
    — inv_freq = 10000^(-2j/ceil(ch/2)*2), rows [sin(p·f_0), cos(p·f_0),
    sin(p·f_1), ...] truncated to `channels`. A pure trace-time constant
    here (the reference caches it as a buffer keyed on input shape)."""
    ch = int(np.ceil(channels / 2) * 2)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))
    ang = np.arange(n, dtype=np.float64)[:, None] * inv_freq[None, :]
    emb = np.stack([np.sin(ang), np.cos(ang)], -1).reshape(n, ch)
    return jnp.asarray(emb[:, :channels], dtype)


@COMPONENTS.register(name="PosMLPRefiner")
class PosMLPRefiner(nn.Module):
    """MLP whose hidden activations get a 1-D positional encoding added
    over the middle axis of (B, C, D) inputs.

    Behavioral spec: PosMLPRefiner at
    /root/reference/mmedited/models/components/refiners/mlp_refiner.py:
    123-163 (Linear→ReLU→(+posenc) per hidden, final Linear). The
    reference keeps its layers in a plain Python list, so its parameters
    are invisible to the optimizer (SURVEY.md §2.1/§8) — a defect, not a
    semantic; here they are registered normally.
    """

    out_dim: int
    hidden_list: Sequence[int] = ()
    in_dim: int | None = None
    is_pos: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 3:
            raise ValueError("PosMLPRefiner expects (B, C, D) inputs, got "
                             f"{x.shape}")
        dims = list(self.hidden_list)
        in_dim = self.in_dim or x.shape[-1]   # compact: fan-in is knowable
        fan_ins = [in_dim] + dims[:-1] if dims else []
        for i, h in enumerate(dims):
            x = nn.Dense(h, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(fan_ins[i])
                         if fan_ins[i] else nn.initializers.zeros,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            x = nn.relu(x)
            if self.is_pos:
                # reference adds the encoding of x's OWN values' shape —
                # shape-only, so a trace-time constant per position
                x = x + positional_encoding_1d(x.shape[1], x.shape[-1],
                                               x.dtype)[None]
        out_fan = dims[-1] if dims else in_dim
        return nn.Dense(self.out_dim, kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(out_fan),
                        dtype=self.dtype, name="out")(x)