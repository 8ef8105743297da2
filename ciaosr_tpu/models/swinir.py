"""SwinIR encoder trunk (window attention, flax, NHWC, static shapes).

Behavioral spec: the vendored SwinIR at
/root/reference/mmedited/models/backbones/sr_backbones/swinir_net.py
(WindowAttention :66-162, SwinTransformerBlock :165-298, BasicLayer
:350-417, RSTB :420-493, SwinIR :619-870) as consumed by the CiaoSR
SwinIR variant (ciaosr_net.py:460-525): conv_first → patch_embed(+LN) →
RSTB stack → LN → unembed → conv_after_body → +skip; inputs reflect-padded
to window multiples and cropped back (gen_feature :499-525).

TPU-first choices:
  * Everything is NHWC; window partition is a reshape/transpose (free).
  * The shifted-window attention mask is a trace-time numpy constant (JAX
    shapes are static) — no cached-vs-recomputed mask machinery
    (swinir_net.py:260-263) and no `.cuda()` buffers (defect §8.3).
  * Attention uses one fused qkv projection + einsum; relative position
    bias is gathered once per (window, heads) at trace time.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ciaosr_tpu.config.registry import BACKBONES
from ciaosr_tpu.utils.init import torch_bias_init

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def _attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    """Shifted-window attention mask, computed at trace time
    (swinir_net.py:222-240 semantics). Returns (nW, N, N) float or None."""
    if shift == 0:
        return None
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, ws², C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class DenseParams(nn.Module):
    """nn.Dense-equivalent (same param tree: kernel/bias) that also exposes
    its parameters as attributes so fused kernels can consume them raw."""

    in_features: int
    features: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param("kernel", trunc_init,
                                 (self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))

    def __call__(self, x: jnp.ndarray, dtype: Any = None) -> jnp.ndarray:
        cdt = dtype or x.dtype
        y = x.astype(cdt) @ self.kernel.astype(cdt)
        if self.use_bias:
            y = y + self.bias.astype(cdt)
        return y


class LNParams(nn.Module):
    """nn.LayerNorm-equivalent (same param tree: scale/bias) exposing its
    parameters as attributes for fused kernels."""

    dim: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = jnp.square(x32 - mu).mean(-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * self.scale + self.bias).astype(x.dtype)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = None

    def setup(self):
        c = self.dim
        self.qkv = DenseParams(c, 3 * c, use_bias=self.qkv_bias, name="qkv")
        self.proj = DenseParams(c, c, name="proj")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table", trunc_init,
            ((2 * self.window_size - 1) ** 2, self.num_heads))

    def _bias(self, ws: int) -> jnp.ndarray:
        """(heads, ws², ws²) bias for a runtime window of ws ≤ the
        configured window_size: same relative-displacement keys, gathered
        from the full-size table."""
        full = self.window_size
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        idx = ((rel[0] + full - 1) * (2 * full - 1)
               + (rel[1] + full - 1)).reshape(-1)
        n = ws * ws
        return self.relative_position_bias_table[idx].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)       # (heads, N, N)

    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None):
        bw, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim ** -0.5
        ws = int(round(n ** 0.5))

        qkv = self.qkv(x, dtype=self.dtype)
        qkv = qkv.reshape(bw, n, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + self._bias(ws)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, heads, n, n) \
                + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(bw, heads, n, n)
        attn = nn.softmax(attn, axis=-1)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = out.astype(self.dtype or out.dtype)
        return self.proj(out, dtype=self.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: Any = None

    def setup(self):
        self.norm1 = LNParams(self.dim, name="norm1")
        self.attn = WindowAttention(self.dim, self.window_size,
                                    self.num_heads, self.qkv_bias,
                                    dtype=self.dtype, name="attn")
        self.norm2 = LNParams(self.dim, name="norm2")
        hidden = int(self.dim * self.mlp_ratio)
        self.mlp_fc1 = DenseParams(self.dim, hidden, name="mlp_fc1")
        self.mlp_fc2 = DenseParams(hidden, self.dim, name="mlp_fc2")

    def __call__(self, x: jnp.ndarray, x_size: tuple[int, int],
                 flash: bool = False):
        h, w = x_size
        b, n, c = x.shape
        ws = min(self.window_size, min(h, w))
        shift = self.shift_size if ws == self.window_size else 0
        if min(h, w) <= self.window_size:
            shift = 0

        if flash and h % ws == 0 and w % ws == 0:
            return self._fused(x, h, w, ws, shift)

        shortcut = x
        x = self.norm1(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        mask = _attn_mask(h, w, ws, shift)
        attn_out = self.attn(windows, mask)
        x = window_reverse(attn_out, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, n, c)

        y = self.norm2(x)
        y = self.mlp_fc1(y, dtype=self.dtype)
        y = nn.gelu(y, approximate=False)
        y = self.mlp_fc2(y, dtype=self.dtype)
        return x + y

    def _fused(self, x: jnp.ndarray, h: int, w: int, ws: int, shift: int):
        """Whole block (LN1→attn→res→LN2→MLP→res) in one Pallas kernel.
        The cyclic shift stays out here: every op in the block is
        per-token or per-(rolled-)window, so the block commutes with the
        roll (see ops/pallas/swin_block.py)."""
        from ciaosr_tpu.ops.pallas.swin_block import swin_block_fused
        b, n, c = x.shape
        xi = x.reshape(b, h, w, c)
        if shift > 0:
            xi = jnp.roll(xi, (-shift, -shift), axis=(1, 2))
        mask = _attn_mask(h, w, ws, shift)
        y = swin_block_fused(
            xi, (self.norm1.scale, self.norm1.bias),
            self.attn.qkv.kernel,
            self.attn.qkv.bias if self.qkv_bias else None,
            self.attn.proj.kernel, self.attn.proj.bias,
            self.attn._bias(ws), mask,
            (self.norm2.scale, self.norm2.bias),
            self.mlp_fc1.kernel, self.mlp_fc1.bias,
            self.mlp_fc2.kernel, self.mlp_fc2.bias,
            self.num_heads, ws,
            interpret=jax.default_backend() == "cpu")
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y.reshape(b, n, c).astype(x.dtype)


class RSTB(nn.Module):
    """Residual Swin Transformer Block: BasicLayer + conv + residual."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: tuple[int, int],
                 flash: bool = False):
        h, w = x_size
        b, n, c = x.shape
        res = x
        for i in range(self.depth):
            x = SwinBlock(self.dim, self.num_heads, self.window_size,
                          shift_size=0 if i % 2 == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                          dtype=self.dtype, name=f"blocks_{i}")(x, x_size,
                                                                flash)
        img = x.reshape(b, h, w, c)
        img = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                      kernel_init=trunc_init, dtype=self.dtype,
                      bias_init=torch_bias_init(c * 9), name="conv")(img)
        return img.reshape(b, n, c) + res


@BACKBONES.register(name="SwinIR")
class SwinIREncoder(nn.Module):
    """SwinIR trunk for CiaoSR (upsampler head never built — the reference
    builds then discards it, ciaosr_net.py:460-473).

    Accepts the reference SwinIR config surface; head-only keys
    (upsampler, upscale, compress_ratio, ...) are accepted and unused.
    """

    img_size: int = 48
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    patch_norm: bool = True
    img_range: float = 1.0
    # accepted-for-config-parity, unused by the trunk:
    upscale: int = 4
    upsampler: str = ""
    resi_connection: str = "1conv"
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    ape: bool = False
    dtype: Any = None

    # the decoder reads feat_dim from here (ciaosr_net.py:60)
    @property
    def mid_channels(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, img: jnp.ndarray, flash: bool = False) -> jnp.ndarray:
        b, h0, w0, _ = img.shape
        ws = self.window_size
        pad_h = (ws - h0 % ws) % ws
        pad_w = (ws - w0 % ws) % ws
        if pad_h or pad_w:
            img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                          mode="reflect")
        h, w = h0 + pad_h, w0 + pad_w

        x = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=trunc_init, dtype=self.dtype,
                    bias_init=torch_bias_init(self.in_chans * 9),
                    name="conv_first")(img)
        skip = x

        feat = x.reshape(b, h * w, self.embed_dim)
        if self.patch_norm:
            feat = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(feat)
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            feat = RSTB(self.embed_dim, depth, heads, ws,
                        mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                        dtype=self.dtype, name=f"layers_{i}")(feat, (h, w),
                                                              flash)
        feat = nn.LayerNorm(epsilon=1e-5, name="norm")(feat)
        feat = feat.reshape(b, h, w, self.embed_dim)

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=trunc_init, dtype=self.dtype,
                       bias_init=torch_bias_init(self.embed_dim * 9),
                       name="conv_after_body")(feat)
        out = feat + skip
        return out[:, :h0, :w0, :]
