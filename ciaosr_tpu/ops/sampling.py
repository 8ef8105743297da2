"""Point sampling / resampling primitives with PyTorch grid-sample semantics.

The reference leans on ATen CUDA kernels for these
(/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:107,
145-146,176-183 — ``F.grid_sample`` nearest & bilinear, align_corners=False;
/root/reference/mmedited/models/common/arch_csnln.py:474 —
``F.interpolate(..., mode='bilinear')``). Here they are integer gathers and
4-tap lerps on NHWC arrays — XLA fuses them into surrounding work; the
Pallas decoder kernel inlines the same math.

Conventions (align_corners=False):
  unnormalized coord  ix = ((x + 1) * W - 1) / 2
  nearest index       round-half-even(ix)   (ATen uses std::nearbyint)
  bilinear 'border'   clamp ix to [0, W-1] before the 2-tap lerp
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((coord + 1.0) * size - 1.0) / 2.0


def nearest_index(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest-neighbor source index for normalized coords in [-1, 1].

    Returns int32 indices; out-of-range coords produce out-of-range indices
    (callers mask or rely on pre-clamped coords, as the reference does via
    coord.clamp_(±(1-1e-6)) at ciaosr_net.py:173).
    """
    ix = _unnormalize(coord, size)
    return jnp.round(ix).astype(jnp.int32)


def grid_sample_nearest(feat: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Nearest grid-sample. feat: (B, H, W, C); coord: (B, Q, 2) in (y, x)
    order (the make_coord convention — NOT flipped). Returns (B, Q, C).

    Padding mode 'zeros': out-of-bounds queries return 0.
    """
    _, h, w, _ = feat.shape
    iy = nearest_index(coord[..., 0], h)
    ix = nearest_index(coord[..., 1], w)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    flat = feat.reshape(feat.shape[0], h * w, feat.shape[-1])
    out = jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=1)
    return jnp.where(valid[..., None], out, 0.0)


def grid_sample_bilinear_border(feat: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid-sample with 'border' padding (coordinate clamping).

    feat: (B, H, W, C); coord: (B, Q, 2) in (y, x) order. Returns (B, Q, C).
    Matches the global residual sample at ciaosr_net.py:107-108.
    """
    b, h, w, c = feat.shape
    iy = jnp.clip(_unnormalize(coord[..., 0], h), 0.0, h - 1.0)
    ix = jnp.clip(_unnormalize(coord[..., 1], w), 0.0, w - 1.0)
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = iy - y0
    wx = ix - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    flat = feat.reshape(b, h * w, c)

    def tap(yi, xi):
        return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    wy = wy[..., None]
    wx = wx[..., None]
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def interpolate_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.interpolate(..., mode='bilinear', align_corners=False) on NHWC.

    src = max(0, (dst + 0.5) * (in/out) - 0.5); 2-tap lerp per axis with the
    upper index clamped (ATen upsample_bilinear2d semantics, no antialias).
    """
    _, in_h, in_w, _ = x.shape

    def axis_taps(in_size, out_size):
        scale = in_size / out_size
        src = jnp.maximum((jnp.arange(out_size, dtype=jnp.float32) + 0.5)
                          * scale - 0.5, 0.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_size - 1)
        i1 = jnp.clip(i0 + 1, 0, in_size - 1)
        frac = src - i0.astype(jnp.float32)
        return i0, i1, frac

    y0, y1, fy = axis_taps(in_h, out_h)
    x0, x1, fx = axis_taps(in_w, out_w)
    top = x[:, y0, :, :] * (1 - fy)[None, :, None, None] \
        + x[:, y1, :, :] * fy[None, :, None, None]
    out = top[:, :, x0, :] * (1 - fx)[None, None, :, None] \
        + top[:, :, x1, :] * fx[None, None, :, None]
    return out
