"""Neighborhood extraction ops — the TPU-native replacement for F.unfold.

The reference materializes 3×3 unfolds to (B, 9C, H, W) in HBM
(/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:131-139
and /root/reference/mmedited/models/common/arch_csnln.py:59-87). On TPU we
either gather the 9 taps per query (decoder path — avoids the 9× HBM blowup)
or build patch matrices only where a matmul consumes them directly (CSA).

Channel layout note: our flattened patch layout is tap-major —
``j = tap * C + c`` with ``tap = (dy+1)*K + (dx+1)`` — which is the natural
gather order. PyTorch's unfold layout is channel-major (``c * K² + tap``);
the weight converter permutes the first/last MLP layers accordingly
(see ciaosr_tpu/convert/torch_weights.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def unfold_nhwc(feat: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """3×3 (or k×k) zero-padded neighborhood expansion.

    feat: (B, H, W, C) → (B, H, W, k*k*C), tap-major layout.
    Equivalent to F.unfold(feat, k, padding=k//2) up to the layout permute.
    """
    b, h, w, c = feat.shape
    pad = ksize // 2
    padded = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    for dy in range(ksize):
        for dx in range(ksize):
            taps.append(padded[:, dy:dy + h, dx:dx + w, :])
    return jnp.concatenate(taps, axis=-1)


def gather_patches(feat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                   ksize: int = 3) -> jnp.ndarray:
    """Gather k×k zero-padded neighborhoods at integer centers.

    feat: (B, H, W, C); iy/ix: (B, ...) int32 center indices (in-range).
    Returns (B, ..., k*k*C) in tap-major layout. This is the fused
    'unfold + nearest grid_sample' of the decoder hot path
    (ciaosr_net.py:131-146,176-179) as one gather.
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    lead = iy.shape[1:]
    outs = []
    r = ksize // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            y = iy + dy
            x = ix + dx
            valid = (y >= 0) & (y < h) & (x >= 0) & (x < w)
            yc = jnp.clip(y, 0, h - 1)
            xc = jnp.clip(x, 0, w - 1)
            idx = (yc * w + xc).reshape(b, -1)
            v = jnp.take_along_axis(flat, idx[..., None], axis=1)
            v = v.reshape(b, *lead, c)
            outs.append(jnp.where(valid[..., None], v, 0.0))
    return jnp.concatenate(outs, axis=-1)


def extract_patches_same(x: jnp.ndarray, ksize: int, stride: int,
                         order: str = "tap_major") -> jnp.ndarray:
    """Extract k×k patches with TF 'SAME' zero padding at a given stride.

    x: (B, H, W, C) → (B, L, k*k*C); L = ceil(H/s)·ceil(W/s).
    Matches extract_image_patches(..., padding='same')
    (arch_csnln.py:32-87) up to the layout permute, which is private to our
    CSA formulation (both sides of its inner products use the same layout).

    ``order``: tap-major (default) iterates taps (dy, dx) row-major;
    "plane_major" (requires ksize = 3·stride) groups taps as
    (t, r, a, b) with dy = stride·t + a, dx = stride·r + b — the layout
    the fused overlap-add kernel consumes (each of the 9 conv_transpose
    shift planes is one contiguous column slice).
    """
    b, h, w, c = x.shape
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max(0, (out_h - 1) * stride + ksize - h)
    pad_w = max(0, (out_w - 1) * stride + ksize - w)
    top, left = pad_h // 2, pad_w // 2
    padded = jnp.pad(x, ((0, 0), (top, pad_h - top), (left, pad_w - left),
                         (0, 0)))
    if order == "tap_major":
        tap_seq = [(dy, dx) for dy in range(ksize) for dx in range(ksize)]
    elif order == "plane_major":
        if ksize != 3 * stride:
            raise ValueError("plane_major requires ksize == 3*stride")
        tap_seq = [(stride * t + a, stride * r + b)
                   for t in range(3) for r in range(3)
                   for a in range(stride) for b in range(stride)]
    else:
        raise ValueError(f"unknown order {order!r}")
    taps = []
    for dy, dx in tap_seq:
        taps.append(padded[:, dy:dy + (out_h - 1) * stride + 1:stride,
                           dx:dx + (out_w - 1) * stride + 1:stride, :])
    patches = jnp.concatenate(taps, axis=-1)  # (B, out_h, out_w, k*k*C)
    return patches.reshape(b, out_h * out_w, ksize * ksize * c)
