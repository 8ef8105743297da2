"""Flash-style fused attention for Cross-Scale Attention (Pallas, TPU).

CSA's hot middle (models/csa.py; reference arch_csnln.py:493-511) is
exactly attention with asymmetric dims:

    out = softmax(q @ k.T · scale) @ v
    q: (B, P, Dk)  full-res match neighborhoods   (P = Hp·Wp, Dk = 9·Cr)
    k: (B, L, Dk)  L2-normalized reference patches (L = Hp·Wp/s²)
    v: (B, L, Dv)  reconstruction patch bank       (Dv = (3s)²·C)

The XLA path materializes the (P, L) correlation map in HBM three times
(matmul out, softmax, cast) — ~5 GB of traffic for a 192² tile. This
kernel runs the online-softmax recurrence with the attention tile in
VMEM: one pass over L per query tile, nothing (P, L)-shaped ever leaves
the core. Forward-only (CSA eval paths); the XLA path remains for
training and for the hard-argmax (average=False) variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                 scale, n_l_tiles, l_actual, tl):
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (TP, Dk)
    k = k_ref[0]                                   # (TL, Dk)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask key-padding columns (L rounded up to the tile size)
    col = li * tl + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < l_actual, s, -jnp.inf)

    m_prev = m_ref[...]                            # (TP, 128) row-bcast
    m_cur = jnp.max(s, axis=-1, keepdims=True)     # (TP, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :1])                  # (TP, TL)
    l_ref[...] = l_ref[...] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), corr.shape)
    m_ref[...] = m_new
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * corr[:, :1] + pv

    @pl.when(li == n_l_tiles - 1)
    def _done():
        o_ref[0] = (acc_ref[...] / l_ref[..., :1]).astype(o_ref.dtype)


def csa_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: float, out_dtype=jnp.float32,
                  tp: int = 1024, tl: int = 1024,
                  interpret: bool = False) -> jnp.ndarray:
    """softmax(q @ k.T · scale) @ v without materializing (P, L).

    q: (B, P, Dk); k: (B, L, Dk); v: (B, L, Dv) → (B, P, Dv) in out_dtype.
    """
    b, p_actual, dk = q.shape
    l_actual, dv = k.shape[1], v.shape[2]
    tp = min(tp, -(-p_actual // 8) * 8)        # sublane-aligned
    tl = min(tl, -(-l_actual // 128) * 128)    # lane-aligned

    def pad_to(x, n, axis):
        short = -x.shape[axis] % n
        if short:
            padding = [(0, 0)] * x.ndim
            padding[axis] = (0, short)
            x = jnp.pad(x, padding)
        return x

    q = pad_to(q, tp, 1)
    k = pad_to(k, tl, 1)
    v = pad_to(v, tl, 1)
    n_p, n_l = q.shape[1] // tp, k.shape[1] // tl

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_l_tiles=n_l,
                          l_actual=l_actual, tl=tl),
        grid=(b, n_p, n_l),
        in_specs=[
            pl.BlockSpec((1, tp, dk), lambda bi, pi, li: (bi, pi, 0)),
            pl.BlockSpec((1, tl, dk), lambda bi, pi, li: (bi, li, 0)),
            pl.BlockSpec((1, tl, dv), lambda bi, pi, li: (bi, li, 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, dv), lambda bi, pi, li: (bi, pi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, q.shape[1], dv), out_dtype),
        scratch_shapes=[pltpu.VMEM((tp, dv), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_actual * l_actual * (dk + dv),
            bytes_accessed=b * (p_actual * (dk + dv) * 2
                                + n_p * l_actual * (dk + dv) * 2),
            transcendentals=b * p_actual * l_actual),
        interpret=interpret,
    )(q, k, v)
    return out[:, :p_actual]


# ---------------------------------------------------------------------------
# Round-2 fusion: overlap-add folded into the attention epilogue.
#
# The unfused path writes k_maps (B, P, (3s)²·C) to HBM (~170 MB bf16 for a
# 192² tile) and then runs models/csa._overlap_add over it (~2.8 ms).
# Here each query tile is R whole image rows and the value bank's columns
# are PLANE-MAJOR — minor order (t, r, a, b, c), so each (t, r) tap plane
# is one contiguous (TP, s²C) column slice. The (3s,3s)-kernel stride-s
# paste (arch_csnln.py:511 conv_transpose) then reduces to NINE 2-D
# row-shifted adds in VMEM: a shift of (t−1) image rows and (r−1) image
# cols is a major-dim offset of (t−1)·Wp + (r−1) on the row-raveled tile,
# with iota masks killing the column wrap-around — no vector reshapes
# (Mosaic rejects minor-dim splits). Only (R+2)-row strips leave the core;
# XLA adds the one-row strip halos and interleaves the s×s phases.
# ---------------------------------------------------------------------------


def plane_major_perm(s: int, c: int) -> "np.ndarray":
    """Column permutation: tap-major (t, a, r, b, c) → plane-major
    (t, r, a, b, c) for a (3s)² patch bank."""
    import numpy as np
    return np.arange(9 * s * s * c).reshape(
        3, s, 3, s, c).transpose(0, 2, 1, 3, 4).reshape(-1)


def _attn_oa_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    scale, n_l_tiles, l_actual, tl, rows, wp, s, channels):
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    col = li * tl + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    sc = jnp.where(col < l_actual, sc, -jnp.inf)

    m_prev = m_ref[...]
    m_cur = jnp.max(sc, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(sc - m_new[:, :1])
    l_ref[...] = l_ref[...] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), corr.shape)
    m_ref[...] = m_new
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * corr[:, :1] + pv

    @pl.when(li == n_l_tiles - 1)
    def _done():
        tp = rows * wp
        sc2 = s * s * channels
        k_maps = acc_ref[...] / l_ref[..., :1]       # (TP, 9·s²C) plane-major
        jblk = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0) % wp
        total = (rows + 2) * wp + 2                  # +2: shift −1 headroom
        strip = jnp.zeros((total, sc2), jnp.float32)
        for t in range(3):
            for r in range(3):
                plane = k_maps[:, (3 * t + r) * sc2:(3 * t + r + 1) * sc2]
                if r == 0:    # j'−1 would wrap to the previous image row
                    plane = jnp.where(jblk == 0, 0.0, plane)
                if r == 2:    # j'+1 would wrap to the next image row
                    plane = jnp.where(jblk == wp - 1, 0.0, plane)
                off = t * wp + (r - 1) + 1           # ∈ [0, 2wp+2]
                strip = strip + jnp.pad(
                    plane, ((off, total - tp - off), (0, 0)))
        o_ref[0, 0] = strip[1:-1].astype(o_ref.dtype)


def csa_attention_overlap_add(q, k, v_pm, scale: float, hp: int, wp: int,
                              s: int, channels: int, out_dtype=jnp.float32,
                              rows: int | None = None, tl: int = 1024,
                              interpret: bool = False):
    """softmax(q@kᵀ·scale) @ v followed by the (3s,3s)/stride-s overlap-add,
    fused — returns the pasted map (B, s·Hp, s·Wp, C), pre-/6 and
    pre-down-conv. ``v_pm`` must be the patch bank with PLANE-MAJOR columns
    (see plane_major_perm / extract_patches_same(order="plane_major"));
    q rows raveled row-major over (hp, wp), hp divisible by the row tile."""
    b, p_actual, dk = q.shape
    l_actual, dv = k.shape[1], v_pm.shape[2]
    assert p_actual == hp * wp and dv == 9 * s * s * channels
    if rows is None:
        cands = [r for r in range(1, 9) if hp % r == 0 and (r * wp) % 8 == 0]
        rows = min(cands, key=lambda r: abs(r * wp - 1024))
    assert hp % rows == 0 and (rows * wp) % 8 == 0
    tp = rows * wp
    n_t = hp // rows
    sc2 = s * s * channels

    def pad_to(x, n, axis):
        short = -x.shape[axis] % n
        if short:
            padding = [(0, 0)] * x.ndim
            padding[axis] = (0, short)
            x = jnp.pad(x, padding)
        return x

    k = pad_to(k, tl, 1)
    v_pm = pad_to(v_pm, tl, 1)
    n_l = k.shape[1] // tl

    strips = pl.pallas_call(
        functools.partial(_attn_oa_kernel, scale=scale, n_l_tiles=n_l,
                          l_actual=l_actual, tl=tl, rows=rows, wp=wp, s=s,
                          channels=channels),
        grid=(b, n_t, n_l),
        in_specs=[
            pl.BlockSpec((1, tp, dk), lambda bi, pi, li: (bi, pi, 0)),
            pl.BlockSpec((1, tl, dk), lambda bi, pi, li: (bi, li, 0)),
            pl.BlockSpec((1, tl, dv), lambda bi, pi, li: (bi, li, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, (rows + 2) * wp, sc2),
                               lambda bi, pi, li: (bi, pi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t, (rows + 2) * wp, sc2),
                                       out_dtype),
        scratch_shapes=[pltpu.VMEM((tp, dv), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_actual * l_actual * (dk + dv),
            bytes_accessed=b * (p_actual * dk * 2
                                + n_t * l_actual * (dk + dv) * 2),
            transcendentals=b * p_actual * l_actual),
        interpret=interpret,
    )(q, k, v_pm)
    return _combine_strips(strips, rows, hp, wp, s, channels)


def _combine_strips(strips, rows: int, hp: int, wp: int, s: int,
                    channels: int):
    """Add the one-image-row halos between adjacent tile strips and
    interleave the s×s phases:
    (B, NT, (R+2)·Wp, s²C) → (B, s·Hp, s·Wp, C)."""
    b, n_t, _, sc2 = strips.shape
    heads = strips[:, :, :wp]                  # image row r0−1 of each tile
    bodies = strips[:, :, wp:wp + rows * wp]
    tails = strips[:, :, wp + rows * wp:]      # image row r0+R
    zh = jnp.zeros_like(heads[:, :1])
    heads_shift = jnp.concatenate([heads[:, 1:], zh], axis=1)
    tails_shift = jnp.concatenate([zh, tails[:, :-1]], axis=1)
    mid = rows * wp - 2 * wp
    if mid > 0:
        zmid = jnp.zeros((b, n_t, mid, sc2), bodies.dtype)
        head_contrib = jnp.concatenate(
            [jnp.zeros_like(tails_shift), zmid, heads_shift], axis=2)
        tail_contrib = jnp.concatenate(
            [tails_shift, zmid, jnp.zeros_like(heads_shift)], axis=2)
    else:
        head_contrib = jnp.concatenate(
            [jnp.zeros_like(tails_shift), heads_shift], axis=2)
        tail_contrib = jnp.concatenate(
            [tails_shift, jnp.zeros_like(heads_shift)], axis=2)
    out = bodies + head_contrib + tail_contrib   # (B, NT, R·Wp, s²C)
    out = out.reshape(b, hp, wp, s, s, channels)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, hp * s, wp * s, channels)


# ---------------------------------------------------------------------------
# Round-2 fusion, stage 2: q and v banks built IN-KERNEL.
#
# extract_patches_same writes x_nb (P, 9Cr) and raw (L, (3s)²C) to HBM
# (~3.9 ms at 192²) and the attention loop re-reads the raw bank once per
# query tile (~1.5 GB). But a patch tap is a pure MAJOR-DIM SHIFT of a
# phase plane: raw[l, (t,r,a,b,c)] = embed[s(i+t-1)+a, s(j+r-1)+b, c]
#                                  = embed_phase[a,b][l + (t-1)W' + (r-1)]
# on the row-raveled L grid (W' = Wp/s) — zero-padded planes give the SAME
# padding, iota masks kill the column wrap. So the kernel keeps the tiny
# phase planes (s²·L·C ≈ 2.4 MB bf16) and match map VMEM-RESIDENT and
# assembles each (TL, (3s)²C) value tile / (TP, 9Cr) query tile with nine
# (or 36) shifted 2-D copies — no bank ever exists in HBM, nothing is
# re-read per tile.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Round-2 fusion, stage 2: q and v banks built IN-KERNEL.
#
# extract_patches_same writes x_nb (P, 9Cr) and raw (L, (3s)²C) to HBM
# (~3.9 ms at 192²) and the attention loop re-reads the raw bank once per
# query tile (~1.5 GB). But a patch tap is a pure MAJOR-DIM SHIFT of a
# phase plane: raw[l, (t,r,a,b,c)] = embed[s(i+t-1)+a, s(j+r-1)+b, c]
#                                  = embed_phase[a,b][l + (t-1)W' + (r-1)]
# on the row-raveled L grid (W' = Wp/s). Mosaic requires dynamic-slice
# starts to be sublane-aligned, so the ±1 COLUMN shifts are pre-baked:
# three column-shifted copies of the match map / each phase plane are
# built outside (edge zeros included — that is exactly the SAME padding),
# and the kernel only ever slices at row offsets that are multiples of
# Wp / W'. The kernel keeps those copies VMEM-RESIDENT (a few MB) and
# assembles each (TL, (3s)²C) value tile / (TP, 9Cr) query tile with
# shifted 2-D loads — no bank ever exists in HBM, nothing is re-read per
# tile.
# ---------------------------------------------------------------------------


def _csa_full_kernel(match_ref, k_ref, ph_ref, o_ref, acc_ref, m_ref, l_ref,
                     *, scale, n_l_tiles, l_actual, tl, rows, wp, s,
                     channels, cr, wq):
    """match_ref: (3, P + 2·Wp, Cr) — dx-shifted copies of the match map,
    VMEM-resident. k_ref: (L_pad, 9Cr) normalized reference patches
    (resident). ph_ref: (3, L_pad + 2·W', s²C) — dr-shifted,
    phase-concatenated planes of the embedding (minor order (a, b, c)).
    o_ref: (1, 1, (rows+2)·Wp, s²C) overlap-added strip (last li only)."""
    pi = pl.program_id(1)
    li = pl.program_id(2)
    tp = rows * wp
    _csa_tile_step(
        lambda dy, dx: match_ref[0, dx, pl.ds(pi * tp + dy * wp, tp), :],
        k_ref,
        lambda t, r: ph_ref[0, r, pl.ds(li * tl + t * wq, tl), :],
        o_ref, acc_ref, m_ref, l_ref, scale=scale, n_l_tiles=n_l_tiles,
        l_actual=l_actual, tl=tl, rows=rows, wp=wp, s=s, channels=channels)


def _csa_windowed_kernel(m0_ref, m1_ref, m2_ref, k_ref, p0_ref, p1_ref,
                         p2_ref, o_ref, acc_ref, m_ref, l_ref, *, scale,
                         n_l_tiles, l_actual, tl, rows, wp, s, channels,
                         cr, wq):
    """Same math as _csa_full_kernel, but the match/phase planes arrive as
    per-column-variant WINDOWS (element-granularity row starts pi·TP and
    li·TL, window heights TP+2Wp / TL+2W') instead of VMEM-resident whole
    maps — admits geometries whose resident planes blow VMEM (192-tile
    SwinIR: ~72 MB of planes). In-window taps are static slices."""
    m_refs = (m0_ref, m1_ref, m2_ref)
    ph_refs = (p0_ref, p1_ref, p2_ref)
    tp = rows * wp
    _csa_tile_step(
        lambda dy, dx: m_refs[dx][0, 0, dy * wp:dy * wp + tp, :],
        k_ref,
        lambda t, r: ph_refs[r][0, 0, t * wq:t * wq + tl, :],
        o_ref, acc_ref, m_ref, l_ref, scale=scale, n_l_tiles=n_l_tiles,
        l_actual=l_actual, tl=tl, rows=rows, wp=wp, s=s, channels=channels)


def _csa_tile_step(get_q_slice, k_ref, get_v_slice, o_ref, acc_ref, m_ref,
                   l_ref, *, scale, n_l_tiles, l_actual, tl, rows, wp, s,
                   channels):
    li = pl.program_id(2)
    tp = rows * wp
    sc2 = s * s * channels

    @pl.when(li == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- query tile from the shifted match maps (9 row-slices)
    q_parts = []
    for dy in range(3):
        for dx in range(3):
            q_parts.append(get_q_slice(dy, dx))
    q = jnp.concatenate(q_parts, axis=1)          # (TP, 9Cr)

    k = k_ref[0, pl.ds(li * tl, tl), :]
    sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    col = li * tl + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    sc = jnp.where(col < l_actual, sc, -jnp.inf)

    m_prev = m_ref[...]
    m_cur = jnp.max(sc, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(sc - m_new[:, :1])
    l_ref[...] = l_ref[...] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), corr.shape)
    m_ref[...] = m_new

    # ---- value tile from the shifted phase planes: the s² phases are
    # pre-concatenated per column shift, so one (TL, s²C) load covers a
    # whole (t, r) tap plane — 9 loads total
    v_parts = []
    for t in range(3):
        for r in range(3):
            v_parts.append(get_v_slice(t, r))
    v = jnp.concatenate(v_parts, axis=1)          # (TL, (3s)²C) plane-major
    pv = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * corr[:, :1] + pv

    @pl.when(li == n_l_tiles - 1)
    def _done():
        k_maps = acc_ref[...] / l_ref[..., :1]
        jblk = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0) % wp
        total = (rows + 2) * wp + 2
        strip = jnp.zeros((total, sc2), jnp.float32)
        for t in range(3):
            for r in range(3):
                plane = k_maps[:, (3 * t + r) * sc2:(3 * t + r + 1) * sc2]
                if r == 0:
                    plane = jnp.where(jblk == 0, 0.0, plane)
                if r == 2:
                    plane = jnp.where(jblk == wp - 1, 0.0, plane)
                off = t * wp + (r - 1) + 1
                strip = strip + jnp.pad(
                    plane, ((off, total - tp - off), (0, 0)))
        o_ref[0, 0] = strip[1:-1].astype(o_ref.dtype)


def _col_shifted3(x2d):
    """(B, H, W, C) → (B, 3, H, W, C): copies shifted by dx−1 columns with
    zero fill — the SAME-padding column taps, pre-baked for aligned
    in-kernel row slicing."""
    left = jnp.pad(x2d[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    right = jnp.pad(x2d[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    # dx = 0 reads column j−1 → right-shifted copy; dx = 2 → left-shifted
    return jnp.stack([right, x2d, left], axis=1)


def aligned_channels(s: int, channels: int) -> int:
    """Smallest C' ≥ channels with s²·C' lane-aligned (multiple of 128) —
    the minor dim the fused epilogue pastes/slices at."""
    import math
    per = 128 // math.gcd(s * s, 128)
    return -(-channels // per) * per


def csa_fused(match, k, embed, scale: float, hp: int, wp: int, s: int,
              channels: int, out_dtype=jnp.float32, rows: int | None = None,
              tl: int = 1024, interpret: bool = False,
              windowed: bool = False):
    """Whole CSA middle — patch banks, attention, softmax, reconstruction
    and overlap-add — in one kernel.

    match: (B, Hp, Wp, Cr) conv_match_1 output; k: (B, L, 9Cr) normalized
    reference patches; embed: (B, Hp, Wp, C) conv_assembly output.
    Returns (B, s·Hp, s·Wp, C), pre-/6 and pre-down-conv.
    Requires wp % 8 == 0 and (wp//s) % 8 == 0 (aligned row slicing).

    Non-lane-aligned s²C (e.g. SwinIR C=180, s=2 → 720) is handled by
    zero-padding the embedding channels up to ``aligned_channels`` (192):
    zero lanes ride the PV matmul and overlap-add unchanged and are
    sliced off at the end — Mosaic only lowers the epilogue's odd-row-
    offset pads (and the s²C-stride lane slices) for aligned minor dims.

    ``windowed``: source the match/phase planes as element-offset windows
    per grid instance instead of VMEM-resident whole maps (see
    _csa_windowed_kernel) — for geometries whose planes don't fit VMEM.
    """
    b = match.shape[0]
    cr = match.shape[-1]
    wq = wp // s
    l_actual = (hp // s) * wq
    c_out = channels
    channels = aligned_channels(s, channels)
    if channels != c_out:
        embed = jnp.pad(embed, ((0, 0), (0, 0), (0, 0),
                                (0, channels - c_out)))
    dv = 9 * s * s * channels
    if rows is None:
        cands = [r for r in range(1, 9) if hp % r == 0 and (r * wp) % 8 == 0]
        rows = min(cands, key=lambda r: abs(r * wp - 1024))
    assert hp % rows == 0 and (rows * wp) % 8 == 0
    assert wp % 8 == 0 and wq % 8 == 0, "csa_fused needs aligned widths"
    tp = rows * wp
    n_t = hp // rows
    tl = min(tl, -(-l_actual // 128) * 128)
    l_pad = -(-l_actual // tl) * tl
    n_l = l_pad // tl
    sc2 = s * s * channels

    # resident operands, pre-shifted and zero-padded for aligned slicing
    m3 = _col_shifted3(match).reshape(b, 3, hp * wp, cr)
    m3 = jnp.pad(m3, ((0, 0), (0, 0), (wp, wp), (0, 0)))
    k_res = jnp.pad(k, ((0, 0), (0, l_pad - l_actual), (0, 0)))
    # phase planes embed[a::s, b::s], concatenated over (a, b) in the
    # minor dim, with the three dr column shifts
    phases = jnp.concatenate([embed[:, a::s, bb::s, :]
                              for a in range(s) for bb in range(s)],
                             axis=-1)              # (B, H', W', s²C)
    ph = _col_shifted3(phases)                     # (B, 3, H', W', s²C)
    ph = ph.reshape(b, 3, l_actual, s * s * channels)
    ph = jnp.pad(ph, ((0, 0), (0, 0), (wq, wq + l_pad - l_actual), (0, 0)))

    k_spec = pl.BlockSpec((1, l_pad, 9 * cr), lambda bi, pi, li: (bi, 0, 0))
    if windowed:
        from jax._src.pallas.core import Element
        kern = functools.partial(_csa_windowed_kernel, scale=scale,
                                 n_l_tiles=n_l, l_actual=l_actual, tl=tl,
                                 rows=rows, wp=wp, s=s, channels=channels,
                                 cr=cr, wq=wq)
        in_specs = [pl.BlockSpec(
            (Element(1), Element(1), Element(tp + 2 * wp), Element(cr)),
            (lambda bi, pi, li, dx=dx: (bi, dx, pi * tp, 0)))
            for dx in range(3)]
        in_specs.append(k_spec)
        in_specs += [pl.BlockSpec(
            (Element(1), Element(1), Element(tl + 2 * wq),
             Element(s * s * channels)),
            (lambda bi, pi, li, r=r: (bi, r, li * tl, 0)))
            for r in range(3)]
        operands = [m3] * 3 + [k_res] + [ph] * 3
    else:
        kern = functools.partial(_csa_full_kernel, scale=scale,
                                 n_l_tiles=n_l, l_actual=l_actual, tl=tl,
                                 rows=rows, wp=wp, s=s, channels=channels,
                                 cr=cr, wq=wq)
        in_specs = [
            pl.BlockSpec((1, 3, hp * wp + 2 * wp, cr),
                         lambda bi, pi, li: (bi, 0, 0, 0)),
            k_spec,
            pl.BlockSpec((1, 3, l_pad + 2 * wq, s * s * channels),
                         lambda bi, pi, li: (bi, 0, 0, 0)),
        ]
        operands = [m3, k_res, ph]
    strips = pl.pallas_call(
        kern,
        grid=(b, n_t, n_l),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, (rows + 2) * wp, sc2),
                               lambda bi, pi, li: (bi, pi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t, (rows + 2) * wp, sc2),
                                       out_dtype),
        scratch_shapes=[pltpu.VMEM((tp, dv), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * l_actual * (9 * cr + dv),
            bytes_accessed=b * (hp * wp * (cr + sc2) * 2
                                + l_actual * (9 * cr + channels) * 2
                                + (n_t * l_actual * channels * 9 * 2
                                   if windowed else 0)),
            transcendentals=b * hp * wp * l_actual),
        interpret=interpret,
    )(*operands)
    out = _combine_strips(strips, rows, hp, wp, s, channels)
    return out[..., :c_out] if channels != c_out else out


# ---------------------------------------------------------------------------
# Round-4: stencil-factored CSA — 9× fewer reconstruction FLOPs.
#
# The fused kernels above pay 2·P·L·(9Cr + 9s²C) FLOPs because every
# (query, key) pair multiplies the full 9-tap (3s)²C value patch. But the
# conv_transpose paste (arch_csnln.py:511) is DIAGONAL in (query, key):
# writing out[s·i'+a] = Σ_t Σ_l attn[i'+1-t, l]·embed[s(l+t-1)+a] and
# substituting l' = l + t - 1 gives
#
#     out[s·i'+a] = Σ_l' M[i', l'] · P_a[l'],
#     M[i', l']   = Σ_{d∈{-1,0,1}²} attn[i'-d, l'-d]   (zero outside),
#     P_a[l']     = embed[s·l'+a]                       (phase planes).
#
# (2-D: d shifts the query index by d full-res pixels AND the key index
# by d key-grid pixels — the same d.) So the 9-tap fold collapses into a
# 9-point diagonal STENCIL on the normalized attention matrix followed by
# ONE (P, L)@(L, s²C) matmul, and the strip overlap-add epilogue becomes
# a plain pixel shuffle: FLOPs drop from 2PL(9Cr + 9s²C) to
# 2PL(9Cr + s²C) — 5.0× at SwinIR width, 4.8× at RDN width. Exactness of
# the factorization is proven in float64 (max|Δ| 4e-14 vs the einsum +
# _overlap_add path; tests/test_csa_stencil.py).
#
# Cost: Ā (P, L) bf16 round-trips HBM between the two kernels (~680 MB at
# the 192-tile geometry — why the mode is gated on P·L size). Kernel A is
# the windowed score kernel run as TWO sweeps over the L tiles (stats,
# then normalized write — P̄ leaves fully normalized, so kernel B needs no
# softmax bookkeeping). Kernel B reads P̄ windows with (wp+8, 64·⌈..⌉)
# halos, takes the nine diagonal static slices with ravel-wrap masks,
# and runs the single phase matmul.
# ---------------------------------------------------------------------------


def _csa_scores_kernel(m0_ref, m1_ref, m2_ref, k_ref, o_ref, m_sc, l_sc, *,
                       scale, n_l, l_actual, tl, rows, wp):
    """Two-sweep normalized attention writer.

    Grid (b, n_t, 2·n_l), li arbitrary. Sweep 1 (li < n_l) runs the
    online max/denominator recurrence into scratch; sweep 2 recomputes
    each score tile and writes Ā = exp(sc − m)/l — fully normalized —
    to HBM bf16. The q tile is assembled per-instance from the three
    column-variant match windows (same fetch pattern as
    _csa_windowed_kernel); k stays VMEM-resident."""
    li = pl.program_id(2)
    lt = li % n_l
    tp = rows * wp

    @pl.when(li == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
        l_sc[...] = jnp.zeros_like(l_sc)

    m_refs = (m0_ref, m1_ref, m2_ref)
    q_parts = []
    for dy in range(3):
        for dx in range(3):
            q_parts.append(m_refs[dx][0, 0, dy * wp:dy * wp + tp, :])
    q = jnp.concatenate(q_parts, axis=1)              # (TP, 9Cr)

    k = k_ref[0, pl.ds(lt * tl, tl), :]
    sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    col = lt * tl + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    sc = jnp.where(col < l_actual, sc, -jnp.inf)

    @pl.when(li < n_l)
    def _stats():
        m_prev = m_sc[...]
        m_cur = jnp.max(sc, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        p = jnp.exp(sc - m_new[:, :1])
        l_sc[...] = l_sc[...] * jnp.exp(m_prev - m_new) + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), m_prev.shape)
        m_sc[...] = m_new

    @pl.when(li >= n_l)
    def _write():
        p = jnp.exp(sc - m_sc[..., :1]) / l_sc[..., :1]
        o_ref[0] = p.astype(o_ref.dtype)


def _csa_stencil_pv_kernel(p_ref, ph_ref, o_ref, acc_ref, *, n_l, tl, rows,
                           wp, wq, hr, hc):
    """Diagonal stencil + single phase matmul.

    p_ref: (1, TP+2·hr, TL+2·hc) window of the zero-padded normalized
    attention (window start (pi·TP, li·TL) of the padded array — i.e.
    (pi·TP − hr, li·TL − hc) of Ā). ph_ref: (1, TL, s²C) phase planes.
    The nine taps are STATIC in-window slices at (hr − dy·wp − dx,
    hc − dy·wq − dx); iota masks kill the row-ravel column wraps (a ±1
    query-col shift at an image edge lands on the adjacent image row; a
    ±1 key-col shift at a key-grid edge lands on the adjacent key row).
    Out-of-range rows/cols are exact zeros from the XLA pad."""
    li = pl.program_id(2)
    tp = rows * wp

    @pl.when(li == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[0]                                       # (TP+2hr, TL+2hc)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    cols_i = li * tl + jax.lax.broadcasted_iota(jnp.int32, (1, tl), 1)
    m = jnp.zeros((tp, tl), jnp.float32)
    for dx in (-1, 0, 1):
        part = jnp.zeros((tp, tl), jnp.float32)
        for dy in (-1, 0, 1):
            r0 = hr - dy * wp - dx
            c0 = hc - dy * wq - dx
            part = part + w[r0:r0 + tp, c0:c0 + tl].astype(jnp.float32)
        if dx:
            bad_q = 0 if dx == 1 else wp - 1
            bad_k = 0 if dx == 1 else wq - 1
            keep = ((rows_i % wp) != bad_q) & ((cols_i % wq) != bad_k)
            part = jnp.where(keep, part, 0.0)
        m = m + part
    pv = jax.lax.dot_general(m.astype(ph_ref.dtype), ph_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] + pv

    @pl.when(li == n_l - 1)
    def _done():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def csa_stencil(match, k, embed, scale: float, hp: int, wp: int, s: int,
                channels: int, out_dtype=jnp.float32,
                rows: int | None = None, tl: int = 1024,
                interpret: bool = False, a_dtype=jnp.bfloat16):
    """Whole CSA middle via the stencil factorization (header above).

    Same contract as csa_fused: match (B, Hp, Wp, Cr), k (B, L, 9Cr)
    normalized, embed (B, Hp, Wp, C); returns (B, s·Hp, s·Wp, C)
    pre-/6, pre-down-conv. Requires wp % 8 == 0 and (wp//s) % 8 == 0.
    Materializes Ā (B, P, L_pad) in HBM between the kernels (``a_dtype``,
    bf16 in production — f32 runs keep an f32 Ā so the mode stays inside
    f32 tolerance) — admission gates on that footprint
    (fused_admission)."""
    b = match.shape[0]
    cr = match.shape[-1]
    wq = wp // s
    hq = hp // s
    l_actual = hq * wq
    lq = hp * wp
    c_out = channels
    channels = aligned_channels(s, channels)
    if channels != c_out:
        embed = jnp.pad(embed, ((0, 0), (0, 0), (0, 0),
                                (0, channels - c_out)))
    if rows is None:
        cands = [r for r in range(1, 33)
                 if hp % r == 0 and (r * wp) % 8 == 0]
        rows = min(cands, key=lambda r: abs(r * wp - 2048))
    assert hp % rows == 0 and (rows * wp) % 8 == 0
    assert wp % 8 == 0 and wq % 8 == 0, "csa_stencil needs aligned widths"
    tp = rows * wp
    n_t = hp // rows
    tl = min(tl, -(-l_actual // 128) * 128)
    l_pad = -(-l_actual // tl) * tl
    n_l = l_pad // tl
    sc2 = s * s * channels
    hr = wp + 8                                   # ≥ wp+1, 8-aligned
    hc = -(-(wq + 1) // 64) * 64                  # ≥ wq+1, keeps lane width
    assert n_l <= 127

    m3 = _col_shifted3(match).reshape(b, 3, lq, cr)
    m3 = jnp.pad(m3, ((0, 0), (0, 0), (wp, wp), (0, 0)))
    k_res = jnp.pad(k, ((0, 0), (0, l_pad - l_actual), (0, 0)))

    from jax._src.pallas.core import Element
    a_norm = pl.pallas_call(
        functools.partial(_csa_scores_kernel, scale=scale, n_l=n_l,
                          l_actual=l_actual, tl=tl, rows=rows, wp=wp),
        grid=(b, n_t, 2 * n_l),
        in_specs=[pl.BlockSpec(
            (Element(1), Element(1), Element(tp + 2 * wp), Element(cr)),
            (lambda bi, pi, li, dx=dx: (bi, dx, pi * tp, 0)))
            for dx in range(3)] + [
            pl.BlockSpec((1, l_pad, 9 * cr), lambda bi, pi, li: (bi, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, tp, tl),
            # sweep 1 never assigns the block: park its visits on block
            # (pi, 0) (index unchanged -> no flush) so only sweep 2's
            # normalized tiles ever reach HBM
            lambda bi, pi, li: (bi, pi,
                                jnp.where(li < n_l, 0, li - n_l))),
        out_shape=jax.ShapeDtypeStruct((b, lq, l_pad), a_dtype),
        scratch_shapes=[pltpu.VMEM((tp, 128), jnp.float32),
                        pltpu.VMEM((tp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * lq * l_pad * 9 * cr,
            bytes_accessed=b * (lq * l_pad * 2 + 2 * l_pad * 9 * cr * 2
                                + 3 * lq * cr * 2),
            transcendentals=2 * b * lq * l_pad),
        interpret=interpret,
    )(m3, m3, m3, k_res)

    a_pad = jnp.pad(a_norm, ((0, 0), (hr, hr), (hc, hc)))
    phases = jnp.concatenate([embed[:, a::s, bb::s, :]
                              for a in range(s) for bb in range(s)],
                             axis=-1)                  # (B, hq, wq, s²C)
    phases = phases.reshape(b, l_actual, sc2)
    phases = jnp.pad(phases, ((0, 0), (0, l_pad - l_actual), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_csa_stencil_pv_kernel, n_l=n_l, tl=tl, rows=rows,
                          wp=wp, wq=wq, hr=hr, hc=hc),
        grid=(b, n_t, n_l),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(tp + 2 * hr), Element(tl + 2 * hc)),
                lambda bi, pi, li: (bi, pi * tp, li * tl)),
            pl.BlockSpec((1, tl, sc2), lambda bi, pi, li: (bi, li, 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, sc2), lambda bi, pi, li: (bi, pi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, sc2), out_dtype),
        scratch_shapes=[pltpu.VMEM((tp, sc2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lq * l_pad * sc2 + 9 * b * lq * l_pad,
            bytes_accessed=b * ((lq + 2 * hr) * (l_pad + 2 * hc) * 2
                                + n_t * l_pad * sc2 * 2 + lq * sc2 * 4),
            transcendentals=0),
        interpret=interpret,
    )(a_pad, phases)

    out = out.reshape(b, hp, wp, s, s, channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * s, wp * s,
                                                  channels)
    return out[..., :c_out] if channels != c_out else out


# ---------------------------------------------------------------------------
# Round-4, continued: single-kernel stencil — Ā never leaves VMEM.
#
# The two-kernel stencil path above still (a) computes every score twice
# (stats sweep + normalized-write sweep) and (b) round-trips the bf16
# Ā (P, L_pad) through HBM (plus an XLA pad copy). This kernel keeps the
# whole per-P-tile Ā block — own rows AND the ±(Wp+1) stencil halo rows,
# recomputed — in one VMEM scratch and normalizes it lazily: tile j is
# written as exp(sc − m_j) with m_j the running max at write time, the
# per-tile maxes are kept in a (TPH, 128) history (lane j = tile j), and
# ONE correction pass at the phase-1/phase-2 boundary applies
# exp(m_j − m_final)/l per tile — no per-step rescans. One score sweep,
# no HBM intermediate: FLOPs ≈ 2·P·L·(9Cr·(1+2·HR/TP) + s²C).
#
# The 9-point diagonal stencil is applied SEPARABLY:
#   u = Σ_dx mask_dx · shift(Ā, (dx, dx));  M = Σ_dy shift(u, dy·(Wp, W'))
# (the tap offset is dy·(Wp, W') + dx·(1, 1), so the double sum factors) —
# 3+3 shifted adds instead of 9, and the dy shifts are sublane-aligned.
# ---------------------------------------------------------------------------


def _csa_stencil_fused_kernel(m0_ref, m1_ref, m2_ref, k_ref, ph_ref, o_ref,
                              a_scr, q_scr, m_run, l_run, m_hist, acc_ref,
                              *, scale, n_l, l_actual, tl, rows, wp, wq, s,
                              channels, hr, hc, lq):
    """Grid (b, n_t, 2·n_l): phase 1 (li < n_l) scores tile li into the
    Ā scratch (q assembled once per P-tile into q_scr); the li == n_l
    step applies the lazy-max/denominator correction; phase 2 runs the
    separable stencil + phase matmul per L tile.

    m{0,1,2}_ref: (1, 1, TP+2·(HR+Wp), Cr) column-variant match windows
    (element row start pi·TP into the (HR+Wp)-row-padded map — the extra
    Wp rows feed the dy taps of the HR halo rows). k_ref: (1, TL, 9Cr)
    tile li (parked on tile 0 during phase 2). ph_ref: (1, TL, s²C)
    phase-plane tile lt (parked on 0 during phase 1). a_scr:
    (TP+2·HR, L_pad+2·HC) — Ā with zero col pads for the key-side taps.
    """
    pi = pl.program_id(1)
    li = pl.program_id(2)
    tp = rows * wp
    tph = tp + 2 * hr
    sc2 = s * s * channels

    @pl.when(li == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run, -jnp.inf)
        l_run[...] = jnp.zeros_like(l_run)
        a_scr[...] = jnp.zeros_like(a_scr)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_refs = (m0_ref, m1_ref, m2_ref)
        q_parts = []
        for dy in range(3):
            for dx in range(3):
                q_parts.append(m_refs[dx][0, 0, dy * wp:dy * wp + tph, :])
        q_scr[...] = jnp.concatenate(q_parts, axis=1)  # (TPH, 9Cr)

    @pl.when(li < n_l)
    def _scores():
        k = k_ref[0]                                   # (TL, 9Cr)
        sc = jax.lax.dot_general(q_scr[...], k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        col = li * tl + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        sc = jnp.where(col < l_actual, sc, -jnp.inf)

        m_prev = m_run[...]
        m_cur = jnp.max(sc, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        corr = jnp.exp(m_prev - m_new)                 # (TPH, 128)
        p = jnp.exp(sc - m_new[:, :1])                 # (TPH, TL)
        # zero out-of-image halo rows (their q is the zero pad → sc = 0,
        # which would otherwise survive the softmax as real mass)
        rglob = (pi * tp - hr
                 + jax.lax.broadcasted_iota(jnp.int32, (tph, 1), 0))
        p = jnp.where((rglob >= 0) & (rglob < lq), p, 0.0)
        l_run[...] = l_run[...] * corr + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), corr.shape)
        m_run[...] = m_new
        # record the max tile li was written with (lane li of the history)
        lane = jax.lax.broadcasted_iota(jnp.int32, m_new.shape, 1)
        m_hist[...] = jnp.where(lane == li, m_new, m_hist[...])
        a_scr[:, pl.ds(hc + li * tl, tl)] = p.astype(a_scr.dtype)

    @pl.when(li == n_l)
    def _normalize():
        # tile j holds exp(sc − m_j); one pass applies exp(m_j − m_fin)/l
        inv = 1.0 / jnp.maximum(l_run[...], 1e-30)     # (TPH, 128)
        m_fin = m_run[...]
        for j in range(n_l):
            f = jnp.exp(m_hist[:, j:j + 1] - m_fin[:, :1]) * inv[:, :1]
            blk = a_scr[:, hc + j * tl:hc + (j + 1) * tl]
            a_scr[:, hc + j * tl:hc + (j + 1) * tl] = (
                blk.astype(jnp.float32) * f).astype(blk.dtype)

    @pl.when(li >= n_l)
    def _stencil_pv():
        lt = li - n_l
        # one tl-ALIGNED dynamic window read, then static in-window
        # slices (the kernel-B pattern — Mosaic handles static unaligned
        # slices of a loaded window, not dynamic unaligned lane starts)
        w = a_scr[:, pl.ds(lt * tl, tl + 2 * hc)]      # (TPH, TL+2HC)
        # separable stencil, stage 1: the three (dx, dx) diagonal taps
        # over the region T2 needs (rows ±Wp, cols ±W' around the tile)
        ur, uc = tp + 2 * wp, tl + 2 * wq
        r0u, c0u = hr - wp, hc - wq
        rows_iu = jax.lax.broadcasted_iota(jnp.int32, (ur, 1), 0)
        cols_iu = (lt * tl - wq
                   + jax.lax.broadcasted_iota(jnp.int32, (1, uc), 1))
        u = w[r0u:r0u + ur, c0u:c0u + uc].astype(jnp.float32)
        for dx in (-1, 1):
            blk = w[r0u - dx:r0u - dx + ur,
                    c0u - dx:c0u - dx + uc].astype(jnp.float32)
            bad_q = 0 if dx == 1 else wp - 1
            bad_k = 0 if dx == 1 else wq - 1
            keep = (((rows_iu % wp) != bad_q)
                    & ((cols_iu % wq) != bad_k))
            u = u + jnp.where(keep, blk, 0.0)
        # stage 2: the three dy·(Wp, W') taps (sublane-aligned rows)
        m = u[wp:wp + tp, wq:wq + tl]
        for dy in (-1, 1):
            m = m + u[wp - dy * wp:wp - dy * wp + tp,
                      wq - dy * wq:wq - dy * wq + tl]
        pv = jax.lax.dot_general(m.astype(ph_ref.dtype), ph_ref[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] + pv

        @pl.when(li == 2 * n_l - 1)
        def _done():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def csa_stencil_fused(match, k, embed, scale: float, hp: int, wp: int,
                      s: int, channels: int, out_dtype=jnp.float32,
                      rows: int | None = None, tl: int = 1024,
                      interpret: bool = False, a_dtype=jnp.bfloat16):
    """Whole CSA middle via the stencil factorization, in ONE kernel.

    Same contract as csa_stencil / csa_fused: match (B, Hp, Wp, Cr),
    k (B, L, 9Cr) normalized, embed (B, Hp, Wp, C); returns
    (B, s·Hp, s·Wp, C) pre-/6, pre-down-conv. Requires wp % 8 == 0 and
    (wp//s) % 8 == 0. Ā lives in a (TP+2·HR, L_pad+2·HC) VMEM scratch
    (``a_dtype``) — admission gates on that footprint (fused_admission).
    The halo rows (HR = Wp+8 per side) are recomputed per P-tile: the
    score sweep runs at (TP+2·HR)/TP × the minimal FLOPs, which buys
    zero HBM intermediates and a single score sweep.

    Reference semantics: CrossScaleAttention,
    /root/reference/mmedited/models/common/arch_csnln.py:493-511.
    """
    b = match.shape[0]
    cr = match.shape[-1]
    wq = wp // s
    hq = hp // s
    l_actual = hq * wq
    lq = hp * wp
    c_out = channels
    channels = aligned_channels(s, channels)
    if channels != c_out:
        embed = jnp.pad(embed, ((0, 0), (0, 0), (0, 0),
                                (0, channels - c_out)))
    if rows is None:
        cands = [r for r in range(1, 17)
                 if hp % r == 0 and (r * wp) % 8 == 0]
        rows = min(cands, key=lambda r: abs(r * wp - 1536))
    assert hp % rows == 0 and (rows * wp) % 8 == 0
    assert wp % 8 == 0 and wq % 8 == 0, "csa_stencil_fused needs aligned widths"
    tp = rows * wp
    n_t = hp // rows
    tl = min(tl, -(-l_actual // 128) * 128)
    l_pad = -(-l_actual // tl) * tl
    n_l = l_pad // tl
    sc2 = s * s * channels
    hr = wp + 8                                  # ≥ wp+1, 8-aligned
    hc = -(-(wq + 1) // 128) * 128               # ≥ wq+1, lane-aligned
    padr = hr + wp                               # window pad: halo + dy tap

    m3 = _col_shifted3(match).reshape(b, 3, lq, cr)
    m3 = jnp.pad(m3, ((0, 0), (0, 0), (padr, padr), (0, 0)))
    k_res = jnp.pad(k, ((0, 0), (0, l_pad - l_actual), (0, 0)))
    phases = jnp.concatenate([embed[:, a::s, bb::s, :]
                              for a in range(s) for bb in range(s)],
                             axis=-1).reshape(b, l_actual, sc2)
    phases = jnp.pad(phases, ((0, 0), (0, l_pad - l_actual), (0, 0)))

    from jax._src.pallas.core import Element
    out = pl.pallas_call(
        functools.partial(_csa_stencil_fused_kernel, scale=scale, n_l=n_l,
                          l_actual=l_actual, tl=tl, rows=rows, wp=wp, wq=wq,
                          s=s, channels=channels, hr=hr, hc=hc, lq=lq),
        grid=(b, n_t, 2 * n_l),
        in_specs=[pl.BlockSpec(
            (Element(1), Element(1), Element(tp + 2 * padr), Element(cr)),
            (lambda bi, pi, li, dx=dx: (bi, dx, pi * tp, 0)))
            for dx in range(3)] + [
            pl.BlockSpec((1, tl, 9 * cr),
                         lambda bi, pi, li: (bi, jnp.where(li < n_l, li, 0),
                                             0)),
            pl.BlockSpec((1, tl, sc2),
                         lambda bi, pi, li: (bi, jnp.where(li < n_l, 0,
                                                           li - n_l), 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, sc2), lambda bi, pi, li: (bi, pi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, sc2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tp + 2 * hr, l_pad + 2 * hc), a_dtype),
            pltpu.VMEM((tp + 2 * hr, 9 * cr), match.dtype),
            pltpu.VMEM((tp + 2 * hr, 128), jnp.float32),
            pltpu.VMEM((tp + 2 * hr, 128), jnp.float32),
            pltpu.VMEM((tp + 2 * hr, 128), jnp.float32),
            pltpu.VMEM((tp, sc2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (lq + 2 * hr * n_t) * l_pad * 9 * cr
            + 2 * b * lq * l_pad * sc2,
            bytes_accessed=b * (3 * lq * cr * 2 + 2 * l_pad * 9 * cr * 2
                                + n_t * l_pad * sc2 * 2 + lq * sc2 * 4),
            transcendentals=b * (lq + 2 * hr * n_t) * l_pad),
        interpret=interpret,
    )(m3, m3, m3, k_res, phases)

    out = out.reshape(b, hp, wp, s, s, channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * s, wp * s,
                                                  channels)
    return out[..., :c_out] if channels != c_out else out
