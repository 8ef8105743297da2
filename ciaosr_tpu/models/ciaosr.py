"""CiaoSR implicit attention-in-attention decoder, TPU-first.

Behavioral spec: LocalImplicitSRNet at
/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:17-264
(forward :88-110, query_rgb :113-224, batched_predict :226-248, dim
plumbing :55-85).

TPU-native redesign (same math):
  * No unfold materialization — per-query 3×3 neighborhoods are gathered
    directly at nearest LR indices (one fused gather per shift set).
  * The reference's 4 sequential shift branches (:159-209) become one
    batched shift axis: a single (B,S,Q,·) gather, ONE imnet_k and ONE
    imnet_v matmul over all shifts — MXU-sized instead of ~30 kernels.
  * Nearest/bilinear grid-sample semantics are integer gathers
    (ops/sampling.py) — bit-matching align_corners=False + coord flip.
  * Query chunking (eval_bsize) is done by the restorer over a pure
    ``query_rgb`` method with static chunk shapes, instead of a Python
    while loop (:241-247).

Channel layout: neighborhoods are tap-major (tap*C + c); the torch
checkpoint converter permutes the first/last MLP layers (channel-major in
torch, ciaosr_net.py:131-139) — see convert/torch_weights.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.models.csa import CrossScaleAttention
from ciaosr_tpu.models.mlp import ImplicitMLP
from ciaosr_tpu.ops.neighborhood import gather_patches
from ciaosr_tpu.ops.sampling import (grid_sample_bilinear_border,
                                     nearest_index)


def shift_offsets(local_size: int) -> list[tuple[int, int]]:
    """The local-ensemble shift set (ciaosr_net.py:152-155):
    local_size=1 → [(0,0)]; 2 → 4 diagonals; 3 → full 3×3."""
    if local_size == 1:
        return [(0, 0)]
    step = 4 - local_size
    return [(i, j) for i in range(-1, 2, step) for j in range(-1, 2, step)]


def _grid_axis_tables(n: int, tn: int, p: int, local_size: int):
    """Host-side per-phase index/rel tables for one axis of a dense grid
    decode at rational scale tn/n = p/q (lowest terms, so q = n·p/tn).

    Replicates the float32 arithmetic of the per-query gather path
    bit-exactly (make_coord → shift → clip → nearest_index, i.e. the
    traced ops of query_rgb / core.coords.make_coord / ops.sampling
    .nearest_index), then slices the length-tn vectors into p phase views
    of length tn/p = n/q. Exact emulation matters because rational scales
    can put HR pixel centers on (or within a float32 ulp of) LR nearest-
    neighbor ties, where an analytic table and the traced computation
    would round differently (reference semantics: grid_sample nearest =
    round-half-even of the unnormalized coord, ciaosr_net.py:176-183).

    Returns {sign: (idx, rel)} per shift sign (plus 'q' → idx for the
    unshifted query sample): idx lists of p int64 vectors (LR source
    index per phase row, border-clamped), rel lists of p float64 vectors
    ((coord_q − coord_k)·n, ciaosr_net.py:185-189).
    """
    import numpy as np

    f32 = np.float32
    i = np.arange(tn, dtype=np.float32)
    # make_coord: -1 + (2 i + 1) / tn, each op in float32
    c0 = f32(-1.0) + (f32(2.0) * i + f32(1.0)) / f32(tn)
    # shift radius (query_rgb: rx = (1 − cell)/(n−1), cell = 2/tn)
    cell0 = f32(2.0) / f32(tn)
    r = (f32(1.0) - cell0) / f32(n - 1) if n > 1 else f32(0.0)
    lo, hi = f32(-1 + 1e-6), f32(1 - 1e-6)

    def near(c):
        ix = ((c + f32(1.0)) * f32(n) - f32(1.0)) / f32(2.0)
        return np.clip(np.round(ix).astype(np.int64), 0, n - 1)

    if local_size == 2:
        signs = (-1, 1)
    elif local_size == 1:
        signs = (0,)
    else:
        signs = (-1, 0, 1)

    c0_64 = c0.astype(np.float64)
    out = {"q": [near(c0)[a::p] for a in range(p)]}
    for s in signs:
        cc = c0 if s == 0 else (c0 + f32(s) * r) + f32(1e-6)
        cc = np.clip(cc, lo, hi)   # coord_s clamp (ciaosr_net.py:173)
        m = near(cc)
        rel = (c0_64 - (-1.0 + (2.0 * m + 1.0) / n)) * n
        out[s] = ([m[a::p] for a in range(p)],
                  [rel[a::p] for a in range(p)])
    return out


class CiaoSRNet(nn.Module):
    """Encoder + implicit attention-in-attention decoder.

    Call signatures:
      __call__(x, coord, cell)          full forward (training path)
      gen_feature(x)                    encoder trunk features (B,H,W,C)
      query_rgb(feature, x, coord, cell) decode a query chunk (+ residual)
    """

    encoder: nn.Module
    feat_dim: int = 64
    out_dim: int = 3
    hidden_q: Sequence[int] = (256, 256, 256, 256)
    hidden_k: Sequence[int] = (256, 256, 256, 256)
    hidden_v: Sequence[int] = (256, 256, 256, 256)
    local_size: int = 2
    feat_unfold: bool = True
    non_local_attn: bool = True
    multi_scale: Sequence[int] = (2,)
    softmax_scale: float = 1.0
    eval_bsize: int | None = 30000
    cs_softmax_scale: float = 10.0
    cs_average: bool = True
    dtype: Any = None  # compute dtype (bfloat16 for speed); params f32
    use_pallas: bool = False  # fused Mosaic grid-decoder kernel (TPU)

    def setup(self):
        base = self.feat_dim * 9 if self.feat_unfold else self.feat_dim
        nla_dim = self.feat_dim * len(self.multi_scale) \
            if self.non_local_attn else 0
        self.imnet_k = ImplicitMLP(out_dim=base, hidden_list=self.hidden_k,
                                   in_dim=base + 4,
                                   dtype=self.dtype, name="imnet_k")
        self.imnet_v = ImplicitMLP(out_dim=base + nla_dim,
                                   hidden_list=self.hidden_v,
                                   in_dim=base + nla_dim + 4,
                                   dtype=self.dtype, name="imnet_v")
        self.imnet_q = ImplicitMLP(out_dim=self.out_dim,
                                   hidden_list=self.hidden_q,
                                   in_dim=base + nla_dim,
                                   dtype=self.dtype, name="imnet_q")
        if self.non_local_attn:
            self.cs_attn = CrossScaleAttention(
                channels=self.feat_dim, scales=tuple(self.multi_scale),
                softmax_scale=self.cs_softmax_scale, average=self.cs_average,
                dtype=self.dtype, name="cs_attn")

    def gen_feature(self, x: jnp.ndarray, flash: bool = False) -> jnp.ndarray:
        """Encoder trunk features, NHWC. flash=True routes SwinIR window
        attention through the fused whole-block Pallas kernel — now
        differentiable (custom-VJP backward kernel), so training paths may
        opt in too."""
        from ciaosr_tpu.models.swinir import SwinIREncoder
        if flash and isinstance(self.encoder, SwinIREncoder):
            return self.encoder(x, flash=True)
        return self.encoder(x)

    def __call__(self, x: jnp.ndarray, coord: jnp.ndarray,
                 cell: jnp.ndarray, flash: bool = False) -> jnp.ndarray:
        """x: (B,H,W,3) LQ (pre-normalized); coord/cell: (B,Q,2).
        Returns (B,Q,3)."""
        feature = self.gen_feature(x, flash=flash)
        return self.query_rgb(feature, x, coord, cell)

    def nl_feature(self, feature: jnp.ndarray) -> jnp.ndarray:
        """Cross-scale attention features, exposed so chunked eval can
        compute them ONCE instead of per query chunk."""
        return self.cs_attn(feature)

    def query_rgb(self, feature: jnp.ndarray, x: jnp.ndarray,
                  coord: jnp.ndarray, cell: jnp.ndarray,
                  nl_feat: jnp.ndarray | None = None) -> jnp.ndarray:
        """Decode queries against precomputed features.

        Includes the global bilinear residual (ciaosr_net.py:107-108) so
        chunked eval can stream query blocks independently. ``nl_feat``
        optionally supplies precomputed cross-scale-attention features
        (hoisted out of the restorer's chunk loop).
        """
        b, h, w, c = feature.shape
        q = coord.shape[1]

        if self.non_local_attn and nl_feat is None:
            nl_feat = self.cs_attn(feature)        # (B,H,W,C·|ms|)

        # ---- query vector at the unshifted nearest LR pixel (:145-146)
        iy0 = jnp.clip(nearest_index(coord[..., 0], h), 0, h - 1)
        ix0 = jnp.clip(nearest_index(coord[..., 1], w), 0, w - 1)
        if self.feat_unfold:
            query = gather_patches(feature, iy0, ix0)          # (B,Q,9C)
        else:
            flat = feature.reshape(b, h * w, c)
            query = jnp.take_along_axis(flat, (iy0 * w + ix0)[..., None], 1)

        # ---- shifted coordinate set (:159-173)
        # shift radius uses the first query's cell, broadcast over Q (:162-163)
        rx = (1.0 - cell[:, 0, 0]) / (h - 1)                   # (B,)
        ry = (1.0 - cell[:, 0, 1]) / (w - 1)
        eps = 1e-6
        shifted = []
        for vx, vy in shift_offsets(self.local_size):
            cy = coord[..., 0]
            cx = coord[..., 1]
            if vx != 0:
                cy = cy + jnp.sign(vx) * (2 * abs(vx) - 1) * rx[:, None] + eps
            if vy != 0:
                cx = cx + jnp.sign(vy) * (2 * abs(vy) - 1) * ry[:, None] + eps
            shifted.append(jnp.stack([cy, cx], axis=-1))
        coord_s = jnp.clip(jnp.stack(shifted, axis=1),
                           -1 + 1e-6, 1 - 1e-6)                # (B,S,Q,2)
        s_num = coord_s.shape[1]

        # ---- gather keys/values at shifted nearest indices (:176-183)
        iy = jnp.clip(nearest_index(coord_s[..., 0], h), 0, h - 1)
        ix = jnp.clip(nearest_index(coord_s[..., 1], w), 0, w - 1)
        if self.feat_unfold:
            key = gather_patches(feature, iy, ix)              # (B,S,Q,9C)
        else:
            flat = feature.reshape(b, h * w, c)
            idx = (iy * w + ix).reshape(b, -1)
            key = jnp.take_along_axis(flat, idx[..., None], 1).reshape(
                b, s_num, q, c)
        if self.non_local_attn:
            nl_flat = nl_feat.reshape(b, h * w, nl_feat.shape[-1])
            idx = (iy * w + ix).reshape(b, -1)
            nl = jnp.take_along_axis(nl_flat, idx[..., None], 1).reshape(
                b, s_num, q, nl_feat.shape[-1])
            value = jnp.concatenate([key, nl], axis=-1)
        else:
            value = key

        # ---- relative offsets vs sampled LR pixel centers (:182-193)
        coord_k = jnp.stack(
            [-1.0 + (2.0 * iy.astype(coord.dtype) + 1.0) / h,
             -1.0 + (2.0 * ix.astype(coord.dtype) + 1.0) / w], axis=-1)
        rel = coord[:, None, :, :] - coord_k                   # (B,S,Q,2)
        rel = rel * jnp.asarray([h, w], dtype=rel.dtype)
        cell_hw = cell * jnp.asarray([h, w], dtype=cell.dtype)
        cell_hw = jnp.broadcast_to(cell_hw[:, None], (b, s_num, q, 2))

        # ---- modulation MLPs, batched over all shifts (:195-206)
        cdt = self.dtype or key.dtype
        rel = rel.astype(cdt)
        cell_hw = cell_hw.astype(cdt)
        key = key.astype(cdt)
        value = value.astype(cdt)
        query = query.astype(cdt)
        inp_k = jnp.concatenate([key, rel, cell_hw], axis=-1)
        inp_v = jnp.concatenate([value, rel, cell_hw], axis=-1)
        pred_k = key * self.imnet_k(inp_k)                     # (B,S,Q,Dk)
        pred_v = value * self.imnet_v(inp_v)                   # (B,S,Q,Dv)

        # ---- learned local ensemble: attention over shifts (:211-215)
        attn = jnp.einsum("bqc,bsqc->bqs", query, pred_k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn / self.softmax_scale, axis=-1)
        out = jnp.einsum("bqs,bsqc->bqc", attn, pred_v,
                         preferred_element_type=jnp.float32)

        # ---- final implicit MLP + global bilinear residual (:220-222,107)
        rgb = self.imnet_q(out.astype(cdt)).astype(jnp.float32)
        rgb = rgb + grid_sample_bilinear_border(
            x.astype(jnp.float32), coord)
        return rgb

    def query_rgb_grid(self, feature: jnp.ndarray, x: jnp.ndarray,
                       scale: int, phase_group: int = 2) -> jnp.ndarray:
        """Dense full-grid decode for INTEGER scales — the TPU-first eval
        path. Returns (B, s·H, s·W, 3).

        For a uniform HR grid at integer scale s, every decoder quantity is
        periodic in the pixel phase (a, b) = (i mod s, j mod s):
          * the nearest LR index is i//s for every phase (|rel|/2 < 1/2),
          * rel offsets and cells are per-phase constants,
          * each local-ensemble shift (ciaosr_net.py:159-173) snaps to a
            CONSTANT neighbor offset in {-1,0,1} (clamped at borders).
        So the per-query gathers of query_rgb become s² dense per-LR-pixel
        passes over edge-clamped shifted feature maps — zero gathers, pure
        MXU matmuls — and the HR image is assembled by pixel shuffle.
        Numerics match query_rgb on grid coords (same math, constants
        precomputed in float64 instead of per-query float32).
        """
        import numpy as np

        s = int(scale)
        b, h, w, c = feature.shape
        cdt = self.dtype or feature.dtype
        from ciaosr_tpu.ops.neighborhood import unfold_nhwc
        from ciaosr_tpu.ops.sampling import interpolate_bilinear

        u_map = unfold_nhwc(feature) if self.feat_unfold else feature
        if self.non_local_attn:
            v_map = jnp.concatenate(
                [u_map, self.cs_attn(feature, flash=True)], axis=-1)
        else:
            v_map = u_map
        u_map = u_map.astype(cdt)
        v_map = v_map.astype(cdt)
        query = u_map                                  # unshifted (B,H,W,Dq)
        dk = u_map.shape[-1]
        dv = v_map.shape[-1]

        # hoist the feature part of the modulation MLPs' first layers out
        # of the phase loop: Dense([K, rel, cell]) = K@W_feat + rc-terms.
        # K@W_feat is shift-equivariant, so ONE matmul per image serves all
        # phases and shifts as shifted views (~29% of decoder FLOPs).
        wk0 = self.imnet_k.variables["params"]["layers_0"]["kernel"]
        bk0 = self.imnet_k.variables["params"]["layers_0"]["bias"]
        wv0 = self.imnet_v.variables["params"]["layers_0"]["kernel"]
        bv0 = self.imnet_v.variables["params"]["layers_0"]["bias"]
        g_k = jnp.einsum("bhwc,cd->bhwd", u_map, wk0[:dk].astype(cdt),
                         preferred_element_type=cdt)
        g_v = jnp.einsum("bhwc,cd->bhwd", v_map, wv0[:dv].astype(cdt),
                         preferred_element_type=cdt)

        def shifted(t, dy, dx):
            if dy == 0 and dx == 0:
                return t
            p = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            return p[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]

        # ---- per-phase constants (float64 host-side) ----
        def axis_consts(n, big_n):
            rel = (2.0 * np.arange(s) + 1.0) / s - 1.0          # (s,)
            rx = (1.0 - 2.0 / big_n) / (n - 1)
            d = {0: np.zeros(s, np.int64)}
            for sign in (-1, 1):
                t = rel / 2 + sign * (n * rx / 2) + n * 1e-6 / 2
                d[sign] = np.round(t).astype(np.int64)
            return rel, d

        rel_y, dy_tab = axis_consts(h, s * h)
        rel_x, dx_tab = axis_consts(w, s * w)
        cell_val = 2.0 / s                              # cell · (H, W)

        shifts = shift_offsets(self.local_size)
        n_shift = len(shifts)
        phases = [(a, bb) for a in range(s) for bb in range(s)]

        def rel_axis_map(n, rel_val, d):
            """(n,) rel values incl. border clamp (coord clamp ⇒ d_eff=0)."""
            m = np.arange(n)
            d_eff = np.clip(m + d, 0, n - 1) - m
            return (rel_val - 2.0 * d_eff).astype(np.float32)

        def rc_bias(w0, b0, d_feat, ry, rx_):
            # per-(phase,shift) first-layer contribution of [rel, cell]+bias
            ry_t = jnp.asarray(ry)[:, None] * w0[d_feat][None, :]
            rx_t = jnp.asarray(rx_)[:, None] * w0[d_feat + 1][None, :]
            const = cell_val * (w0[d_feat + 2] + w0[d_feat + 3]) + b0
            return (ry_t[:, None, :] + rx_t[None, :, :]
                    + const[None, None, :]).astype(cdt)    # (H,W,256)

        out_phases = []
        for g0 in range(0, len(phases), phase_group):
            group = phases[g0:g0 + phase_group]
            pg = len(group)
            logits = []
            pred_vs = []
            for vy, vx in shifts:
                k_list, v_list, hk_list, hv_list = [], [], [], []
                for a, bb in group:
                    dy = int(dy_tab[int(np.sign(vy))][a]) if vy else 0
                    dx = int(dx_tab[int(np.sign(vx))][bb]) if vx else 0
                    k_list.append(shifted(u_map, dy, dx))
                    v_list.append(shifted(v_map, dy, dx))
                    ry = rel_axis_map(h, rel_y[a], dy)
                    rx_ = rel_axis_map(w, rel_x[bb], dx)
                    hk_list.append(shifted(g_k, dy, dx)
                                   + rc_bias(wk0, bk0, dk, ry, rx_))
                    hv_list.append(shifted(g_v, dy, dx)
                                   + rc_bias(wv0, bv0, dv, ry, rx_))
                key = jnp.stack(k_list)                    # (Pg,B,H,W,Dk)
                val = jnp.stack(v_list)
                wk = self.imnet_k.tail(nn.relu(jnp.stack(hk_list)))
                wv = self.imnet_v.tail(nn.relu(jnp.stack(hv_list)))
                logit = jnp.einsum("bhwc,pbhwc->pbhw", query, key * wk,
                                   preferred_element_type=jnp.float32)
                logits.append(logit)
                pred_vs.append(val * wv)
            attn = nn.softmax(
                jnp.stack(logits, axis=-1) / self.softmax_scale, axis=-1)
            outv = sum(attn[..., i:i + 1].astype(jnp.float32)
                       * pred_vs[i].astype(jnp.float32)
                       for i in range(n_shift))
            rgb = self.imnet_q(outv.astype(cdt)).astype(jnp.float32)
            out_phases.append(rgb)                        # (Pg,B,H,W,3)

        # ---- pixel-shuffle assembly: out[s·m+a, s·n+bb] = phase(a,bb) ----
        all_p = jnp.concatenate(out_phases, axis=0)       # (s²,B,H,W,3)
        all_p = all_p.reshape(s, s, b, h, w, 3)
        img = all_p.transpose(2, 3, 0, 4, 1, 5).reshape(b, s * h, s * w, 3)
        img = img + interpolate_bilinear(x.astype(jnp.float32),
                                         s * h, s * w)
        return img

    def query_rgb_grid_rational(self, feature: jnp.ndarray, x: jnp.ndarray,
                                py: int, qy: int, px: int, qx: int,
                                phase_group: int = 2) -> jnp.ndarray:
        """Dense full-grid decode for RATIONAL scales py/qy × px/qx — the
        arbitrary-scale extension of query_rgb_grid. Returns
        (B, H·py/qy, W·px/qx, 3). Requires qy | H and qx | W (automatic
        when the target size is H·py/qy ∈ ℤ with gcd(py,qy)=1).

        The integer-scale phase argument generalizes: on a uniform HR grid
        of size (py/qy)·H, every decoder quantity is periodic in the HR
        pixel phase (i mod py, j mod px) — phase a covers HR rows
        {a, a+py, ...}, which sample LR rows {qy·k + m_a} for a constant
        base offset m_a (up to border clamps and float32 rounding at exact
        nearest-neighbor ties, both captured per-row by the host tables of
        _grid_axis_tables). So the per-query gathers of query_rgb become
        py·px dense passes over stride-q row/column gathers of the feature
        maps — one (nky, nkx) = (H/qy, W/qx) MXU-shaped pass per phase,
        assembled by pixel shuffle. Reference semantics: arbitrary target
        sizes via per-query decoding (ciaosr_net.py:226-248,
        mmedited/models/restorers/ciaosr.py:240-243); the reference has no
        dense path at any scale.
        """
        import numpy as np

        b, h, w, c = feature.shape
        if h % qy or w % qx:
            raise ValueError(f"rational grid decode needs qy|H, qx|W; got "
                             f"H={h} qy={qy}, W={w} qx={qx}")
        th, tw = h * py // qy, w * px // qx
        nky, nkx = h // qy, w // qx
        from ciaosr_tpu.ops.neighborhood import unfold_nhwc
        from ciaosr_tpu.ops.sampling import interpolate_bilinear

        cdt = self.dtype or feature.dtype
        u_map = unfold_nhwc(feature) if self.feat_unfold else feature
        if self.non_local_attn:
            v_map = jnp.concatenate(
                [u_map, self.cs_attn(feature, flash=True)], axis=-1)
        else:
            v_map = u_map
        all_p = self._decode_rational_phases(
            u_map.astype(cdt), v_map.astype(cdt), py, qy, px, qx,
            phase_group)                           # (py·px,B,nky,nkx,3)

        # pixel-shuffle assembly: out[py·k + a, px·m + bb] = phase(a,bb)[k,m]
        all_p = all_p.reshape(py, px, b, nky, nkx, 3)
        img = all_p.transpose(2, 3, 0, 4, 1, 5).reshape(b, th, tw, 3)
        img = img + interpolate_bilinear(x.astype(jnp.float32), th, tw)
        return img

    def _decode_rational_phases(self, u_map: jnp.ndarray,
                                v_map: jnp.ndarray, py: int, qy: int,
                                px: int, qx: int, phase_group: int = 2,
                                phases: Sequence[tuple] | None = None
                                ) -> jnp.ndarray:
        """XLA dense decode of a rational-scale PHASE SUBSET (default:
        all py·px phases, row-major). Returns (n_phases, B, H/qy, W/qx, 3)
        pre-residual phase images. The subset form serves the hybrid
        fused/XLA composition (query_rgb_grid_rational_pallas): float32
        tie phases that the fused kernel cannot fetch affinely decode
        here."""
        import numpy as np

        b, h, w, _ = u_map.shape
        th, tw = h * py // qy, w * px // qx
        cdt = self.dtype or u_map.dtype
        dk = u_map.shape[-1]
        dv = v_map.shape[-1]

        # hoisted shift-equivariant first-layer feature matmuls (same
        # trick as query_rgb_grid: strided gathers commute with K@W_feat)
        wk0 = self.imnet_k.variables["params"]["layers_0"]["kernel"]
        bk0 = self.imnet_k.variables["params"]["layers_0"]["bias"]
        wv0 = self.imnet_v.variables["params"]["layers_0"]["kernel"]
        bv0 = self.imnet_v.variables["params"]["layers_0"]["bias"]
        g_k = jnp.einsum("bhwc,cd->bhwd", u_map, wk0[:dk].astype(cdt),
                         preferred_element_type=cdt)
        g_v = jnp.einsum("bhwc,cd->bhwd", v_map, wv0[:dv].astype(cdt),
                         preferred_element_type=cdt)

        y_tab = _grid_axis_tables(h, th, py, self.local_size)
        x_tab = _grid_axis_tables(w, tw, px, self.local_size)
        # cell·(H,W) as the gather path computes it (float32 2/target)
        cell_y = float(np.float32(2.0) / np.float32(th)) * h
        cell_x = float(np.float32(2.0) / np.float32(tw)) * w

        def take2(t, my, mx):
            return jnp.take(jnp.take(t, jnp.asarray(my), axis=1),
                            jnp.asarray(mx), axis=2)

        def rc_bias(w0, b0, d_feat, ry, rx_):
            # first-layer contribution of [rel_y, rel_x, cell_y, cell_x]
            ry_t = jnp.asarray(ry, jnp.float32)[:, None] * w0[d_feat][None]
            rx_t = jnp.asarray(rx_, jnp.float32)[:, None] * w0[d_feat + 1][None]
            const = cell_y * w0[d_feat + 2] + cell_x * w0[d_feat + 3] + b0
            return (ry_t[:, None, :] + rx_t[None, :, :]
                    + const[None, None, :]).astype(cdt)

        shifts = shift_offsets(self.local_size)
        n_shift = len(shifts)
        if phases is None:
            phases = [(a, bb) for a in range(py) for bb in range(px)]

        out_phases = []
        for g0 in range(0, len(phases), phase_group):
            group = phases[g0:g0 + phase_group]
            query = jnp.stack([take2(u_map, y_tab["q"][a], x_tab["q"][bb])
                               for a, bb in group])    # (Pg,B,nky,nkx,Dk)
            logits = []
            pred_vs = []
            for vy, vx in shifts:
                sy = int(np.sign(vy))
                sx = int(np.sign(vx))
                k_list, v_list, hk_list, hv_list = [], [], [], []
                for a, bb in group:
                    my = y_tab[sy][0][a]
                    ry = y_tab[sy][1][a]
                    mx = x_tab[sx][0][bb]
                    rx_ = x_tab[sx][1][bb]
                    k_list.append(take2(u_map, my, mx))
                    v_list.append(take2(v_map, my, mx))
                    hk_list.append(take2(g_k, my, mx)
                                   + rc_bias(wk0, bk0, dk, ry, rx_))
                    hv_list.append(take2(g_v, my, mx)
                                   + rc_bias(wv0, bv0, dv, ry, rx_))
                key = jnp.stack(k_list)                # (Pg,B,nky,nkx,Dk)
                val = jnp.stack(v_list)
                wk = self.imnet_k.tail(nn.relu(jnp.stack(hk_list)))
                wv = self.imnet_v.tail(nn.relu(jnp.stack(hv_list)))
                logit = jnp.einsum("pbhwc,pbhwc->pbhw", query, key * wk,
                                   preferred_element_type=jnp.float32)
                logits.append(logit)
                pred_vs.append(val * wv)
            attn = nn.softmax(
                jnp.stack(logits, axis=-1) / self.softmax_scale, axis=-1)
            outv = sum(attn[..., i:i + 1].astype(jnp.float32)
                       * pred_vs[i].astype(jnp.float32)
                       for i in range(n_shift))
            rgb = self.imnet_q(outv.astype(cdt)).astype(jnp.float32)
            out_phases.append(rgb)                     # (Pg,B,nky,nkx,3)

        return jnp.concatenate(out_phases, axis=0)     # (n_ph,B,nky,nkx,3)

    def query_rgb_grid_rational_pallas(self, feature: jnp.ndarray,
                                       x: jnp.ndarray, py: int, qy: int,
                                       px: int, qx: int) -> jnp.ndarray:
        """Rational-scale dense decode through the fused halo kernel
        (ops/pallas/decoder_kernel.py grid_decode_fused_rational —
        residue-grouped strided fetches), HYBRID-composed with the XLA
        dense path for the float32 tie phases the kernel cannot fetch
        affinely (every even-q scale has one tie row/column phase — e.g.
        ×2.5's center phase; odd q is fully fused). Bit-equal phase
        partition ⇒ same output as query_rgb_grid_rational. Gate with
        decoder_kernel.rational_halo_supported before tracing."""
        import jax
        import numpy as np

        from ciaosr_tpu.ops.neighborhood import unfold_nhwc
        from ciaosr_tpu.ops.pallas.decoder_kernel import (
            grid_decode_fused_rational, rational_phase_split)
        from ciaosr_tpu.ops.sampling import interpolate_bilinear

        b, h, w, _ = feature.shape
        kh, kw = h // qy, w // qx
        th, tw = kh * py, kw * px
        cdt = self.dtype or feature.dtype
        eligible, excluded = rational_phase_split(h, w, py, qy, px, qx,
                                                  self.local_size)
        # the fused phases unfold IN-KERNEL (f3p from_feature); the
        # materialized u_map is only needed for the XLA tie phases
        u_map = unfold_nhwc(feature) \
            if self.feat_unfold and excluded else \
            (None if self.feat_unfold else feature)
        csa_map = (self.cs_attn(feature, flash=True)
                   if self.non_local_attn else None)
        params = {"imnet_k": self.imnet_k.variables["params"],
                  "imnet_v": self.imnet_v.variables["params"],
                  "imnet_q": self.imnet_q.variables["params"]}
        fused = grid_decode_fused_rational(
            None if self.feat_unfold else u_map, csa_map, params,
            py, qy, px, qx,
            local_size=self.local_size, softmax_scale=self.softmax_scale,
            interpret=jax.default_backend() == "cpu",
            feature=feature if self.feat_unfold else None)
        parts = fused.reshape(b, len(eligible), kh, kw, 3).transpose(
            1, 0, 2, 3, 4)                             # (n_e,B,kh,kw,3)
        order = list(eligible)
        if excluded:
            v_map = u_map if csa_map is None else \
                jnp.concatenate([u_map, csa_map], axis=-1)
            xla_parts = self._decode_rational_phases(
                u_map.astype(cdt), v_map.astype(cdt), py, qy, px, qx,
                phase_group=2, phases=list(excluded))
            parts = jnp.concatenate([parts, xla_parts], axis=0)
            order += list(excluded)
        # static permutation back to row-major (a, b) phase order
        perm = np.argsort([a * px + bb for a, bb in order])
        all_p = jnp.take(parts, jnp.asarray(perm), axis=0)
        img = all_p.reshape(py, px, b, kh, kw, 3).transpose(
            2, 3, 0, 4, 1, 5).reshape(b, th, tw, 3)
        img = img + interpolate_bilinear(x.astype(jnp.float32), th, tw)
        return img

    def query_rgb_grid_pallas(self, feature: jnp.ndarray, x: jnp.ndarray,
                              scale: int, rows: int = 4) -> jnp.ndarray:
        """Dense-grid decode through the fused Mosaic kernel
        (ops/pallas/decoder_kernel.py) — ~1.4x the XLA grid path on v5e
        (decoder+CSA 78 -> 54 ms on a single 192-tile); batched tiles run
        as extra grid instances."""
        import jax

        from ciaosr_tpu.ops.pallas.decoder_kernel import grid_decode_fused
        from ciaosr_tpu.ops.sampling import interpolate_bilinear

        s = int(scale)
        b, h, w, _ = feature.shape
        # the 3×3 unfold runs INSIDE the f3p build kernel on the halo
        # path (decoder_kernel._f3p_kernel from_feature) — the 9×-blown
        # u_map never exists in HBM; only the stacked fallback (odd
        # widths) materializes it (grid_decode_fused handles both)
        u_map = None if self.feat_unfold else feature
        # value features are concat([u_map, CSA]); the kernel reuses the
        # key planes for the shared prefix, so only CSA planes are passed
        csa_map = (self.cs_attn(feature, flash=True)
                   if self.non_local_attn else None)
        params = {"imnet_k": self.imnet_k.variables["params"],
                  "imnet_v": self.imnet_v.variables["params"],
                  "imnet_q": self.imnet_q.variables["params"]}
        phases = grid_decode_fused(
            u_map, csa_map, params, scale=s, local_size=self.local_size,
            softmax_scale=self.softmax_scale, rows=rows,
            interpret=jax.default_backend() == "cpu",
            feature=feature if self.feat_unfold else None)
        img = phases.reshape(b, s, s, h, w, 3).transpose(
            0, 3, 1, 4, 2, 5).reshape(b, s * h, s * w, 3)
        img = img + interpolate_bilinear(x.astype(jnp.float32),
                                         s * h, s * w)
        return img

