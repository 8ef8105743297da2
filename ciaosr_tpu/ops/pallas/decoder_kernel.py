"""Fused CiaoSR grid-decoder kernel (Pallas/Mosaic, TPU).

Fuses, per (image, phase, row-block) grid instance, the per-pixel decoder
of query_rgb_grid (models/ciaosr.py): for all S local-ensemble shifts the
imnet_k / imnet_v modulation MLP tails (ciaosr_net.py:195-206), the
key-query logits, the softmax local ensemble (:211-215), the value blend,
and the imnet_q head (:220-222) — one HBM read of the shifted feature
planes, one HBM write of RGB. All MLP weights live in VMEM for the whole
kernel; the XLA fallback path writes ~6 (N,576..640) intermediates to HBM
per shift.

Shift-plane selection comes in two assemblies (grid_decode_fused
``assembly``):
* "stacked" (original): 9 edge-clamped shifted copies of every plane
  family are materialized in HBM; each of the S shift inputs is the SAME
  stacked array passed with an index_map that picks plane sel[p, s] via
  scalar prefetch.
* "halo" (round 2, default where W % 8 == 0): the families are merged
  into ONE lane-aligned map with three column variants, and the shifted
  block is fetched directly with element-granularity row starts — see
  the section comment above _grid_decode_halo.

Traffic/FLOP structure (what is hoisted and what is deduplicated):

* First-layer feature matmuls K@W_feat of imnet_k/imnet_v are
  shift-equivariant and phase-independent, so they run ONCE per image
  outside the kernel; the kernel reads their shifted 256-wide planes and
  only runs the MLP *tails* (~28% of decoder FLOPs removed).
  Dense([K, rel, cell]) = K @ W_feat + rely ⊗ w_rel_y + relx ⊗ w_rel_x
  + b_eff, where b_eff folds the (constant) cell terms; rely/relx carry
  the per-phase rel constants and their border-clamp corrections.
* The value features are concat([unfold, CSA]) (ciaosr_net.py:134-137),
  whose first DK lanes duplicate the key features exactly — the kernel
  reads the CSA extension planes only and reuses the key planes for the
  value modulation, splitting imnet_v's output layer and imnet_q's input
  layer column-/row-wise at pack time (host-side; no in-kernel
  unaligned lane slicing).
"""

from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Explicit tuning hook: caps the halo kernel's row-block size, overriding
# the measured production gate in _grid_decode_halo (rmax = 8 for
# lanes<=1536, else 4 — swept on v5e via tools/sweep_halo_rmax.py).
# Intended for offline sweeps only; leave None in production code paths.
_HALO_RMAX_OVERRIDE = None


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mlp_hidden(h, weights, prefix, n_hidden):
    """hidden layers 2..n; h is (N,hidden) f32 (post first relu)."""
    for i in range(1, n_hidden):
        h = jnp.maximum(_mm(h.astype(jnp.bfloat16), weights[f"{prefix}_w{i}"])
                        + weights[f"{prefix}_b{i}"], 0.0)
    return h


def _mlp_tail(h, weights, prefix, n_hidden):
    """hidden layers 2..n + out layer; h is (N,hidden) f32."""
    h = _mlp_hidden(h, weights, prefix, n_hidden)
    return _mm(h.astype(jnp.bfloat16), weights[f"{prefix}_wout"]) \
        + weights[f"{prefix}_bout"]


def _decode_kernel(sel_ref, u_refs, c_refs, gk_refs, gv_refs, wt_refs,
                   ck_refs, q_ref, rely_ref, relx_ref, w_refs, out_ref, *,
                   n_shift, n_hidden, softmax_scale, rows, width, dk, dc,
                   hoist_kout):
    n = rows * width
    weights = {k: r[...] for k, r in w_refs.items()}
    hk = weights["k_b0"].shape[-1]

    if not hoist_kout:
        q = q_ref[0].reshape(n, dk).astype(jnp.bfloat16)

    # ---- first layers per shift (VPU: rank-2 rel correction + relu), then
    # the shifts are STACKED along rows so every MLP-tail matmul runs once
    # at (S·N, 256) instead of S× at (N, 256) — 4× the M dim keeps the MXU
    # pipeline full instead of draining between small per-shift matmuls
    # (measured: 28.4 → ~24 ms/tile decode at RDN dims).
    h_ks = []
    h_vs = []
    for s in range(n_shift):
        # hoisted first-layer feature matmuls (module docstring): shifted
        # 256-wide pre-activation planes, computed once per image outside
        pre_k = gk_refs[s][0].reshape(n, -1).astype(jnp.float32)
        pre_v = gv_refs[s][0].reshape(n, -1).astype(jnp.float32)

        # first layers with decomposed rel terms. rely lives in SMEM
        # (scalar reads per image row); relx is a full VMEM lane row.
        # VPU outer products measured faster than a K=8 MXU matmul for
        # the rank-2 correction (28.5 vs 30.0 ms/tile) — the MXU is the
        # contended unit here, not the VPU.
        p_idx = pl.program_id(1)
        i_blk = pl.program_id(2)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
        rel_y_map = jnp.zeros((rows, width), jnp.float32)
        for r in range(rows):
            ry = rely_ref[p_idx, s, i_blk * rows + r]
            rel_y_map = jnp.where(row_ids == r, ry, rel_y_map)
        relx = relx_ref[0, s, :]                           # (width,)
        rel_x_map = jnp.broadcast_to(relx[None, :], (rows, width))
        rc_k = (rel_y_map[:, :, None] * weights["rel_w"][0, :hk]
                + rel_x_map[:, :, None] * weights["rel_w"][1, :hk]
                ).reshape(n, hk)
        rc_v = (rel_y_map[:, :, None] * weights["rel_w"][0, hk:]
                + rel_x_map[:, :, None] * weights["rel_w"][1, hk:]
                ).reshape(n, -1)
        h_ks.append(jnp.maximum(pre_k + rc_k + weights["k_b0"], 0.0))
        h_vs.append(jnp.maximum(pre_v + rc_v + weights["v_b0"], 0.0))

    hk_all = _mlp_hidden(jnp.concatenate(h_ks, axis=0), weights, "k",
                         n_hidden)                        # (S·N, 256) f32
    hv_all = _mlp_hidden(jnp.concatenate(h_vs, axis=0), weights, "v",
                         n_hidden).astype(jnp.bfloat16)
    # value modulation, split: lanes [0,DK) of the value features are
    # the key features (concat([unfold, CSA])) — reuse x_k, read only
    # the CSA extension plane
    wv_a_all = _mm(hv_all, weights["v_wouta"]) + weights["v_bouta"]
    if dc:
        wv_b_all = _mm(hv_all, weights["v_woutb"]) + weights["v_boutb"]
    if not hoist_kout:
        wk_all = _mm(hk_all.astype(jnp.bfloat16),
                     weights["k_wout"]) + weights["k_bout"]   # (S·N, DK)

    logits = []
    pred_as = []
    pred_bs = []
    for s in range(n_shift):
        x_k = u_refs[s][0].reshape(n, dk).astype(jnp.bfloat16)
        sl = slice(s * n, (s + 1) * n)
        if hoist_kout:
            # hoisted k-out layer (module docstring): logits = w̃·h + c
            # with w̃ = (q⊙key)@W_kout, c = (q⊙key)·b_kout computed per
            # image outside — the DK-wide out matmul and the query input
            # vanish. Wins for narrow features (RDN/EDSR, DK=576); for
            # SwinIR (DK=1620) the added w̃ plane traffic costs more than
            # the FLOP cut saves, so the classic path is kept (gate in
            # grid_decode_fused).
            wt = wt_refs[s][0].reshape(n, -1).astype(jnp.float32)
            ck = jnp.sum(ck_refs[s][0].reshape(n, 8), axis=-1,
                         keepdims=True)                   # lanes 1..7 zero
            logits.append(jnp.sum(wt * hk_all[sl], axis=-1, keepdims=True)
                          + ck)
        else:
            pred_k = x_k.astype(jnp.float32) * wk_all[sl]
            logits.append(jnp.sum(q.astype(jnp.float32) * pred_k, axis=-1,
                                  keepdims=True))
        # bf16 storage (VMEM budget); the blend below accumulates in f32
        pred_as.append((x_k.astype(jnp.float32)
                        * wv_a_all[sl]).astype(jnp.bfloat16))
        if dc:
            x_c = c_refs[s][0].reshape(n, dc).astype(jnp.float32)
            pred_bs.append((x_c * wv_b_all[sl]).astype(jnp.bfloat16))

    # local-ensemble softmax over shifts: manual on (N,1) columns
    lg = [l / softmax_scale for l in logits]
    mx = lg[0]
    for s in range(1, n_shift):
        mx = jnp.maximum(mx, lg[s])
    ex = [jnp.exp(l - mx) for l in lg]
    denom = ex[0]
    for s in range(1, n_shift):
        denom = denom + ex[s]
    attn = [e / denom for e in ex]
    outv_a = pred_as[0].astype(jnp.float32) * attn[0]
    for s in range(1, n_shift):
        outv_a = outv_a + pred_as[s].astype(jnp.float32) * attn[s]

    # imnet_q first layer, row-split to match the value split
    pre_q = _mm(outv_a.astype(jnp.bfloat16), weights["q_w0a"])
    if dc:
        outv_b = pred_bs[0].astype(jnp.float32) * attn[0]
        for s in range(1, n_shift):
            outv_b = outv_b + pred_bs[s].astype(jnp.float32) * attn[s]
        pre_q = pre_q + _mm(outv_b.astype(jnp.bfloat16), weights["q_w0b"])
    h_q = jnp.maximum(pre_q + weights["q_b0"], 0.0)
    rgb = _mlp_tail(h_q, weights, "q", n_hidden)   # (N, out_pad≥128)
    # write only 8 lanes: the imnet_q matmul stays 128-wide for the MXU,
    # but a 128-ch f32 output block would write 2.4 GB/tile for 3 useful
    # channels (43× the data) and steal DMA bandwidth from the inputs
    out_ref[0] = rgb[:, :8].reshape(rows, width, 8)


def _shift_planes(t: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) → (B*9,H,W,C): edge-clamped shifts; image b's plane for
    shift (dy,dx) lives at index b*9 + (dy+1)*3 + (dx+1)."""
    b, h, w, c = t.shape
    p = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    planes = [p[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]
              for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    return jnp.stack(planes, axis=1).reshape(b * 9, h, w, c)


def _split_first_layer(params, main_dim):
    k = params["layers_0"]["kernel"]
    return (k[:main_dim].astype(jnp.bfloat16),
            k[main_dim].astype(jnp.float32),      # rel_y row
            k[main_dim + 1].astype(jnp.float32),  # rel_x row
            k[main_dim + 2].astype(jnp.float32),  # cell_y row
            k[main_dim + 3].astype(jnp.float32),  # cell_x row
            params["layers_0"]["bias"].astype(jnp.float32))


def _pack_weights(mlp_params, prefix, main_dim, cell_val, n_hidden,
                  with_rc=True, pad_out=False, with_out=True):
    out = {}
    if with_rc:
        # w0 (the feature block) is NOT packed: its matmul is hoisted out
        # of the kernel (see grid_decode_fused); only the rel rows and the
        # cell-folded bias enter VMEM. cell_val is (cell_y, cell_x) —
        # anisotropic rational scales fold per-axis cell constants.
        _, wry, wrx, wcy, wcx, b0 = _split_first_layer(mlp_params, main_dim)
        c_y, c_x = (cell_val if isinstance(cell_val, tuple)
                    else (cell_val, cell_val))
        out[f"{prefix}_wrely"] = wry
        out[f"{prefix}_wrelx"] = wrx
        out[f"{prefix}_b0"] = b0 + c_y * wcy + c_x * wcx
    else:
        out[f"{prefix}_w0"] = mlp_params["layers_0"]["kernel"].astype(
            jnp.bfloat16)
        out[f"{prefix}_b0"] = mlp_params["layers_0"]["bias"].astype(
            jnp.float32)
    for i in range(1, n_hidden):
        out[f"{prefix}_w{i}"] = mlp_params[f"layers_{i}"]["kernel"].astype(
            jnp.bfloat16)
        out[f"{prefix}_b{i}"] = mlp_params[f"layers_{i}"]["bias"].astype(
            jnp.float32)
    if with_out:
        wout = mlp_params["out"]["kernel"].astype(jnp.bfloat16)
        bout = mlp_params["out"]["bias"].astype(jnp.float32)
        if pad_out and wout.shape[-1] % 128:
            pad = 128 - wout.shape[-1] % 128
            wout = jnp.pad(wout, ((0, 0), (0, pad)))
            bout = jnp.pad(bout, (0, pad))
        out[f"{prefix}_wout"] = wout
        out[f"{prefix}_bout"] = bout
    return out


def grid_decode_fused(u_map: jnp.ndarray | None,
                      csa_map: jnp.ndarray | None,
                      params: dict, scale: int, local_size: int,
                      softmax_scale: float, rows: int = 4,
                      interpret: bool = False,
                      hoist_kout: bool | None = None,
                      assembly: str | None = None,
                      phase_inner: bool | None = None,
                      feature: jnp.ndarray | None = None) -> jnp.ndarray:
    """Run the fused decoder over all phases.

    Feature input — exactly one of ``u_map`` / ``feature``:
      * ``u_map``: (B,H,W,9C) pre-materialized 3×3 unfold (bf16 ok), or
      * ``feature``: (B,H,W,C) raw encoder features — the 3×3 unfold then
        runs in-kernel on the halo path (DK=9C is derived from C), saving
        the 9× HBM materialization; on the stacked fallback the unfold is
        materialized here first.
    Passing both is an error (the halo path would silently ignore
    ``u_map`` and recompute from ``feature``).
    csa_map: optional (B,H,W,DC) cross-scale-attention features — the
    value features are concat([u_map, csa_map]) and are never
    materialized (kernel reuses the key planes for the shared prefix);
    params: generator params dict with imnet_k/v/q subtrees.
    Returns (B·s², H, W, 3) float32 phase images (pre-residual), image-major
    (image b's phase p at index b·s² + p).

    ``assembly``: "halo" (default where eligible) assembles the shifted
    planes IN-KERNEL from three column-variant copies of one merged map
    (see _grid_decode_halo) instead of materializing nine shifted copies
    of every plane family in HBM; "stacked" is the original 9-plane path,
    kept as the fallback for odd widths (W % 8 != 0) and as the halo
    path's bit-parity oracle in tests. On halo the k-out hoist is
    unconditional (wins at every measured DK, incl. wide-DK SwinIR);
    on stacked it is gated to DK ≤ 1024.

    ``phase_inner`` (halo only): make phase the innermost grid dim with
    shift-monotone phase ordering so Mosaic elides repeated window
    fetches (see _grid_decode_halo); None auto-enables it for wide
    merged maps (lanes > 1536, i.e. SwinIR-class models) where the
    kernel is read-bound.
    """
    from ciaosr_tpu.models.ciaosr import shift_offsets

    if (u_map is None) == (feature is None):
        raise ValueError("pass exactly one of u_map / feature "
                         f"(got u_map={'set' if u_map is not None else None}, "
                         f"feature={'set' if feature is not None else None})")
    s = int(scale)
    if feature is not None:
        bsz, h, w, cf = feature.shape
        dk = 9 * cf
    else:
        bsz, h, w, dk = u_map.shape
    dc = 0 if csa_map is None else csa_map.shape[-1]
    dv = dk + dc
    shifts = shift_offsets(local_size)
    n_shift = len(shifts)
    n_hidden = len([k for k in params["imnet_k"] if k.startswith("layers")])
    cell_val = 2.0 / s

    halo_ok = w % 8 == 0 and h > 1
    if assembly is None:
        assembly = "halo" if halo_ok else "stacked"
    if assembly != "halo" and u_map is None:
        # in-kernel unfold is a halo-assembly mode; the stacked fallback
        # still needs the materialized unfold
        from ciaosr_tpu.ops.neighborhood import unfold_nhwc
        u_map = unfold_nhwc(feature)
        feature = None
    if hoist_kout is None:
        # stacked path: the DK-wide w̃ plane traffic beats the FLOP cut
        # past DK≈1024 (measured round 1: SwinIR 5.23→4.90). Halo path:
        # the hoist also wins at DK=1620 (42.4→35.0 ms per 192² ×4 tile —
        # it drops the a128(DK)-lane query window for a 256-lane w̃ read
        # AND cuts the in-kernel 256→DK matmul), so it is unconditional.
        hoist_kout = True if assembly == "halo" else dk <= 1024
    if assembly == "halo":
        if not halo_ok:
            raise ValueError("halo assembly needs W % 8 == 0 and H > 1")
        return _grid_decode_halo(u_map, csa_map, params, s, shifts,
                                 n_hidden, cell_val, softmax_scale,
                                 interpret, hoist_kout,
                                 phase_inner=phase_inner, feature=feature)
    if phase_inner:
        raise ValueError("phase_inner grid order is a halo-assembly mode")

    u9 = _shift_planes(u_map.astype(jnp.bfloat16))
    c9 = _shift_planes(csa_map.astype(jnp.bfloat16)) if dc else None
    query = u_map.astype(jnp.bfloat16)

    # hoisted imnet_k OUT layer: logits = (q⊙key)·(W_kout h + b_kout)
    #                                   = [(q⊙key)@W_kout]·h + (q⊙key)·b,
    # and q⊙key is phase-independent → one matmul per shift plane per
    # image replaces the in-kernel 256→DK out matmul + DK-wide multiply
    # and dot per (pixel, phase, shift) (~s²× the FLOPs). Measured: wins
    # for DK=576 (RDN/EDSR); loses for DK=1620 (SwinIR — added plane
    # traffic beats the FLOP cut), hence the width gate.
    if hoist_kout:
        w_kout_t = params["imnet_k"]["out"]["kernel"].T.astype(jnp.bfloat16)
        b_kout = params["imnet_k"]["out"]["bias"].astype(jnp.float32)
        q_rep = jnp.repeat(query, 9, axis=0)
        qk9 = (u9 * q_rep).reshape(-1, dk)                # (B·9·H·W, DK)
        wt9 = _mm(qk9, w_kout_t).reshape(bsz * 9, h, w, -1).astype(
            jnp.bfloat16)                                 # (B·9,H,W,256)
        # matvec as a bf16-in/f32-accum matmul — an f32 cast of qk9 here
        # would materialize the 9×-expanded DK-wide product at 4 B/elem
        ck9 = _mm(qk9, b_kout.astype(jnp.bfloat16)[:, None]).reshape(
            bsz * 9, h, w, 1)
        ck9 = jnp.pad(ck9, ((0, 0), (0, 0), (0, 0), (0, 7)))  # 8 lanes

    # hoisted first-layer feature matmuls (shift-equivariant, phase-
    # independent — one pass per image serves all s²·n_shift kernel
    # instances as shifted plane views; same trick as query_rgb_grid)
    wk0 = params["imnet_k"]["layers_0"]["kernel"][:dk].astype(jnp.bfloat16)
    wv0 = params["imnet_v"]["layers_0"]["kernel"][:dv].astype(jnp.bfloat16)
    u_flat = u_map.astype(jnp.bfloat16).reshape(-1, dk)
    g_k = _mm(u_flat, wk0)
    g_v = _mm(u_flat, wv0[:dk])
    if dc:
        g_v = g_v + _mm(csa_map.astype(jnp.bfloat16).reshape(-1, dc),
                        wv0[dk:])
    hidden_k, hidden_v = g_k.shape[-1], g_v.shape[-1]
    gk9 = _shift_planes(g_k.reshape(bsz, h, w, hidden_k).astype(jnp.bfloat16))
    gv9 = _shift_planes(g_v.reshape(bsz, h, w, hidden_v).astype(jnp.bfloat16))

    # ---- per-phase constants (host) ----
    def axis_consts(n_, big_n):
        rel = (2.0 * np.arange(s) + 1.0) / s - 1.0
        rx = (1.0 - 2.0 / big_n) / (n_ - 1)
        d = {0: np.zeros(s, np.int64)}
        for sign in (-1, 1):
            d[sign] = np.round(rel / 2 + sign * (n_ * rx / 2)
                               + n_ * 1e-6 / 2).astype(np.int64)
        return rel, d

    rel_y, dy_tab = axis_consts(h, s * h)
    rel_x, dx_tab = axis_consts(w, s * w)
    phases = [(a, b) for a in range(s) for b in range(s)]
    n_phase = len(phases)

    sel = np.zeros((n_phase, n_shift), np.int32)
    rely = np.zeros((n_phase, n_shift, h), np.float32)
    relx = np.zeros((n_phase, n_shift, w), np.float32)
    m_h, m_w = np.arange(h), np.arange(w)
    for p, (a, b) in enumerate(phases):
        for si, (vy, vx) in enumerate(shifts):
            dy = int(dy_tab[int(np.sign(vy))][a]) if vy else 0
            dx = int(dx_tab[int(np.sign(vx))][b]) if vx else 0
            sel[p, si] = (dy + 1) * 3 + (dx + 1)
            dye = np.clip(m_h + dy, 0, h - 1) - m_h
            dxe = np.clip(m_w + dx, 0, w - 1) - m_w
            rely[p, si] = rel_y[a] - 2.0 * dye
            relx[p, si] = rel_x[b] - 2.0 * dxe

    weights = {}
    weights.update(_pack_weights(params["imnet_k"], "k", dk, cell_val,
                                 n_hidden, with_out=not hoist_kout))
    weights.update(_pack_weights(params["imnet_v"], "v", dv, cell_val,
                                 n_hidden))
    weights.update(_pack_weights(params["imnet_q"], "q", dv, cell_val,
                                 n_hidden, with_rc=False, pad_out=True))
    # joint rel-correction rows for the in-kernel outer products:
    # row 0 = d(h)/d(rel_y), row 1 = d(h)/d(rel_x), over [k-MLP | v-MLP]
    rel_w = jnp.zeros((2, weights["k_b0"].shape[-1]
                       + weights["v_b0"].shape[-1]), jnp.float32)
    rel_w = rel_w.at[0].set(jnp.concatenate([weights.pop("k_wrely"),
                                             weights.pop("v_wrely")]))
    rel_w = rel_w.at[1].set(jnp.concatenate([weights.pop("k_wrelx"),
                                             weights.pop("v_wrelx")]))
    weights["rel_w"] = rel_w
    # split imnet_v's output layer (columns) and imnet_q's first layer
    # (rows) at the unfold/CSA boundary — host-side, so the kernel never
    # lane-slices at a non-128-aligned offset
    v_wout = weights.pop("v_wout")
    v_bout = weights.pop("v_bout")
    weights["v_wouta"], weights["v_bouta"] = v_wout[:, :dk], v_bout[:dk]
    q_w0 = weights.pop("q_w0")
    weights["q_w0a"] = q_w0[:dk]
    if dc:
        weights["v_woutb"], weights["v_boutb"] = v_wout[:, dk:], v_bout[dk:]
        weights["q_w0b"] = q_w0[dk:]
    w_names = sorted(weights)

    rows = min(rows, h)
    while h % rows:
        rows -= 1
    n_blocks = h // rows

    def sel_spec(width_, si):
        return pl.BlockSpec((1, rows, w, width_),
                            (lambda b, p, i, sref, s_=si:
                             (b * 9 + sref[p, s_], i, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_phase, n_blocks),
        in_specs=[
            *[sel_spec(dk, si) for si in range(n_shift)],
            *([sel_spec(dc, si) for si in range(n_shift)] if dc else []),
            *[sel_spec(hidden_k, si) for si in range(n_shift)],
            *[sel_spec(hidden_v, si) for si in range(n_shift)],
            *([sel_spec(wt9.shape[-1], si) for si in range(n_shift)]
              + [sel_spec(8, si) for si in range(n_shift)]
              if hoist_kout else
              [pl.BlockSpec((1, rows, w, dk),
                            lambda b, p, i, sref: (b, i, 0, 0))]),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rely (P,S,H)
            pl.BlockSpec((1, n_shift, w), lambda b, p, i, sref: (p, 0, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_names],
        ],
        out_specs=pl.BlockSpec((1, rows, w, 8),
                               lambda b, p, i, sref: (b * n_phase + p, i,
                                                      0, 0)),
    )

    n_c = n_shift if dc else 0

    def kernel(sel_ref, *refs):
        u_refs = refs[:n_shift]
        c_refs = refs[n_shift:n_shift + n_c]
        gk_refs = refs[n_shift + n_c:2 * n_shift + n_c]
        gv_refs = refs[2 * n_shift + n_c:3 * n_shift + n_c]
        pos = 3 * n_shift + n_c
        if hoist_kout:
            wt_refs = refs[pos:pos + n_shift]
            ck_refs = refs[pos + n_shift:pos + 2 * n_shift]
            q_ref = None
            pos += 2 * n_shift
        else:
            wt_refs = ck_refs = None
            q_ref = refs[pos]
            pos += 1
        rest = refs[pos:]
        rely_ref, relx_ref = rest[0], rest[1]
        w_refs = dict(zip(w_names, rest[2:2 + len(w_names)]))
        out_ref = refs[-1]
        _decode_kernel(sel_ref, u_refs, c_refs, gk_refs, gv_refs, wt_refs,
                       ck_refs, q_ref, rely_ref, relx_ref, w_refs, out_ref,
                       n_shift=n_shift, n_hidden=n_hidden,
                       softmax_scale=softmax_scale, rows=rows, width=w,
                       dk=dk, dc=dc, hoist_kout=hoist_kout)

    # first-layer feature matmuls (and for narrow DK the k-out layer)
    # hoisted → mostly MLP tails run in-kernel
    mlp_flops = ((n_hidden - 1) * 256 * 256
                 + (0 if hoist_kout else 256 * dk)
                 + (n_hidden - 1) * 256 * 256 + 256 * dv)
    per_shift_lanes = dk + dc + hidden_k + hidden_v \
        + (hidden_k + 8 if hoist_kout else 0)
    cost = pl.CostEstimate(
        flops=2 * bsz * n_phase * h * w * (n_shift * mlp_flops
                                           + dv * 256
                                           + (n_hidden - 1) * 65536),
        bytes_accessed=bsz * n_phase * h * w
        * (per_shift_lanes * n_shift + (0 if hoist_kout else dk)) * 2,
        transcendentals=bsz * n_phase * h * w * n_shift)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * n_phase, h, w, 8),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(sel), *([u9] * n_shift),
      *([c9] * n_shift if dc else []),
      *([gk9] * n_shift), *([gv9] * n_shift),
      *([wt9] * n_shift + [ck9] * n_shift if hoist_kout else [query]),
      jnp.asarray(rely), jnp.asarray(relx),
      *[weights[k] for k in w_names])
    return out[..., :3]


# ---------------------------------------------------------------------------
# Round-2 "halo" assembly: shifted planes fetched, not materialized.
#
# The stacked path above materializes nine edge-shifted copies of every
# plane family (u_map / CSA / g_k / g_v) in HBM (~0.8 GB of stack writes
# per 192² RDN tile, ~8 ms of glue). But an edge-clamped (dy,dx) shift
# decomposes into a column half and a row half:
#   * columns: only three variants (dx ∈ {-1,0,1}) exist — pre-baked as
#     copies, because a ±1 column shift of the row-raveled tile is a ±1
#     SUBLANE shift, which Mosaic cannot slice at (same lesson as
#     csa_fused, csa_attention.py); the index map picks the variant per
#     (phase, shift) via scalar prefetch, exactly like the stacked path
#     picks planes;
#   * rows: with one baked edge row of padding top and bottom, the
#     (dy,dx)-shifted block IS the rows-tall window of column variant
#     dx+1 starting at image row i·rows + dy — fetched directly with an
#     ELEMENT-granularity row start (pl BlockDim Element; the row stride
#     W·lanes keeps any start sublane-aligned), so no nine-plane stack,
#     no halo overfetch, and no in-kernel assembly exist at all.
# The families are lane-concatenated into ONE 128-aligned map (u padded
# to ⌈DK/128⌉·128 | CSA to ⌈DC/128⌉ | g_k | g_v) so each shift is a
# single DMA, and in-kernel lane slices land on 128 boundaries.
# ---------------------------------------------------------------------------


def a128(x):
    """Smallest multiple of 128 ≥ x (lane-tile alignment)."""
    return -(-x // 128) * 128


def _f3p_kernel(u_ref, *rest, dc, hk_p, hv_p, dc_p, dk_pad,
                from_feature=False):
    """One output row of the merged column-variant map: first-layer
    feature matmuls + lane-pad + segment concat + the three edge-clamped
    column shifts, fused — the XLA construction materialized each step
    (pad → concat → stack → row-pad ≈ 4 copies of ~190 MB at 192²).

    ``from_feature``: the 3×3 unfold itself also runs in-kernel — the
    three refs are rows y−1/y/y+1 of the zero-row-padded RAW feature
    (B,H,W,C) and the 9-tap row (W, 9C) is built in VMEM (tap-major,
    j = tap·C + c, matching ops/neighborhood.unfold_nhwc) — so the 9×
    unfolded u_map (42 MB at RDN 192², 127 MB at SwinIR) never exists
    in HBM (reference materializes it: ciaosr_net.py:131-139)."""
    refs = (u_ref,) + rest
    if from_feature:
        if dc:
            fm1_ref, fc_ref, fp1_ref, c_ref, wk_ref, wvu_ref, wvc_ref, \
                o_ref = refs
        else:
            fm1_ref, fc_ref, fp1_ref, wk_ref, wvu_ref, o_ref = refs
        rows3 = [fm1_ref[0, 0], fc_ref[0, 0], fp1_ref[0, 0]]
        cf = rows3[0].shape[-1]
        zc = jnp.zeros((1, cf), jnp.bfloat16)
        taps = []
        for v in rows3:                               # dy = -1, 0, +1
            v = v.astype(jnp.bfloat16)                # (W, C)
            taps.append(jnp.concatenate([zc, v[:-1]], axis=0))  # x-1
            taps.append(v)                                      # x
            taps.append(jnp.concatenate([v[1:], zc], axis=0))   # x+1
        u = jnp.concatenate(taps, axis=-1)            # (W, 9C) tap-major
    elif dc:
        c_ref, wk_ref, wvu_ref, wvc_ref, o_ref = rest
        u = u_ref[0, 0].astype(jnp.bfloat16)          # (W, dk)
    else:
        wk_ref, wvu_ref, o_ref = rest
        u = u_ref[0, 0].astype(jnp.bfloat16)          # (W, dk)
    w_ = u.shape[0]

    def lane_pad(x, to):
        short = to - x.shape[-1]
        if short == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((w_, short), jnp.bfloat16)], axis=-1)

    gk = _mm(u, wk_ref[...])                          # (W, hidden_k) f32
    gv = _mm(u, wvu_ref[...])
    segs = [lane_pad(gk.astype(jnp.bfloat16), hk_p)]
    if dc:
        c = c_ref[0, 0].astype(jnp.bfloat16)          # (W, dc)
        gv = gv + _mm(c, wvc_ref[...])
        segs.append(lane_pad(gv.astype(jnp.bfloat16), hv_p))
        segs.append(lane_pad(c, dc_p))
    else:
        segs.append(lane_pad(gv.astype(jnp.bfloat16), hv_p))
    segs.append(lane_pad(u, dk_pad))
    m = jnp.concatenate(segs, axis=-1)                # (W, lanes)
    o_ref[0, 0, 0] = jnp.concatenate([m[:1], m[:-1]], axis=0)
    o_ref[0, 1, 0] = m
    o_ref[0, 2, 0] = jnp.concatenate([m[1:], m[-1:]], axis=0)


def _build_f3p(u_map, csa_map, wk0, wvu, wvc, interpret, feature=None):
    """Fused build of the halo path's merged map (B,3,H+2,W,lanes):
    row r of the output holds image row clamp(r-1) — the edge clamp is
    the INPUT index map (block row size 1, so block indices address
    element rows and no Element dims or post-pad copy are needed).

    ``feature``: build from the RAW (B,H,W,C) feature instead — the 3×3
    zero-padded unfold runs in-kernel (u_map is ignored and never needs
    to exist; dk = 9·C). The feature is zero-padded by one row host-side
    so the three row refs (y−1, y, y+1 of image row y = clamp(r−1)) are
    plain clipped index maps with no edge masking."""
    if feature is not None:
        bsz, h, w, cf = feature.shape
        dk = 9 * cf
    else:
        bsz, h, w, dk = u_map.shape
    dc = 0 if csa_map is None else csa_map.shape[-1]
    hk_p, hv_p = a128(wk0.shape[-1]), a128(wvu.shape[-1])
    dc_p = a128(dc) if dc else 0
    dk_pad = a128(dk)
    lanes = hk_p + hv_p + dc_p + dk_pad

    if feature is not None:
        # fp[i] = feature row i-1 (rows 0 / h+1 are the unfold zero pad)
        fp = jnp.pad(feature.astype(jnp.bfloat16),
                     ((0, 0), (1, 1), (0, 0), (0, 0)))
        in_specs = [
            pl.BlockSpec((1, 1, w, cf),
                         lambda b, r, d=d: (b, jnp.clip(r - 1, 0, h - 1)
                                            + d, 0, 0))
            for d in range(3)]
        ops = [fp, fp, fp]
    else:
        in_specs = [pl.BlockSpec(
            (1, 1, w, dk),
            lambda b, r: (b, jnp.clip(r - 1, 0, h - 1), 0, 0))]
        ops = [u_map]
    if dc:
        in_specs.append(pl.BlockSpec(
            (1, 1, w, dc),
            lambda b, r: (b, jnp.clip(r - 1, 0, h - 1), 0, 0)))
        ops.append(csa_map)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 if dc else 2)
    ops.append(wk0.astype(jnp.bfloat16))
    ops.append(wvu.astype(jnp.bfloat16))
    if dc:
        ops.append(wvc.astype(jnp.bfloat16))

    return pl.pallas_call(
        functools.partial(_f3p_kernel, dc=dc, hk_p=hk_p, hv_p=hv_p,
                          dc_p=dc_p, dk_pad=dk_pad,
                          from_feature=feature is not None),
        grid=(bsz, h + 2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, 1, w, lanes),
                               lambda b, r: (b, 0, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, h + 2, w, lanes),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (h + 2) * w * (
                dk * (wk0.shape[-1] + wvu.shape[-1])
                + dc * wvu.shape[-1]),
            bytes_accessed=bsz * (h + 2) * w * (
                (6 * cf if feature is not None
                 else dk * u_map.dtype.itemsize)
                + (dc * csa_map.dtype.itemsize if dc else 0)
                + 3 * lanes * 2),
            transcendentals=0),
        interpret=interpret,
    )(*ops)


def _phase_tables(s, h, w, shifts):
    """Per-(phase, shift) integer shift components and rel-coordinate
    rows (ciaosr_net.py:176-215 grid decomposition — same math as the
    stacked path, with (dy, dx) returned separately for the halo path's
    column-variant / row-offset selection)."""
    def axis_consts(n_, big_n):
        rel = (2.0 * np.arange(s) + 1.0) / s - 1.0
        rx = (1.0 - 2.0 / big_n) / (n_ - 1)
        d = {0: np.zeros(s, np.int64)}
        for sign in (-1, 1):
            d[sign] = np.round(rel / 2 + sign * (n_ * rx / 2)
                               + n_ * 1e-6 / 2).astype(np.int64)
        return rel, d

    rel_y, dy_tab = axis_consts(h, s * h)
    rel_x, dx_tab = axis_consts(w, s * w)
    phases = [(a, b) for a in range(s) for b in range(s)]
    n_phase, n_shift = len(phases), len(shifts)
    dys = np.zeros((n_phase, n_shift), np.int32)
    dxs = np.zeros((n_phase, n_shift), np.int32)
    rely = np.zeros((n_phase, n_shift, h), np.float32)
    relx = np.zeros((n_phase, n_shift, w), np.float32)
    m_h, m_w = np.arange(h), np.arange(w)
    for p, (a, b) in enumerate(phases):
        for si, (vy, vx) in enumerate(shifts):
            dy = int(dy_tab[int(np.sign(vy))][a]) if vy else 0
            dx = int(dx_tab[int(np.sign(vx))][b]) if vx else 0
            dys[p, si], dxs[p, si] = dy, dx
            dye = np.clip(m_h + dy, 0, h - 1) - m_h
            dxe = np.clip(m_w + dx, 0, w - 1) - m_w
            rely[p, si] = rel_y[a] - 2.0 * dye
            relx[p, si] = rel_x[b] - 2.0 * dxe
    return dys, dxs, rely, relx


def _wt_kernel(*refs, rows, width, dk):
    """All nine hoisted k-out planes for one row block:
    wt(dy,dx) = (q ⊙ shift(u)) @ W_koutᵀ, ck(dy,dx) = (q ⊙ shift(u))·b.
    Reads the three column-variant u windows ONCE (static row slices —
    dy is a compile-time constant here) instead of materializing
    u9/q_rep/qk9 (~1.1 GB of HBM round-trips at 192²/DK=576).

    Measured negative (round 4, don't retry): concatenating the nine qk
    products into ONE (9N, DK)@(DK, 256+8) matmul is wall-neutral at
    both widths (RDN 22.52 → 22.28, SwinIR 35.44 → 35.34 ms full
    decode) — Mosaic already pipelines the per-plane matmuls; the 2.35
    ms this stage shows in isolation is DMA/grid latency, not per-op
    matmul overhead."""
    f_refs, wk_ref, bmat_ref, wt_ref, ck_ref = \
        refs[:3], refs[3], refs[4], refs[5], refs[6]
    n = rows * width
    wk = wk_ref[...]
    bmat = bmat_ref[...]
    cats = [f_refs[cx][0, 0].reshape((rows + 2) * width, -1)
            for cx in range(3)]
    q = cats[1][width:width + n]
    for dy in range(3):
        for cx in range(3):
            qk = cats[cx][dy * width:dy * width + n] * q
            wt_ref[3 * dy + cx] = _mm(qk, wk).astype(wt_ref.dtype).reshape(
                rows, width, -1)
            ck_ref[3 * dy + cx] = _mm(qk, bmat).reshape(rows, width, 8)


def _wt_hoist_planes(f3p, w_kout_t, b_kout, dk, o_u, h, w, bsz, h_last,
                     interpret):
    """Run _wt_kernel over (image, row-block); f3p is the row-padded
    column-variant merged map — only its u segment (lanes [o_u, o_u+dk),
    o_u a multiple of 128) is fetched, as one (rows+2)-row window per
    column variant (element-granularity row starts)."""
    from jax._src.pallas.core import Element

    dk_pad = a128(dk)
    # wide-DK inputs (SwinIR: dk_pad=1664) blow the 100 MB scoped-VMEM
    # budget at rows=8 (3 double-buffered (rows+2)-row windows + the f32
    # qk scratch scale with rows); halve the block height past 1024 lanes
    rmax = 8 if dk_pad <= 1024 else 4
    rows = max(r for r in range(1, rmax + 1) if h % r == 0)
    n_blocks = h // rows
    wk = jnp.pad(w_kout_t.astype(jnp.bfloat16), ((0, dk_pad - dk), (0, 0)))
    bmat = jnp.zeros((dk_pad, 8), jnp.bfloat16).at[:dk, 0].set(
        b_kout.astype(jnp.bfloat16))

    # Mosaic requires all-Element (or no-Element) block dims, so every
    # dim carries an element offset; only the row and lane starts are
    # non-block (the u segment is read at its 128-padded width — block
    # lane dims must be 128-divisible)
    in_specs = [pl.BlockSpec(
        (Element(1), Element(1), Element(rows + 2), Element(w),
         Element(dk_pad)),
        (lambda b, i, c=cx: (b, c, i * rows, 0, o_u)))
        for cx in range(3)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    wt9, ck9 = pl.pallas_call(
        functools.partial(_wt_kernel, rows=rows, width=w, dk=dk),
        grid=(bsz, n_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((9, rows, w, h_last), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((9, rows, w, 8), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * 9, h, w, h_last), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz * 9, h, w, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * 9 * h * w * dk * (h_last + 8),
            bytes_accessed=bsz * h * w * (3 * dk * 2
                                          + 9 * (h_last * 2 + 8 * 4)),
            transcendentals=0),
        interpret=interpret,
    )(*([f3p] * 3), wk, bmat)
    return wt9, ck9


def _decode_kernel_halo(sel_ref, main_refs, wt_refs, ck_refs, q_ref,
                        rely_ref, relx_ref, w_refs, out_ref, *, n_shift,
                        n_hidden, softmax_scale, rows, width, dk, dc,
                        hk_p, hv_p, hoist_kout, phase_inner=False,
                        tie_y=False, tie_x=False, variants=((0, 0),)):
    n = rows * width
    n_var = len(variants)
    weights = {k: r[...] for k, r in w_refs.items()}
    hk = weights["k_b0"].shape[-1]
    p_idx = pl.program_id(2) if phase_inner else pl.program_id(1)
    i_blk = pl.program_id(1) if phase_inner else pl.program_id(2)
    # segment order [g_k | g_v | CSA(pad) | u]: every slice START is a
    # multiple of 128 (hk_p/hv_p/dc_p are 128-aligned); the arbitrary-
    # width u tail needs no padding because nothing follows it
    o_gv = hk_p
    o_c = hk_p + hv_p
    o_u = o_c + (a128(dc) if dc else 0)

    # the (dy,dx)-shifted tiles arrive pre-assembled: the index maps pick
    # the column variant (sel col 0) and an element-granularity row start
    # i·rows + dy + 1 into the edge-row-padded map (sel col 1), so each
    # shift is exactly one rows-tall DMA — no stacked copies, no halo
    # overfetch
    tiles, h_ks, h_vs = [], [], []
    for sft in range(n_shift):
        tile = main_refs[sft][0, 0].reshape(n, -1)
        tiles.append(tile)

        pre_k = tile[:, :weights["k_b0"].shape[-1]].astype(jnp.float32)
        pre_v = tile[:, o_gv:o_gv
                     + weights["v_b0"].shape[-1]].astype(jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
        rel_y_map = jnp.zeros((rows, width), jnp.float32)
        for r in range(rows):
            ry = rely_ref[p_idx, sft, i_blk * rows + r]
            rel_y_map = jnp.where(row_ids == r, ry, rel_y_map)
        relx = relx_ref[0, sft, :]
        rel_x_map = jnp.broadcast_to(relx[None, :], (rows, width))
        rc_k = (rel_y_map[:, :, None] * weights["rel_w"][0, :hk]
                + rel_x_map[:, :, None] * weights["rel_w"][1, :hk]
                ).reshape(n, hk)
        rc_v = (rel_y_map[:, :, None] * weights["rel_w"][0, hk:]
                + rel_x_map[:, :, None] * weights["rel_w"][1, hk:]
                ).reshape(n, -1)
        h_ks.append(jnp.maximum(pre_k + rc_k + weights["k_b0"], 0.0))
        h_vs.append(jnp.maximum(pre_v + rc_v + weights["v_b0"], 0.0))

    hk_all = _mlp_hidden(jnp.concatenate(h_ks, axis=0), weights, "k",
                         n_hidden)                        # (S·N, 256) f32
    hv_all = _mlp_hidden(jnp.concatenate(h_vs, axis=0), weights, "v",
                         n_hidden).astype(jnp.bfloat16)
    wv_a_all = _mm(hv_all, weights["v_wouta"]) + weights["v_bouta"]
    if dc:
        wv_b_all = _mm(hv_all, weights["v_woutb"]) + weights["v_boutb"]
    if not hoist_kout:
        # wide-DK models (SwinIR): k-out layer runs in-kernel against the
        # unshifted query tile, exactly like the stacked non-hoist branch
        q = q_ref[0, 0].reshape(n, -1)[:, :dk].astype(jnp.float32)
        wk_all = _mm(hk_all.astype(jnp.bfloat16),
                     weights["k_wout"]) + weights["k_bout"]   # (S·N, DK)

    # tie-group blending masks (εy per row / εx per column, appended as
    # the n_shift-th rel row): variant weight = Π axis (ε or 1−ε) — the
    # masks are exact {0,1}, so the weighted sum IS the per-row/col
    # window selection
    if tie_y or tie_x:
        ones = jnp.ones((rows, width), jnp.float32)
        if tie_y:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
            my = jnp.zeros((rows, width), jnp.float32)
            for r in range(rows):
                ey = rely_ref[p_idx, n_shift, i_blk * rows + r]
                my = jnp.where(row_ids == r, ey, my)
        else:
            my = None
        mx = jnp.broadcast_to(relx_ref[0, n_shift, :][None, :],
                              (rows, width)) if tie_x else None
        var_w = []
        for vy, vx in variants:
            wgt = ones
            if tie_y:
                wgt = wgt * (my if vy else (1.0 - my))
            if tie_x:
                wgt = wgt * (mx if vx else (1.0 - mx))
            # keep (rows, width): Mosaic can't reshape a 2-D map to
            # (n, 1) (lane-dim change); blends broadcast [:, :, None]
            # then collapse 3D→2D like the rel maps
            var_w.append(wgt)

    logits, pred_as, pred_bs = [], [], []
    for sft in range(n_shift):
        sl = slice(sft * n, (sft + 1) * n)
        x_k = tiles[sft][:, o_u:o_u + dk].astype(jnp.float32)
        if hoist_kout:
            if n_var == 1:
                wt = wt_refs[sft][0].reshape(n, -1).astype(jnp.float32)
                ck = jnp.sum(ck_refs[sft][0].reshape(n, 8), axis=-1,
                             keepdims=True)
            else:
                wt3 = ck3 = 0.0
                for v in range(n_var):
                    wv = var_w[v][:, :, None]
                    wt3 = wt3 + wv * wt_refs[sft * n_var + v][0] \
                        .astype(jnp.float32)
                    ck3 = ck3 + wv * ck_refs[sft * n_var + v][0] \
                        .astype(jnp.float32)
                wt = wt3.reshape(n, -1)
                ck = jnp.sum(ck3.reshape(n, 8), axis=-1, keepdims=True)
            logits.append(jnp.sum(wt * hk_all[sl], axis=-1, keepdims=True)
                          + ck)
        else:
            logits.append(jnp.sum(q * x_k * wk_all[sl], axis=-1,
                                  keepdims=True))
        pred_as.append((x_k * wv_a_all[sl]).astype(jnp.bfloat16))
        if dc:
            x_c = tiles[sft][:, o_c:o_c + dc].astype(jnp.float32)
            pred_bs.append((x_c * wv_b_all[sl]).astype(jnp.bfloat16))

    # local-ensemble softmax over shifts (identical to the stacked path)
    lg = [l / softmax_scale for l in logits]
    mx = lg[0]
    for sft in range(1, n_shift):
        mx = jnp.maximum(mx, lg[sft])
    ex = [jnp.exp(l - mx) for l in lg]
    denom = ex[0]
    for sft in range(1, n_shift):
        denom = denom + ex[sft]
    attn = [e / denom for e in ex]
    outv_a = pred_as[0].astype(jnp.float32) * attn[0]
    for sft in range(1, n_shift):
        outv_a = outv_a + pred_as[sft].astype(jnp.float32) * attn[sft]

    pre_q = _mm(outv_a.astype(jnp.bfloat16), weights["q_w0a"])
    if dc:
        outv_b = pred_bs[0].astype(jnp.float32) * attn[0]
        for sft in range(1, n_shift):
            outv_b = outv_b + pred_bs[sft].astype(jnp.float32) * attn[sft]
        pre_q = pre_q + _mm(outv_b.astype(jnp.bfloat16), weights["q_w0b"])
    h_q = jnp.maximum(pre_q + weights["q_b0"], 0.0)
    rgb = _mlp_tail(h_q, weights, "q", n_hidden)
    out_ref[0] = rgb[:, :8].reshape(rows, width, 8)


# ---------------------------------------------------------------------------
# Rational-scale extension (round 4): residue-grouped halo fetches.
#
# For a rational scale p/q (lowest terms, q | H), HR phase a covers HR
# rows {a, a+p, ...}, which sample LR rows m_a + q·k for a constant base
# m_a ∈ [0, q) — a STRIDE-q row gather instead of the integer case's
# shift. Strided fetches are not expressible as Pallas block windows,
# but a stride-q slice IS a contiguous window of the residue-grouped
# map: reorder rows as q groups of H/q (group r holds LR rows r, r+q,
# ...), each padded with one edge-clamp row top and bottom, and the
# shifted strided fetch for base t = m_a + dy becomes group (t mod q) at
# element row start (1 + (t − group)/q) — exactly the integer halo's
# {0,1,2} row offsets, one group up or down at the residue wrap.
# Columns get the same treatment at BUILD time (sublane starts must be
# 8-aligned, so the kernel fetches whole kw-wide residue segments at
# sublane start r·kw): the three ±1 column-shift variants are baked in
# ORIGINAL column space by _build_f3p, then permuted residue-major, so
# variant (dxv, residue r) holds clamp(qx·j + r + dxv − 1) — any shifted
# strided column fetch. The hoisted wt/ck planes are phase-independent
# per-pixel products (w̃(dy,dx)[y,x] = (u[y,x]⊙u[clamp(y+dy),
# clamp(x+dx)])@W_kout), so they are built on the original layout and
# permuted residue-major too, fetched at the QUERY's strided positions.
#
# Float32 rounding at nearest-neighbor ties can break the affine form
# m_a + q·k at individual rows; _rational_tables verifies every index
# vector of the float32-emulating host tables (_grid_axis_tables)
# against the affine+clamp form and returns None on any deviation —
# callers then fall back to the XLA rational path. Reference semantics:
# arbitrary target sizes via per-query decoding
# (mmedited/models/restorers/ciaosr.py:240-243); the reference has no
# dense or fused path at any scale.
# ---------------------------------------------------------------------------


def _axis_decomp(n, tn, p, q, local_size):
    """Decompose one axis's host tables into affine strided-fetch form,
    PER PHASE.

    Returns (ok (p,) bool, mq (p,) int64 query bases, {sign: (ts (p,)
    int64 shifted bases, rel (p, n/q) float32 rel rows)}, tie (p,) bool,
    eps (p, n/q) float32) — phase a is ok when its query indices equal
    mq[a] + q·k and every sign's indices equal clip(ts + q·k, 0, n−1)
    with |ts − mq[a]| ≤ 1.

    Phases can FAIL the strict affine form: a scale whose HR pixel
    centers land exactly between two LR pixels (every even-q scale has
    one such phase, e.g. ×2.5 phase a=2) resolves the tie per-row from
    float32 rounding noise — an irregular ±1 pattern no single strided
    window can fetch. The shifted samples carry a +1e-6 tie-break
    epsilon (ciaosr_net.py:159-173) and STAY affine; only the query
    index jitters, as mq[a] + q·k + eps with eps ∈ {0,1} per row
    (verified here). Such phases get ``tie[a]=True`` with the per-row
    selection mask in ``eps[a]`` and mq[a] = the LOW base — the fused
    kernel fetches both query-base window variants and blends by the
    mask (round-5 quad-window tie fetches). Phases that fit neither
    form (none observed; defensive) stay not-ok, not-tie and decode via
    the XLA dense path."""
    from ciaosr_tpu.models.ciaosr import _grid_axis_tables

    tab = _grid_axis_tables(n, tn, p, local_size)
    nk = n // q
    base = q * np.arange(nk, dtype=np.int64)
    ok = np.ones(p, bool)
    tie = np.zeros(p, bool)
    eps = np.zeros((p, nk), np.float32)
    mq = np.zeros(p, np.int64)
    for a in range(p):
        iq = np.asarray(tab["q"][a])
        m0 = int(iq[0])
        if 0 <= m0 < q and np.array_equal(iq, m0 + base):
            mq[a] = m0
            continue
        ok[a] = False
        # tie candidate: query base jitters between m_lo and m_lo+1
        resid = iq - base
        m_lo = int(resid.min())
        e = resid - m_lo
        if 0 <= m_lo < q and np.isin(e, (0, 1)).all():
            tie[a] = True
            mq[a] = m_lo
            eps[a] = e.astype(np.float32)
    out = {}
    for sign, (idxs, rels) in ((k, v) for k, v in tab.items() if k != "q"):
        ts = np.zeros(p, np.int64)
        rel = np.zeros((p, nk), np.float32)
        for a in range(p):
            rel[a] = np.asarray(rels[a], np.float32)
            if not (ok[a] or tie[a]):
                continue
            # tie phases additionally need the shifted base within ±1 of
            # BOTH query-base variants, i.e. ts ∈ {m_lo, m_lo+1}
            cands = (mq[a], mq[a] + 1) if tie[a] else \
                (mq[a] - 1, mq[a], mq[a] + 1)
            for cand in cands:
                if np.array_equal(idxs[a],
                                  np.clip(cand + base, 0, n - 1)):
                    ts[a] = cand
                    break
            else:
                ok[a] = False
                tie[a] = False
        out[sign] = (ts, rel)
    return ok, mq, out, tie, eps


@functools.lru_cache(maxsize=64)
def _rational_tables(h, w, py, qy, px, qx, local_size, tie_sig=(0, 0)):
    """Per-(phase, shift) fetch descriptors for the residue-grouped halo
    decode at rational scale (py/qy, px/qx), restricted to the phases of
    one TIE SIGNATURE group — tie_sig=(ty, tx) selects phases whose
    y-axis (x-axis) query base is affine (0) or jittering-by-one (1, see
    _axis_decomp) — or None when the group is empty. ``phase_ids`` lists
    the group's phases; ``excluded`` (only meaningful on the (0,0) call)
    lists phases NO group can fuse. All entries host numpy.

    Tie groups additionally carry: per-phase query-window variant bases
    into the residue-grouped wt/ck maps — element rows ``wt_row_el``
    (n_e, 2) [A=low base, B=low+1] and element cols ``wt_col_el``
    (n_e, 2) — and the per-row/col selection masks ``epsy`` (n_e, kh) /
    ``epsx`` (n_e, kw). An x-axis base wrap (m_lo+1 == qx) cannot be
    fetched (sublane starts must be 8-aligned) and drops the phase to
    the XLA path; a y wrap is expressible (element-granularity row
    starts) and allowed."""
    from ciaosr_tpu.models.ciaosr import shift_offsets

    shifts = shift_offsets(local_size)
    oky, mqy, ytab, tiey, epsy_t = _axis_decomp(
        h, h * py // qy, py, qy, local_size)
    okx, mqx, xtab, tiex, epsx_t = _axis_decomp(
        w, w * px // qx, px, qx, local_size)
    kh, kw = h // qy, w // qx
    all_phases = [(a, b) for a in range(py) for b in range(px)]
    ty_sig, tx_sig = tie_sig

    def shift_ok(a, b):
        for vy, vx in shifts:
            ty = int(ytab[int(np.sign(vy))][0][a])
            tx = int(xtab[int(np.sign(vx))][0][b])
            if abs(ty - int(mqy[a])) > 1 or abs(tx - int(mqx[b])) > 1 \
                    or not (-1 <= tx <= qx):
                return False
        return True

    def y_fusable(a):
        return oky[a] or tiey[a]

    def x_fusable(b):
        # x-axis tie needs the high-base variant at an 8-aligned sublane
        # start: base m_lo+1 must stay within the residue groups (no wrap)
        return okx[b] or (tiex[b] and int(mqx[b]) + 1 < qx)

    group = [(a, b) for a, b in all_phases
             if y_fusable(a) and x_fusable(b) and shift_ok(a, b)
             and bool(tiey[a]) == bool(ty_sig)
             and bool(tiex[b]) == bool(tx_sig)]
    fusable = {(a, b) for a, b in all_phases
               if y_fusable(a) and x_fusable(b) and shift_ok(a, b)}
    excluded = [p for p in all_phases if p not in fusable]
    if not group:
        return None

    n_e, n_s = len(group), len(shifts)
    cv = np.zeros((n_e, n_s), np.int32)
    row_base = np.zeros((n_e, n_s), np.int32)
    wt_plane = np.zeros((n_e, n_s), np.int32)
    col_start = np.zeros((n_e, n_s), np.int32)
    rely = np.zeros((n_e, n_s, kh), np.float32)
    relx = np.zeros((n_e, n_s, kw), np.float32)
    ma = np.zeros(n_e, np.int32)
    mb = np.zeros(n_e, np.int32)
    wt_row_el = np.zeros((n_e, 2), np.int32)
    wt_col_el = np.zeros((n_e, 2), np.int32)
    epsy = np.zeros((n_e, kh), np.float32)
    epsx = np.zeros((n_e, kw), np.float32)
    for pidx, (a, b) in enumerate(group):
        ma[pidx], mb[pidx] = mqy[a], mqx[b]
        # query-window variant bases (element-granularity, residue-major
        # nopad layout: LR row m+qy·k lives in group m%qy, inner row
        # (m - m%qy)//qy + k)
        my, mx = int(mqy[a]), int(mqx[b])
        wt_row_el[pidx, 0] = (my % qy) * kh + my // qy
        yb = my + (1 if tiey[a] else 0)
        wt_row_el[pidx, 1] = (yb % qy) * kh + yb // qy
        # columns carry the RESIDUE only (inner offset is 0 — x wraps are
        # excluded); the index map multiplies by kw, a static multiple of
        # 8, so Mosaic can prove the sublane start aligned (a raw SMEM
        # scalar cannot be)
        wt_col_el[pidx, 0] = mx % qx
        xb = mx + (1 if tiex[b] else 0)
        wt_col_el[pidx, 1] = xb % qx
        epsy[pidx] = epsy_t[a]
        epsx[pidx] = epsx_t[b]
        for si, (vy, vx) in enumerate(shifts):
            tsy, ry = ytab[int(np.sign(vy))]
            tsx, rx = xtab[int(np.sign(vx))]
            ty, tx = int(tsy[a]), int(tsx[b])
            dy, dx = ty - int(mqy[a]), tx - int(mqx[b])
            g = ty % qy
            row_base[pidx, si] = g * (kh + 2) + 1 + (ty - g) // qy
            if 0 <= tx < qx:
                rxr, dxv = tx, 1
            elif tx == -1:
                rxr, dxv = 0, 0
            else:                        # tx == qx
                rxr, dxv = qx - 1, 2
            cv[pidx, si] = dxv
            col_start[pidx, si] = rxr    # column RESIDUE; index maps
            # multiply by kw (a static multiple of 8) so Mosaic can prove
            # the sublane start 8-aligned — a raw SMEM scalar cannot be
            # (plane index relative to the LOW query base; the high-base
            # variants are planeA-3 / planeA-1 / planeA-4, in-range
            # because tie-axis dy,dx ∈ {0,1} relative to the low base)
            wt_plane[pidx, si] = (dy + 1) * 3 + (dx + 1)
            rely[pidx, si] = ry[a]
            relx[pidx, si] = rx[b]
    return dict(cv=cv, row_base=row_base, wt_plane=wt_plane,
                col_start=col_start, rely=rely, relx=relx, ma=ma, mb=mb,
                wt_row_el=wt_row_el, wt_col_el=wt_col_el,
                epsy=epsy, epsx=epsx,
                phase_ids=tuple(group), excluded=tuple(excluded))


# tie-signature groups, in the fixed call/concatenation order
_TIE_SIGS = ((0, 0), (0, 1), (1, 0), (1, 1))


def rational_phase_split(h, w, py, qy, px, qx, local_size=2):
    """(eligible, excluded) phase-id partition for the hybrid rational
    decode — eligible phases ride the fused kernel (in the order the
    tie-signature group calls concatenate: affine, x-tie, y-tie, quad),
    excluded ones the XLA dense path. Round 5: tie phases fuse via
    query-window variant blending, so on typical geometries excluded is
    empty. Host-only, cached."""
    eligible: list = []
    excluded = None
    for sig in _TIE_SIGS:
        tabs = _rational_tables(h, w, py, qy, px, qx, local_size, sig)
        if tabs is not None:
            eligible += list(tabs["phase_ids"])
            excluded = tabs["excluded"]
    if excluded is None:
        all_p = tuple((a, b) for a in range(py) for b in range(px))
        return (), all_p
    return tuple(eligible), tuple(excluded)


def rational_halo_supported(h, w, py, qy, px, qx, local_size=2) -> bool:
    """True when grid_decode_fused_rational can fuse this geometry (host
    check — no tracing): constraints hold and at least a quarter of the
    phases are fused-eligible (any remainder decodes via the XLA dense
    path; since the round-5 tie-fetch extension the typical even-q
    geometry fuses ALL phases). Integer scales should use
    grid_decode_fused."""
    if qy == 1 and qx == 1:
        return False
    if h % qy or w % qx or py < qy or px < qx:
        return False
    kh, kw = h // qy, w // qx
    if w % 8 or kw % 8 or kh < 2:
        return False
    eligible, _ = rational_phase_split(h, w, py, qy, px, qx, local_size)
    return len(eligible) * 4 >= py * px


def grid_decode_fused_rational(u_map: jnp.ndarray | None,
                               csa_map: jnp.ndarray | None, params: dict,
                               py: int, qy: int, px: int, qx: int,
                               local_size: int, softmax_scale: float,
                               interpret: bool = False,
                               hoist_kout: bool = True,
                               phase_inner: bool | None = None,
                               feature: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """Fused dense decode at rational scale (py/qy, px/qx): the halo
    kernel over residue-grouped fetches (section comment above), for the
    fused-eligible phases — since round 5 that includes TIE phases
    (query-base jitter, _axis_decomp), fused via per-phase-group kernel
    calls with dual/quad query-window fetches blended by the per-row/col
    masks. Returns (B·n_eligible, H/qy, W/qx, 3) phase images,
    image-major, in rational_phase_split() order — phase (a,b) covers HR
    pixels [py·k + a, px·j + b]. Any excluded phases
    (rational_phase_split()[1], e.g. x-axis base wraps) must be decoded
    via the XLA dense path and composed by the caller
    (query_rgb_grid_rational_pallas). Gate with
    rational_halo_supported() first; raises ValueError on unsupported
    geometries.

    Feature input — exactly one of ``u_map`` (pre-materialized (B,H,W,9C)
    unfold) / ``feature`` ((B,H,W,C) raw encoder features, unfolded
    in-kernel); see grid_decode_fused."""
    from ciaosr_tpu.models.ciaosr import shift_offsets

    if (u_map is None) == (feature is None):
        raise ValueError("pass exactly one of u_map / feature")
    if feature is not None:
        bsz, h, w, cf = feature.shape
        dk = 9 * cf
    else:
        bsz, h, w, dk = u_map.shape
    if not rational_halo_supported(h, w, py, qy, px, qx, local_size):
        raise ValueError(
            f"rational halo decode unsupported for H={h} W={w} "
            f"scale=({py}/{qy}, {px}/{qx}) (need q|size, W%8==0, "
            f"(W/qx)%8==0, H/qy>=2, affine-expressible tables)")
    # tie groups need the k-out hoist (query-side data lives in the wt/ck
    # planes, which is where the variant windows are fetched); without it
    # only the affine group decodes — callers passing hoist_kout=False
    # (tests) must use tie-free geometries
    sigs = _TIE_SIGS if hoist_kout else ((0, 0),)
    n_hidden = len([k for k in params["imnet_k"] if k.startswith("layers")])
    th, tw = (h // qy) * py, (w // qx) * px
    cell = (float(np.float32(2.0) / np.float32(th)) * h,
            float(np.float32(2.0) / np.float32(tw)) * w)
    kh, kw = h // qy, w // qx
    shared: dict = {}   # f3p/wt9/ck9 built once, shared across groups
    outs = []
    n_total = 0
    for sig in sigs:
        tabs = _rational_tables(h, w, py, qy, px, qx, local_size, sig)
        if tabs is None:
            continue
        out = _grid_decode_halo(u_map, csa_map, params, None,
                                shift_offsets(local_size), n_hidden, cell,
                                softmax_scale, interpret, hoist_kout,
                                phase_inner=phase_inner,
                                rational=(py, qy, px, qx),
                                local_size=local_size, feature=feature,
                                tie_sig=sig, _shared=shared)
        n_i = len(tabs["phase_ids"])
        n_total += n_i
        outs.append(out.reshape(bsz, n_i, kh, kw, 3))
    if len(outs) == 1:
        return outs[0].reshape(bsz * n_total, kh, kw, 3)
    return jnp.concatenate(outs, axis=1).reshape(bsz * n_total, kh, kw, 3)


def _residue_rows_index(h, qy, kh):
    """Row-gather indices turning the (H+2)-row edge-padded map into qy
    residue groups of (kh+2) rows each (pad, r, r+qy, ..., pad)."""
    idx = []
    for g in range(qy):
        idx.append(0)
        idx.extend(1 + g + qy * k for k in range(kh))
        idx.append(h + 1)
    return np.asarray(idx, np.int64)


def _residue_cols(t, kw, qx, axis):
    """Permute an axis of length qx·kw to residue-major order."""
    if qx == 1:
        return t
    shape = t.shape
    split = shape[:axis] + (kw, qx) + shape[axis + 1:]
    perm = list(range(len(split)))
    perm[axis], perm[axis + 1] = axis + 1, axis
    return t.reshape(split).transpose(perm).reshape(shape)


def _residue_rows_nopad(t, kh, qy, axis):
    """Permute an axis of length qy·kh to residue-major (no pad rows)."""
    if qy == 1:
        return t
    shape = t.shape
    split = shape[:axis] + (kh, qy) + shape[axis + 1:]
    perm = list(range(len(split)))
    perm[axis], perm[axis + 1] = axis + 1, axis
    return t.reshape(split).transpose(perm).reshape(shape)


def _grid_decode_halo(u_map, csa_map, params, s, shifts, n_hidden,
                      cell_val, softmax_scale, interpret, hoist_kout,
                      phase_inner=None, rational=None, local_size=2,
                      feature=None, tie_sig=(0, 0), _shared=None):
    """grid_decode_fused with halo-fetched shift planes (see the section
    comment above): ~3× less glue HBM traffic than the stacked path —
    three column variants of one merged plane replace four 9-plane
    stacks, and _wt_hoist_planes replaces the u9/q_rep/qk9 chain (the
    non-hoisted wide-DK case instead adds one unshifted query window and
    runs the k-out layer in-kernel). With ``rational=(py,qy,px,qx)`` the
    same kernel decodes rational scales over residue-grouped fetches
    (rational section comment); the kernel body is identical — only the
    host tables, the map permutations, and the index maps change.

    ``tie_sig`` (rational only) selects one tie-signature phase group
    (see _rational_tables): tie axes fetch 2 (one axis) or 4 (both)
    query-window variants of the hoisted wt/ck planes per shift —
    element-granularity windows at the low/high query bases — and the
    kernel blends them by the per-row (εy) / per-column (εx) masks
    appended to rely/relx. ``_shared`` caches f3p/wt9/ck9 (post residue
    permute) across the per-group calls of one decode."""
    if feature is not None:
        bsz, h, w, cf = feature.shape
        dk = 9 * cf
    else:
        bsz, h, w, dk = u_map.shape
    dc = 0 if csa_map is None else csa_map.shape[-1]
    dv = dk + dc
    n_shift = len(shifts)
    if rational is not None:
        py, qy, px, qx = rational
        kh, kw = h // qy, w // qx
    else:
        qy = qx = 1
        kh, kw = h, w

    # merged map, fused build: first-layer feature matmuls + lane-pad +
    # segment concat [g_k | g_v | CSA | u] + 3 edge-clamped column
    # variants + the edge-clamp rows, all in one kernel pass (the XLA
    # construction materialized ~4 copies of the ~190 MB map); row r+1
    # of f3p holds image row r, rows 0 / H+1 are the baked edge clamp —
    # so a window at element row start i·rows + (dy+1) IS the
    # (dy,dx)-shifted block. Every segment slice start is lane-aligned
    # and every in-kernel slice reads its TRUE width (no weight padding
    # anywhere); the u segment is zero-padded to 128 lanes only because
    # Mosaic block lane dims must be 128-divisible
    wk0 = params["imnet_k"]["layers_0"]["kernel"][:dk]
    wv0 = params["imnet_v"]["layers_0"]["kernel"][:dv]
    hidden_k, hidden_v = wk0.shape[-1], wv0.shape[-1]
    hk_p, hv_p = a128(hidden_k), a128(hidden_v)
    dc_p = a128(dc) if dc else 0
    o_u = hk_p + hv_p + dc_p
    lanes = o_u + a128(dk)
    if _shared and "f3p" in _shared:
        f3p = _shared["f3p"]
        if hoist_kout:
            wt9, ck9 = _shared["wt9"], _shared["ck9"]
            h_last = wt9.shape[-1]
    else:
        f3p = _build_f3p(u_map, csa_map, wk0, wv0[:dk],
                         wv0[dk:] if dc else None, interpret,
                         feature=feature)

        if hoist_kout:
            w_kout_t = params["imnet_k"]["out"]["kernel"].T
            b_kout = params["imnet_k"]["out"]["bias"]
            h_last = w_kout_t.shape[-1]
            wt9, ck9 = _wt_hoist_planes(f3p, w_kout_t, b_kout, dk, o_u,
                                        h, w, bsz, h_last, interpret)

        if rational is not None:
            # residue-major permutations (rational section comment): f3p
            # rows regroup into qy edge-padded groups of kh, columns into
            # qx groups of kw; wt/ck planes (built on the original layout
            # — their (dy,dx) products need ORIGINAL adjacency) permute
            # the same way without pads (query fetches never clamp)
            ridx = _residue_rows_index(h, qy, kh)
            f3p = jnp.take(f3p, jnp.asarray(ridx), axis=2)
            f3p = _residue_cols(f3p, kw, qx, axis=3)
            if hoist_kout:
                wt9 = _residue_cols(_residue_rows_nopad(wt9, kh, qy, 1),
                                    kw, qx, 2)
                ck9 = _residue_cols(_residue_rows_nopad(ck9, kh, qy, 1),
                                    kw, qx, 2)
        if _shared is not None:
            _shared["f3p"] = f3p
            if hoist_kout:
                _shared["wt9"], _shared["ck9"] = wt9, ck9

    tie_y, tie_x = (bool(tie_sig[0]), bool(tie_sig[1])) \
        if rational is not None else (False, False)
    if rational is not None:
        tabs = _rational_tables(h, w, py, qy, px, qx, local_size,
                                tuple(tie_sig))
        cvs, row_base = tabs["cv"], tabs["row_base"]
        wt_plane, col_start = tabs["wt_plane"], tabs["col_start"]
        rely, relx = tabs["rely"], tabs["relx"]
        ma, mb = tabs["ma"], tabs["mb"]
        wt_row_el, wt_col_el = tabs["wt_row_el"], tabs["wt_col_el"]
        epsy, epsx = tabs["epsy"], tabs["epsx"]
        n_phase = cvs.shape[0]
        if tie_y or tie_x:
            # masks ride as an extra (n_shift-th) row of rely/relx
            rely = np.concatenate([rely, epsy[:, None, :]], axis=1)
            relx = np.concatenate([relx, epsx[:, None, :]], axis=1)
    else:
        dys, dxs, rely, relx = _phase_tables(s, h, w, shifts)
        n_phase = dys.shape[0]
        cvs = (dxs + 1).astype(np.int32)
        row_base = (dys + 1).astype(np.int32)
        wt_plane = ((dys + 1) * 3 + (dxs + 1)).astype(np.int32)
        col_start = np.zeros_like(cvs)
        ma = np.zeros(n_phase, np.int32)
        mb = np.zeros(n_phase, np.int32)

    # single-DMA shifts remove the stacked path's small-block pressure;
    # taller blocks win here (22.4 vs 22.7 ms at 192² — fewer grid steps,
    # same exact reads), so the caller's stacked-path `rows` tuning is
    # ignored. The round-2 "wide-DK needs rows=2" gate (53.0 → 46.0 ms)
    # predates the unconditional hoist: without the a128(DK)-lane query
    # window (lanes 2944 → 2432) the sweep moves — rmax 2/3/4/6 →
    # 35.34/39.32/34.66/39.26 ms at SwinIR 192² — so wide-DK now takes
    # rows=4 (rows=3/6 lose to grid-divisibility effects).
    # _HALO_RMAX_OVERRIDE is the sweep hook (see /tmp-style drives).
    rmax = _HALO_RMAX_OVERRIDE or (8 if lanes <= 1536 else 4)
    rows = max(r for r in range(1, min(rmax, kh) + 1) if kh % r == 0)
    n_blocks = kh // rows

    # sel columns: [0 column variant, 1 row base (group·(kh+2) + offset;
    # integer: dy+1), 2 wt plane index, 3 output phase row, 4 column
    # residue (sublane start = residue·kw; integer 0), 5 query row base,
    # 6 query column residue, 7 wt row-block base, 8 wt column block,
    # 9/10 tie wt element-row base A/B, 11/12 tie wt element-col A/B]
    if rational is not None:
        # element-granularity wt/ck window bases — used by ALL rational
        # groups (col 9+vy / 11+vx; non-tie groups read only A)
        tie_cols = np.concatenate([wt_row_el, wt_col_el], axis=-1)
    else:
        tie_cols = np.zeros((n_phase, 4), np.int32)
    sel = np.concatenate([
        np.stack([cvs, row_base, wt_plane,
                  np.broadcast_to(np.arange(n_phase)[:, None], cvs.shape),
                  col_start], axis=-1),
        np.broadcast_to(
            np.stack([ma * (kh + 2) + 1, mb, ma * kh // rows, mb],
                     axis=-1)[:, None, :], cvs.shape + (4,)),
        np.broadcast_to(tie_cols[:, None, :], cvs.shape + (4,)),
    ], axis=-1).astype(np.int32)

    if phase_inner is None:
        phase_inner = lanes > 1536
    if phase_inner:
        # phase-INNER grid: consecutive phases at a fixed row block hit
        # the same fetch windows most of the time, and the Mosaic
        # pipeline elides the copy when a block's index-map output is
        # unchanged from the previous step. Order phases so each shift's
        # (row base, column variant/start) is piecewise-constant (the
        # row base depends only on the y-phase, the column terms only on
        # the x-phase → lex sort groups both); the true output row rides
        # in sel col 3. Wins only where the kernel is read-bound
        # (wide-DK models — the DK-lane u segment dominates)
        order = sorted(range(n_phase), key=lambda p: (
            tuple(row_base[p]), tuple(cvs[p]), tuple(col_start[p])))
        sel = sel[order]
        rely = rely[order]
        relx = relx[order]

    weights = {}
    weights.update(_pack_weights(params["imnet_k"], "k", dk, cell_val,
                                 n_hidden, with_out=not hoist_kout))
    weights.update(_pack_weights(params["imnet_v"], "v", dv, cell_val,
                                 n_hidden))
    weights.update(_pack_weights(params["imnet_q"], "q", dv, cell_val,
                                 n_hidden, with_rc=False, pad_out=True))

    # joint rel rows + v-out / q-first splits: identical to the stacked
    # path (unpadded — the in-kernel slices read true widths at
    # lane-aligned starts)
    rel_w = jnp.zeros((2, weights["k_b0"].shape[-1]
                       + weights["v_b0"].shape[-1]), jnp.float32)
    rel_w = rel_w.at[0].set(jnp.concatenate([weights.pop("k_wrely"),
                                             weights.pop("v_wrely")]))
    rel_w = rel_w.at[1].set(jnp.concatenate([weights.pop("k_wrelx"),
                                             weights.pop("v_wrelx")]))
    weights["rel_w"] = rel_w
    v_wout = weights.pop("v_wout")
    v_bout = weights.pop("v_bout")
    weights["v_wouta"], weights["v_bouta"] = v_wout[:, :dk], v_bout[:dk]
    q_w0 = weights.pop("q_w0")
    weights["q_w0a"] = q_w0[:dk]
    if dc:
        weights["v_woutb"], weights["v_boutb"] = v_wout[:, dk:], v_bout[dk:]
        weights["q_w0b"] = q_w0[dk:]
    w_names = sorted(weights)

    from jax._src.pallas.core import Element

    def pmap_(f):
        # index maps are written over normalized (b, p, i); the
        # phase-inner grid permutes the call order to (b, i, p)
        if phase_inner:
            return lambda b, i, p, sref: f(b, p, i, sref)
        return f

    # column sublane starts: literal 0 on the integer path; residue·kw on
    # the rational path — the multiplication by kw (a static multiple of
    # 8) happens IN the index map so Mosaic can prove the start 8-aligned
    # (a raw SMEM scalar fails the tiling-divisibility check)
    def main_spec(si):
        # all-Element block dims (Mosaic constraint); the row start is a
        # true element offset
        return pl.BlockSpec((Element(1), Element(1), Element(rows),
                             Element(kw), Element(lanes)),
                            pmap_(lambda b, p, i, sref, s_=si:
                                  (b, sref[p, s_, 0],
                                   i * rows + sref[p, s_, 1],
                                   0 if qx == 1 else sref[p, s_, 4] * kw,
                                   0)))

    # the unshifted query window (non-hoist only): column variant 1 at
    # the query's row/column base — the identity shift of the u segment
    q_spec = pl.BlockSpec((Element(1), Element(1), Element(rows),
                           Element(kw), Element(a128(dk))),
                          pmap_(lambda b, p, i, sref:
                                (b, 1, i * rows + sref[p, 0, 5],
                                 0 if qx == 1 else sref[p, 0, 6] * kw,
                                 o_u)))
    # wt/ck query-window specs. Tie groups fetch the variant windows at
    # element granularity (the high base's inner offset is not a multiple
    # of `rows` at a y wrap); the plane index of a variant is a STATIC
    # decrement of the low-base plane (εy: dy−1 → −3, εx: dx−1 → −1).
    variants = [(vy, vx) for vy in range(1 + int(tie_y))
                for vx in range(1 + int(tie_x))]
    n_var = len(variants)

    def wt_spec(si, vy, vx, lanes_):
        if n_var == 1 and rational is None:
            # integer path: block-unit spec (proven round-4 form)
            return pl.BlockSpec(
                (1, rows, kw, lanes_),
                pmap_(lambda b, p, i, sref, s_=si:
                      (b * 9 + sref[p, s_, 2],
                       sref[p, 0, 7] + i, sref[p, 0, 8], 0)))
        return pl.BlockSpec(
            (Element(1), Element(rows), Element(kw), Element(lanes_)),
            pmap_(lambda b, p, i, sref, s_=si, vy_=vy, vx_=vx:
                  (b * 9 + sref[p, s_, 2] - 3 * vy_ - vx_,
                   sref[p, 0, 9 + vy_] + i * rows,
                   sref[p, 0, 11 + vx_] * kw, 0)))

    rel_rows = n_shift + (1 if (tie_y or tie_x) else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((bsz, n_blocks, n_phase) if phase_inner
              else (bsz, n_phase, n_blocks)),
        in_specs=[
            *[main_spec(si) for si in range(n_shift)],
            *([wt_spec(si, vy, vx, h_last)
               for si in range(n_shift) for vy, vx in variants]
              + [wt_spec(si, vy, vx, 8)
                 for si in range(n_shift) for vy, vx in variants]
              if hoist_kout else [q_spec]),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rely (P,S(+1),kh)
            pl.BlockSpec((1, rel_rows, kw),
                         pmap_(lambda b, p, i, sref: (p, 0, 0))),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_names],
        ],
        out_specs=pl.BlockSpec(
            (1, rows, kw, 8),
            pmap_(lambda b, p, i, sref:
                  (b * n_phase + sref[p, 0, 3], i, 0, 0))),
    )

    def kernel(sel_ref, *refs):
        main_refs = refs[:n_shift]
        pos = n_shift
        if hoist_kout:
            wt_refs = refs[pos:pos + n_shift * n_var]
            ck_refs = refs[pos + n_shift * n_var:pos + 2 * n_shift * n_var]
            q_ref = None
            pos += 2 * n_shift * n_var
        else:
            wt_refs = ck_refs = None
            q_ref = refs[pos]
            pos += 1
        rest = refs[pos:]
        rely_ref, relx_ref = rest[0], rest[1]
        w_refs = dict(zip(w_names, rest[2:2 + len(w_names)]))
        out_ref = refs[-1]
        _decode_kernel_halo(sel_ref, main_refs, wt_refs, ck_refs, q_ref,
                            rely_ref, relx_ref, w_refs, out_ref,
                            n_shift=n_shift, n_hidden=n_hidden,
                            softmax_scale=softmax_scale, rows=rows,
                            width=kw, dk=dk, dc=dc, hk_p=hk_p, hv_p=hv_p,
                            hoist_kout=hoist_kout, phase_inner=phase_inner,
                            tie_y=tie_y, tie_x=tie_x, variants=variants)

    mlp_flops = ((n_hidden - 1) * 256 * 256
                 + (0 if hoist_kout else 256 * dk)
                 + (n_hidden - 1) * 256 * 256 + 256 * (dk + dc))
    halo_lanes = lanes + ((h_last + 8) if hoist_kout else a128(dk))
    cost = pl.CostEstimate(
        flops=2 * bsz * n_phase * kh * kw * (n_shift * mlp_flops
                                             + (dk + dc) * 256
                                             + (n_hidden - 1) * 65536),
        bytes_accessed=bsz * n_phase * kh * kw * halo_lanes * n_shift * 2,
        transcendentals=bsz * n_phase * kh * kw * n_shift)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * n_phase, kh, kw, 8),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(sel),
      *([f3p] * n_shift),
      *([wt9] * (n_shift * n_var) + [ck9] * (n_shift * n_var)
        if hoist_kout else [f3p]),
      jnp.asarray(rely), jnp.asarray(relx),
      *[weights[k] for k in w_names])
    return out[..., :3]
