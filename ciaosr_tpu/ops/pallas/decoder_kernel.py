"""Fused CiaoSR grid-decoder kernel (Pallas/Mosaic, TPU).

Fuses, per (image, phase, row-block) grid instance, the entire per-pixel decoder
of query_rgb_grid (models/ciaosr.py): for all S local-ensemble shifts the
imnet_k / imnet_v modulation MLPs (ciaosr_net.py:195-206), the key-query
logits, the softmax local ensemble (:211-215), the value blend, and the
imnet_q head (:220-222) — one HBM read of the shifted feature planes, one
HBM write of RGB. All MLP weights live in VMEM for the whole kernel; the
XLA fallback path writes ~6 (N,576..640) intermediates to HBM per shift.

Shift-plane selection: the 9 edge-clamped shifted copies of the (un)folded
feature maps are stacked outside; each of the S shift inputs is the SAME
stacked array passed with an index_map that picks plane sel[p, s] via
scalar prefetch — no gathers, no halo DMA.

First-layer decomposition: Dense([K, rel, cell]) = K @ W_main
+ rely ⊗ w_rel_y + relx ⊗ w_rel_x + b_eff, where b_eff folds the
(constant) cell terms; rely/relx carry the per-phase rel constants and
their border-clamp corrections.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mlp_tail(h, weights, prefix, n_hidden):
    """hidden layers 2..n + out layer; h is (N,256) f32 (post first relu)."""
    for i in range(1, n_hidden):
        h = jnp.maximum(_mm(h.astype(jnp.bfloat16), weights[f"{prefix}_w{i}"])
                        + weights[f"{prefix}_b{i}"], 0.0)
    return _mm(h.astype(jnp.bfloat16), weights[f"{prefix}_wout"]) \
        + weights[f"{prefix}_bout"]


def _decode_kernel(sel_ref, u_refs, v_refs, q_ref, rely_ref, relx_ref,
                   w_refs, out_ref, *, n_shift, n_hidden, softmax_scale,
                   rows, width, dk, dv):
    n = rows * width
    weights = {k: r[...] for k, r in w_refs.items()}

    q = q_ref[0].reshape(n, dk).astype(jnp.bfloat16)

    logits = []
    pred_vs = []
    for s in range(n_shift):
        x_k = u_refs[s][0].reshape(n, dk).astype(jnp.bfloat16)
        x_v = v_refs[s][0].reshape(n, dv).astype(jnp.bfloat16)

        # first layers with decomposed rel terms. rely lives in SMEM
        # (scalar reads per image row); relx is a full VMEM lane row.
        p_idx = pl.program_id(1)
        i_blk = pl.program_id(2)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
        rel_y_map = jnp.zeros((rows, width), jnp.float32)
        for r in range(rows):
            ry = rely_ref[p_idx, s, i_blk * rows + r]
            rel_y_map = jnp.where(row_ids == r, ry, rel_y_map)
        relx = relx_ref[0, s, :]                           # (width,)
        rel_x_map = jnp.broadcast_to(relx[None, :], (rows, width))
        rc_k = (rel_y_map[:, :, None] * weights["k_wrely"][None, None, :]
                + rel_x_map[:, :, None] * weights["k_wrelx"][None, None, :]
                ).reshape(n, -1)
        rc_v = (rel_y_map[:, :, None] * weights["v_wrely"][None, None, :]
                + rel_x_map[:, :, None] * weights["v_wrelx"][None, None, :]
                ).reshape(n, -1)
        h_k = jnp.maximum(
            _mm(x_k, weights["k_w0"]) + rc_k + weights["k_b0"], 0.0)
        h_v = jnp.maximum(
            _mm(x_v, weights["v_w0"]) + rc_v + weights["v_b0"], 0.0)

        wk = _mlp_tail(h_k, weights, "k", n_hidden)      # (N, DK) f32
        wv = _mlp_tail(h_v, weights, "v", n_hidden)      # (N, DV) f32

        pred_k = x_k.astype(jnp.float32) * wk
        logits.append(jnp.sum(q.astype(jnp.float32) * pred_k, axis=-1,
                              keepdims=True))
        # bf16 storage (VMEM budget); the blend below accumulates in f32
        pred_vs.append((x_v.astype(jnp.float32) * wv).astype(jnp.bfloat16))

    # local-ensemble softmax over shifts: manual on (N,1) columns
    lg = [l / softmax_scale for l in logits]
    mx = lg[0]
    for s in range(1, n_shift):
        mx = jnp.maximum(mx, lg[s])
    ex = [jnp.exp(l - mx) for l in lg]
    denom = ex[0]
    for s in range(1, n_shift):
        denom = denom + ex[s]
    outv = pred_vs[0].astype(jnp.float32) * (ex[0] / denom)
    for s in range(1, n_shift):
        outv = outv + pred_vs[s].astype(jnp.float32) * (ex[s] / denom)

    h_q = jnp.maximum(
        _mm(outv.astype(jnp.bfloat16), weights["q_w0"]) + weights["q_b0"],
        0.0)
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
                  with_rc=True, pad_out=False):
    out = {}
    if with_rc:
        w0, wry, wrx, wcy, wcx, b0 = _split_first_layer(mlp_params, main_dim)
        out[f"{prefix}_w0"] = w0
        out[f"{prefix}_wrely"] = wry
        out[f"{prefix}_wrelx"] = wrx
        out[f"{prefix}_b0"] = b0 + cell_val * (wcy + wcx)
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
    wout = mlp_params["out"]["kernel"].astype(jnp.bfloat16)
    bout = mlp_params["out"]["bias"].astype(jnp.float32)
    if pad_out and wout.shape[-1] % 128:
        pad = 128 - wout.shape[-1] % 128
        wout = jnp.pad(wout, ((0, 0), (0, pad)))
        bout = jnp.pad(bout, (0, pad))
    out[f"{prefix}_wout"] = wout
    out[f"{prefix}_bout"] = bout
    return out


def grid_decode_fused(u_map: jnp.ndarray, v_map: jnp.ndarray,
                      params: dict, scale: int, local_size: int,
                      softmax_scale: float, rows: int = 4,
                      interpret: bool = False) -> jnp.ndarray:
    """Run the fused decoder over all phases.

    u_map: (B,H,W,DK) unfolded features (bf16 ok); v_map: (B,H,W,DV);
    params: generator params dict with imnet_k/v/q subtrees.
    Returns (B·s², H, W, 3) float32 phase images (pre-residual), image-major
    (image b's phase p at index b·s² + p).
    """
    from ciaosr_tpu.models.ciaosr import shift_offsets

    s = int(scale)
    bsz, h, w, dk = u_map.shape
    dv = v_map.shape[-1]
    shifts = shift_offsets(local_size)
    n_shift = len(shifts)
    n_hidden = len([k for k in params["imnet_k"] if k.startswith("layers")])
    cell_val = 2.0 / s

    u9 = _shift_planes(u_map.astype(jnp.bfloat16))
    v9 = _shift_planes(v_map.astype(jnp.bfloat16))
    query = u_map.astype(jnp.bfloat16)

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
                                 n_hidden))
    weights.update(_pack_weights(params["imnet_v"], "v", dv, cell_val,
                                 n_hidden))
    weights.update(_pack_weights(params["imnet_q"], "q", dv, cell_val,
                                 n_hidden, with_rc=False, pad_out=True))
    w_names = sorted(weights)

    rows = min(rows, h)
    while h % rows:
        rows -= 1
    n_blocks = h // rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_phase, n_blocks),
        in_specs=[
            *[pl.BlockSpec((1, rows, w, dk),
                           (lambda b, p, i, sref, s_=si:
                            (b * 9 + sref[p, s_], i, 0, 0)))
              for si in range(n_shift)],
            *[pl.BlockSpec((1, rows, w, dv),
                           (lambda b, p, i, sref, s_=si:
                            (b * 9 + sref[p, s_], i, 0, 0)))
              for si in range(n_shift)],
            pl.BlockSpec((1, rows, w, dk), lambda b, p, i, sref: (b, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rely (P,S,H)
            pl.BlockSpec((1, n_shift, w), lambda b, p, i, sref: (p, 0, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_names],
        ],
        out_specs=pl.BlockSpec((1, rows, w, 8),
                               lambda b, p, i, sref: (b * n_phase + p, i,
                                                      0, 0)),
    )

    def kernel(sel_ref, *refs):
        u_refs = refs[:n_shift]
        v_refs = refs[n_shift:2 * n_shift]
        q_ref = refs[2 * n_shift]
        rely_ref = refs[2 * n_shift + 1]
        relx_ref = refs[2 * n_shift + 2]
        w_refs = dict(zip(w_names, refs[2 * n_shift + 3:
                                        2 * n_shift + 3 + len(w_names)]))
        out_ref = refs[-1]
        _decode_kernel(sel_ref, u_refs, v_refs, q_ref, rely_ref, relx_ref,
                       w_refs, out_ref, n_shift=n_shift, n_hidden=n_hidden,
                       softmax_scale=softmax_scale, rows=rows, width=w,
                       dk=dk, dv=dv)

    mlp_flops = (dk * 256 + (n_hidden - 1) * 256 * 256 + 256 * dk
                 + dv * 256 + (n_hidden - 1) * 256 * 256 + 256 * dv)
    cost = pl.CostEstimate(
        flops=2 * bsz * n_phase * h * w * (n_shift * mlp_flops
                                           + dv * 256
                                           + (n_hidden - 1) * 65536),
        bytes_accessed=bsz * n_phase * h * w * (dk + dv) * 2 * (n_shift + 1),
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
    )(jnp.asarray(sel), *([u9] * n_shift), *([v9] * n_shift), query,
      jnp.asarray(rely), jnp.asarray(relx),
      *[weights[k] for k in w_names])
    return out[..., :3]
