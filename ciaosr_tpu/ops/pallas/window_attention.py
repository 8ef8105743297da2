"""Fused SwinIR window-attention kernel (Pallas/Mosaic, TPU). Eval-only.

Behavioral spec: WindowAttention at
/root/reference/mmedited/models/backbones/sr_backbones/swinir_net.py:66-162
(qkv projection → per-head scaled dot-product over ws² tokens with relative
position bias and the shifted-window mask → output projection).

Why a kernel: the XLA path materializes, per transformer block, the qkv
head-split transpose (~40 MB), the f32 attention logits (~28 MB) across
bias-add/mask-add/softmax passes, and the output transpose — the SwinIR-180
trunk is ~10% MXU-utilized and entirely HBM-bound. This kernel runs
qkv → per-head attention → proj for a block of windows in one VMEM
residency; per layer the only HBM traffic is the token block in and out.

Head handling: head_dim = C/heads (30 for SwinIR-180) is far below the
128-lane MXU tile, so per-head slicing would relayout constantly. Instead
each head's logits are computed as (q ⊙ head_mask_h) @ k^T over the FULL
C lanes — the zeroed lanes contribute nothing — and the value blend is
(attn_h @ v) ⊙ head_mask_h, accumulated over heads. This wastes
C/head_dim× MXU work on matmuls that are a tiny fraction of the layer's
FLOPs, and in exchange every operand stays lane-aligned.

The shifted-window mask takes ≤9 distinct patterns (corner/edge/interior
window kinds); they are deduplicated at trace time and selected per window
via scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a @ b^T (contract last dims), f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_kernel(kinds_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                 wv_ref, bv_ref, wp_ref, bp_ref, bias_ref, mask_ref,
                 hm_ref, out_ref, *, wb, n, c, heads, scale, masked):
    x = x_ref[...].reshape(wb * n, c).astype(jnp.bfloat16)
    q = _mm(x, wq_ref[...]) * scale + bq_ref[...]     # (WB·N, C) f32
    k = _mm(x, wk_ref[...]) + bk_ref[...]
    v = _mm(x, wv_ref[...]) + bv_ref[...]

    g = pl.program_id(0)
    outs = []
    for w in range(wb):
        qw = q[w * n:(w + 1) * n]
        kw = k[w * n:(w + 1) * n].astype(jnp.bfloat16)
        vw = v[w * n:(w + 1) * n].astype(jnp.bfloat16)
        acc = jnp.zeros((n, c), jnp.float32)
        for h in range(heads):
            hm = hm_ref[h, :]                          # (C,) {0,1}
            qh = (qw * hm).astype(jnp.bfloat16)
            logits = _mm_t(qh, kw) + bias_ref[h]       # (N, N) f32
            if masked:
                kind = kinds_ref[g * wb + w]
                logits = logits + mask_ref[kind]
            a = jax.nn.softmax(logits, axis=-1)
            acc = acc + _mm(a.astype(jnp.bfloat16), vw) * hm
        outs.append(acc)
    out = jnp.concatenate(outs, axis=0)                # (WB·N, C) f32
    y = _mm(out.astype(jnp.bfloat16), wp_ref[...]) + bp_ref[...]
    out_ref[...] = y.reshape(wb, n, c)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _window_attention_call(xw, wq, bq, wk, bk, wv, bv, wp, bp, bias,
                           mask_kinds, kinds, head_mask, *, heads,
                           scale, interpret):
    bw, n, c = xw.shape
    wb = 1
    for cand in (16, 8, 4, 2):
        if bw % cand == 0:
            wb = cand
            break
    masked = mask_kinds is not None
    if not masked:
        mask_kinds = jnp.zeros((1, n, n), jnp.float32)
        kinds = jnp.zeros((bw,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bw // wb,),
        in_specs=[
            pl.BlockSpec((wb, n, c), lambda g, kref: (g, 0, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)],
        ],
        out_specs=pl.BlockSpec((wb, n, c), lambda g, kref: (g, 0, 0)),
    )
    kernel = functools.partial(_attn_kernel, wb=wb, n=n, c=c, heads=heads,
                               scale=scale, masked=masked)
    flops_mm = 2 * bw * n * c * (3 * c + c)            # qkv + proj
    flops_attn = 2 * bw * heads * n * n * c * 2
    cost = pl.CostEstimate(
        flops=flops_mm + flops_attn,
        bytes_accessed=2 * bw * n * c * 2,
        transcendentals=bw * heads * n * n)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bw, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=cost,
        interpret=interpret,
    )(kinds, xw.astype(jnp.bfloat16),
      wq.astype(jnp.bfloat16), bq.astype(jnp.float32),
      wk.astype(jnp.bfloat16), bk.astype(jnp.float32),
      wv.astype(jnp.bfloat16), bv.astype(jnp.float32),
      wp.astype(jnp.bfloat16), bp.astype(jnp.float32),
      bias.astype(jnp.float32), mask_kinds, head_mask)


def window_attention_fused(xw: jnp.ndarray, qkv_kernel: jnp.ndarray,
                           qkv_bias: jnp.ndarray | None,
                           proj_kernel: jnp.ndarray, proj_bias: jnp.ndarray,
                           bias: jnp.ndarray, mask: np.ndarray | None,
                           heads: int, interpret: bool = False
                           ) -> jnp.ndarray:
    """Fused window attention (forward only — eval paths).

    xw: (BW, N, C) window tokens; qkv_kernel: (C, 3C); qkv_bias: (3C,) or
    None; proj_kernel: (C, C); proj_bias: (C,); bias: (heads, N, N)
    relative-position bias; mask: (nW, N, N) numpy shift mask or None
    (trace-time constant — deduplicated to its distinct window kinds).
    Returns (BW, N, C) float32.
    """
    bw, n, c = xw.shape
    head_dim = c // heads
    scale = float(head_dim) ** -0.5

    wq, wk, wv = (qkv_kernel[:, :c], qkv_kernel[:, c:2 * c],
                  qkv_kernel[:, 2 * c:])
    if qkv_bias is None:
        bq = bk = bv = jnp.zeros((c,), jnp.float32)
    else:
        bq, bk, bv = qkv_bias[:c], qkv_bias[c:2 * c], qkv_bias[2 * c:]
    # q is pre-scaled (swinir_net.py:129), so its bias scales too
    bq = bq * scale

    hm = np.zeros((heads, c), np.float32)
    for h in range(heads):
        hm[h, h * head_dim:(h + 1) * head_dim] = 1.0

    if mask is not None:
        kinds_u, inverse = np.unique(np.asarray(mask), axis=0,
                                     return_inverse=True)
        nw = mask.shape[0]
        kinds = np.tile(inverse.astype(np.int32), bw // nw)
        mask_kinds = jnp.asarray(kinds_u, jnp.float32)
        kinds = jnp.asarray(kinds)
    else:
        mask_kinds = None
        kinds = None

    return _window_attention_call(
        xw, wq, bq, wk, bk, wv, bv, proj_kernel, proj_bias, bias,
        mask_kinds, kinds, jnp.asarray(hm), heads=heads, scale=scale,
        interpret=interpret)
