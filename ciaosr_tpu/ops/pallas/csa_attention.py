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
