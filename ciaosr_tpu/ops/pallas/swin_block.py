"""Fully fused Swin transformer block (Pallas/Mosaic, TPU). Eval-only.

Behavioral spec: SwinTransformerBlock at
/root/reference/mmedited/models/backbones/sr_backbones/swinir_net.py:165-298
(LN → shifted-window attention w/ relative-position bias + shift mask →
residual → LN → 2-layer GELU MLP → residual; drop-path is identity at the
shipped drop_path_rate for eval).

Why: the XLA path round-trips every intermediate — LN stats, the window
partition/reverse transposes, qkv, logits, proj, both MLP matmuls — through
HBM, ~10+ (B·HW·C)-sized tensors per block × 36 blocks; the SwinIR-180
trunk spends ~80% of its time on that traffic. This kernel holds one
window-row (ws, W, C) in VMEM and runs the whole block on it; per block
the only HBM traffic is tokens in and out, plus the resident weights.

The cyclic shift stays in XLA (`jnp.roll` is two cheap copies): LN/MLP are
per-token and attention is per-window, so the entire block commutes with
the roll — running it in rolled space with the standard shift masks is
exactly the reference semantics.

Head handling matches ops/pallas/window_attention.py: per-head logits are
computed over the full C lanes with a {0,1} head mask (head_dim=30 would
relayout constantly); the shift-mask kinds are deduplicated at trace time
and selected per window via scalar prefetch.
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
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _layernorm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (|err| < 1.5e-7) — Mosaic has
    no erf primitive; exp is supported."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    # exact-erf GELU (the reference uses nn.GELU() default), via _erf
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _block_kernel(kinds_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref,
                  bk_ref, wv_ref, bv_ref, wp_ref, bp_ref, bias_ref, mask_ref,
                  hm_ref, g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                  out_ref, *, ws, wpr, n, c, heads, scale, masked, n_rows):
    t = ws * wpr * ws                                  # tokens in the row
    x0 = x_ref[...].reshape(t, c).astype(jnp.float32)  # residual stream

    # ---- LN1 + qkv over the whole window row (one big matmul each)
    xn = _layernorm(x0, g1_ref[...], b1_ref[...]).astype(jnp.bfloat16)
    q = _mm(xn, wq_ref[...]) * scale + bq_ref[...]
    k = _mm(xn, wk_ref[...]) + bk_ref[...]
    v = _mm(xn, wv_ref[...]) + bv_ref[...]
    # (ws, W, C) view: window j owns columns [j·ws, (j+1)·ws)
    q = q.reshape(ws, wpr * ws, c)
    k = k.reshape(ws, wpr * ws, c)
    v = v.reshape(ws, wpr * ws, c)

    g = pl.program_id(0)
    row = g % n_rows
    outs = []
    for j in range(wpr):
        # Per-head loop over full-C lane-masked operands. (A head-packed
        # single-matmul variant — K/V expanded to (heads·N, C) rows,
        # transposed logits, segmented softmax — measured ~6% SLOWER: the
        # expansion concats and softmax relayouts cost more than the
        # fewer-but-bigger matmuls save. Don't retry blindly.)
        qw = q[:, j * ws:(j + 1) * ws, :].reshape(n, c)
        kw = k[:, j * ws:(j + 1) * ws, :].reshape(n, c).astype(jnp.bfloat16)
        vw = v[:, j * ws:(j + 1) * ws, :].reshape(n, c).astype(jnp.bfloat16)
        acc = jnp.zeros((n, c), jnp.float32)
        for h_ in range(heads):
            hm = hm_ref[h_, :]
            qh = (qw * hm).astype(jnp.bfloat16)
            logits = _mm_t(qh, kw) + bias_ref[h_]
            if masked:
                kind = kinds_ref[row * wpr + j]
                logits = logits + mask_ref[kind]
            a = jax.nn.softmax(logits, axis=-1)
            acc = acc + _mm(a.astype(jnp.bfloat16), vw) * hm
        outs.append(acc.reshape(ws, ws, c))
    attn = jnp.concatenate(outs, axis=1).reshape(t, c)  # back to row layout

    x1 = x0 + _mm(attn.astype(jnp.bfloat16), wp_ref[...]) + bp_ref[...]

    # ---- LN2 + MLP + residual
    yn = _layernorm(x1, g2_ref[...], b2_ref[...]).astype(jnp.bfloat16)
    hdn = _gelu(_mm(yn, w1_ref[...]) + bb1_ref[...])
    y = x1 + _mm(hdn.astype(jnp.bfloat16), w2_ref[...]) + bb2_ref[...]
    out_ref[...] = y.reshape(1, ws, wpr * ws, c)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "ws",
                                             "interpret"))
def _swin_block_call(x, g1, b1, wq, bq, wk, bk, wv, bv, wp, bp, bias,
                     mask_kinds, kinds, head_mask, g2, b2, w1, bb1, w2, bb2,
                     *, heads, scale, ws, interpret):
    b, h, w, c = x.shape
    n = ws * ws
    wpr = w // ws                                       # windows per row
    n_rows = h // ws
    masked = mask_kinds is not None
    if not masked:
        mask_kinds = jnp.zeros((1, n, n), jnp.float32)
        kinds = jnp.zeros((n_rows * wpr,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n_rows,),
        in_specs=[
            pl.BlockSpec((1, ws, w, c), lambda g, kref: (g, 0, 0, 0)),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(19)],
        ],
        out_specs=pl.BlockSpec((1, ws, w, c), lambda g, kref: (g, 0, 0, 0)),
    )
    kernel = functools.partial(_block_kernel, ws=ws, wpr=wpr, n=n, c=c,
                               heads=heads, scale=scale, masked=masked,
                               n_rows=n_rows)
    t = ws * w
    hidden = w1.shape[1]
    flops = 2 * b * n_rows * t * c * (3 * c + c + 2 * hidden) \
        + 2 * b * n_rows * heads * wpr * n * n * c * 2
    cost = pl.CostEstimate(flops=flops,
                           bytes_accessed=2 * b * h * w * c * 4,
                           transcendentals=b * h * w * (heads * ws * ws + 2))
    xr = x.reshape(b * n_rows, ws, w, c)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * n_rows, ws, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=cost,
        interpret=interpret,
    )(kinds, xr.astype(jnp.float32),
      g1.astype(jnp.float32), b1.astype(jnp.float32),
      wq.astype(jnp.bfloat16), bq.astype(jnp.float32),
      wk.astype(jnp.bfloat16), bk.astype(jnp.float32),
      wv.astype(jnp.bfloat16), bv.astype(jnp.float32),
      wp.astype(jnp.bfloat16), bp.astype(jnp.float32),
      bias.astype(jnp.float32), mask_kinds, head_mask,
      g2.astype(jnp.float32), b2.astype(jnp.float32),
      w1.astype(jnp.bfloat16), bb1.astype(jnp.float32),
      w2.astype(jnp.bfloat16), bb2.astype(jnp.float32),
      ).reshape(b, h, w, c)


def swin_block_fused(x: jnp.ndarray, ln1: tuple, qkv_kernel: jnp.ndarray,
                     qkv_bias: jnp.ndarray | None, proj_kernel: jnp.ndarray,
                     proj_bias: jnp.ndarray, bias: jnp.ndarray,
                     mask: np.ndarray | None, ln2: tuple,
                     mlp_w1: jnp.ndarray, mlp_b1: jnp.ndarray,
                     mlp_w2: jnp.ndarray, mlp_b2: jnp.ndarray,
                     heads: int, ws: int,
                     interpret: bool = False) -> jnp.ndarray:
    """One Swin block, fused (forward only — eval paths).

    x: (B, H, W, C) tokens in (already-rolled, if shifted) image layout,
    H and W multiples of ws. ln1/ln2: (scale, bias). bias: (heads, N, N)
    relative-position bias. mask: (nW, N, N) numpy shift mask or None.
    Returns (B, H, W, C) float32.
    """
    c = x.shape[-1]
    head_dim = c // heads
    scale = float(head_dim) ** -0.5

    wq, wk, wv = (qkv_kernel[:, :c], qkv_kernel[:, c:2 * c],
                  qkv_kernel[:, 2 * c:])
    if qkv_bias is None:
        bq = bk = bv = jnp.zeros((c,), jnp.float32)
    else:
        bq, bk, bv = qkv_bias[:c], qkv_bias[c:2 * c], qkv_bias[2 * c:]
    bq = bq * scale  # q is pre-scaled (swinir_net.py:129)

    hm = np.zeros((heads, c), np.float32)
    for h_ in range(heads):
        hm[h_, h_ * head_dim:(h_ + 1) * head_dim] = 1.0

    if mask is not None:
        kinds_u, inverse = np.unique(np.asarray(mask), axis=0,
                                     return_inverse=True)
        mask_kinds = jnp.asarray(kinds_u, jnp.float32)
        kinds = jnp.asarray(inverse.astype(np.int32))
    else:
        mask_kinds = None
        kinds = None

    return _swin_block_call(
        x, ln1[0], ln1[1], wq, bq, wk, bk, wv, bv, proj_kernel, proj_bias,
        bias, mask_kinds, kinds, jnp.asarray(hm), ln2[0], ln2[1],
        mlp_w1, mlp_b1, mlp_w2, mlp_b2, heads=heads, scale=scale, ws=ws,
        interpret=interpret)
