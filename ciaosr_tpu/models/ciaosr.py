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

    def setup(self):
        base = self.feat_dim * 9 if self.feat_unfold else self.feat_dim
        nla_dim = self.feat_dim * len(self.multi_scale) \
            if self.non_local_attn else 0
        self.imnet_k = ImplicitMLP(out_dim=base, hidden_list=self.hidden_k,
                                   name="imnet_k")
        self.imnet_v = ImplicitMLP(out_dim=base + nla_dim,
                                   hidden_list=self.hidden_v, name="imnet_v")
        self.imnet_q = ImplicitMLP(out_dim=self.out_dim,
                                   hidden_list=self.hidden_q, name="imnet_q")
        if self.non_local_attn:
            self.cs_attn = CrossScaleAttention(
                channels=self.feat_dim, scales=tuple(self.multi_scale),
                softmax_scale=self.cs_softmax_scale, average=self.cs_average,
                name="cs_attn")

    def gen_feature(self, x: jnp.ndarray) -> jnp.ndarray:
        """Encoder trunk features, NHWC."""
        return self.encoder(x)

    def __call__(self, x: jnp.ndarray, coord: jnp.ndarray,
                 cell: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,3) LQ (pre-normalized); coord/cell: (B,Q,2).
        Returns (B,Q,3)."""
        feature = self.gen_feature(x)
        return self.query_rgb(feature, x, coord, cell)

    def query_rgb(self, feature: jnp.ndarray, x: jnp.ndarray,
                  coord: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
        """Decode queries against precomputed features.

        Includes the global bilinear residual (ciaosr_net.py:107-108) so
        chunked eval can stream query blocks independently.
        """
        b, h, w, c = feature.shape
        q = coord.shape[1]

        if self.non_local_attn:
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
        rgb = self.imnet_q(out)
        rgb = rgb + grid_sample_bilinear_border(x, coord)
        return rgb
