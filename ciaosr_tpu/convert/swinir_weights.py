"""SwinIR torch state_dict → flax params (trunk only).

Key families per the reference's attribute-stealing layout
(ciaosr_net.py:460-473): conv_first, patch_embed.norm,
layers.{i}.residual_group.blocks.{j}.{norm1,attn,norm2,mlp}, layers.{i}.conv,
norm, conv_after_body. Buffers (relative_position_index, attn_mask) are
recomputed at trace time and skipped.
"""

from __future__ import annotations

import re

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(sd, key):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0).copy()}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"]).copy()
    return out


def _dense(sd, key):
    out = {"kernel": _np(sd[f"{key}.weight"]).T.copy()}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"]).copy()
    return out


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]).copy(),
            "bias": _np(sd[f"{key}.bias"]).copy()}


def convert_swinir_encoder(sd: dict) -> dict:
    p = {
        "conv_first": _conv(sd, "conv_first"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "norm": _ln(sd, "norm"),
    }
    if "patch_embed.norm.weight" in sd:
        p["patch_embed_norm"] = _ln(sd, "patch_embed.norm")

    layer_ids = sorted({int(m.group(1)) for k in sd
                        if (m := re.match(r"layers\.(\d+)\.", k))})
    for i in layer_ids:
        lp = {"conv": _conv(sd, f"layers.{i}.conv")}
        blk_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(
                rf"layers\.{i}\.residual_group\.blocks\.(\d+)\.", k))})
        for j in blk_ids:
            base = f"layers.{i}.residual_group.blocks.{j}"
            lp[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{base}.attn.qkv"),
                    "proj": _dense(sd, f"{base}.attn.proj"),
                    "relative_position_bias_table": _np(
                        sd[f"{base}.attn.relative_position_bias_table"]
                    ).copy(),
                },
                "mlp_fc1": _dense(sd, f"{base}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{base}.mlp.fc2"),
            }
        p[f"layers_{i}"] = lp
    return p
