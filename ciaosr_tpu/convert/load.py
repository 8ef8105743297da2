"""Load + convert reference .pth checkpoints into flax params.

Covers the reference's load paths (tools/test.py:115-118 including the raw
SwinIR-checkpoint 'generator.' prefix rewrite; mmcv load_checkpoint meta
dicts with 'state_dict' key).
"""

from __future__ import annotations


_ENCODER_FAMILY = {
    "LocalImplicitSRRDN": "rdn",
    "LocalImplicitSREDSR": "edsr",
    "LocalImplicitSRSWINIR": "swinir",
}


def load_torch_checkpoint(path: str, model_cfg: dict) -> dict:
    import torch

    from ciaosr_tpu.convert.torch_weights import convert_generator

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw

    gen_cfg = dict(model_cfg["generator"])
    gtype = gen_cfg["type"]
    gname = gtype if isinstance(gtype, str) else gtype.__name__
    family = _ENCODER_FAMILY[gname]
    enc = gen_cfg["encoder"]
    feat_dim = enc.get("mid_channels") or enc.get("embed_dim")
    n_hidden = len(gen_cfg.get("imnet_q", {}).get(
        "hidden_list", [256, 256, 256, 256]))
    return convert_generator(
        sd, encoder=family, feat_dim=feat_dim, n_hidden=n_hidden,
        feat_unfold=gen_cfg.get("feat_unfold", True),
        non_local_attn=gen_cfg.get("non_local_attn", True),
        multi_scale=tuple(gen_cfg.get("multi_scale", (2,))))
