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


def load_torch_checkpoint(path: str, model_cfg: dict, *, ema: bool = False,
                          strict: bool = False, log=None) -> dict:
    """``ema=True`` extracts the EMA copy RealCiaoSR saves alongside the
    live generator (real_ciaosr.py:84-91) — the weights actually used for
    real-world inference (``is_use_ema``, :270-278).  ``strict=True``
    enables the key-consumption audit (convert/audit.py)."""
    import torch

    from ciaosr_tpu.convert.torch_weights import convert_generator

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw

    if ema:
        pfx = "generator_ema."
        if not any(k.startswith(pfx) for k in sd):
            raise KeyError(
                "ema=True but the checkpoint has no generator_ema.* keys "
                "(not a RealCiaoSR GAN checkpoint?)")
        sd = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}

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
        multi_scale=tuple(gen_cfg.get("multi_scale", (2,))),
        strict=strict, log=log)
