"""Config-driven model builders with the reference's config surface.

Accepts generator configs shaped like /root/reference/configs/001_*.py:11-41
and 002_*.py:34-66 (``type=LocalImplicitSR{RDN,EDSR,SWINIR}``, encoder dict,
imnet_q/k/v dicts). Per SURVEY.md §2.1, the net overwrites the configs'
imnet in/out dims (only hidden_list and imnet_q.out_dim survive); per
SURVEY.md §8.1 the 002 configs pass extra knobs the reference __init__
rejects — we accept and validate them against their baked-in semantics.
"""

from __future__ import annotations

import copy
from typing import Any

import jax.numpy as jnp

_DTYPES = {None: None, "float32": jnp.float32, "fp32": jnp.float32,
           "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}

from ciaosr_tpu.config.registry import BACKBONES, MODELS, build_from_cfg
from ciaosr_tpu.models.ciaosr import CiaoSRNet
import ciaosr_tpu.models.edsr  # noqa: F401  (registry side effects)
import ciaosr_tpu.models.rdn   # noqa: F401

# Knobs the 002 configs pass that are constants in the shipped decoder
# (unfold+lec+mulwkv+res always on): name -> required value.
_BAKED_IN = {
    "local_ensemble_coord": True,
    "imnet_k_type": "mul_w_cell",
    "imnet_v_type": "mul_w_cell",
    "res": True,
    "cat_nla_v": True,
    "query_mlp": None,
    "key_mlp": None,
    "value_mlp": None,
}


def _hidden(imnet_cfg: dict | None, default=(256, 256, 256, 256)) -> tuple:
    if not imnet_cfg:
        return tuple(default)
    return tuple(imnet_cfg.get("hidden_list", default))


def build_generator(cfg: dict) -> CiaoSRNet:
    cfg = copy.deepcopy(dict(cfg))
    gtype = cfg.pop("type")
    gname = gtype if isinstance(gtype, str) else gtype.__name__

    strict = cfg.pop("strict_knobs", False)
    for knob, baked in _BAKED_IN.items():
        if knob in cfg:
            v = cfg.pop(knob)
            if v != baked and v is not None:
                msg = (f"{knob}={v!r} has baked-in semantics "
                       f"{knob}={baked!r} — the reference collapses these "
                       "knobs to constants and its own __init__ rejects "
                       "them (SURVEY.md §8.1); proceeding with the baked-in "
                       "behavior")
                if strict:
                    raise ValueError(msg)
                import warnings
                warnings.warn(msg, stacklevel=2)

    dtype = cfg.pop("dtype", None)
    dtype = _DTYPES[dtype] if isinstance(dtype, (str, type(None))) else dtype

    enc_cfg = cfg.pop("encoder")
    window_size = cfg.pop("window_size", None)
    if gname == "LocalImplicitSRSWINIR":
        from ciaosr_tpu.models.swinir import SwinIREncoder  # lazy: big module
        enc_cfg = dict(enc_cfg)
        enc_cfg.setdefault("type", "SwinIR")
        if window_size is not None:
            enc_cfg.setdefault("window_size", window_size)
        encoder = build_from_cfg(dict(enc_cfg, dtype=dtype), BACKBONES)
        feat_dim = getattr(encoder, "embed_dim")
    elif gname in ("LocalImplicitSRRDN", "LocalImplicitSREDSR",
                   "LocalImplicitSRNet"):
        encoder = build_from_cfg(dict(enc_cfg, dtype=dtype), BACKBONES)
        feat_dim = getattr(encoder, "mid_channels")
    else:
        raise KeyError(f"unknown generator type {gname}")

    imnet_q = cfg.pop("imnet_q", None)
    imnet_k = cfg.pop("imnet_k", None)
    imnet_v = cfg.pop("imnet_v", None)

    return CiaoSRNet(
        encoder=encoder,
        feat_dim=feat_dim,
        out_dim=(imnet_q or {}).get("out_dim", 3),
        hidden_q=_hidden(imnet_q),
        hidden_k=_hidden(imnet_k),
        hidden_v=_hidden(imnet_v),
        local_size=cfg.pop("local_size", 2),
        feat_unfold=cfg.pop("feat_unfold", True),
        non_local_attn=cfg.pop("non_local_attn", True),
        multi_scale=tuple(cfg.pop("multi_scale", (2,))),
        softmax_scale=cfg.pop("softmax_scale", 1.0),
        eval_bsize=cfg.pop("eval_bsize", None),
        dtype=dtype,
        use_pallas=cfg.pop("use_pallas", False),
    )


def build_model(cfg: dict, train_cfg: Any = None, test_cfg: Any = None):
    """Build a restorer from a reference-style model config."""
    cfg = copy.deepcopy(dict(cfg))
    mtype = cfg.pop("type")
    mname = mtype if isinstance(mtype, str) else mtype.__name__
    if mname in MODELS:
        cls = MODELS.get(mname)
    else:
        cls = mtype
    return cls(train_cfg=train_cfg, test_cfg=test_cfg, **cfg)
