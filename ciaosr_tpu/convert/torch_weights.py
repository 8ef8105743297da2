"""PyTorch checkpoint → flax params converter.

Maps reference state_dicts (key families per
/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:314-319,
388-391 and the MLPRefiner/CrossScaleAttention layouts) onto our NHWC flax
parameter trees.

Layout notes
  * torch Linear weight (out,in) → flax Dense kernel (in,out): transpose.
  * torch Conv2d weight (out,in,kh,kw) → flax Conv kernel (kh,kw,in,out).
  * Unfolded-feature axes: torch F.unfold is channel-major (idx = c*9+tap,
    ciaosr_net.py:131-139); our gathers are tap-major (idx = tap*C+c).
    The first/last layers of imnet_k/v/q get their unfold blocks permuted.
  * The ``generator.`` checkpoint prefix (restorer wrapping) and the
    SwinIR-family `'^' -> 'generator.'` rewrite (tools/test.py:115-118) are
    handled by ``strip_prefix``.
"""

from __future__ import annotations

import re

import numpy as np


def _np(t):
    # torch tensor or numpy array → numpy
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def tap_major_perm(c: int, k2: int = 9) -> np.ndarray:
    """perm[ours_idx] = torch_idx for a (k², C) unfold block."""
    o = np.arange(k2 * c)
    tap, ch = o // c, o % c
    return ch * k2 + tap


def _linear(sd, key, in_perm=None, out_perm=None):
    w = _np(sd[f"{key}.weight"])  # (out, in)
    b = _np(sd[f"{key}.bias"])
    if in_perm is not None:
        w = w[:, in_perm]
    if out_perm is not None:
        w = w[out_perm, :]
        b = b[out_perm]
    return {"kernel": w.T.copy(), "bias": b.copy()}


def _conv(sd, key):
    w = _np(sd[f"{key}.weight"])  # (out, in, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0).copy()}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"]).copy()
    return out


def _prelu(sd, key):
    return {"negative_slope": _np(sd[f"{key}.weight"]).reshape(()).copy()}


def _mlp(sd, prefix, n_hidden, in_perm=None, out_perm=None):
    """MLPRefiner Sequential: Linear at even indices (ReLU between)."""
    params = {}
    for i in range(n_hidden):
        params[f"layers_{i}"] = _linear(sd, f"{prefix}.layers.{2 * i}",
                                        in_perm=in_perm if i == 0 else None)
    params["out"] = _linear(
        sd, f"{prefix}.layers.{2 * n_hidden}",
        in_perm=in_perm if n_hidden == 0 else None, out_perm=out_perm)
    return params


def strip_prefix(state_dict: dict, prefix: str = "generator.") -> dict:
    """Drop a module prefix; if absent, prepend semantics of the reference's
    revise_keys=(r'^', 'generator.') are a no-op here (keys used as-is)."""
    if any(k.startswith(prefix) for k in state_dict):
        return {k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)}
    return dict(state_dict)


def convert_rdn_encoder(sd: dict) -> dict:
    p = {"sfe1": _conv(sd, "sfe1"), "sfe2": _conv(sd, "sfe2")}
    rdb_ids = sorted({int(m.group(1)) for k in sd
                      if (m := re.match(r"rdbs\.(\d+)\.", k))})
    for i in rdb_ids:
        blk = {"lff": _conv(sd, f"rdbs.{i}.lff")}
        layer_ids = sorted({int(m.group(1)) for k in sd
                            if (m := re.match(rf"rdbs\.{i}\.layers\.(\d+)\.",
                                              k))})
        for j in layer_ids:
            blk[f"layers_{j}"] = _conv(sd, f"rdbs.{i}.layers.{j}.conv")
        p[f"rdb_{i}"] = blk
    p["gff_0"] = _conv(sd, "gff.0")
    p["gff_1"] = _conv(sd, "gff.1")
    return p


def convert_edsr_encoder(sd: dict) -> dict:
    p = {"conv_first": _conv(sd, "conv_first"),
         "conv_after_body": _conv(sd, "conv_after_body")}
    blk_ids = sorted({int(m.group(1)) for k in sd
                      if (m := re.match(r"body\.(\d+)\.", k))})
    for i in blk_ids:
        p[f"body_{i}"] = {"conv1": _conv(sd, f"body.{i}.conv1"),
                          "conv2": _conv(sd, f"body.{i}.conv2")}
    return p


def convert_csa(sd: dict, scales=(2,)) -> dict:
    p = {}
    for name in ("conv_match_1", "conv_match_2", "conv_assembly"):
        p[f"{name}_conv"] = _conv(sd, f"cs_attn.{name}.0")
        p[f"{name}_prelu"] = _prelu(sd, f"cs_attn.{name}.1")
    for s in scales:
        name = "down" if s == 2 else f"downx{s}"
        if f"cs_attn.{name}.weight" in sd:
            p[name] = _conv(sd, f"cs_attn.{name}")
    # the reference always builds `down` even when 2 ∉ scales; extra keys in
    # sd are simply unused here.
    return p


def convert_generator(state_dict: dict, *, encoder: str, feat_dim: int,
                      n_hidden: int = 4, feat_unfold: bool = True,
                      non_local_attn: bool = True,
                      multi_scale=(2,), strict: bool = False,
                      log=None) -> dict:
    """Full LocalImplicitSR{RDN,EDSR,SWINIR} state_dict → flax params.

    ``strict=True`` audits key consumption (convert/audit.py): every
    checkpoint key must be either converted or explained by a
    known-ignored rule, else ConversionAuditError.
    """
    from ciaosr_tpu.convert.audit import TrackedStateDict, report

    sd = TrackedStateDict(strip_prefix(state_dict))
    c = feat_dim
    base = 9 * c if feat_unfold else c
    nla = c * len(multi_scale) if non_local_attn else 0
    perm = tap_major_perm(c) if feat_unfold else None

    def block_perm(extra_identity: int):
        """permute the leading unfold block, identity for trailing dims."""
        if perm is None:
            return None
        return np.concatenate([perm, base + np.arange(extra_identity)])

    params = {
        # imnet_k: in [unfold(base), rel(2), cell(2)], out base
        "imnet_k": _mlp(sd, "imnet_k", n_hidden,
                        in_perm=block_perm(4), out_perm=perm),
        # imnet_v: in [unfold, nla, rel, cell], out base+nla
        "imnet_v": _mlp(sd, "imnet_v", n_hidden,
                        in_perm=block_perm(nla + 4),
                        out_perm=block_perm(nla)),
        # imnet_q: in [unfold, nla], out rgb
        "imnet_q": _mlp(sd, "imnet_q", n_hidden,
                        in_perm=block_perm(nla)),
    }
    if non_local_attn:
        params["cs_attn"] = convert_csa(sd, scales=multi_scale)

    if encoder == "rdn":
        params["encoder"] = convert_rdn_encoder(sd)
    elif encoder == "edsr":
        params["encoder"] = convert_edsr_encoder(sd)
    elif encoder == "swinir":
        from ciaosr_tpu.convert.swinir_weights import convert_swinir_encoder
        params["encoder"] = convert_swinir_encoder(sd)
    else:
        raise ValueError(f"unknown encoder family {encoder}")

    if strict or log is not None:
        report(sd, original_keys=list(state_dict), prefix="generator."
               if any(k.startswith("generator.") for k in state_dict)
               else None, strict=strict, log=log or (lambda *_: None))
    return {"params": params}
