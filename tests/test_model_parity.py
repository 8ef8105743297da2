"""End-to-end numerical parity: flax CiaoSR vs the torch reference oracle.

Weights flow through the REAL converter (convert/torch_weights.py), so this
validates the model math, the layout permutations, and the checkpoint
conversion path in one shot — the decoder-parity strategy of SURVEY.md §4.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ciaosr_tpu.core.coords import make_coord_cell
from ciaosr_tpu.convert.torch_weights import convert_generator
from ciaosr_tpu.models.builder import build_generator
from tests.oracles.torch_ciaosr import (OracleCiaoSR, OracleCSA, OracleEDSR,
                                        OracleRDN)


def _strip_encoder(sd):
    return {(k[len("encoder."):] if k.startswith("encoder.") else k): v
            for k, v in sd.items()}


def _make_pair(encoder_kind: str, feat_dim=16, hidden=(32, 32),
               non_local=True, local_size=2, seed=0):
    torch.manual_seed(seed)
    if encoder_kind == "rdn":
        enc_t = OracleRDN(mid=feat_dim, blocks=2, layers=3, growth=8)
        enc_cfg = dict(type="RDN", in_channels=3, mid_channels=feat_dim,
                       num_blocks=2, num_layers=3, channel_growth=8)
        gen_type = "LocalImplicitSRRDN"
    else:
        enc_t = OracleEDSR(mid=feat_dim, blocks=3)
        enc_cfg = dict(type="EDSR", in_channels=3, mid_channels=feat_dim,
                       num_blocks=3)
        gen_type = "LocalImplicitSREDSR"

    oracle = OracleCiaoSR(enc_t, feat_dim=feat_dim, hidden=hidden,
                          local_size=local_size, non_local_attn=non_local)
    oracle.eval()

    net = build_generator(dict(
        type=gen_type, encoder=enc_cfg,
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=list(hidden)),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=list(hidden)),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=list(hidden)),
        local_size=local_size, non_local_attn=non_local, feat_unfold=True))

    sd = _strip_encoder(oracle.state_dict())
    params = convert_generator(sd, encoder=encoder_kind, feat_dim=feat_dim,
                               n_hidden=len(hidden), non_local_attn=non_local)
    return oracle, net, params


@pytest.mark.parametrize("encoder_kind", ["rdn", "edsr"])
def test_full_forward_parity(encoder_kind, rng):
    oracle, net, params = _make_pair(encoder_kind)
    b, h, w = 2, 10, 9
    th, tw = 23, 17  # non-integer scale
    x = rng.standard_normal((b, h, w, 3)).astype(np.float32) * 0.3
    coord, cell = make_coord_cell((th, tw))
    coord_b = np.broadcast_to(np.asarray(coord)[None], (b, th * tw, 2)).copy()
    cell_b = np.broadcast_to(np.asarray(cell)[None], (b, th * tw, 2)).copy()

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(coord_b),
                     torch.from_numpy(cell_b)).numpy()

    ours = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(coord_b),
                                jnp.asarray(cell_b)))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)
    # sanity: outputs aren't trivially the residual
    assert np.abs(ref).max() > 1e-3


def test_csa_parity(rng):
    torch.manual_seed(1)
    c = 16
    oracle = OracleCSA(channel=c, scales=(2,))
    oracle.eval()
    from ciaosr_tpu.models.csa import CrossScaleAttention
    from ciaosr_tpu.convert.torch_weights import convert_csa
    csa = CrossScaleAttention(channels=c, scales=(2,))
    sd = {f"cs_attn.{k}": v for k, v in oracle.state_dict().items()}
    params = {"params": convert_csa(sd, scales=(2,))}

    x = rng.standard_normal((2, 11, 14, c)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    ours = np.asarray(csa.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_csa_hard_argmax_path(rng):
    torch.manual_seed(2)
    c = 8
    oracle = OracleCSA(channel=c, scales=(2,), average=False)
    oracle.eval()
    from ciaosr_tpu.models.csa import CrossScaleAttention
    from ciaosr_tpu.convert.torch_weights import convert_csa
    csa = CrossScaleAttention(channels=c, scales=(2,), average=False)
    sd = {f"cs_attn.{k}": v for k, v in oracle.state_dict().items()}
    params = {"params": convert_csa(sd, scales=(2,))}
    x = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    ours = np.asarray(csa.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("encoder_kind,enc_cls", [("rdn", OracleRDN),
                                                  ("edsr", OracleEDSR)])
def test_encoder_parity(encoder_kind, enc_cls, rng):
    torch.manual_seed(3)
    enc_t = enc_cls(mid=16, blocks=2, layers=3, growth=8) \
        if encoder_kind == "rdn" else enc_cls(mid=16, blocks=2)
    enc_t.eval()
    from ciaosr_tpu.convert.torch_weights import (convert_edsr_encoder,
                                                  convert_rdn_encoder)
    from ciaosr_tpu.models.edsr import EDSREncoder
    from ciaosr_tpu.models.rdn import RDNEncoder
    if encoder_kind == "rdn":
        enc_j = RDNEncoder(mid_channels=16, num_blocks=2, num_layers=3,
                           channel_growth=8)
        params = {"params": convert_rdn_encoder(enc_t.state_dict())}
    else:
        enc_j = EDSREncoder(mid_channels=16, num_blocks=2)
        params = {"params": convert_edsr_encoder(enc_t.state_dict())}
    x = rng.standard_normal((2, 9, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = enc_t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    ours = np.asarray(enc_j.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_local_size_variants(rng):
    """local_size=1 (single tap) and 3 (full 3×3 ensemble) also match."""
    for ls in (1, 3):
        oracle, net, params = _make_pair("edsr", local_size=ls, seed=10 + ls)
        b, h, w = 1, 8, 8
        x = rng.standard_normal((b, h, w, 3)).astype(np.float32) * 0.3
        coord, cell = make_coord_cell((16, 16))
        coord_b = np.asarray(coord)[None]
        cell_b = np.asarray(cell)[None]
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2),
                         torch.from_numpy(coord_b.copy()),
                         torch.from_numpy(cell_b.copy())).numpy()
        ours = np.asarray(net.apply(params, jnp.asarray(x),
                                    jnp.asarray(coord_b),
                                    jnp.asarray(cell_b)))
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)
