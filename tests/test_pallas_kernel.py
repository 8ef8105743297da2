"""Fused Pallas grid-decoder kernel vs the XLA grid path (interpret mode).

The kernel (ops/pallas/decoder_kernel.py) is the fully fused per-pixel
decoder; on CPU it runs under the Pallas interpreter. Tolerances reflect
its bf16 weight storage (the XLA reference path here runs f32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ciaosr_tpu.models.builder import build_generator
from ciaosr_tpu.models.csa import CrossScaleAttention
from ciaosr_tpu.ops.neighborhood import unfold_nhwc
from ciaosr_tpu.ops.pallas.decoder_kernel import grid_decode_fused
from ciaosr_tpu.ops.sampling import interpolate_bilinear


@pytest.mark.parametrize("scale,non_local", [(2, True), (3, True),
                                             (4, False)])
def test_fused_kernel_matches_grid_path(rng, scale, non_local):
    net = build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local))
    x = jnp.asarray(rng.random((1, 8, 10, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, scale, method="query_rgb_grid")

    u = unfold_nhwc(feat)
    if non_local:
        csa = CrossScaleAttention(channels=16, scales=(2,))
        v = jnp.concatenate(
            [u, csa.apply({"params": params["params"]["cs_attn"]}, feat)],
            -1)
    else:
        v = u
    phases = grid_decode_fused(u, v, params["params"], scale=scale,
                               local_size=2, softmax_scale=1.0, rows=2,
                               interpret=True)
    h, w = 8, 10
    img = phases.reshape(scale, scale, h, w, 3).transpose(
        2, 0, 3, 1, 4).reshape(scale * h, scale * w, 3)
    img = img + interpolate_bilinear(x, scale * h, scale * w)[0]
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref[0]),
                               atol=2e-3, rtol=1e-2)
