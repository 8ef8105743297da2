"""Shim parity for the last two reference-source-testable ops without
live config consumers (round-4 verdict missing #4):

* GenerateCoordinateAndCell2 vs the reference's own
  generate_assistant.py:105-192 (target-size arithmetic, gt flattening,
  sample-index pairing, cell values);
* smgan GANLoss (mask path incl. the scalar-cancellation quirk, the
  GaussianBlur(71, sigma 10) mask target, and the align_corners=True
  prediction resize) vs the reference's own gan_loss.py:12-248.

The reference modules run as genuine untrusted-source-under-test via
tests/oracles/reference_shim.py.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_aux():
    from oracles import reference_shim as shim
    return shim.load_reference_aux()


# ---------------------------------------------------------------------------
# GenerateCoordinateAndCell2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw,scale,scale1", [
    ((20, 24), 2.0, 3.0),     # super-sampling target (30, 36)
    ((48, 48), 3.0, 2.0),     # downscaled target, float-division interm.
    ((17, 23), 1.7, 1.7),     # scale1 == scale: self-consistent case
])
def test_gcc2_full_grid_parity(ref_aux, hw, scale, scale1):
    """No-sampling path: target-size arithmetic (round(H/scale·scale1)
    two-step form), gt flattening, coord grid, and cell must match the
    reference op exactly."""
    from ciaosr_tpu.data.pipelines import GenerateCoordinateAndCell2

    h, w = hw
    rng = np.random.default_rng(5)
    gt_hwc = rng.random((h, w, 3)).astype(np.float32)

    ref_op = ref_aux.generate_assistant.GenerateCoordinateAndCell2(
        sample_quantity=None, scale=scale, scale1=scale1)
    ref_out = ref_op({"gt": torch.from_numpy(
        gt_hwc.transpose(2, 0, 1)).contiguous()})

    ours = GenerateCoordinateAndCell2(sample_quantity=None, scale=scale,
                                      scale1=scale1)(
        {"gt": gt_hwc.copy(), "_rng": np.random.default_rng(0)})

    np.testing.assert_array_equal(ours["gt"], ref_out["gt"].numpy())
    np.testing.assert_allclose(ours["coord"], ref_out["coord"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(ours["cell"], ref_out["cell"].numpy(),
                               atol=1e-6)


def test_gcc2_sampled_pairing_parity(ref_aux):
    """Sampling path: given the SAME drawn indices, coord/gt/cell pairing
    must match the reference row-for-row (the reference draws via the
    legacy np.random global, ours via the pipeline generator — the RNG
    engine is not the contract, the index pairing is). Indices are
    recovered from the reference's output coords against the full grid."""
    from ciaosr_tpu.core.coords import make_coord_np
    from ciaosr_tpu.data.pipelines import GenerateCoordinateAndCell2

    h, w, q = 16, 14, 40
    scale = scale1 = 2.0        # equal-length grid: consistent pairing
    rng = np.random.default_rng(7)
    gt_hwc = rng.random((h, w, 3)).astype(np.float32)

    np.random.seed(123)
    ref_op = ref_aux.generate_assistant.GenerateCoordinateAndCell2(
        sample_quantity=q, scale=scale, scale1=scale1)
    ref_out = ref_op({"gt": torch.from_numpy(
        gt_hwc.transpose(2, 0, 1)).contiguous()})
    assert ref_out["coord"].shape == (q, 2)

    # recover the reference's sample_lst by matching coord rows
    full = make_coord_np((h, w))
    index_of = {bytes(np.asarray(r, np.float32)): i
                for i, r in enumerate(full)}
    sel = np.array([index_of[bytes(np.asarray(r, np.float32))]
                    for r in ref_out["coord"].numpy()])

    class _FixedDraw:
        def choice(self, n, size, replace):
            assert n == len(full) and size == q and replace is False
            return sel.copy()

    ours = GenerateCoordinateAndCell2(sample_quantity=q, scale=scale,
                                      scale1=scale1)(
        {"gt": gt_hwc.copy(), "_rng": _FixedDraw()})
    np.testing.assert_array_equal(ours["gt"], ref_out["gt"].numpy())
    np.testing.assert_allclose(ours["coord"], ref_out["coord"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(ours["cell"], ref_out["cell"].numpy(),
                               atol=1e-6)


def test_gcc2_no_gt_target_size(ref_aux):
    from ciaosr_tpu.data.pipelines import GenerateCoordinateAndCell2

    ref_op = ref_aux.generate_assistant.GenerateCoordinateAndCell2(
        target_size=(3, 10, 12))
    ref_out = ref_op({})
    ours = GenerateCoordinateAndCell2(target_size=(3, 10, 12))({})
    np.testing.assert_allclose(ours["coord"], ref_out["coord"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(ours["cell"], ref_out["cell"].numpy(),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# smgan GANLoss + GaussianBlur
# ---------------------------------------------------------------------------

def _np_nchw(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_gaussian_blur_parity(ref_aux):
    """Our depthwise blur (losses/gan.py gaussian_blur_71) vs the
    reference GaussianBlur((71,71), (10,10)) — zero padding, kernel
    normalization, channel grouping."""
    import jax.numpy as jnp

    from ciaosr_tpu.losses.gan import gaussian_blur_71

    rng = np.random.default_rng(0)
    x = _np_nchw(rng, 2, 3, 80, 96)
    ref_blur = ref_aux.gan_loss.GaussianBlur()(torch.from_numpy(x))
    ours = gaussian_blur_71(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_blur.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("case", ["gen_mask", "disc_real", "disc_fake",
                                  "gen_resized", "disc_fake_resized"])
def test_smgan_loss_parity(ref_aux, case):
    """smgan value parity per branch — including the generator branch's
    scalar-cancellation quirk (gan_loss.py:124-126: mean-MSE × mask /
    mask.mean() then mean() == plain MSE) and the bilinear
    align_corners=True resize of the prediction to the mask size
    (gan_loss.py:106-113)."""
    import jax.numpy as jnp

    from ciaosr_tpu.losses.gan import GANLoss

    rng = np.random.default_rng(int(np.bytes_(case.encode()).__hash__())
                                % 2 ** 31)
    hw = (40, 48) if "resized" not in case else (20, 24)
    pred = _np_nchw(rng, 2, 1, *hw)
    mask = rng.random((2, 1, 40, 48)).astype(np.float32)

    ref_loss_mod = ref_aux.gan_loss.GANLoss("smgan", loss_weight=0.7)
    ours = GANLoss("smgan", loss_weight=0.7)

    t_pred = torch.from_numpy(pred)
    t_mask = torch.from_numpy(mask)
    j_pred = jnp.asarray(pred.transpose(0, 2, 3, 1))
    j_mask = jnp.asarray(mask.transpose(0, 2, 3, 1))

    if case in ("gen_mask", "gen_resized"):
        ref_val = ref_loss_mod(t_pred, True, is_disc=False, mask=t_mask)
        our_val = ours(j_pred, True, is_disc=False, mask=j_mask)
    elif case == "disc_real":
        ref_val = ref_loss_mod(t_pred, True, is_disc=True, mask=t_mask)
        our_val = ours(j_pred, True, is_disc=True, mask=j_mask)
    else:
        ref_val = ref_loss_mod(t_pred, False, is_disc=True, mask=t_mask)
        our_val = ours(j_pred, False, is_disc=True, mask=j_mask)
    np.testing.assert_allclose(float(our_val), float(ref_val), atol=3e-5,
                               rtol=1e-4)
