"""Native C++ host-pipeline core vs the numpy reference implementation.

Skipped when native/build/libciaosr_native.so is absent (build with
``make -C native``); CI images have g++, so the test builds on demand.
"""

import math
import os

import numpy as np
import pytest

from ciaosr_tpu.data import native


@pytest.fixture(scope="module")
def native_lib():
    if not native.ensure_built():
        pytest.skip("native library unavailable and could not be built")
    return True


@pytest.mark.parametrize("shape,scale", [
    ((48, 48, 3), 0.25), ((37, 53, 3), 2.37), ((100, 77, 3), 1 / 3),
    ((64, 64, 1), 0.5)])
def test_native_bicubic_matches_numpy(native_lib, rng, shape, scale):
    img = rng.random(shape, dtype=np.float32)
    oh, ow = math.ceil(shape[0] * scale), math.ceil(shape[1] * scale)
    os.environ["CIAOSR_NATIVE"] = "0"
    try:
        from ciaosr_tpu.core.resize import imresize_np
        ref = imresize_np(img, scale=scale)
    finally:
        os.environ.pop("CIAOSR_NATIVE", None)
    nat = native.bicubic_resize(img, oh, ow, scale)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_imresize_np_uses_native_when_available(native_lib, rng):
    img = rng.random((40, 40, 3), dtype=np.float32)
    from ciaosr_tpu.core.resize import imresize_np
    out_native = imresize_np(img, scale=0.5)         # native default-on
    os.environ["CIAOSR_NATIVE"] = "0"
    try:
        out_numpy = imresize_np(img, scale=0.5)
    finally:
        os.environ.pop("CIAOSR_NATIVE", None)
    np.testing.assert_allclose(out_native, out_numpy, atol=1e-6)
