"""ciaosr_tpu — a TPU-native JAX framework for arbitrary-scale image
super-resolution with the capabilities of CiaoSR (CVPR 2023).

Design: JAX/XLA/Pallas compute path, NHWC layouts, static-shape tiling,
SPMD data parallelism over a `jax.sharding.Mesh`. The reference behavior
spec lives in SURVEY.md; file:line citations in docstrings point at the
reference implementation this framework reproduces (without porting it).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CIAOSR_PLATFORM"):
    # Select the JAX platform even in environments whose site hooks
    # pre-import jax and pin JAX_PLATFORMS (works until backend init).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["CIAOSR_PLATFORM"])
    except Exception:  # pragma: no cover - backend already initialized
        pass

from ciaosr_tpu.config.registry import Registry, build_from_cfg  # noqa: F401
