"""Parameter initializers matching PyTorch layer defaults.

Training-dynamics parity with the reference (which uses torch's default
kaiming-uniform for Linear/Conv2d) requires matching init distributions:
W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax.linen import initializers

# kaiming_uniform(a=sqrt(5)) == uniform with limit sqrt(3*(1/3)/fan_in)
torch_kernel_init = initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
