"""Coordinate grids for implicit image functions (LIIF convention).

Behavioral spec: mmedit's ``make_coord`` as consumed by the reference at
/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:7,148
and /root/reference/mmedited/models/restorers/ciaosr.py:240-243.

Convention: per-axis pixel centers ``-1 + (2 i + 1) / n`` for ``i in [0, n)``,
stacked in (y, x) order on the last axis, row-major flatten. Consumers flip
the last axis before sampling because grid-sample expects (x, y).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _axis_centers_np(n: int) -> np.ndarray:
    # -1 + 1/n, -1 + 3/n, ..., 1 - 1/n
    r = 1.0 / n
    return -1.0 + r + 2.0 * r * np.arange(n, dtype=np.float32)


def make_coord_np(shape, flatten: bool = True) -> np.ndarray:
    """Pixel-center coordinate grid in [-1, 1], numpy, float32.

    Returns (H*W, 2) if flatten else (H, W, 2); last axis is (y, x).
    """
    h, w = shape
    ys = _axis_centers_np(h)
    xs = _axis_centers_np(w)
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)
    if flatten:
        grid = grid.reshape(-1, 2)
    return grid.astype(np.float32)


def make_coord(shape, flatten: bool = True) -> jnp.ndarray:
    """JAX version of :func:`make_coord_np` (device array, float32)."""
    h, w = shape
    ys = -1.0 + (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h
    xs = -1.0 + (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    if flatten:
        grid = grid.reshape(-1, 2)
    return grid


def make_cell_np(target_shape) -> np.ndarray:
    """Per-query cell sizes (2/H, 2/W) for a target resolution.

    Matches mmedit GenerateCoordinateAndCell semantics
    (/root/reference/mmedited/datasets/pipelines/generate_assistant.py:87-90):
    every query of one image carries the same (2/H, 2/W) cell.
    """
    h, w = target_shape
    n = h * w
    cell = np.empty((n, 2), dtype=np.float32)
    cell[:, 0] = 2.0 / h
    cell[:, 1] = 2.0 / w
    return cell


def make_coord_cell(target_shape):
    """(coord, cell) pair for a full target grid — jnp arrays (N,2)."""
    h, w = target_shape
    coord = make_coord((h, w), flatten=True)
    cell = jnp.stack(
        [jnp.full((h * w,), 2.0 / h, dtype=jnp.float32),
         jnp.full((h * w,), 2.0 / w, dtype=jnp.float32)],
        axis=-1,
    )
    return coord, cell
