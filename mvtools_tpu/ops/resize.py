"""SimpleResize: bilinear upscaler with precomputed integer tables.

Equivalent of SimpleResize.cpp: 14-bit fixed-point separable bilinear with
edge-pinned tables (InitTables :27-56).  Used to upscale the per-block vx/vy
int16 fields and uint8 masks to full frame resolution.  The int16 variant
progressively clamps vectors so `pixel + v` stays inside the padded frame
(simpleResize<int16_t> :60-121).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

WEIGHT_SHIFT = 14
WEIGHT_MAX = 1 << WEIGHT_SHIFT
WEIGHT_HALF = WEIGHT_MAX // 2


@functools.lru_cache(maxsize=None)
def init_tables(out: int, in_: int) -> Tuple[np.ndarray, np.ndarray]:
    """(offsets, weights) per output coordinate (InitTables, float32 math)."""
    leftmost = np.float32(0.5)
    rightmost = np.float32(in_) - np.float32(0.5)
    leftmost_idx = max(int(leftmost), 0)
    rightmost_idx = min(int(rightmost), in_ - 1)
    offsets = np.zeros(out, np.int32)
    weights = np.zeros(out, np.int32)
    for i in range(out):
        position = np.float32((i + np.float32(0.5)) * np.float32(in_)
                              / np.float32(out))
        if position <= leftmost:
            offset = leftmost_idx
            weight = np.float32(0.0)
        elif position >= rightmost:
            offset = rightmost_idx - 1
            weight = np.float32(1.0)
        else:
            offset = int(position - leftmost)
            weight = np.float32(position - leftmost - np.float32(offset))
        offsets[i] = offset
        weights[i] = int(weight * WEIGHT_MAX)
    return offsets, weights


def simple_resize(src: jnp.ndarray, dst_height: int, dst_width: int,
                  limit: bool = False, limit_width: int = 0,
                  limit_height: int = 0, pel: int = 1,
                  horizontal_vectors: bool = False) -> jnp.ndarray:
    """Resize [sh, sw] -> [dst_height, dst_width] in int32.

    limit=True replicates the int16 path's progressive vector clamping: the
    per-output-pixel bound is `limit * pel - 1 - coord * step` so that
    coord*pel + value stays in the padded frame.
    """
    sh, sw = src.shape
    v_off, v_w = init_tables(dst_height, sh)
    h_off, h_w = init_tables(dst_width, sw)
    src = src.astype(jnp.int32)

    v_off_j = jnp.asarray(v_off)
    v_w_j = jnp.asarray(v_w)[:, None]
    row1 = src[v_off_j, :]
    row2 = src[jnp.minimum(v_off_j + 1, sh - 1), :]
    work = (row1 * (WEIGHT_MAX - v_w_j) + row2 * v_w_j + WEIGHT_HALF
            ) >> WEIGHT_SHIFT  # [dst_height, sw]

    h_off_j = jnp.asarray(h_off)
    h_w_j = jnp.asarray(h_w)[None, :]
    col1 = work[:, h_off_j]
    col2 = work[:, jnp.minimum(h_off_j + 1, sw - 1)]
    out = (col1 * (WEIGHT_MAX - h_w_j) + col2 * h_w_j + WEIGHT_HALF
           ) >> WEIGHT_SHIFT

    if limit:
        if horizontal_vectors:
            maxi = (limit_width * pel - 1
                    - pel * jnp.arange(dst_width, dtype=jnp.int32))[None, :]
        else:
            maxi = (limit_height * pel - 1
                    - pel * jnp.arange(dst_height, dtype=jnp.int32))[:, None]
        mini = jnp.zeros_like(out) + (0 - (0 if horizontal_vectors else 0))
        # minimum also walks down by step: min_i = -step * i
        if horizontal_vectors:
            mini = (-pel * jnp.arange(dst_width, dtype=jnp.int32))[None, :]
        else:
            mini = (-pel * jnp.arange(dst_height, dtype=jnp.int32))[:, None]
        out = jnp.clip(out, mini, maxi)
    return out
