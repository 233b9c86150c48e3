"""Block cost kernels: SAD, SATD (Hadamard), block luma sum.

TPU-native equivalents of the reference's dispatch tables
(SADFunctions.cpp:354-367 sad_c, :581-761 SATD scalar composition,
Luma.cpp:14-25 luma_c).  Instead of per-(w,h,bits,isa) function tables these
are shape-polymorphic jitted functions; JAX specialises per static block
size the same way the reference selects a kernel per block size.

All kernels accept either a single block [bh, bw] or any batch of blocks
[..., bh, bw] and reduce over the trailing two axes — batching over
candidates/blocks/frames is how the TPU gets its parallelism.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sad(src: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences over the last two axes
    (reference: sad_c SADFunctions.cpp:354-367)."""
    a = src.astype(jnp.int32)
    b = ref.astype(jnp.int32)
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


def luma(src: jnp.ndarray) -> jnp.ndarray:
    """Block pixel sum (reference: luma_c Luma.cpp:14-25)."""
    return jnp.sum(src.astype(jnp.int32), axis=(-2, -1))


# Unnormalised 4-point Hadamard matrix in the reference's butterfly order
# (HADAMARD4, SADFunctions.cpp:581-592).  Only the sum of |coefficients|
# matters, so row order is irrelevant.
_H4 = np.array([[1, 1, 1, 1],
                [1, -1, 1, -1],
                [1, 1, -1, -1],
                [1, -1, -1, 1]], dtype=np.int32)


def _hadamard_abs_sum_4x4(d: jnp.ndarray) -> jnp.ndarray:
    """sum |H4 @ D @ H4^T| for a batch of 4x4 tiles [..., 4, 4]."""
    h = jnp.asarray(_H4)
    t = jnp.einsum("ij,...jk,lk->...il", h, d, h)
    return jnp.sum(jnp.abs(t), axis=(-2, -1))


def satd(src: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """SATD over the last two axes [..., bh, bw].

    Matches the reference's scalar composition exactly
    (Satd_C SADFunctions.cpp:713-741): a 4x4 block is a single transform
    with the final >>1; larger blocks sum 8x4 partitions, each partition
    being two 4x4 transforms whose absolute sums are added *before* the >>1.
    """
    bh, bw = src.shape[-2], src.shape[-1]
    d = src.astype(jnp.int32) - ref.astype(jnp.int32)
    if bh == 4 and bw == 4:
        return _hadamard_abs_sum_4x4(d) >> 1
    if bh % 4 or bw % 8:
        raise ValueError(f"SATD unsupported for block size {bw}x{bh}")
    lead = d.shape[:-2]
    # tiles of 4 rows x 4 cols: [..., bh/4, 4, bw/4, 4] -> [..., bh/4, bw/4, 4, 4]
    t = d.reshape(*lead, bh // 4, 4, bw // 4, 4)
    t = jnp.moveaxis(t, -3, -2)
    tile_sums = _hadamard_abs_sum_4x4(t)  # [..., bh/4, bw/4]
    pair = (tile_sums[..., 0::2] + tile_sums[..., 1::2]) >> 1  # per 8x4 partition
    return jnp.sum(pair, axis=(-2, -1))


def satd_supported(bw: int, bh: int) -> bool:
    """The reference disables SATD for 16x2 blocks (PlaneOfBlocks.cpp:365-368)."""
    if bw == 4 and bh == 4:
        return True
    return bh % 4 == 0 and bw % 8 == 0
