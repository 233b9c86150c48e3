"""2-D DCT block transform for the dct cost modes.

TPU-native equivalent of DCTFFTW (DCTFFTW.cpp): an unnormalised DCT-II
(FFTW REDFT10 convention, output = 2 * sum(x * cos(...)) per axis) followed
by requantisation to the pixel range (Float2Pixels_C DCTFFTW.cpp:30-54):

    f     = coef * sqrt(2)/2          (DC: coef * 0.5)
    integ = nearbyint(f)              (round half to even)
    out   = clamp((integ >> dctshift) + pixelHalf, 0, pixelMax)
    dctshift  = ceil(log2(blkArea)), dctshift0 = dctshift + 2 (DC)

Implemented as two small cosine-matrix matmuls — on TPU these hit the MXU
directly, replacing the FFTW plan machinery (and its global plan mutex,
DCTFFTW.cpp:132) with pure functional code.  The transform accumulates in
float64 and the coefficient is cast to float32 before the sqrt(2)/2 scale
— exactly the golden harness's scalar REDFT10 stub
(tests/golden_harness/dct_stub.cc), which byte-matches this module
through the reference's own search; a real fftwf pipeline could still
differ by one quantisation step in rare last-ulp races.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dct2_matrix(n: int) -> np.ndarray:
    """Unnormalised DCT-II matrix: out[k] = 2 * sum_j in[j]*cos(pi*(j+.5)*k/n)."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    return 2.0 * np.cos(np.pi * (j + 0.5) * k / n)


def dct_shift(sizex: int, sizey: int) -> int:
    """ceil(log2(blkArea)) (reference: dctInit DCTFFTW.cpp:146-153)."""
    size2d = sizex * sizey
    shift = 0
    cursize = 1
    while cursize < size2d:
        shift += 1
        cursize <<= 1
    return shift


_SQRT2_DIV2 = math.sqrt(2.0) / 2.0


def dct_block(block: jnp.ndarray, bits: int) -> jnp.ndarray:
    """DCT-transform blocks [..., bh, bw] and requantise to pixel range.

    Returns int32 in [0, pixelMax]; feed the result to `sad` just like
    pixel blocks (pobLumaSAD dctmode 1-4, PlaneOfBlocks.cpp:123-163).
    """
    bh, bw = block.shape[-2], block.shape[-1]
    cy = jnp.asarray(_dct2_matrix(bh))
    cx = jnp.asarray(_dct2_matrix(bw))
    x = block.astype(jnp.float64)
    coefs = jnp.einsum("ij,...jk,lk->...il", cy, x, cx)

    shift = dct_shift(bw, bh)
    shift0 = shift + 2
    pixel_max = (1 << bits) - 1
    pixel_half = 1 << (bits - 1)

    # float32 from here on: Float2Pixels_C stores float coefficients and
    # multiplies by the float32 sqrt(2)/2 constant (DCTFFTW.cpp:30-43)
    f = coefs.astype(jnp.float32) * jnp.float32(_SQRT2_DIV2)
    integ = jnp.round(f).astype(jnp.int64)  # round half to even == nearbyint
    out = jnp.clip((integ >> shift) + pixel_half, 0, pixel_max)

    f0 = coefs[..., 0, 0].astype(jnp.float32) * jnp.float32(0.5)
    integ0 = jnp.round(f0).astype(jnp.int64)
    dc = jnp.clip((integ0 >> shift0) + pixel_half, 0, pixel_max)
    out = out.at[..., 0, 0].set(dc)
    return out.astype(jnp.int32)
