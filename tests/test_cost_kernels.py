import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from mvtools_tpu.ops import sad as sad_ops
from mvtools_tpu.ops import dct as dct_ops

from oracle import oracle_sad as osad

BLOCK_SIZES = [(4, 4), (8, 4), (8, 8), (16, 2), (16, 8), (16, 16),
               (32, 16), (32, 32), (64, 32), (64, 64), (128, 64), (128, 128)]


def rand_block(rng, w, h, bits):
    dt = np.uint8 if bits <= 8 else np.uint16
    return rng.integers(0, 1 << bits, size=(h, w), dtype=dt)


@pytest.mark.parametrize("w,h", BLOCK_SIZES)
@pytest.mark.parametrize("bits", [8, 16])
def test_sad_luma(w, h, bits):
    rng = np.random.default_rng(w * h + bits)
    a, b = rand_block(rng, w, h, bits), rand_block(rng, w, h, bits)
    assert int(sad_ops.sad(jnp.asarray(a), jnp.asarray(b))) == osad.sad(a, b)
    assert int(sad_ops.luma(jnp.asarray(a))) == osad.luma(a)


@pytest.mark.parametrize("w,h", [bs for bs in BLOCK_SIZES if bs != (16, 2)])
@pytest.mark.parametrize("bits", [8, 16])
def test_satd_matches_swar_oracle(w, h, bits):
    rng = np.random.default_rng(w + h + bits)
    a, b = rand_block(rng, w, h, bits), rand_block(rng, w, h, bits)
    got = int(sad_ops.satd(jnp.asarray(a), jnp.asarray(b)))
    want = osad.satd(a, b, bits)
    assert got == want, f"SATD {w}x{h} {bits}bit: {got} != {want}"


def test_satd_batched():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(5, 8, 8), dtype=np.uint8)
    b = rng.integers(0, 256, size=(5, 8, 8), dtype=np.uint8)
    got = np.asarray(sad_ops.satd(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        assert got[i] == osad.satd(a[i], b[i], 8)


@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (16, 8), (32, 32)])
@pytest.mark.parametrize("bits", [8, 16])
def test_dct_block(w, h, bits):
    rng = np.random.default_rng(w + bits)
    a = rand_block(rng, w, h, bits)
    got = np.asarray(dct_ops.dct_block(jnp.asarray(a), bits))

    # independent oracle: scipy dctn type-II unnormalised == FFTW REDFT10
    coefs = scipy.fft.dctn(a.astype(np.float64), type=2, norm=None)
    shift = dct_ops.dct_shift(w, h)
    half, pmax = 1 << (bits - 1), (1 << bits) - 1
    integ = np.rint(coefs * (np.sqrt(2) / 2)).astype(np.int64)
    want = np.clip((integ >> shift) + half, 0, pmax)
    integ0 = np.rint(coefs[0, 0] * 0.5).astype(np.int64)
    want[0, 0] = np.clip((integ0 >> (shift + 2)) + half, 0, pmax)
    np.testing.assert_array_equal(got, want)


def test_dct_shift():
    assert dct_ops.dct_shift(8, 8) == 6
    assert dct_ops.dct_shift(16, 16) == 8
    assert dct_ops.dct_shift(16, 2) == 5
    assert dct_ops.dct_shift(4, 4) == 4
