"""Golden interop vs the reference C: DCT/SATD cost modes, hi-bit
depth, divide, recalculate (split from test_golden.py)."""

import os
import subprocess
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import mvtools_tpu as mvt
from mvtools_tpu.core.codec import decode_mv_field, encode_mv_field
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat

from golden_common import (_check_config, _frames, _golden_blob,
                           build_harness)


@pytest.fixture(scope="module")
def harness():
    return build_harness()


@pytest.mark.parametrize("dct", [1, 2, 3, 4])
def test_golden_dct_modes(harness, tmp_path, dct):
    """FFTW DCT cost modes 1-4 byte-exact against the reference search
    driven by the scalar REDFT10 stub (pobLumaSAD PlaneOfBlocks.cpp:
    117-163 + DCTFFTW.cpp:30-54 requantisation; dct_stub.cc implements
    the transform the reference would get from fftwf)."""
    _check_config(harness, tmp_path, 128, 96,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=16, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False, dct=dct),
                  seed=30 + dct)


@pytest.mark.parametrize("dct", [5, 6, 7, 8, 9, 10])
def test_golden_satd_modes(harness, tmp_path, dct):
    """SATD cost modes 5-10 byte-exact against the reference's own
    scalar Satd_C (SADFunctions.cpp:581-761, already linked into the
    harness — no fftw involved)."""
    _check_config(harness, tmp_path, 128, 96,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=16, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False, dct=dct),
                  seed=40 + dct)


@pytest.mark.parametrize("bits", [10, 16])
def test_golden_hibit_analyse(harness, tmp_path, bits):
    """8-16-bit sources (MVSuper.c:204-209): hi-bit SAD scaling,
    verybigSAD, and blob contents byte-exact against the C at 10 and
    16 bits."""
    rng = np.random.default_rng(60 + bits)
    w, h = 192, 128
    peak = (1 << bits) - 1
    base = rng.integers(0, peak + 1, (h, w)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    k = np.ones((3, 3), np.float32) / 9
    pad = np.pad(base, 1, mode="edge")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (3, 3)), k)
    noise = rng.normal(0, peak / 64.0, (h, w))
    src = np.clip(base + noise, 0, peak).astype("<u2")
    ref = np.clip(np.roll(base, (3, -5), (0, 1)) + noise, 0,
                  peak).astype("<u2")

    fmt = VideoFormat(w, h, bits, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=16, levels=0, search=SearchType.HEX2,
                          searchparam=2, truemotion=True,
                          chroma=False).validate(sspec)
    blob = _golden_blob(harness, tmp_path, src, ref, sspec, aspec,
                        bits=bits)
    s_src = mvt.build_super([jnp.asarray(src.astype(np.int32))], sspec)
    s_ref = mvt.build_super([jnp.asarray(ref.astype(np.int32))], sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    want = decode_mv_field(blob, aspec.meta)
    for lv in range(len(mv.levels)):
        for key in ("x", "y", "sad"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mv.levels[lv], key)),
                np.asarray(getattr(want.levels[lv], key)),
                err_msg=f"level {lv} {key}")
    assert encode_mv_field(mv) == blob


@pytest.mark.parametrize("divide", [1, 2])
def test_golden_divide_modes(harness, tmp_path, divide):
    """gopExtraDivide (GroupOfPlanes.c:206-302): the 4-children split
    with SAD>>2, plus divide=2's median sub-vectors, byte-exact on the
    <divided> blob level."""
    _check_config(harness, tmp_path, 192, 128,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=8, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False,
                                divide=divide),
                  seed=50 + divide)


@pytest.mark.parametrize("rblk,rov,smooth", [(8, 0, 1), (8, 4, 0)])
def test_golden_recalculate_blob(harness, tmp_path, rblk, rov, smooth):
    """MRecalculate golden: the C reference's Super -> MAnalyse ->
    gopRecalculateMVs (pobRecalculateMVs PlaneOfBlocks.cpp:1158-1424,
    blk16 field refined onto a finer recalc grid) vs our
    recalculate(engine="exact"), byte-for-byte on the vectors blob."""
    from mvtools_tpu.recalculate import RecalculateConfig, recalculate
    rng = np.random.default_rng(31 + rblk + rov)
    w, h = 192, 128
    src, ref = _frames(rng, w, h)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=0, search=SearchType.HEX2,
                         searchparam=2, truemotion=True, chroma=False)
    aspec = acfg.validate(sspec)
    rcfg = RecalculateConfig(blksize=rblk, overlap=rov, thsad=200,
                             smooth=smooth, chroma=False, truemotion=True)
    rspec = rcfg.to_analyse_config().validate(sspec)

    sp, rp, op = (str(tmp_path / n) for n in
                  ("src.raw", "ref.raw", "vec.bin"))
    src.tofile(sp)
    ref.tofile(rp)
    m = aspec.meta
    args = [harness, "recalculate", str(w), str(h), str(m.pel),
            str(m.lv_count), str(sspec.hpad), str(sspec.vpad),
            str(sspec.sharp), str(sspec.rfilter),
            str(m.x_ratio_uv), str(m.y_ratio_uv),
            str(m.blk_size_x), str(m.blk_size_y),
            str(m.overlap_x), str(m.overlap_y),
            str(int(aspec.search)), str(aspec.n_search_param),
            str(aspec.pel_search), str(aspec.lambda_), str(aspec.lsad),
            str(aspec.pnew), str(aspec.plevel), str(int(aspec.global_)),
            str(aspec.pzero), str(aspec.pglobal), str(aspec.badsad),
            str(aspec.badrange), str(int(aspec.meander)),
            str(int(aspec.trymany)), str(int(aspec.search_coarse)),
            str(rspec.meta.blk_size_x), str(rspec.meta.blk_size_y),
            str(rspec.meta.overlap_x), str(rspec.meta.overlap_y),
            str(int(rspec.search)), str(rspec.n_search_param),
            str(rspec.lambda_), str(rspec.pnew), str(rcfg.thsad),
            str(rcfg.smooth), sp, rp, op]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(op, "rb") as f:
        blob = f.read()

    s_src = mvt.build_super([jnp.asarray(src)], sspec)
    s_ref = mvt.build_super([jnp.asarray(ref)], sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    mv2 = recalculate(s_src, s_ref, mv, rspec, rcfg, engine="exact")

    want = decode_mv_field(blob, mv2.meta)
    np.testing.assert_array_equal(np.asarray(mv2.levels[0].x),
                                  np.asarray(want.levels[0].x), err_msg="x")
    np.testing.assert_array_equal(np.asarray(mv2.levels[0].y),
                                  np.asarray(want.levels[0].y), err_msg="y")
    np.testing.assert_array_equal(np.asarray(mv2.levels[0].sad),
                                  np.asarray(want.levels[0].sad),
                                  err_msg="sad")
    assert encode_mv_field(mv2) == blob


