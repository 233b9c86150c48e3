import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat

from oracle import oracle_analyse as oa


def make_clip(rng, w, h, bits=8, shift=(3, 2), chroma=False, xr=2, yr=2):
    """Source + reference pair: reference is source translated by `shift`
    (wrapped) plus light noise, giving the search real structure."""
    dt = np.uint8 if bits <= 8 else np.uint16

    def smooth(a):
        k = np.ones((3, 3)) / 9.0
        out = a.astype(np.float64)
        from scipy.ndimage import convolve
        return convolve(out, k, mode="wrap")

    base = smooth(rng.integers(0, 1 << bits, (h, w)).astype(np.float64))
    base = (base / base.max() * ((1 << bits) - 1)).astype(dt)
    ref = np.roll(base, shift, axis=(0, 1))
    noise = rng.integers(0, 3, (h, w)).astype(dt)
    ref = np.clip(ref.astype(np.int64) + noise, 0, (1 << bits) - 1).astype(dt)
    planes_src, planes_ref = [base], [ref]
    if chroma:
        for _ in range(2):
            cb = smooth(rng.integers(0, 1 << bits, (h // yr, w // xr)
                                     ).astype(np.float64))
            cb = (cb / cb.max() * ((1 << bits) - 1)).astype(dt)
            planes_src.append(cb)
            planes_ref.append(np.roll(cb, (shift[0] // yr, shift[1] // xr),
                                      axis=(0, 1)))
    return planes_src, planes_ref


def run_both(planes_src, planes_ref, fmt, scfg, acfg, field_shift=0):
    sspec = scfg.validate(fmt)
    aspec = acfg.validate(sspec)
    sup_src = build_super([jnp.asarray(p) for p in planes_src], sspec)
    sup_ref = build_super([jnp.asarray(p) for p in planes_ref], sspec)
    mv = analyse(sup_src, sup_ref, aspec, field_shift)

    m = aspec.meta
    lv_count = m.lv_count
    nplanes = 3 if aspec.chroma else 1
    src_lv = oa.build_planes(planes_src[:nplanes], sspec.hpad, sspec.vpad,
                             sspec.pel, sspec.levels, sspec.sharp,
                             sspec.rfilter, fmt.x_ratio_uv, fmt.y_ratio_uv,
                             fmt.bits)
    ref_lv = oa.build_planes(planes_ref[:nplanes], sspec.hpad, sspec.vpad,
                             sspec.pel, sspec.levels, sspec.sharp,
                             sspec.rfilter, fmt.x_ratio_uv, fmt.y_ratio_uv,
                             fmt.bits)
    want = oa.gop_search(
        src_lv, ref_lv, lv_count=lv_count, blk_x=m.blk_x, blk_y=m.blk_y,
        bsx=m.blk_size_x, bsy=m.blk_size_y, ovx=m.overlap_x, ovy=m.overlap_y,
        pel=sspec.pel, xratio=fmt.x_ratio_uv, yratio=fmt.y_ratio_uv,
        bits=fmt.bits, chroma=aspec.chroma, search_type=int(aspec.search),
        search_coarse=int(aspec.search_coarse),
        search_param=aspec.n_search_param, pel_search=aspec.pel_search,
        lam=aspec.lambda_, lsad=aspec.lsad, pnew=aspec.pnew,
        plevel=aspec.plevel, global_=aspec.global_, pzero=aspec.pzero,
        pglobal=aspec.pglobal, badsad=aspec.badsad, badrange=aspec.badrange,
        meander=aspec.meander, trymany=aspec.trymany, dctmode=aspec.dct,
        field_shift=field_shift)

    offset = 1 if aspec.divide else 0
    for lv in range(lv_count):
        got = mv.levels[lv + offset]
        nby, nbx = got.x.shape
        wx = np.array([v[0] for v in want[lv]]).reshape(nby, nbx)
        wy = np.array([v[1] for v in want[lv]]).reshape(nby, nbx)
        ws = np.array([v[2] for v in want[lv]]).reshape(nby, nbx)
        np.testing.assert_array_equal(np.asarray(got.x), wx,
                                      err_msg=f"x level {lv}")
        np.testing.assert_array_equal(np.asarray(got.y), wy,
                                      err_msg=f"y level {lv}")
        np.testing.assert_array_equal(np.asarray(got.sad), ws,
                                      err_msg=f"sad level {lv}")
    return mv, want


def test_single_level_exhaustive_pel1():
    rng = np.random.default_rng(1)
    src, ref = make_clip(rng, 64, 48)
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=1, levels=1),
             AnalyseConfig(blksize=8, levels=1, search=SearchType.EXHAUSTIVE,
                           searchparam=4, truemotion=False))


def test_hierarchical_hex2_pel2_truemotion():
    rng = np.random.default_rng(2)
    src, ref = make_clip(rng, 64, 48)
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=2),
             AnalyseConfig(blksize=8, search=SearchType.HEX2, searchparam=2,
                           truemotion=True))


def test_umh_chroma_yuv420():
    rng = np.random.default_rng(3)
    src, ref = make_clip(rng, 64, 48, chroma=True)
    fmt = VideoFormat(64, 48, 8, ColorFamily.YUV420)
    run_both(src, ref, fmt,
             SuperConfig(pel=2),
             AnalyseConfig(blksize=8, search=SearchType.UMH, searchparam=4,
                           truemotion=True))


@pytest.mark.parametrize("search", [SearchType.ONETIME, SearchType.NSTEP,
                                    SearchType.LOGARITHMIC,
                                    SearchType.HORIZONTAL,
                                    SearchType.VERTICAL])
def test_search_types(search):
    rng = np.random.default_rng(int(search) + 10)
    src, ref = make_clip(rng, 48, 32)
    fmt = VideoFormat(48, 32, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=1),
             AnalyseConfig(blksize=8, search=search, searchparam=3,
                           truemotion=True))


def test_overlap_meander_off():
    rng = np.random.default_rng(5)
    src, ref = make_clip(rng, 64, 48)
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=2),
             AnalyseConfig(blksize=8, overlap=4, search=SearchType.HEX2,
                           meander=False, truemotion=True))


def test_backward_delta_and_badsad():
    rng = np.random.default_rng(6)
    src, ref = make_clip(rng, 64, 48, shift=(9, 12))
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    # tiny badsad forces the rescue path on most blocks
    run_both(src, ref, fmt,
             SuperConfig(pel=1),
             AnalyseConfig(blksize=8, search=SearchType.HEX2, badsad=10,
                           badrange=6, truemotion=True))


def test_badsad_esa_negative_range():
    rng = np.random.default_rng(7)
    src, ref = make_clip(rng, 48, 32, shift=(5, 7))
    fmt = VideoFormat(48, 32, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=2),
             AnalyseConfig(blksize=8, search=SearchType.HEX2, badsad=10,
                           badrange=-4, truemotion=True))


def test_trymany():
    rng = np.random.default_rng(8)
    src, ref = make_clip(rng, 48, 32)
    fmt = VideoFormat(48, 32, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=2),
             AnalyseConfig(blksize=8, search=SearchType.HEX2, trymany=True,
                           truemotion=True))


def test_divide():
    rng = np.random.default_rng(9)
    src, ref = make_clip(rng, 64, 48)
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    mv, _ = run_both(src, ref, fmt,
                     SuperConfig(pel=1),
                     AnalyseConfig(blksize=8, divide=2, search=SearchType.HEX2,
                                   truemotion=True))
    assert mv.levels[0].x.shape == (2 * mv.levels[1].x.shape[0],
                                    2 * mv.levels[1].x.shape[1])


def test_16bit_pel4():
    rng = np.random.default_rng(11)
    src, ref = make_clip(rng, 48, 32, bits=16)
    fmt = VideoFormat(48, 32, 16, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=4),
             AnalyseConfig(blksize=8, search=SearchType.HEX2,
                           truemotion=True))


def test_satd_dct5():
    rng = np.random.default_rng(12)
    src, ref = make_clip(rng, 48, 32)
    fmt = VideoFormat(48, 32, 8, ColorFamily.GRAY)
    run_both(src, ref, fmt,
             SuperConfig(pel=1),
             AnalyseConfig(blksize=8, search=SearchType.HEX2, dct=5,
                           truemotion=True))


def test_property_zero_motion():
    """Identical frames => zero MV field everywhere (SURVEY §4.4)."""
    rng = np.random.default_rng(13)
    src, _ = make_clip(rng, 64, 48)
    fmt = VideoFormat(64, 48, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=1).validate(fmt)
    aspec = AnalyseConfig(blksize=8, truemotion=True).validate(sspec)
    sup = build_super([jnp.asarray(src[0])], sspec)
    mv = analyse(sup, sup, aspec)
    assert int(np.abs(np.asarray(mv.finest.x)).max()) == 0
    assert int(np.abs(np.asarray(mv.finest.y)).max()) == 0
    assert int(np.asarray(mv.finest.sad).max()) == 0
