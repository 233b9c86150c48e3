"""Flow-family kernel tests against loop oracles + pipeline properties."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.flow import FlowConfig, flow
from mvtools_tpu.flowfps import FlowFPSConfig, flowfps_frame, output_frame_mapping
from mvtools_tpu.flowinter import FlowInterConfig, flowinter
from mvtools_tpu.blockfps import BlockFPSConfig, blockfps_frame
from mvtools_tpu.flowblur import FlowBlurConfig, flowblur
from mvtools_tpu.ops import maskfun, resize

from oracle import oracle_flow as ofl
from test_analyse import make_clip


@pytest.mark.parametrize("dims", [((6, 8), (48, 64)), ((5, 7), (37, 53))])
def test_simple_resize_uint8(dims):
    (sh, sw), (dh, dw) = dims
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (sh, sw), np.int64)
    got = np.asarray(resize.simple_resize(jnp.asarray(src), dh, dw))
    want = ofl.simple_resize(src, dh, dw)
    np.testing.assert_array_equal(got, want)


def test_simple_resize_int16_limiting():
    rng = np.random.default_rng(1)
    src = rng.integers(-50, 50, (6, 8), np.int64)
    for horiz in (True, False):
        got = np.asarray(resize.simple_resize(
            jnp.asarray(src), 48, 64, limit=True, limit_width=64,
            limit_height=48, pel=2, horizontal_vectors=horiz))
        want = ofl.simple_resize(src, 48, 64, limit=True, limit_w=64,
                                 limit_h=48, pel=2, horizontal_vectors=horiz)
        np.testing.assert_array_equal(got, want, err_msg=f"horiz={horiz}")


@pytest.mark.parametrize("is_backward", [False, True])
@pytest.mark.parametrize("gamma", [1.0, 2.0])
def test_occlusion_mask_matches_serial_oracle(is_backward, gamma):
    rng = np.random.default_rng(2)
    vx = rng.integers(-20, 20, (7, 9), np.int32)
    vy = rng.integers(-20, 20, (7, 9), np.int32)
    got = np.asarray(maskfun.make_vector_occlusion_mask_time(
        jnp.asarray(vx), jnp.asarray(vy), is_backward, 100.0, gamma, 2, 100,
        8, 8))
    want = ofl.make_vector_occlusion_mask_time(vx, vy, is_backward, 100.0,
                                               gamma, 2, 100, 8, 8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("time256", [64, 128, 200])
def test_flow_inter_kernels_match_oracle(time256):
    rng = np.random.default_rng(3)
    h, w, pel = 24, 32, 2
    fine_b = rng.integers(0, 256, ((h + 8) * pel, (w + 8) * pel), np.int64)
    fine_f = rng.integers(0, 256, ((h + 8) * pel, (w + 8) * pel), np.int64)
    oy = ox = 4 * pel
    vxb = rng.integers(-6, 6, (h, w), np.int32)
    vyb = rng.integers(-6, 6, (h, w), np.int32)
    vxf = rng.integers(-6, 6, (h, w), np.int32)
    vyf = rng.integers(-6, 6, (h, w), np.int32)
    mb = rng.integers(0, 256, (h, w), np.int32)
    mf = rng.integers(0, 256, (h, w), np.int32)

    got = np.asarray(maskfun.flow_inter(
        jnp.asarray(fine_b), jnp.asarray(fine_f), oy, ox, jnp.asarray(vxb),
        jnp.asarray(vxf), jnp.asarray(vyb), jnp.asarray(vyf),
        jnp.asarray(mb), jnp.asarray(mf), time256, pel))
    want = ofl.flow_inter(fine_b, fine_f, oy, ox, vxb, vxf, vyb, vyf, mb, mf,
                          time256, pel)
    np.testing.assert_array_equal(got, want)

    got_s = np.asarray(maskfun.flow_inter_simple(
        jnp.asarray(fine_b), jnp.asarray(fine_f), oy, ox, jnp.asarray(vxb),
        jnp.asarray(vxf), jnp.asarray(vyb), jnp.asarray(vyf),
        jnp.asarray(mb), jnp.asarray(mf), time256, pel))
    want_s = ofl.flow_inter_simple(fine_b, fine_f, oy, ox, vxb, vxf, vyb,
                                   vyf, mb, mf, time256, pel)
    np.testing.assert_array_equal(got_s, want_s)


def _translating_pair(rng, w, h, shift):
    base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)

    def smooth(a):
        from scipy.ndimage import gaussian_filter
        out = gaussian_filter(a.astype(np.float64), 2.0)
        return (out / out.max() * 255).astype(np.uint8)

    base = smooth(base)
    a = base[8:8 + h, 8:8 + w]
    b = base[8 + shift[0]:8 + shift[0] + h, 8 + shift[1]:8 + shift[1] + w]
    mid = base[8 + shift[0] // 2:8 + shift[0] // 2 + h,
               8 + shift[1] // 2:8 + shift[1] // 2 + w]
    return a, b, mid


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


def _mv_pair(a, b, sspec, acfg):
    s_a = build_super([jnp.asarray(a)], sspec)
    s_b = build_super([jnp.asarray(b)], sspec)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    mv_b = analyse(s_a, s_b, aspec_b)     # backward vectors at frame a
    mv_f = analyse(s_b, s_a, aspec_f)     # forward vectors at frame b
    return s_a, s_b, mv_b, mv_f, aspec_b.meta


def test_flowfps_halfway_psnr():
    """Frame doubling of a translating scene reconstructs the true middle
    frame with high PSNR (BASELINE config 5 sanity)."""
    rng = np.random.default_rng(4)
    w, h = 96, 64
    a, b, mid = _translating_pair(rng, w, h, (4, 6))
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=8, truemotion=True, chroma=False)
    s_a, s_b, mv_b, mv_f, meta = _mv_pair(a, b, sspec, acfg)

    out = flowfps_frame([jnp.asarray(a)], [jnp.asarray(b)], s_a, s_b, mv_b,
                        mv_f, meta, FlowFPSConfig(maskmode=0, thscd1=1000,
                                                  thscd2=255), 128)
    psnr = _psnr(np.asarray(out[0])[8:-8, 8:-8], mid[8:-8, 8:-8])
    assert psnr > 35, f"FlowFPS halfway PSNR too low: {psnr:.2f} dB"

    # maskmode 1 and 2 also run
    out1 = flowfps_frame([jnp.asarray(a)], [jnp.asarray(b)], s_a, s_b, mv_b,
                         mv_f, meta, FlowFPSConfig(maskmode=1, thscd1=1000,
                                                   thscd2=255), 128)
    assert _psnr(np.asarray(out1[0])[8:-8, 8:-8], mid[8:-8, 8:-8]) > 30


def test_blockfps_halfway_psnr():
    rng = np.random.default_rng(5)
    w, h = 96, 64
    a, b, mid = _translating_pair(rng, w, h, (4, 6))
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=8, truemotion=True, chroma=False)
    s_a, s_b, mv_b, mv_f, meta = _mv_pair(a, b, sspec, acfg)
    for mode in (0, 1, 2, 3, 4):
        out = blockfps_frame([jnp.asarray(a)], [jnp.asarray(b)], s_a, s_b,
                             mv_b, mv_f, meta,
                             BlockFPSConfig(mode=mode, thscd1=1000,
                                            thscd2=255), 128)
        psnr = _psnr(np.asarray(out[0])[8:-8, 8:-8], mid[8:-8, 8:-8])
        assert psnr > 28, f"BlockFPS mode {mode} PSNR {psnr:.2f}"


def test_flowinter_runs_and_fallback():
    rng = np.random.default_rng(6)
    w, h = 64, 48
    a, b, mid = _translating_pair(rng, w, h, (2, 4))
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=8, truemotion=True, chroma=False)
    s_a, s_b, mv_b, mv_f, meta = _mv_pair(a, b, sspec, acfg)
    out = flowinter([jnp.asarray(a)], [jnp.asarray(b)], s_a, s_b, mv_b, mv_f,
                    meta, FlowInterConfig(time=50.0, thscd1=1000, thscd2=255))
    psnr = _psnr(np.asarray(out[0])[8:-8, 8:-8], mid[8:-8, 8:-8])
    assert psnr > 32, f"FlowInter PSNR {psnr:.2f}"
    # extra-field variant runs
    out2 = flowinter([jnp.asarray(a)], [jnp.asarray(b)], s_a, s_b, mv_b,
                     mv_f, meta, FlowInterConfig(time=50.0, thscd1=1000,
                                                 thscd2=255),
                     mv_bb=mv_b, mv_ff=mv_f)
    assert np.asarray(out2[0]).shape == (h, w)


def test_flow_fetch_translation():
    rng = np.random.default_rng(7)
    w, h = 64, 48
    a, b, _ = _translating_pair(rng, w, h, (2, 4))
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=8, truemotion=True, chroma=False)
    aspec = dataclasses.replace(acfg, isb=False).validate(sspec)
    s_a = build_super([jnp.asarray(a)], sspec)
    s_b = build_super([jnp.asarray(b)], sspec)
    mv = analyse(s_a, s_b, aspec)
    out = flow([jnp.asarray(a)], s_b, mv, aspec.meta,
               FlowConfig(mode=0, thscd1=1000, thscd2=255))
    psnr = _psnr(np.asarray(out[0])[8:-8, 8:-8], a[8:-8, 8:-8])
    assert psnr > 35, f"Flow fetch PSNR {psnr:.2f}"
    # shift mode runs
    out_s = flow([jnp.asarray(a)], s_b, mv, aspec.meta,
                 FlowConfig(mode=1, thscd1=1000, thscd2=255))
    assert np.asarray(out_s[0]).shape == (h, w)


def test_flowblur_runs():
    rng = np.random.default_rng(8)
    w, h = 64, 48
    a, b, _ = _translating_pair(rng, w, h, (3, 5))
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=1, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=8, truemotion=True, chroma=False)
    s_a, s_b, mv_b, mv_f, meta = _mv_pair(a, b, sspec, acfg)
    out = flowblur([jnp.asarray(a)], s_a, mv_b, mv_f, meta,
                   FlowBlurConfig(blur=50.0, thscd1=1000, thscd2=255))
    assert np.asarray(out[0]).shape == (h, w)
    assert 0 <= np.asarray(out[0]).min() and np.asarray(out[0]).max() <= 255
