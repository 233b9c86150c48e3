"""Tests for Recalculate, Compensate, Finest, SCDetection, Mask, codec."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
from mvtools_tpu.compensate import CompensateConfig, compensate
from mvtools_tpu.core import codec
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat
from mvtools_tpu.finest import finest
from mvtools_tpu.mask import MaskConfig, mask
from mvtools_tpu.recalculate import RecalculateConfig, recalculate
from mvtools_tpu.scdetect import SCDetectionConfig, scdetect

from oracle import oracle_analyse as oa
from test_analyse import make_clip


def _setup(rng, w=64, h=48, pel=2, blksize=8, overlap=0, chroma=False):
    family = ColorFamily.YUV420 if chroma else ColorFamily.GRAY
    fmt = VideoFormat(w, h, 8, family)
    cur, ref = make_clip(rng, w, h, chroma=chroma)
    scfg = SuperConfig(pel=pel, chroma=chroma)
    sspec = scfg.validate(fmt)
    acfg = AnalyseConfig(blksize=blksize, overlap=overlap, truemotion=True,
                         chroma=chroma, isb=False)
    aspec = acfg.validate(sspec)
    s_cur = build_super([jnp.asarray(p) for p in cur], sspec)
    s_ref = build_super([jnp.asarray(p) for p in ref], sspec)
    mv = analyse(s_cur, s_ref, aspec)
    return fmt, cur, ref, sspec, aspec, s_cur, s_ref, mv


def test_codec_roundtrip():
    rng = np.random.default_rng(0)
    _, _, _, _, aspec, _, _, mv = _setup(rng)
    blob = codec.encode_mv_field(mv)
    meta_blob = codec.encode_analysis_meta(aspec.meta)
    meta2 = codec.decode_analysis_meta(meta_blob)
    assert meta2 == aspec.meta
    mv2 = codec.decode_mv_field(blob, meta2)
    for lv, lv2 in zip(mv.levels, mv2.levels):
        np.testing.assert_array_equal(np.asarray(lv.x), lv2.x)
        np.testing.assert_array_equal(np.asarray(lv.y), lv2.y)
        np.testing.assert_array_equal(np.asarray(lv.sad), lv2.sad)
    # byte-level layout: level record = int32 size + 16-byte vectors
    nbk_coarsest = mv.levels[-1].x.size
    (size0,) = np.frombuffer(blob[8:12], np.int32)
    assert size0 == 4 + nbk_coarsest * 16


def test_finest_interleave():
    rng = np.random.default_rng(1)
    _, _, _, _, _, s_cur, _, _ = _setup(rng, pel=2)
    fine = finest(s_cur)[0]
    stack = s_cur.planes[0][0]
    ph, pw = stack.shape[1:]
    assert fine.shape == (ph * 2, pw * 2)
    f = np.asarray(fine)
    st = np.asarray(stack)
    np.testing.assert_array_equal(f[0::2, 0::2], st[0])
    np.testing.assert_array_equal(f[0::2, 1::2], st[1])
    np.testing.assert_array_equal(f[1::2, 0::2], st[2])
    np.testing.assert_array_equal(f[1::2, 1::2], st[3])


def test_scdetection():
    rng = np.random.default_rng(2)
    _, _, _, _, aspec, s_cur, s_ref, mv = _setup(rng)
    flag = scdetect(mv, aspec.meta)
    assert not bool(flag)  # same-scene clip
    # unrelated frames => scene change
    other = [rng.integers(0, 256, (48, 64), np.uint8)]
    s_other = build_super([jnp.asarray(other[0])],
                          s_cur.spec)
    mv2 = analyse(s_cur, s_other, aspec)
    assert bool(scdetect(mv2, aspec.meta,
                         SCDetectionConfig(thscd1=200, thscd2=50)))


def test_compensate_pure_translation():
    """Perfect translation: the compensated ref equals the source exactly
    inside the block-covered region."""
    rng = np.random.default_rng(3)
    w, h = 64, 48
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    base = rng.integers(0, 256, (h + 16, w + 16), np.uint8)
    cur = base[4:4 + h, 4:4 + w]
    ref = base[6:6 + h, 7:7 + w]  # ref shifted by (2, 3)
    sspec = SuperConfig(pel=1, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=8, truemotion=True, chroma=False
                          ).validate(sspec)
    s_cur = build_super([jnp.asarray(cur)], sspec)
    s_ref = build_super([jnp.asarray(ref)], sspec)
    mv = analyse(s_cur, s_ref, aspec)
    out = compensate(s_cur, s_ref, mv, aspec.meta,
                     CompensateConfig(thsad=10000, thscd1=1000, thscd2=255))
    # borders can't match (the shifted-in content lies in replicate padding
    # of the ref super), so compare the interior block region only
    np.testing.assert_array_equal(np.asarray(out[0])[8:-8, 8:-8],
                                  cur[8:-8, 8:-8])


def test_compensate_scene_change_behaviour():
    rng = np.random.default_rng(4)
    w, h = 48, 32
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    cur = rng.integers(0, 256, (h, w), np.uint8)
    ref = rng.integers(0, 256, (h, w), np.uint8)
    sspec = SuperConfig(pel=1, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=8, truemotion=True, chroma=False
                          ).validate(sspec)
    s_cur = build_super([jnp.asarray(cur)], sspec)
    s_ref = build_super([jnp.asarray(ref)], sspec)
    mv = analyse(s_cur, s_ref, aspec)
    cfg = CompensateConfig(thscd1=100, thscd2=10)
    out_keep = compensate(s_cur, s_ref, mv, aspec.meta, cfg)
    np.testing.assert_array_equal(np.asarray(out_keep[0]), cur)
    cfg2 = CompensateConfig(scbehavior=False, thscd1=100, thscd2=10)
    out_ref = compensate(s_cur, s_ref, mv, aspec.meta, cfg2)
    np.testing.assert_array_equal(np.asarray(out_ref[0]), ref)


@pytest.mark.parametrize("smooth,overlap", [(1, 0), (0, 0), (1, 4)])
def test_recalculate_matches_oracle(smooth, overlap):
    rng = np.random.default_rng(5)
    w, h = 64, 48
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    cur, ref = make_clip(rng, w, h)
    scfg = SuperConfig(pel=2, chroma=False)
    sspec = scfg.validate(fmt)
    # first pass: 16x16 blocks
    acfg16 = AnalyseConfig(blksize=16, truemotion=True, chroma=False)
    aspec16 = acfg16.validate(sspec)
    s_cur = build_super([jnp.asarray(p) for p in cur], sspec)
    s_ref = build_super([jnp.asarray(p) for p in ref], sspec)
    mv16 = analyse(s_cur, s_ref, aspec16)

    rcfg = RecalculateConfig(blksize=8, overlap=overlap, smooth=smooth,
                             thsad=100, chroma=False, truemotion=True)
    rspec = rcfg.to_analyse_config().validate(sspec)
    got = recalculate(s_cur, s_ref, mv16, rspec, rcfg)
    got_exact = recalculate(s_cur, s_ref, mv16, rspec, rcfg, engine="exact")

    # oracle
    src_lv = oa.build_planes(cur[:1], sspec.hpad, sspec.vpad, sspec.pel,
                             sspec.levels, sspec.sharp, sspec.rfilter,
                             1, 1, 8)
    ref_lv = oa.build_planes(ref[:1], sspec.hpad, sspec.vpad, sspec.pel,
                             sspec.levels, sspec.sharp, sspec.rfilter,
                             1, 1, 8)
    m = rspec.meta
    pob = oa.POB(m.blk_x, m.blk_y, m.blk_size_x, m.blk_size_y, m.pel, 0,
                 False, False, m.overlap_x, m.overlap_y, 1, 1, 8)
    m16 = aspec16.meta
    old_vectors = [[int(a), int(b), int(c)] for a, b, c in zip(
        np.asarray(mv16.finest.x).ravel(), np.asarray(mv16.finest.y).ravel(),
        np.asarray(mv16.finest.sad).ravel())]
    pixel_max = 255
    thsad_scaled = int(rcfg.thsad * pixel_max / 255.0 + 0.5)
    thsad_scaled = thsad_scaled * (m.blk_size_x * m.blk_size_y) // 64
    want = oa.recalculate_mvs(
        pob, old_vectors,
        dict(nblkx=m16.blk_x, nblky=m16.blk_y, bsx=16, bsy=16,
             ovx=0, ovy=0, pel=2),
        src_lv[0], ref_lv[0], int(rspec.search), rspec.n_search_param,
        rspec.lambda_, rspec.pnew, 0, thsad_scaled, 0, None, smooth,
        rcfg.meander)
    wx = np.array([v[0] for v in want]).reshape(m.blk_y, m.blk_x)
    wy = np.array([v[1] for v in want]).reshape(m.blk_y, m.blk_x)
    ws = np.array([v[2] for v in want]).reshape(m.blk_y, m.blk_x)
    # "exact" keeps the reference candidate order and must be bit-exact;
    # the production lockstep engine differs only in tie-breaks and is
    # bit-exact on this content too (regression-pins both)
    np.testing.assert_array_equal(np.asarray(got_exact.levels[0].x), wx)
    np.testing.assert_array_equal(np.asarray(got_exact.levels[0].y), wy)
    np.testing.assert_array_equal(np.asarray(got_exact.levels[0].sad), ws)
    np.testing.assert_array_equal(np.asarray(got.levels[0].x), wx)
    np.testing.assert_array_equal(np.asarray(got.levels[0].y), wy)
    np.testing.assert_array_equal(np.asarray(got.levels[0].sad), ws)


def test_mask_kinds_run():
    rng = np.random.default_rng(6)
    fmt, cur, ref, sspec, aspec, s_cur, s_ref, mv = _setup(rng, chroma=False)
    planes = [jnp.asarray(cur[0])]
    for kind in range(6):
        out = mask(planes, mv, aspec.meta, MaskConfig(kind=kind, ml=50.0))
        assert out[0].shape == (48, 64)
        # gray vectors: xRatioUV == yRatioUV == 1 -> "chroma" masks full size
        assert out[1].shape == (48, 64)
        vals = np.asarray(out[1])
        assert vals.min() >= 0 and vals.max() <= 255
