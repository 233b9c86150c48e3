"""Golden interop vs the reference C: gray frame outputs — degrain,
compensate, flowinter (split from test_golden.py)."""

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


@pytest.mark.parametrize("overlap", [0, 8])
def test_golden_degrain1_frame_bytes(harness, tmp_path, overlap):
    """Full pipeline golden: the C reference's Super -> MAnalyse
    (bwd+fwd) -> MDegrain1 (useBlock/DegrainWeight/normaliseWeights/
    Degrain_C + overlap windows + ToPixels, mvdegrainGetFrame
    MVDegrains.cpp:85-330) vs our exact-engine pipeline, byte-for-byte
    on the output frame."""
    import dataclasses
    from mvtools_tpu.degrain import DegrainConfig, degrain
    rng = np.random.default_rng(7 + overlap)
    w, h = 192, 128
    src, refb = _frames(rng, w, h)
    reff = np.clip(np.roll(refb.astype(np.int16), (-2, 4), (0, 1))
                   + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                         search=SearchType.HEX2, searchparam=2,
                         truemotion=True, chroma=False)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    thsad, limit, thscd1, thscd2 = 400, 255, 400, 130

    sp, bp, fp, op = (str(tmp_path / n) for n in
                      ("src.raw", "refb.raw", "reff.raw", "out.raw"))
    src.tofile(sp)
    refb.tofile(bp)
    reff.tofile(fp)
    m = aspec_b.meta
    args = [harness, "degrain1", str(w), str(h), str(m.pel),
            str(m.lv_count), str(sspec.hpad), str(sspec.vpad),
            str(sspec.sharp), str(sspec.rfilter),
            str(m.x_ratio_uv), str(m.y_ratio_uv),
            str(m.blk_size_x), str(m.blk_size_y),
            str(m.overlap_x), str(m.overlap_y),
            str(int(aspec_b.search)), str(aspec_b.n_search_param),
            str(aspec_b.pel_search), str(aspec_b.lambda_),
            str(aspec_b.lsad), str(aspec_b.pnew), str(aspec_b.plevel),
            str(int(aspec_b.global_)), str(aspec_b.pzero),
            str(aspec_b.pglobal), str(aspec_b.badsad),
            str(aspec_b.badrange), str(int(aspec_b.meander)),
            str(int(aspec_b.trymany)), str(int(aspec_b.search_coarse)),
            str(thsad), str(limit), str(thscd1), str(thscd2),
            sp, bp, fp, op]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    want = np.fromfile(op, np.uint8).reshape(h, w)

    s_src = mvt.build_super([jnp.asarray(src)], sspec)
    s_refb = mvt.build_super([jnp.asarray(refb)], sspec)
    s_reff = mvt.build_super([jnp.asarray(reff)], sspec)
    mv_b = mvt.analyse(s_src, s_refb, aspec_b, engine="exact")
    mv_f = mvt.analyse(s_src, s_reff, aspec_f, engine="exact")
    out = degrain([jnp.asarray(src)], [s_refb, s_reff], [mv_b, mv_f],
                  aspec_b.meta,
                  DegrainConfig(thsad=thsad, limit=limit, thscd1=thscd1,
                                thscd2=thscd2))
    got = np.asarray(out[0]).astype(np.uint8)
    np.testing.assert_array_equal(got, want, err_msg=r.stdout)


@pytest.mark.parametrize("overlap,scbehavior", [(0, True), (8, False)])
def test_golden_compensate_frame_bytes(harness, tmp_path, overlap,
                                       scbehavior):
    """Full pipeline golden: the C reference's Super -> MAnalyse ->
    MCompensate (mvcompensateGetFrame MVCompensate.c:98-360: per-block
    blit/overlap-add from the ref super with the src-super fallback when
    SAD >= thSAD, uncovered margins from scSrc) vs our compensate(),
    byte-for-byte.  thsad is set low enough that some blocks take the
    occlusion fallback path."""
    import dataclasses
    from mvtools_tpu.compensate import CompensateConfig, compensate
    rng = np.random.default_rng(11 + overlap)
    w, h = 192, 128
    src, ref = _frames(rng, w, h)
    # occlude a region so several blocks exceed thsad and fall back
    ref[40:72, 60:108] = 255 - ref[40:72, 60:108]
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                         search=SearchType.HEX2, searchparam=2,
                         truemotion=True, chroma=False)
    aspec = acfg.validate(sspec)
    thsad, thscd1, thscd2 = 300, 400, 130

    sp, rp, op = (str(tmp_path / n) for n in
                  ("src.raw", "ref.raw", "out.raw"))
    src.tofile(sp)
    ref.tofile(rp)
    m = aspec.meta
    args = [harness, "compensate", str(w), str(h), str(m.pel),
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
            str(thsad), str(thscd1), str(thscd2), str(int(scbehavior)),
            sp, rp, op]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    want = np.fromfile(op, np.uint8).reshape(h, w)

    s_src = mvt.build_super([jnp.asarray(src)], sspec)
    s_ref = mvt.build_super([jnp.asarray(ref)], sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    out = compensate(s_src, s_ref, mv, aspec.meta,
                     CompensateConfig(scbehavior=scbehavior, thsad=thsad,
                                      thscd1=thscd1, thscd2=thscd2))
    got = np.asarray(out[0]).astype(np.uint8)
    np.testing.assert_array_equal(got, want, err_msg=r.stdout)


@pytest.mark.parametrize("overlap,pel,time,ml,simple",
                         [(0, 2, 50.0, 100.0, False),
                          (8, 1, 25.0, 50.0, False),
                          (0, 2, 50.0, 100.0, True),
                          (0, 4, 25.0, 100.0, False)])
def test_golden_flowinter_frame_bytes(harness, tmp_path, overlap, pel,
                                      time, ml, simple):
    """Full Flow-family golden: the C reference's Super -> MAnalyse
    bwd/fwd -> MakeVectorSmallMasks/CheckAndPadSmallY ->
    MakeVectorOcclusionMaskTime -> SimpleResize (14-bit tables, vector
    limiting) -> Finest (Merge4PlanesToBig) -> FlowInter kernel
    (MVFlowInter.c:145-378) vs our flowinter(), byte-for-byte on the
    interpolated frame."""
    from mvtools_tpu.flowinter import FlowInterConfig, flowinter
    import dataclasses
    rng = np.random.default_rng(47 + overlap + pel)
    w, h = 192, 128
    src, ref = _frames(rng, w, h)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=pel, levels=0, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                         search=SearchType.HEX2, searchparam=2,
                         truemotion=True, chroma=False)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    time256 = int(time * 256 / 100)

    sp, rp, op = (str(tmp_path / n) for n in
                  ("src.raw", "ref.raw", "out.raw"))
    src.tofile(sp)
    ref.tofile(rp)
    m = aspec_b.meta
    args = [harness, "flowinter", str(w), str(h), str(m.pel),
            str(m.lv_count), str(sspec.hpad), str(sspec.vpad),
            str(sspec.sharp), str(sspec.rfilter),
            str(m.x_ratio_uv), str(m.y_ratio_uv),
            str(m.blk_size_x), str(m.blk_size_y),
            str(m.overlap_x), str(m.overlap_y),
            str(int(aspec_b.search)), str(aspec_b.n_search_param),
            str(aspec_b.pel_search), str(aspec_b.lambda_),
            str(aspec_b.lsad), str(aspec_b.pnew), str(aspec_b.plevel),
            str(int(aspec_b.global_)), str(aspec_b.pzero),
            str(aspec_b.pglobal), str(aspec_b.badsad),
            str(aspec_b.badrange), str(int(aspec_b.meander)),
            str(int(aspec_b.trymany)), str(int(aspec_b.search_coarse)),
            str(time256), str(ml), str(int(simple)), sp, rp, op]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    want = np.fromfile(op, np.uint8).reshape(h, w)

    s_src = mvt.build_super([jnp.asarray(src)], sspec)
    s_ref = mvt.build_super([jnp.asarray(ref)], sspec)
    mv_b = mvt.analyse(s_src, s_ref, aspec_b, engine="exact")
    mv_f = mvt.analyse(s_ref, s_src, aspec_f, engine="exact")
    cfg = FlowInterConfig(time=time, ml=ml, thscd1=16320, thscd2=255)
    if not simple:
        out = flowinter([jnp.asarray(src)], [jnp.asarray(ref)], s_src,
                        s_ref, mv_b, mv_f, m, cfg)[0]
    else:
        # the FlowFPS kernel (FlowInterSimple, incl. its special
        # time256==128 path): compose the same pipeline by hand
        from mvtools_tpu.finest import finest as make_finest
        from mvtools_tpu.flowutils import (FlowGeometry,
                                           occlusion_mask_small,
                                           small_vector_fields,
                                           upsize_mask, upsize_vectors)
        from mvtools_tpu.ops import maskfun
        geo = FlowGeometry.from_meta(m)
        vxb_s, vyb_s = small_vector_fields(mv_b, m, geo)
        vxf_s, vyf_s = small_vector_fields(mv_f, m, geo)
        mb_s = occlusion_mask_small(mv_b, m, True, ml, 256 - time256)
        mf_s = occlusion_mask_small(mv_f, m, False, ml, time256)
        vxb = upsize_vectors(vxb_s, vyb_s, m, geo, False)[0][:h, :w]
        vyb = upsize_vectors(vxb_s, vyb_s, m, geo, False)[1][:h, :w]
        vxf = upsize_vectors(vxf_s, vyf_s, m, geo, False)[0][:h, :w]
        vyf = upsize_vectors(vxf_s, vyf_s, m, geo, False)[1][:h, :w]
        mb = upsize_mask(mb_s, m, geo, False)[:h, :w]
        mf = upsize_mask(mf_s, m, geo, False)[:h, :w]
        fine_src = make_finest(s_src)
        fine_ref = make_finest(s_ref)
        oy, ox = m.vpadding * pel, m.hpadding * pel
        out = maskfun.flow_inter_simple(
            fine_ref[0].astype(jnp.int32), fine_src[0].astype(jnp.int32),
            oy, ox, vxb, vxf, vyb, vyf, mb, mf, time256,
            pel).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(out), want,
                                  err_msg=r.stdout)


