"""Golden interop vs the reference C: YUV420 chroma pipelines +
usability gate (split from test_golden.py)."""

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


@pytest.mark.parametrize("overlap,pel", [(0, 2), (8, 1)])
def test_golden_yuv_analyse_blob(harness, tmp_path, overlap, pel):
    """Chroma motion search golden: the C reference's YUV420 Super +
    gopSearchMVs with MOTION_USE_CHROMA_MOTION (chroma SADs via the
    pobGetRefBlockU/V negative-bias rounding, PlaneOfBlocks.cpp:57-77)
    vs our analyse(chroma=True, engine="exact"), byte-for-byte."""
    rng = np.random.default_rng(61 + overlap + pel)
    w, h = 192, 128
    src_y, ref_y = _frames(rng, w, h)
    src_u, ref_u = _frames(rng, w // 2, h // 2)
    src_v, ref_v = _frames(rng, w // 2, h // 2)
    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    sspec = SuperConfig(pel=pel, levels=0, chroma=True).validate(fmt)
    aspec = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                          search=SearchType.HEX2, searchparam=2,
                          truemotion=True, chroma=True).validate(sspec)

    paths = {}
    for name, arr in (("sy", src_y), ("su", src_u), ("sv", src_v),
                      ("ry", ref_y), ("ru", ref_u), ("rv", ref_v)):
        paths[name] = str(tmp_path / f"{name}.raw")
        arr.tofile(paths[name])
    op = str(tmp_path / "vec.bin")
    m = aspec.meta
    args = [harness, "yuvanalyse", str(w), str(h), str(m.pel),
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
            paths["sy"], paths["su"], paths["sv"],
            paths["ry"], paths["ru"], paths["rv"], op]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(op, "rb") as f:
        blob = f.read()

    s_src = mvt.build_super(
        [jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v)],
        sspec)
    s_ref = mvt.build_super(
        [jnp.asarray(ref_y), jnp.asarray(ref_u), jnp.asarray(ref_v)],
        sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    want = decode_mv_field(blob, aspec.meta)
    for lv in range(len(mv.levels)):
        for k in ("x", "y", "sad"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mv.levels[lv], k)),
                np.asarray(getattr(want.levels[lv], k)),
                err_msg=f"level {lv} {k}")
    assert encode_mv_field(mv) == blob


@pytest.mark.parametrize("overlap", [0, 8])
def test_golden_yuv_degrain1_frame_bytes(harness, tmp_path, overlap):
    """Chroma MDegrain1 golden: YUV420 supers + chroma MAnalyse bwd/fwd
    + the reference's per-plane degrain loop (useBlock chroma halving,
    thSADC, per-plane overlap windows, MVDegrains.cpp:179-330) vs our
    degrain() on all three planes, byte-for-byte."""
    from mvtools_tpu.degrain import DegrainConfig, degrain
    import dataclasses
    rng = np.random.default_rng(71 + overlap)
    w, h = 192, 128
    src_y, junk = _frames(rng, w, h)
    refb_y, reff_y = _frames(rng, w, h)
    src_u, refb_u = _frames(rng, w // 2, h // 2)
    src_v, reff_u = _frames(rng, w // 2, h // 2)
    reff_v, refb_v = _frames(rng, w // 2, h // 2)
    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    sspec = SuperConfig(pel=2, levels=0, chroma=True).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                         search=SearchType.HEX2, searchparam=2,
                         truemotion=True, chroma=True)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    thsad, thsadc, thscd1, thscd2 = 300, 220, 400, 130

    files = {}
    for name, arr in (("sy", src_y), ("su", src_u), ("sv", src_v),
                      ("by", refb_y), ("bu", refb_u), ("bv", refb_v),
                      ("fy", reff_y), ("fu", reff_u), ("fv", reff_v)):
        files[name] = str(tmp_path / f"{name}.raw")
        arr.tofile(files[name])
    outs = [str(tmp_path / f"o{p}.raw") for p in "yuv"]
    m = aspec_b.meta
    args = [harness, "yuvdegrain1", str(w), str(h), str(m.pel),
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
            str(thsad), str(thsadc), str(thscd1), str(thscd2),
            files["sy"], files["su"], files["sv"],
            files["by"], files["bu"], files["bv"],
            files["fy"], files["fu"], files["fv"]] + outs
    r = subprocess.run(args, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    want = [np.fromfile(outs[0], np.uint8).reshape(h, w),
            np.fromfile(outs[1], np.uint8).reshape(h // 2, w // 2),
            np.fromfile(outs[2], np.uint8).reshape(h // 2, w // 2)]

    src = [jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v)]
    s_src = mvt.build_super(src, sspec)
    s_b = mvt.build_super([jnp.asarray(refb_y), jnp.asarray(refb_u),
                           jnp.asarray(refb_v)], sspec)
    s_f = mvt.build_super([jnp.asarray(reff_y), jnp.asarray(reff_u),
                           jnp.asarray(reff_v)], sspec)
    mv_b = mvt.analyse(s_src, s_b, aspec_b, engine="exact")
    mv_f = mvt.analyse(s_src, s_f, aspec_f, engine="exact")
    dcfg = DegrainConfig(thsad=thsad, thsadc=thsadc, thscd1=thscd1,
                         thscd2=thscd2)
    out = degrain(src, [s_b, s_f], [mv_b, mv_f], aspec_b.meta, dcfg)
    for p in range(3):
        np.testing.assert_array_equal(np.asarray(out[p]), want[p],
                                      err_msg=f"plane {p}: {r.stdout}")


@pytest.mark.parametrize("overlap,time", [(0, 100.0), (8, 50.0)])
def test_golden_yuv_compensate_frame_bytes(harness, tmp_path, overlap,
                                           time):
    """Chroma MCompensate golden: YUV420 supers + chroma MAnalyse +
    the reference's per-plane blit/overlap assembly with the
    time256-scaled vectors and subsampling-shifted chroma positions
    (MVCompensate.c:227-320) vs our compensate(), byte-for-byte."""
    from mvtools_tpu.compensate import CompensateConfig, compensate
    rng = np.random.default_rng(83 + overlap)
    w, h = 192, 128
    src_y, ref_y = _frames(rng, w, h)
    src_u, ref_u = _frames(rng, w // 2, h // 2)
    src_v, ref_v = _frames(rng, w // 2, h // 2)
    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    sspec = SuperConfig(pel=2, levels=0, chroma=True).validate(fmt)
    aspec = AnalyseConfig(blksize=16, levels=0, overlap=overlap,
                          search=SearchType.HEX2, searchparam=2,
                          truemotion=True, chroma=True).validate(sspec)
    thsad, thscd1, thscd2 = 700, 16320, 255
    time256 = int(time * 256 / 100)

    files = {}
    for name, arr in (("sy", src_y), ("su", src_u), ("sv", src_v),
                      ("ry", ref_y), ("ru", ref_u), ("rv", ref_v)):
        files[name] = str(tmp_path / f"{name}.raw")
        arr.tofile(files[name])
    outs = [str(tmp_path / f"o{p}.raw") for p in "yuv"]
    m = aspec.meta
    args = [harness, "yuvcompensate", str(w), str(h), str(m.pel),
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
            str(thsad), str(thscd1), str(thscd2), str(time256),
            files["sy"], files["su"], files["sv"],
            files["ry"], files["ru"], files["rv"]] + outs
    r = subprocess.run(args, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    want = [np.fromfile(outs[0], np.uint8).reshape(h, w),
            np.fromfile(outs[1], np.uint8).reshape(h // 2, w // 2),
            np.fromfile(outs[2], np.uint8).reshape(h // 2, w // 2)]

    src = [jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v)]
    s_src = mvt.build_super(src, sspec)
    s_ref = mvt.build_super([jnp.asarray(ref_y), jnp.asarray(ref_u),
                             jnp.asarray(ref_v)], sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    ccfg = CompensateConfig(thsad=thsad, thscd1=thscd1, thscd2=thscd2,
                            time=time)
    out = compensate(s_src, s_ref, mv, aspec.meta, ccfg)
    for p in range(3):
        np.testing.assert_array_equal(np.asarray(out[p]), want[p],
                                      err_msg=f"plane {p}: {r.stdout}")


def test_golden_usable_gate(harness, tmp_path):
    """Scene-change / usability gate golden: the C fgopIsUsable with
    scaleThSCD normalisation (MVAnalysisData.c:7-31, Fakery.c:52-58,
    :144-146) vs our scale_thscd + is_usable across thresholds that
    straddle the scene-change boundary."""
    from mvtools_tpu.core.thscd import is_usable, scale_thscd
    rng = np.random.default_rng(97)
    w, h = 192, 128
    src, _ = _frames(rng, w, h)
    ref = rng.integers(0, 256, (h, w)).astype(np.uint8)   # unrelated
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=16, levels=0,
                          search=SearchType.HEX2, searchparam=2,
                          truemotion=True, chroma=False).validate(sspec)
    sp, rp = str(tmp_path / "s.raw"), str(tmp_path / "r.raw")
    src.tofile(sp)
    ref.tofile(rp)
    pairs = [(400, 130), (16320, 255), (100, 1), (4000, 200)]
    m = aspec.meta
    args = [harness, "usable", str(w), str(h), str(m.pel),
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
            sp, rp] + [str(v) for p_ in pairs for v in p_]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    got = {}
    for line in r.stdout.splitlines():
        parts = line.split()
        if parts[:1] == ["usable"]:
            got[(int(parts[1]), int(parts[2]))] = int(parts[4])

    s_src = mvt.build_super([jnp.asarray(src)], sspec)
    s_ref = mvt.build_super([jnp.asarray(ref)], sspec)
    mv = mvt.analyse(s_src, s_ref, aspec, engine="exact")
    seen_states = set()
    for t1, t2 in pairs:
        n1, n2 = scale_thscd(t1, t2, m, "test")
        ours = int(bool(is_usable(mv, n1, n2)))
        assert ours == got[(t1, t2)], (t1, t2, ours, got)
        seen_states.add(ours)
    assert seen_states == {0, 1}, "thresholds straddle the boundary"
