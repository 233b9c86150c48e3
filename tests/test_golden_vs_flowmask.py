"""mv.Flow / mv.Mask / overlapped-BlockFPS goldens vs the reference's
OWN filters (MVFlow.cpp, MVMask.c, MVBlockFPS.c compiled in place, run
through the vs_mini core) — closes VERDICT r4 missing #2/#3."""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import mvtools_tpu as mvt
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat

HARNESS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_harness")
GOLDEN_VS = os.path.join(HARNESS_DIR, "golden_vs")

W, H, T = 224, 160, 4
NLEFT, NRIGHT = 1, 2
TIME256 = 128


@pytest.fixture(scope="module")
def golden_vs():
    r = subprocess.run(["make", "-C", HARNESS_DIR, "golden_vs"],
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(GOLDEN_VS):
        pytest.skip(f"golden_vs build failed: {r.stderr[-500:]}")
    return GOLDEN_VS


def _make_frames():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (H, W)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    k = np.ones((3, 3), np.float32) / 9
    pad = np.pad(base, 1, mode="edge")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (3, 3)), k)
    frames = []
    for i in range(T):
        f = np.clip(np.roll(base, (2 * i, -3 * i), (0, 1))
                    + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
        frames.append(f)
    return frames


def _build(overlap):
    frames = _make_frames()
    fmt = VideoFormat(W, H, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=3, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=3, search=SearchType.HEX2,
                         searchparam=2, truemotion=True, chroma=False,
                         overlap=overlap)
    # the mask golden reads meta.is_backward (MVMask.c kind 2 uses the
    # vector clip's isBackward), so the isb flag must match the harness's
    # mvbw/mvfw nodes
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    sups = [mvt.build_super([jnp.asarray(f)], sspec) for f in frames]

    fields = {
        "mv_b": mvt.analyse(sups[NLEFT], sups[NRIGHT], aspec_b,
                            engine="exact"),     # mvbw @ NLEFT
        "mv_f": mvt.analyse(sups[NRIGHT], sups[NLEFT], aspec_f,
                            engine="exact"),     # mvfw @ NRIGHT
    }
    return frames, sspec, aspec_b, sups, fields


@pytest.fixture(scope="module")
def clip_ov0():
    return _build(0)


@pytest.fixture(scope="module")
def clip_ov8():
    return _build(8)


def _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec, mode,
                   mode_args, out_size=W * H):
    paths = []
    for i, f in enumerate(frames):
        p = str(tmp_path / f"f{i}.raw")
        f.tofile(p)
        paths.append(p)
    out = str(tmp_path / "out.raw")
    m = aspec.meta
    args = [golden_vs, mode, str(W), str(H), str(m.pel),
            str(m.lv_count), str(sspec.hpad), str(sspec.vpad),
            str(sspec.sharp), str(sspec.rfilter), str(m.x_ratio_uv),
            str(m.y_ratio_uv), str(m.blk_size_x), str(m.blk_size_y),
            str(m.overlap_x), str(m.overlap_y), str(int(aspec.search)),
            str(aspec.n_search_param), str(aspec.pel_search),
            str(aspec.lambda_), str(aspec.lsad), str(aspec.pnew),
            str(aspec.plevel), str(int(aspec.global_)), str(aspec.pzero),
            str(aspec.pglobal), str(aspec.badsad), str(aspec.badrange),
            str(int(aspec.meander)), str(int(aspec.trymany)),
            str(int(aspec.search_coarse)), str(T)] + paths \
        + [str(a) for a in mode_args] + [out]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    return np.fromfile(out, np.uint8)


@pytest.mark.parametrize("fmode,time", [(0, 100.0), (1, 100.0),
                                        (0, 50.0), (1, 50.0)])
def test_golden_flow_frame(golden_vs, tmp_path, clip_ov0, fmode, time):
    """mv.Flow fetch/shift byte-exact vs the reference filter
    (MVFlow.cpp:93-148 flowFetch/flowShift + the full-res vector
    upsizing at :266-340)."""
    frames, sspec, aspec, sups, f = clip_ov0
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "flow", [time, fmode, 1, NLEFT]).reshape(H, W)

    from mvtools_tpu.flow import FlowConfig, flow
    cfg = FlowConfig(time=time, mode=fmode)
    got = flow([jnp.asarray(frames[NLEFT])], sups[NRIGHT], f["mv_b"],
               aspec.meta, cfg)[0]
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("kind,ml,gamma,time", [
    (0, 100.0, 1.0, 100.0), (1, 100.0, 1.0, 100.0),
    (1, 50.0, 1.0, 50.0), (2, 100.0, 1.0, 100.0),
    (2, 100.0, 1.5, 100.0), (3, 100.0, 1.0, 100.0),
    (4, 100.0, 1.0, 100.0), (5, 100.0, 1.0, 100.0)])
def test_golden_mask_frame(golden_vs, tmp_path, clip_ov0, kind, ml,
                           gamma, time):
    """mv.Mask kinds 0-5 byte-exact vs the reference filter (MVMask.c
    :139-205: small-mask build + SimpleResize upsizing + margins).
    Gray input -> YUV444P8: all three planes compared."""
    frames, sspec, aspec, sups, f = clip_ov0
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "mask", [ml, gamma, kind, time, 0, NLEFT],
                          out_size=W * H * 3).reshape(3, H, W)

    from mvtools_tpu.mask import MaskConfig, mask
    cfg = MaskConfig(ml=ml, gamma=gamma, kind=kind, time=time)
    got = mask([jnp.asarray(frames[NLEFT])], f["mv_b"], aspec.meta, cfg)
    np.testing.assert_array_equal(
        np.stack([np.asarray(p) for p in got]), want)


@pytest.mark.parametrize("mode", [0, 3, 6, 7])
def test_golden_blockfps_overlap(golden_vs, tmp_path, clip_ov8, mode):
    """BlockFPS with OVERLAPPED vectors byte-exact vs the reference's
    windowed overlap-add assembly (MVBlockFPS.c:518-610) — modes 6/7
    were the untested SAD-mask variants (VERDICT r4 missing #3)."""
    frames, sspec, aspec, sups, f = clip_ov8
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "blockfps", [2, 3, mode, 100.0, 0]
                          ).reshape(H, W)

    from mvtools_tpu.blockfps import BlockFPSConfig, blockfps_frame
    cfg = BlockFPSConfig(mode=mode, ml=100.0, blend=False)
    got = blockfps_frame(
        [jnp.asarray(frames[NLEFT])], [jnp.asarray(frames[NRIGHT])],
        sups[NLEFT], sups[NRIGHT], f["mv_b"], f["mv_f"], aspec.meta,
        cfg, TIME256)[0]
    np.testing.assert_array_equal(np.asarray(got), want)
