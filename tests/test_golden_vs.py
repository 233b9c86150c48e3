"""Flow-family goldens driven through the reference's OWN filter code:
golden_vs compiles MVFlowFPS.c / MVBlockFPS.c / MVFlowBlur.c (plus the
FlowFPSHelper and Finest internals) in place and runs their Create +
GetFrame under a miniature synchronous VapourSynth core — so these
byte-parity tests cover the filters' full frame assembly, not just the
kernels."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
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
TIME256 = 128          # golden_vs num_mult=2, output frame n=3


@pytest.fixture(scope="module")
def golden_vs():
    r = subprocess.run(["make", "-C", HARNESS_DIR, "golden_vs"],
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(GOLDEN_VS):
        pytest.skip(f"golden_vs build failed: {r.stderr[-500:]}")
    return GOLDEN_VS


@pytest.fixture(scope="module")
def clip_and_fields():
    """Shared frames + supers + the four exact-engine MV fields the
    flow filters consume around the (NLEFT, NRIGHT) pair."""
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

    fmt = VideoFormat(W, H, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=3, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=16, levels=3, search=SearchType.HEX2,
                          searchparam=2, truemotion=True,
                          chroma=False).validate(sspec)
    sups = [mvt.build_super([jnp.asarray(f)], sspec) for f in frames]

    def an(i, j):
        return mvt.analyse(sups[i], sups[j], aspec, engine="exact")

    # golden_vs mv nodes: mvbw frame n = search(n, n+1), mvfw frame n =
    # search(n, n-1); FlowFPS consumes mvB=mvbw@nleft, mvF=mvfw@nright,
    # and for maskmode 2 mvFF=mvfw@nleft, mvBB=mvbw@nright
    fields = {
        "mv_b": an(NLEFT, NRIGHT),
        "mv_f": an(NRIGHT, NLEFT),
        "mv_ff": an(NLEFT, NLEFT - 1),
        "mv_bb": an(NRIGHT, NRIGHT + 1),
        # FlowBlur at n: mvbw@(n-1) = search(n-1, n) and mvfw@(n+1) =
        # search(n+1, n) (MVFlowBlur.c:152-181, off=1)
        "fb_b": an(NLEFT - 1, NLEFT),
        "fb_f": an(NLEFT + 1, NLEFT),
    }
    return frames, sspec, aspec, sups, fields


def _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec, mode,
                   mode_args):
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
    return np.fromfile(out, np.uint8).reshape(H, W)


@pytest.mark.parametrize("maskmode", [0, 1, 2])
def test_golden_flowfps_frame(golden_vs, tmp_path, clip_and_fields,
                              maskmode):
    """FlowFPS at time256=128 byte-exact vs the reference filter
    (MVFlowFPS.c:86-524 + MVFlowFPSHelper.c full-res vector props)."""
    frames, sspec, aspec, sups, f = clip_and_fields
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "flowfps", [2, 3, maskmode, 100.0, 0])

    from mvtools_tpu.flowfps import FlowFPSConfig, flowfps_frame
    cfg = FlowFPSConfig(maskmode=maskmode, ml=100.0, blend=False)
    got = flowfps_frame(
        [jnp.asarray(frames[NLEFT])], [jnp.asarray(frames[NRIGHT])],
        sups[NLEFT], sups[NRIGHT], f["mv_b"], f["mv_f"], aspec.meta,
        cfg, TIME256,
        mv_bb=f["mv_bb"] if maskmode == 2 else None,
        mv_ff=f["mv_ff"] if maskmode == 2 else None)[0]
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 8])
def test_golden_blockfps_frame(golden_vs, tmp_path, clip_and_fields,
                               mode):
    """BlockFPS result modes byte-exact vs the reference filter
    (MVBlockFPS.c:117-228 ResultBlock + the MC block assembly)."""
    frames, sspec, aspec, sups, f = clip_and_fields
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "blockfps", [2, 3, mode, 100.0, 0])

    from mvtools_tpu.blockfps import BlockFPSConfig, blockfps_frame
    cfg = BlockFPSConfig(mode=mode, ml=100.0, blend=False)
    got = blockfps_frame(
        [jnp.asarray(frames[NLEFT])], [jnp.asarray(frames[NRIGHT])],
        sups[NLEFT], sups[NRIGHT], f["mv_b"], f["mv_f"], aspec.meta,
        cfg, TIME256)[0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_golden_flowblur_frame(golden_vs, tmp_path, clip_and_fields):
    """FlowBlur path-sum blur byte-exact vs the reference filter
    (MVFlowBlur.c:72-130)."""
    frames, sspec, aspec, sups, f = clip_and_fields
    n = NLEFT
    want = _run_golden_vs(golden_vs, tmp_path, frames, sspec, aspec,
                          "flowblur", [50.0, 1, n])

    from mvtools_tpu.flowblur import FlowBlurConfig, flowblur
    cfg = FlowBlurConfig(blur=50.0, prec=1)
    got = flowblur([jnp.asarray(frames[n])], sups[n],
                   f["fb_b"], f["fb_f"], aspec.meta, cfg)[0]
    np.testing.assert_array_equal(np.asarray(got), want)
