"""Tests for the Depan quartet (global-motion subsystem)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu.core.types import AnalysisMeta, MVField, MVPlaneField
from mvtools_tpu.depan import (
    DepanAnalyseConfig,
    DepanCompensateConfig,
    DepanEstimateConfig,
    DepanStabiliseConfig,
    depan_analyse,
    depan_compensate,
    depan_estimate,
    depan_stabilise,
)
from mvtools_tpu.ops import warp as warp_ops

from oracle import oracle_depan as od


F32 = np.float32


def np_tr(tr):
    return tuple(float(v) for v in tr)


# ---------------------------------------------------------------------------
# transform algebra vs oracle


def test_transform_algebra_matches_oracle():
    cases = [
        (3.5, -2.25, 0.8, 1.02, 1.0, 320.0, 240.0, True, 1.0),
        (-1.5, 4.0, -0.3, 0.98, 1.09, 100.0, 50.0, False, -0.5),
        (0.0, 0.0, 0.0, 1.0, 1.0, 64.0, 48.0, True, 1.0),
    ]
    for (dx, dy, rot, zoom, pa, xc, yc, fwd, fract) in cases:
        got = warp_ops.motion2transform(dx, dy, rot, zoom, pa, xc, yc,
                                        fwd, fract)
        want = od.motion2transform(dx, dy, rot, zoom, pa, xc, yc, fwd, fract)
        # float32 chains with different op ordering: tolerance ~1e-3
        np.testing.assert_allclose(np_tr(got), want, rtol=2e-3, atol=2e-3)

    ta = od.motion2transform(*cases[0])
    tb = od.motion2transform(*cases[1])
    got = warp_ops.sumtransform(warp_ops.Transform(*map(jnp.float32, ta)),
                                warp_ops.Transform(*map(jnp.float32, tb)))
    np.testing.assert_allclose(np_tr(got), od.sumtransform(ta, tb),
                               rtol=1e-5, atol=1e-3)

    got = warp_ops.inversetransform(warp_ops.Transform(*map(jnp.float32, ta)))
    np.testing.assert_allclose(np_tr(got), od.inversetransform(ta),
                               rtol=1e-5, atol=1e-4)


def test_transform_roundtrip():
    """motion2transform -> transform2motion recovers the motion."""
    tr = warp_ops.motion2transform(5.0, -3.0, 1.2, 1.03, 1.0, 160.0, 120.0,
                                   True, 1.0)
    dx, dy, rot, zoom = warp_ops.transform2motion(tr, True, 160.0, 120.0, 1.0)
    np.testing.assert_allclose(
        [float(dx), float(dy), float(rot), float(zoom)],
        [5.0, -3.0, 1.2, 1.03], rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# warp kernels


@pytest.mark.parametrize("subpixel", [0, 1, 2])
def test_warp_identity(subpixel):
    rng = np.random.default_rng(subpixel)
    plane = jnp.asarray(rng.integers(0, 256, (40, 56), np.uint8))
    out = warp_ops.warp_plane(plane, warp_ops.null_transform(), subpixel,
                              0, -1, 0, 255)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plane))


def test_warp_bilinear_matches_oracle_interior():
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 256, (32, 48), np.uint8)
    tr_np = od.motion2transform(1.7, -0.6, 0.4, 1.01, 1.0, 24.0, 16.0,
                                True, 1.0)
    tr = warp_ops.Transform(*map(jnp.float32, tr_np))
    got = warp_ops.warp_plane(jnp.asarray(plane), tr, 1, 0, 0, 0, 255)
    want, mask = od.warp_bilinear_interior(plane, tr_np)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int64)[mask],
                                  want[mask])


def test_warp_mirror_and_border():
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (20, 30), np.uint8)
    tr = warp_ops.null_transform()._replace(dxc=jnp.float32(-5.0))
    # xsrc = x - 5: the left 5 columns sample outside -> border fill
    out_b = np.asarray(warp_ops.warp_plane(jnp.asarray(plane), tr, 0, 0,
                                           17, 0, 255))
    assert (out_b[:, :5] == 17).all()
    np.testing.assert_array_equal(out_b[:, 5:], plane[:, :25])
    # left mirror: x = 0 -> rowleft = -5 -> mirrored to +5
    out_m = np.asarray(warp_ops.warp_plane(
        jnp.asarray(plane), tr, 0, warp_ops.MIRROR_LEFT, 17, 0, 255))
    np.testing.assert_array_equal(out_m[:, 0], plane[:, 5])
    # right side: xsrc = x + 5 -> x = 29 maps to 34 -> mirror 2*30-34-2 = 24
    tr2 = warp_ops.null_transform()._replace(dxc=jnp.float32(5.0))
    out_r = np.asarray(warp_ops.warp_plane(
        jnp.asarray(plane), tr2, 0, warp_ops.MIRROR_RIGHT, 17, 0, 255))
    np.testing.assert_array_equal(out_r[:, 29], plane[:, 24])


def test_warp_edge_blur():
    rng = np.random.default_rng(4)
    plane = rng.integers(0, 256, (10, 16), np.uint8)
    tr = warp_ops.null_transform()._replace(dxc=jnp.float32(-3.0))
    out = np.asarray(warp_ops.warp_plane(
        jnp.asarray(plane), tr, 0, warp_ops.MIRROR_LEFT, 0, 2, 255))
    # x=0 -> rowleft=-3, blurlen=min(2,3)=2, pixels [2..3] averaged
    want = (plane[:, 2].astype(int) + plane[:, 3].astype(int)) // 2
    np.testing.assert_array_equal(out[:, 0], want)


# ---------------------------------------------------------------------------
# DepanAnalyse


def _uniform_field(nbx, nby, vx, vy, sad=100):
    meta = AnalysisMeta(
        blk_size_x=8, blk_size_y=8, pel=2, lv_count=1, delta_frame=1,
        is_backward=False, motion_flags=0, width=nbx * 8, height=nby * 8,
        overlap_x=0, overlap_y=0, blk_x=nbx, blk_y=nby, bits_per_sample=8,
        y_ratio_uv=2, x_ratio_uv=2, hpadding=16, vpadding=16)
    lvl = MVPlaneField(jnp.full((nby, nbx), vx, jnp.int32),
                       jnp.full((nby, nbx), vy, jnp.int32),
                       jnp.full((nby, nbx), sad, jnp.int64))
    return MVField((lvl,), jnp.ones((), jnp.int32), meta), meta


def test_depan_analyse_translation():
    mv, meta = _uniform_field(12, 10, 8, -4)   # pel=2 -> dx=4, dy=-2
    dx, dy, zoom, rot = depan_analyse(mv, meta, DepanAnalyseConfig())
    assert abs(float(dx) - 4.0) < 0.05
    assert abs(float(dy) + 2.0) < 0.05
    assert abs(float(zoom) - 1.0) < 0.01
    assert abs(float(rot)) < 0.5


def test_depan_analyse_scene_change_returns_null():
    mv, meta = _uniform_field(12, 10, 8, -4, sad=10 ** 9)
    # huge SADs -> not usable -> null motion
    dx, dy, zoom, rot = depan_analyse(mv, meta, DepanAnalyseConfig())
    assert float(dx) == 0.0 and float(dy) == 0.0
    assert float(zoom) == 1.0 and float(rot) == 0.0


def test_depan_analyse_zoom_field():
    """A radial field ~ (x - xc) * s should be read as zoom.  The grid
    must be large enough that blocks outside the 4-wide ignored border
    (RejectBadBlocks MVDepan.cpp:207-208) carry non-zero vectors."""
    nbx = nby = 24
    meta = AnalysisMeta(
        blk_size_x=8, blk_size_y=8, pel=1, lv_count=1, delta_frame=1,
        is_backward=False, motion_flags=0, width=nbx * 8, height=nby * 8,
        overlap_x=0, overlap_y=0, blk_x=nbx, blk_y=nby, bits_per_sample=8,
        y_ratio_uv=2, x_ratio_uv=2, hpadding=16, vpadding=16)
    xc, yc = meta.width / 2, meta.height / 2
    jj, ii = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    bx = ii * 8 + 4
    by = jj * 8 + 4
    scale = 0.05
    vx = np.round((bx - xc) * scale).astype(np.int32)
    vy = np.round((by - yc) * scale).astype(np.int32)
    lvl = MVPlaneField(jnp.asarray(vx), jnp.asarray(vy),
                       jnp.full((nby, nbx), 50, jnp.int64))
    mv = MVField((lvl,), jnp.ones((), jnp.int32), meta)
    dx, dy, zoom, rot = depan_analyse(mv, meta, DepanAnalyseConfig())
    assert abs(float(zoom) - (1 + scale)) < 0.02
    assert abs(float(rot)) < 0.3


# ---------------------------------------------------------------------------
# DepanEstimate


def test_depan_estimate_translation():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(96, 128)).astype(np.float32)
    # low-pass so the correlation peak is well-defined
    k = np.ones((5, 5), np.float32) / 25
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(base, 2, mode="wrap")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (5, 5)), k)
    base = (base - base.min()) / (base.max() - base.min()) * 255

    frames = [np.roll(np.roll(base, -2 * t, axis=0), -3 * t, axis=1)
              for t in range(4)]
    dx, dy, zoom, trust = depan_estimate(
        jnp.asarray(np.stack(frames)), DepanEstimateConfig(trust=0.01))
    # content moved by (-3, -2) per frame; the reference convention
    # (conj(cur)*prev, MVDepan.cpp:681-697) reports +3, +2 — the pan of
    # the camera, not of the content
    np.testing.assert_allclose(np.asarray(dx)[1:], 3.0, atol=0.2)
    np.testing.assert_allclose(np.asarray(dy)[1:], 2.0, atol=0.2)
    assert float(dx[0]) == 0.0 and float(zoom[1]) == 1.0


def test_depan_estimate_window_geometry():
    cfg = DepanEstimateConfig()
    winx, winy, wleft, wtop, dxmax, dymax = cfg.resolve(720, 480)
    assert winx == 512 and winy == 256           # max pow2 fitting
    assert wleft == (720 - 512) // 2 and wtop == (480 - 256) // 2
    assert dxmax == 128 and dymax == 64
    cfg2 = DepanEstimateConfig(zoommax=1.2)
    winx2, _, wleft2, _, _, _ = cfg2.resolve(720, 480)
    assert winx2 == 256                          # split for zoom windows
    assert wleft2 == (720 - 512) // 4


# ---------------------------------------------------------------------------
# DepanCompensate / DepanStabilise


def test_depan_compensate_shifts_frame():
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 256, (48, 64), np.uint8)
    motions = np.zeros((4, 4), F32)
    motions[:, 2] = 1.0
    motions[2, 0] = 3.0      # frame 2 moved +3 px in x vs frame 1
    cfg = DepanCompensateConfig(offset=1.0, subpixel=0)
    out = depan_compensate([jnp.asarray(plane)], motions, ndest=2,
                           num_frames=4, cfg=cfg)
    got = np.asarray(out[0])
    # forward compensation moves the src (frame 1) onto frame 2's position
    np.testing.assert_array_equal(got[:, :-3], plane[:, 3:])


def test_depan_compensate_offset_zero_passthrough():
    plane = jnp.asarray(np.arange(48 * 64, dtype=np.uint8).reshape(48, 64))
    motions = np.zeros((3, 4), F32)
    motions[:, 2] = 1.0
    out = depan_compensate([plane], motions, 1, 3,
                           DepanCompensateConfig(offset=0.0))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(plane))


@pytest.mark.parametrize("method", [0, 1])
def test_depan_stabilise_constant_pan(method):
    """A constant pan should be (partially) smoothed; output must stay
    the right shape/dtype and not blow up."""
    rng = np.random.default_rng(9)
    frames = [[jnp.asarray(rng.integers(0, 256, (48, 64), np.uint8))]
              for _ in range(8)]
    motions = np.zeros((8, 4), F32)
    motions[:, 2] = 1.0
    motions[1:, 0] = 2.0
    cfg = DepanStabiliseConfig(method=method, fps=25.0)
    outs = depan_stabilise(frames, motions, cfg)
    assert len(outs) == 8
    for f in outs:
        arr = np.asarray(f[0])
        assert arr.shape == (48, 64) and arr.dtype == np.uint8


def test_depan_stabilise_static_clip_is_identity_interior():
    """Zero motion -> trdif stays identity (no initzoom) -> frames pass
    through untouched."""
    rng = np.random.default_rng(2)
    frames = [[jnp.asarray(rng.integers(0, 256, (32, 40), np.uint8))]
              for _ in range(5)]
    motions = np.zeros((5, 4), F32)
    motions[:, 2] = 1.0
    outs = depan_stabilise(frames, motions,
                           DepanStabiliseConfig(method=1, fps=25.0))
    for fin, fout in zip(frames, outs):
        np.testing.assert_array_equal(np.asarray(fout[0]),
                                      np.asarray(fin[0]))


def test_depan_stabilise_scene_change_resets_base():
    rng = np.random.default_rng(11)
    frames = [[jnp.asarray(rng.integers(0, 256, (32, 40), np.uint8))]
              for _ in range(6)]
    motions = np.zeros((6, 4), F32)
    motions[:, 2] = 1.0
    motions[1:, 0] = 5.0
    motions[3, 0] = 0.0   # MOTIONBAD at frame 3 = scene change
    outs = depan_stabilise(frames, motions,
                           DepanStabiliseConfig(method=0, fps=25.0))
    # frame 3 is a new base -> identity transform -> passthrough
    np.testing.assert_array_equal(np.asarray(outs[3][0]),
                                  np.asarray(frames[3][0]))


def test_depan_estimate_show_surface():
    """`show` debug view: window region replaced by the normalized
    correlation surface whose peak sits at the known shift
    (showcorrelation MVDepan.cpp:895-952)."""
    from mvtools_tpu.depan import depan_estimate_show

    rng = np.random.default_rng(9)
    base = rng.normal(size=(96, 128)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(base, 2, mode="wrap")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (5, 5)), k)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    frames = np.stack([base, np.roll(base, (-2, -3), (0, 1))]
                      ).astype(np.uint8)
    cfg = DepanEstimateConfig(trust=0.01)
    shown, dx, dy, zoom, trust = depan_estimate_show(jnp.asarray(frames),
                                                     cfg)
    assert shown.shape == frames.shape
    winx, winy, wleft, wtop, _, _ = cfg.resolve(128, 96)
    win = np.asarray(shown)[1, wtop:wtop + winy, wleft:wleft + winx]
    assert win.max() == 255          # normalized to pixel_max
    jpk, ipk = np.unravel_index(win.argmax(), win.shape)
    # peak at (dy, dx) = (+2, +3), wrapped into window coords
    assert ipk % winx == 3 and jpk % winy == 2
    # frame 0 window is rendered too (all-equal surface for frame 0 is
    # degenerate, just check shape/range)
    assert np.asarray(shown)[0].shape == (96, 128)
    # info strings
    from mvtools_tpu.depan import depan_estimate_info
    s = depan_estimate_info(1, float(dx[1]), float(dy[1]), float(zoom[1]),
                            float(trust[1]))
    assert s.startswith("fn=1 dx=3.0") or s.startswith("fn=1 dx=2.9")
