import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import SuperConfig, build_super
from mvtools_tpu.core.types import ColorFamily, VideoFormat

from oracle import oracle_frame as of


def make_plane(rng, h, w, bits):
    if bits <= 8:
        return rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return rng.integers(0, 1 << bits, size=(h, w), dtype=np.uint16)


@pytest.mark.parametrize("pel", [1, 2, 4])
@pytest.mark.parametrize("sharp", [0, 1, 2])
def test_super_gray_subpel(pel, sharp):
    rng = np.random.default_rng(42 + pel * 10 + sharp)
    h, w = 48, 64
    plane = make_plane(rng, h, w, 8)
    cfg = SuperConfig(pel=pel, sharp=sharp, levels=3, rfilter=2)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sup = build_super([jnp.asarray(plane)], cfg, fmt)
    spec = sup.spec
    assert spec.levels == 3

    subplanes, coarse = of.build_super_plane(
        plane, 16, 16, pel, 3, sharp, 2, 1, 1, 8)
    got0 = np.asarray(sup.planes[0][0])
    assert got0.shape[0] == pel * pel
    for idx in range(pel * pel):
        np.testing.assert_array_equal(
            got0[idx], subplanes[idx].astype(np.uint8),
            err_msg=f"subplane {idx} (pel={pel}, sharp={sharp})")
    for lv in range(1, 3):
        np.testing.assert_array_equal(
            np.asarray(sup.planes[0][lv]), coarse[lv - 1].astype(np.uint8),
            err_msg=f"level {lv}")


@pytest.mark.parametrize("rfilter", [0, 1, 2, 3, 4])
def test_super_reduce_filters(rfilter):
    rng = np.random.default_rng(7 + rfilter)
    # Odd dimensions exercise the beyond-region reads.
    h, w = 47, 61
    plane = make_plane(rng, h, w, 8)
    cfg = SuperConfig(pel=1, rfilter=rfilter, levels=0)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sup = build_super([jnp.asarray(plane)], cfg, fmt)
    levels = sup.spec.levels

    _, coarse = of.build_super_plane(plane, 16, 16, 1, levels, 2, rfilter, 1, 1, 8)
    for lv in range(1, levels):
        np.testing.assert_array_equal(
            np.asarray(sup.planes[0][lv]), coarse[lv - 1].astype(np.uint8),
            err_msg=f"rfilter={rfilter} level {lv}")


@pytest.mark.parametrize("family,bits", [
    (ColorFamily.YUV420, 8),
    (ColorFamily.YUV422, 10),
    (ColorFamily.YUV444, 16),
])
def test_super_yuv(family, bits):
    rng = np.random.default_rng(3)
    h, w = 48, 64
    fmt = VideoFormat(w, h, bits, family)
    y = make_plane(rng, h, w, bits)
    u = make_plane(rng, h // fmt.y_ratio_uv, w // fmt.x_ratio_uv, bits)
    v = make_plane(rng, h // fmt.y_ratio_uv, w // fmt.x_ratio_uv, bits)
    cfg = SuperConfig(pel=2, levels=2, rfilter=4, sharp=2)
    sup = build_super([jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)], cfg, fmt)
    assert sup.num_planes == 3

    np_dtype = np.uint8 if bits <= 8 else np.uint16
    subs_y, coarse_y = of.build_super_plane(y, 16, 16, 2, 2, 2, 4, 1, 1, bits)
    np.testing.assert_array_equal(np.asarray(sup.planes[0][0][3]),
                                  subs_y[3].astype(np_dtype))
    np.testing.assert_array_equal(np.asarray(sup.planes[0][1]),
                                  coarse_y[0].astype(np_dtype))

    subs_u, coarse_u = of.build_super_plane(
        u, 16 // fmt.x_ratio_uv, 16 // fmt.y_ratio_uv, 2, 2, 2, 4,
        fmt.x_ratio_uv, fmt.y_ratio_uv, bits, is_luma=False)
    np.testing.assert_array_equal(np.asarray(sup.planes[1][0][1]),
                                  subs_u[1].astype(np_dtype))
    np.testing.assert_array_equal(np.asarray(sup.planes[1][1]),
                                  coarse_u[0].astype(np_dtype))


def test_super_pelclip_import():
    rng = np.random.default_rng(11)
    h, w = 32, 40
    plane = make_plane(rng, h, w, 8)
    pel_plane = make_plane(rng, h * 2, w * 2, 8)
    cfg = SuperConfig(pel=2, levels=1)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sup = build_super([jnp.asarray(plane)], cfg, fmt,
                      pel_planes=[jnp.asarray(pel_plane)])
    got = np.asarray(sup.planes[0][0])
    # plane 1 = odd columns, even rows of the pel clip, replicate-padded
    expected = of.pad_replicate(pel_plane[0::2, 1::2], 16, 16)
    np.testing.assert_array_equal(got[1], expected.astype(np.uint8))
    expected2 = of.pad_replicate(pel_plane[1::2, 0::2], 16, 16)
    np.testing.assert_array_equal(got[2], expected2.astype(np.uint8))


def test_levels_max_matches_reference_formula():
    from mvtools_tpu.core import geometry as g
    # 1080p luma, 420, pad 16: the well-known mvtools level count
    assert g.super_levels_max(1920, 1080, 2, 2, 16, 16) > 5
    assert g.plane_width_luma(1920, 1, 2, 16) == 960
    assert g.plane_height_luma(1080, 1, 2, 16) == 540
