"""Golden interop vs the reference C: core analyse blobs + super
pyramid (split from test_golden.py for xdist wall-clock)."""

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


def test_golden_config1_single_level_exhaustive(harness, tmp_path):
    """BASELINE config 1: 16x16 blocks, SAD cost, single-level full-pel
    exhaustive search, grayscale (smaller frame, same settings)."""
    _check_config(harness, tmp_path, 320, 192,
                  SuperConfig(pel=1, levels=1, chroma=False),
                  AnalyseConfig(blksize=16, levels=1,
                                search=SearchType.EXHAUSTIVE,
                                searchparam=4, truemotion=True,
                                chroma=False),
                  seed=0)


def test_golden_config2_hierarchical_hex_pel4(harness, tmp_path):
    """BASELINE config 2: full pyramid, hexagon search, quarter-pel."""
    _check_config(harness, tmp_path, 320, 192,
                  SuperConfig(pel=4, levels=0, chroma=False),
                  AnalyseConfig(blksize=16, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False),
                  seed=1)


@pytest.mark.parametrize("search,param", [
    (SearchType.ONETIME, 2), (SearchType.NSTEP, 2),
    (SearchType.LOGARITHMIC, 2), (SearchType.UMH, 4),
    (SearchType.HORIZONTAL, 3), (SearchType.VERTICAL, 3)])
def test_golden_search_types(harness, tmp_path, search, param):
    """Every remaining search algorithm (PlaneOfBlocks.cpp Search
    dispatch) byte-exact against the compiled reference."""
    _check_config(harness, tmp_path, 192, 128,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=16, levels=0, search=search,
                                searchparam=param, truemotion=True,
                                chroma=False),
                  seed=int(search) + 10)


def test_golden_trymany_no_meander(harness, tmp_path):
    """trymany=True coarse-level multi-candidate search + meander=False
    raster order (GroupOfPlanes.c:110-126)."""
    _check_config(harness, tmp_path, 192, 128,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=8, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False,
                                trymany=True, meander=False),
                  seed=21)


def test_golden_field_shift(harness, tmp_path):
    """Non-zero fieldShift threaded through the whole level loop
    (GroupOfPlanes.c:93 fieldShiftCur, MVAnalyse.c:176-179)."""
    _check_config(harness, tmp_path, 192, 128,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=16, levels=0,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False),
                  seed=22, field_shift=1)


def test_golden_overlap_and_blk8(harness, tmp_path):
    """Overlapped blocks + pel2 + smaller blocks, hierarchical."""
    _check_config(harness, tmp_path, 256, 160,
                  SuperConfig(pel=2, levels=0, chroma=False),
                  AnalyseConfig(blksize=8, levels=0, overlap=4,
                                search=SearchType.HEX2, searchparam=2,
                                truemotion=True, chroma=False),
                  seed=2)


def test_golden_super_pyramid_bytes(harness, tmp_path):
    """The C super frame (pad + reduce + refine) vs build_super, byte
    compared level by level through the PlaneSuperOffset layout."""
    rng = np.random.default_rng(3)
    w, h = 128, 96
    src, _ = _frames(rng, w, h)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
    sp = str(tmp_path / "src.raw")
    op = str(tmp_path / "super.raw")
    src.tofile(sp)
    r = subprocess.run(
        [harness, "super", str(w), str(h), str(sspec.pel),
         str(sspec.levels), str(sspec.hpad), str(sspec.vpad),
         str(sspec.sharp), str(sspec.rfilter), str(sspec.x_ratio_uv),
         str(sspec.y_ratio_uv), sp, op],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    got = np.fromfile(op, np.uint8)

    from mvtools_tpu.core.geometry import plane_super_offset
    sup = mvt.build_super([jnp.asarray(src)], sspec)
    pitch = w + 2 * sspec.hpad
    for lv in range(sspec.levels):
        off = plane_super_offset(False, h, lv, sspec.pel, sspec.vpad,
                                 pitch, 1)
        arr = np.asarray(sup.planes[0][lv]).astype(np.uint8)
        if arr.ndim == 2:
            arr = arr[None]
        n_sub, ph, pw = arr.shape
        # C layout (mvpUpdate MVFrame.cpp:1356-1364): subplane i at
        # base + i*pitch*paddedHeight, rows strided by the SUPER pitch
        # even for narrower coarse levels
        for i in range(n_sub):
            base = off + i * pitch * ph
            rows = got[base:base + pitch * ph].reshape(ph, pitch)[:, :pw]
            np.testing.assert_array_equal(
                arr[i], rows, err_msg=f"super level {lv} subplane {i}")


