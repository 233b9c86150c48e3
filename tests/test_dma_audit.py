"""Analytic audit of every window DMA the Pallas probe kernel can issue.

The probe kernel (ops/probe.py) trusts its callers to keep tile-aligned
window reads inside the padded subplane stacks (pad_stack padding +
ALIGN_SLACK_*).  This test re-derives, with plain integer arithmetic,
the worst-case DMA extents for every probe call-site of the lockstep
analyse engine — luma and both chroma planes, the K-predictor probe,
hex2 hexagon/ring, exhaustive and UMH offset sets, the bad-SAD rescue
tail, and the subpel refine rings — across every pyramid level of the
benched geometries (including the full-pyramid 1080p YUV420 config) and
asserts containment.

Kernel read model (mirrors _probe_kernel / _fetch_kernel):
  wb = (candidate_pel + min_offset) >> log_pel         window base
  start = wb & ~(tile - 1)                             align down (8/128)
  size  = roundup(logical_window + tile, vmem_tile)    (32, 128) for u8
  rows/cols touched = [start, start + size)
Containment therefore needs wb >= 0 and (wb & ~(tile-1)) + size <= dim.
Candidates are clamped to the per-block MV bounds before every probe
(FieldProber.check / plain_sads_multi callers), so the candidate range
is exactly [dmin, dmax - 1] (analyse.py:1228-1231 bounds formulas,
mirroring PlaneOfBlocks.cpp:119-130).
"""

import dataclasses

import numpy as np
import pytest

from mvtools_tpu.core import geometry
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat
from mvtools_tpu.field_engine import _HEXP, _ring_offsets, \
    _umh_uniform_offsets
from mvtools_tpu.ops.probe import ALIGN_SLACK_X, ALIGN_SLACK_Y, \
    _offset_classes, _window_geom

PAD = 16  # FieldProber.PAD


def _kernel_extent(offsets, bs_y, bs_x, pel):
    """(min_dy, min_dx, rows, cols) of the tile-rounded DMA slice, as
    computed by _probe_kernel."""
    min_dx, min_dy, wy, wx = _window_geom(offsets, bs_y, bs_x, pel)
    wy_t = -(-(wy + 8) // 32) * 32
    wx_t = -(-(wx + 128) // 128) * 128
    return min_dy, min_dx, wy_t, wx_t


def _check_fit(tag, H, W, pel, cy_min, cy_max, cx_min, cx_max,
               offsets, bs_y, bs_x, failures):
    logp = pel.bit_length() - 1
    min_dy, min_dx, wy_t, wx_t = _kernel_extent(offsets, bs_y, bs_x, pel)
    wb_y_min = (cy_min + min_dy) >> logp
    wb_y_max = (cy_max + min_dy) >> logp
    wb_x_min = (cx_min + min_dx) >> logp
    wb_x_max = (cx_max + min_dx) >> logp
    end_y = (wb_y_max & ~7) + wy_t
    end_x = (wb_x_max & ~127) + wx_t
    if wb_y_min < 0:
        failures.append(f"{tag}: row base {wb_y_min} < 0")
    if wb_x_min < 0:
        failures.append(f"{tag}: col base {wb_x_min} < 0")
    if end_y > H:
        failures.append(f"{tag}: row end {end_y} > stack H {H}")
    if end_x > W:
        failures.append(f"{tag}: col end {end_x} > stack W {W}")


def _luma_offset_sets(search, param, pel):
    """Every static offset set the field engine probes the LUMA stack
    with for one (search, param) level (field_engine.refine + the
    predictor/zero/global probes + the rescue tail)."""
    hex6 = [(-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2)]
    sets = [((0, 0),), tuple(hex6), tuple(_HEXP),
            tuple(_ring_offsets(1, 1))]
    if search == SearchType.EXHAUSTIVE:
        offs = []
        for r in range(1, param + 1):
            offs += _ring_offsets(r, 1)
        sets.append(tuple(offs))
    if search == SearchType.UMH:
        sets.append(tuple(_umh_uniform_offsets(param)))
    if search in (SearchType.ONETIME, SearchType.NSTEP,
                  SearchType.LOGARITHMIC):
        for length in range(1, param + 1):
            sets.append(((length, length), (length, 0), (length, -length),
                         (0, -length), (0, length), (-length, length),
                         (-length, 0), (-length, -length)))
    if search in (SearchType.HORIZONTAL, SearchType.VERTICAL):
        offs = []
        for i in range(1, param + 1):
            offs += [(-i, 0), (i, 0), (0, -i), (0, i)]
        sets.append(tuple(offs))
    # subpel refine + rescue expanding rings (radius < pel, step 1)
    for i in range(1, pel):
        sets.append(tuple(_ring_offsets(i, 1)))
    return sets


def _chroma_grid(offsets, logx, logy, pel):
    """The static chroma delta grid FieldProber.chroma_sads probes for a
    multi-offset luma set (field_engine.py chroma_sads)."""
    rx, ry = (1 << logx) - 1, (1 << logy) - 1
    xs = [o[0] for o in offsets]
    ys = [o[1] for o in offsets]
    gx = range((min(xs) - rx) >> logx, ((max(xs) + rx) >> logx) + 1)
    gy = range((min(ys) - ry) >> logy, ((max(ys) + ry) >> logy) + 1)
    return tuple((ddx, ddy) for ddy in gy for ddx in gx)


CONFIGS = [
    # the full-pyramid 1080p YUV420 production config (bench config 4)
    (1920, 1080, ColorFamily.YUV420, dict(pel=2, levels=0, chroma=True),
     dict(blksize=16, levels=0, overlap=8, truemotion=True, chroma=True)),
    # headline gray config
    (1920, 1080, ColorFamily.GRAY, dict(pel=2, levels=0, chroma=False),
     dict(blksize=16, levels=0, chroma=False)),
    # pel=4 + small plane + blk8 + exhaustive coarse
    (320, 192, ColorFamily.YUV420, dict(pel=4, levels=0, chroma=True),
     dict(blksize=8, levels=0, overlap=4, chroma=True,
          search=SearchType.EXHAUSTIVE, searchparam=4, pelsearch=4)),
    # UMH + blk32
    (1280, 720, ColorFamily.YUV420, dict(pel=2, levels=0, chroma=True),
     dict(blksize=32, levels=0, overlap=16, chroma=True,
          search=SearchType.UMH, searchparam=8, pelsearch=8)),
]


@pytest.mark.parametrize("w,h,fam,skw,akw", CONFIGS)
def test_probe_windows_fit_all_levels(w, h, fam, skw, akw):
    fmt = VideoFormat(w, h, 8, fam)
    sspec = SuperConfig(**skw).validate(fmt)
    aspec = dataclasses.replace(AnalyseConfig(**akw), isb=True) \
        .validate(sspec)
    m = aspec.meta
    logx = geometry.ilog2(sspec.x_ratio_uv)
    logy = geometry.ilog2(sspec.y_ratio_uv)
    geos = geometry.level_geometries(
        sspec.width, sspec.height, sspec.hpad, sspec.vpad, sspec.pel,
        sspec.levels, sspec.x_ratio_uv, sspec.y_ratio_uv)
    bsx, bsy = m.blk_size_x, m.blk_size_y
    bcx, bcy = bsx >> logx, bsy >> logy
    failures = []

    for lv in range(m.lv_count):
        g = geos[lv]
        gc = geometry.chroma_geometry(g, sspec.x_ratio_uv,
                                      sspec.y_ratio_uv)
        pel = sspec.pel if lv == 0 else 1
        logp = pel.bit_length() - 1
        pw, ph = g.padded_width, g.padded_height
        hpad, vpad = g.hpad, g.vpad
        hps, vps = hpad >> lv, vpad >> lv
        # per-block x0 cancels in base+bound (analyse.py:1226-1231):
        # base_x + dxmin = (PAD + hpad - hps) << logp for every block
        cx_min = (PAD + hpad - hps) << logp
        cx_max = ((PAD + pw - bsx - hpad + hps) << logp) - 1
        cy_min = (PAD + vpad - vps) << logp
        cy_max = ((PAD + ph - bsy - vpad + vps) << logp) - 1
        # field_shift enters candidates only via values that are then
        # clamped to the same bounds, so the range above is complete
        H = ph + 2 * PAD + ALIGN_SLACK_Y
        W = pw + 2 * PAD + ALIGN_SLACK_X

        coarsest = lv == m.lv_count - 1
        finest = lv == 0
        if aspec.search in (SearchType.HORIZONTAL, SearchType.VERTICAL):
            search = aspec.search
        elif coarsest:
            search = (aspec.search if m.lv_count == 1
                      else aspec.search_coarse)
        elif finest:
            search = aspec.search
        else:
            search = aspec.search_coarse
        param = (aspec.pel_search if (finest or m.lv_count == 1)
                 else aspec.n_search_param)

        sets = _luma_offset_sets(search, param, pel)
        for si, offsets in enumerate(sets):
            _check_fit(f"lv{lv} luma set{si}", H, W, pel,
                       cy_min, cy_max, cx_min, cx_max, offsets, bsy, bsx,
                       failures)

        if aspec.chroma:
            padc = max(PAD >> logx, PAD >> logy, 4)
            Hc = gc.padded_height + 2 * padc + ALIGN_SLACK_Y
            Wc = gc.padded_width + 2 * padc + ALIGN_SLACK_X
            rx, ry = (1 << logx) - 1, (1 << logy) - 1
            # chroma candidate centre (chroma_sads): cbase spans the
            # block grid; vy spans the luma bounds; cpos monotone
            nbx, nby = geometry.level_block_counts(
                (bsx - m.overlap_x) * m.blk_x + m.overlap_x,
                (bsy - m.overlap_y) * m.blk_y + m.overlap_y,
                bsx, bsy, m.overlap_x, m.overlap_y, lv)
            xc_lo = gc.hpad
            xc_hi = gc.hpad + ((bsx - m.overlap_x) >> logx) * (nbx - 1)
            yc_lo = gc.vpad
            yc_hi = gc.vpad + ((bsy - m.overlap_y) >> logy) * (nby - 1)
            # luma bounds per block (not constant in chroma coords —
            # evaluate both extremes of the block grid)
            dxmin_lo = -(((hpad - hps)) << logp)          # block 0
            dxmax_lo = ((pw - bsx - hpad + hps - hpad
                         - (bsx - m.overlap_x) * (nbx - 1)) << logp)
            for offsets in sets:
                grid = (_chroma_grid(offsets, logx, logy, pel)
                        if len(offsets) > 1 else ((0, 0),))
                # min centre: first block, vx = its dxmin (most negative
                # luma MV), negative-bias floor
                vx_min = dxmin_lo
                vy_min = -(((vpad - vps)) << logp)
                c_lo_x = ((xc_lo + padc) << logp) \
                    + ((vx_min + (rx if vx_min < 0 else 0)) >> logx)
                c_lo_y = ((yc_lo + padc) << logp) \
                    + ((vy_min + (ry if vy_min < 0 else 0)) >> logy)
                # max centre: last block, vx = its dxmax - 1
                x0_hi = hpad + (bsx - m.overlap_x) * (nbx - 1)
                y0_hi = vpad + (bsy - m.overlap_y) * (nby - 1)
                vx_max = ((pw - bsx - hpad + hps - x0_hi) << logp) - 1
                vy_max = ((ph - bsy - vpad + vps - y0_hi) << logp) - 1
                c_hi_x = ((xc_hi + padc) << logp) \
                    + ((vx_max + (rx if vx_max < 0 else 0)) >> logx)
                c_hi_y = ((yc_hi + padc) << logp) \
                    + ((vy_max + (ry if vy_max < 0 else 0)) >> logy)
                _check_fit(f"lv{lv} chroma grid|{len(grid)}|", Hc, Wc,
                           pel, c_lo_y, c_hi_y, c_lo_x, c_hi_x, grid,
                           bcy, bcx, failures)

    assert not failures, "\n".join(failures)


def test_fetch_windows_fit():
    """degrain.gather_blocks clamps fetch coordinates to
    [0, (dim - bs) << logp] against the super stack, then pad_stack(0)
    adds the alignment slack; the fetch kernel's tile-rounded window
    must fit for every clamped coordinate."""
    for (H, W, bsy, bsx, pel) in [(1112, 1952, 16, 16, 2),
                                  (556, 976, 8, 8, 4),
                                  (24, 40, 8, 8, 1),
                                  (1112, 1952, 128, 128, 2)]:
        wy_t = -(-(bsy + 8) // 32) * 32
        wx_t = -(-(bsx + 128) // 128) * 128
        logp = pel.bit_length() - 1
        wb_max_y = ((((H - bsy) << logp) + (pel - 1)) >> logp)
        wb_max_x = ((((W - bsx) << logp) + (pel - 1)) >> logp)
        assert (wb_max_y & ~7) + wy_t <= H + ALIGN_SLACK_Y, (H, bsy)
        assert (wb_max_x & ~127) + wx_t <= W + ALIGN_SLACK_X, (W, bsx)
