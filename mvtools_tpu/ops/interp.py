"""Subpel refinement interpolators for the super pyramid.

TPU-native equivalents of the reference's pel-refine kernels
(MVFrame.cpp:508-573 bilinear, :1019-1111 Wiener 6-tap, :1114-1176 bicubic
Catmull-Rom, :1180-1197 Average2) and the pel=2/4 subplane schedule of
mvpRefine (MVFrame.cpp:1386-1527).

All kernels operate on a full padded plane [PH, PW] (the reference refines
padded planes) in int32 and reproduce the exact edge special-cases of the C
code, including cells the reference leaves at the frame's zero
initialisation.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

SHARP_BILINEAR = 0
SHARP_BICUBIC = 1
SHARP_WIENER = 2


def _avg2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a + b + 1) >> 1


def h_bilinear(p: jnp.ndarray) -> jnp.ndarray:
    """HorizontalBilinear (MVFrame.cpp:530-548)."""
    out = _avg2(p[:, :-1], p[:, 1:])
    return jnp.concatenate([out, p[:, -1:]], axis=1)


def v_bilinear(p: jnp.ndarray) -> jnp.ndarray:
    """VerticalBilinear (MVFrame.cpp:508-527)."""
    out = _avg2(p[:-1, :], p[1:, :])
    return jnp.concatenate([out, p[-1:, :]], axis=0)


def diag_bilinear(p: jnp.ndarray) -> jnp.ndarray:
    """DiagonalBilinear (MVFrame.cpp:551-572)."""
    main = (p[:-1, :-1] + p[:-1, 1:] + p[1:, :-1] + p[1:, 1:] + 2) >> 2
    last_col = _avg2(p[:-1, -1:], p[1:, -1:])
    top = jnp.concatenate([main, last_col], axis=1)
    bottom = jnp.concatenate([_avg2(p[-1:, :-1], p[-1:, 1:]), p[-1:, -1:]], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _clamp(x: jnp.ndarray, pixel_max: int) -> jnp.ndarray:
    return jnp.clip(x, 0, pixel_max)


def h_wiener(p: jnp.ndarray, bits: int) -> jnp.ndarray:
    """HorizontalWiener: 6 taps (1,-5,20,20,-5,1)/32 (MVFrame.cpp:1071-1111)."""
    pixel_max = (1 << bits) - 1
    w = p.shape[1]
    cols = [
        _avg2(p[:, 0:1], p[:, 1:2]),
        _avg2(p[:, 1:2], p[:, 2:3]),
    ]
    # i in [2, w-4): taps at i-2, i-1, i, i+1, i+2, i+3
    m0 = p[:, 0:w - 6]
    m1 = p[:, 1:w - 5]
    m2 = p[:, 2:w - 4]
    m3 = p[:, 3:w - 3]
    m4 = p[:, 4:w - 2]
    m5 = p[:, 5:w - 1]
    mid = ((m2 + m3) * 4 - (m1 + m4)) * 5 + m0 + m5 + 16
    cols.append(_clamp(mid >> 5, pixel_max))
    cols.append(_avg2(p[:, w - 4:w - 1], p[:, w - 3:w]))
    cols.append(p[:, w - 1:w])
    return jnp.concatenate(cols, axis=1)


def v_wiener(p: jnp.ndarray, bits: int) -> jnp.ndarray:
    """VerticalWiener (MVFrame.cpp:1019-1068)."""
    pixel_max = (1 << bits) - 1
    h = p.shape[0]
    rows = [
        _avg2(p[0:1, :], p[1:2, :]),
        _avg2(p[1:2, :], p[2:3, :]),
    ]
    m0 = p[0:h - 6, :]
    m1 = p[1:h - 5, :]
    m2 = p[2:h - 4, :]
    m3 = p[3:h - 3, :]
    m4 = p[4:h - 2, :]
    m5 = p[5:h - 1, :]
    mid = ((m2 + m3) * 4 - (m1 + m4)) * 5 + m0 + m5 + 16
    rows.append(_clamp(mid >> 5, pixel_max))
    rows.append(_avg2(p[h - 4:h - 1, :], p[h - 3:h, :]))
    rows.append(p[h - 1:h, :])
    return jnp.concatenate(rows, axis=0)


def h_bicubic(p: jnp.ndarray, bits: int) -> jnp.ndarray:
    """HorizontalBicubic: Catmull-Rom (-1, 9, 9, -1)/16 (MVFrame.cpp:1153-1176)."""
    pixel_max = (1 << bits) - 1
    w = p.shape[1]
    cols = [_avg2(p[:, 0:1], p[:, 1:2])]
    # i in [1, w-3): taps at i-1, i, i+1, i+2
    m0 = p[:, 0:w - 4]
    m1 = p[:, 1:w - 3]
    m2 = p[:, 2:w - 2]
    m3 = p[:, 3:w - 1]
    mid = (-(m0 + m3) + (m1 + m2) * 9 + 8) >> 4
    cols.append(_clamp(mid, pixel_max))
    cols.append(_avg2(p[:, w - 3:w - 1], p[:, w - 2:w]))
    cols.append(p[:, w - 1:w])
    return jnp.concatenate(cols, axis=1)


def v_bicubic(p: jnp.ndarray, bits: int) -> jnp.ndarray:
    """VerticalBicubic (MVFrame.cpp:1115-1150)."""
    pixel_max = (1 << bits) - 1
    h = p.shape[0]
    rows = [_avg2(p[0:1, :], p[1:2, :])]
    m0 = p[0:h - 4, :]
    m1 = p[1:h - 3, :]
    m2 = p[2:h - 2, :]
    m3 = p[3:h - 1, :]
    mid = (-(m0 + m3) + (m1 + m2) * 9 + 8) >> 4
    rows.append(_clamp(mid, pixel_max))
    rows.append(_avg2(p[h - 3:h - 1, :], p[h - 2:h, :]))
    rows.append(p[h - 1:h, :])
    return jnp.concatenate(rows, axis=0)


def _refine_triple(p0: jnp.ndarray, sharp: int, bits: int):
    """The three directional interpolations of mvpRefine: refine[0] applied
    to plane 0 (horizontal), refine[1] (vertical), refine[2] applied to
    either plane 0 (bilinear: diagonal) or the vertical result (bicubic /
    Wiener: horizontal of vertical) — MVFrame.cpp:1463-1487."""
    if sharp == SHARP_BILINEAR:
        ph = h_bilinear(p0)
        pv = v_bilinear(p0)
        pd = diag_bilinear(p0)
    elif sharp == SHARP_BICUBIC:
        ph = h_bicubic(p0, bits)
        pv = v_bicubic(p0, bits)
        pd = h_bicubic(pv, bits)
    else:  # Wiener
        ph = h_wiener(p0, bits)
        pv = v_wiener(p0, bits)
        pd = h_wiener(pv, bits)
    return ph, pv, pd


def _avg_shift_col(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Average2(dst, src1 + 1 pixel, src2) with width-1: the reference leaves
    the final column at the frame's zero init (MVFrame.cpp:1517)."""
    out = _avg2(a[:, 1:], b[:, :-1])
    return jnp.concatenate([out, jnp.zeros_like(a[:, :1])], axis=1)


def _avg_shift_row(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Average2(dst, src1 + 1 row, src2) with height-1; final row stays 0."""
    out = _avg2(a[1:, :], b[:-1, :])
    return jnp.concatenate([out, jnp.zeros_like(a[:1, :])], axis=0)


def refine_subplanes(p0: jnp.ndarray, pel: int, sharp: int, bits: int) -> List[jnp.ndarray]:
    """Compute all pel*pel subpel planes of a padded plane.

    Returns a list of pel*pel planes indexed by (x & (pel-1)) | ((y & (pel-1))
    << log2(pel)), i.e. plane[idx][Y, X] samples position (X + xfrac/pel,
    Y + yfrac/pel).  Matches mvpRefine (MVFrame.cpp:1386-1527) including the
    pel=4 Average2 schedule.
    """
    if pel == 1:
        return [p0]
    if pel == 2:
        ph, pv, pd = _refine_triple(p0, sharp, bits)
        return [p0, ph, pv, pd]
    if pel == 4:
        ph, pv, pd = _refine_triple(p0, sharp, bits)
        pl = [None] * 16
        pl[0] = p0
        pl[2] = ph
        pl[8] = pv
        pl[10] = pd
        # Average2 schedule (MVFrame.cpp:1511-1523)
        pl[1] = _avg2(pl[0], pl[2])
        pl[9] = _avg2(pl[8], pl[10])
        pl[4] = _avg2(pl[0], pl[8])
        pl[6] = _avg2(pl[2], pl[10])
        pl[5] = _avg2(pl[4], pl[6])
        pl[3] = _avg_shift_col(pl[0], pl[2])
        pl[11] = _avg_shift_col(pl[8], pl[10])
        pl[12] = _avg_shift_row(pl[0], pl[8])
        pl[14] = _avg_shift_row(pl[2], pl[10])
        pl[13] = _avg2(pl[12], pl[14])
        pl[7] = _avg_shift_col(pl[4], pl[6])
        pl[15] = _avg_shift_col(pl[12], pl[14])
        return pl
    raise ValueError(f"pel must be 1, 2 or 4, got {pel}")


def import_pel_subplanes(src_pel: jnp.ndarray, pel: int, hpad: int, vpad: int,
                         is_padded: bool) -> List[jnp.ndarray]:
    """mvpRefineExt: build subplanes from an externally upsampled clip
    (MVFrame.cpp:1530-1631).  `src_pel` is the pel-upsampled frame, either
    unpadded [H*pel, W*pel] (is_padded=False) or padded
    [(H+2*vpad)*pel, (W+2*hpad)*pel].  Returns pel*pel padded planes; plane 0
    is NOT produced here (it comes from the normal fill/pad path)."""
    planes: List[jnp.ndarray] = [None] * (pel * pel)
    for idx in range(1, pel * pel):
        dx = idx & (pel - 1)
        dy = idx >> (pel.bit_length() - 1)
        sub = src_pel[dy::pel, dx::pel]
        if not is_padded:
            sub = jnp.pad(sub, ((vpad, vpad), (hpad, hpad)), mode="edge")
        planes[idx] = sub
    return planes
