"""NumPy oracle for the frame-pyramid operations.

Literal, loop-level transliterations of the reference's scalar C kernels
(MVFrame.cpp), used as the ground truth the JAX/Pallas implementations must
match bit for bit.  Deliberately simple and slow; run on small frames.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Padding (PadReferenceFrame, MVFrame.cpp:1264-1318)

def pad_replicate(plane: np.ndarray, hpad: int, vpad: int) -> np.ndarray:
    return np.pad(plane, ((vpad, vpad), (hpad, hpad)), mode="edge")


# ---------------------------------------------------------------------------
# Reduce filters.  src is the region starting at the unpadded top-left of the
# source level, with enough rows/cols beyond (zeros for level 0, replicated
# padding for deeper levels).  Returns [h, w].

def rb2_simple(src, h, w):
    dst = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            dst[y, x] = (src[2 * y, 2 * x] + src[2 * y, 2 * x + 1]
                         + src[2 * y + 1, 2 * x + 1] + src[2 * y + 1, 2 * x] + 2) // 4
    return dst


def _rb2_vertical(src, h, w2, taps, off, rnd, shift, last_avg):
    v = np.zeros((h, w2), np.int64)
    for y in range(min(1, h)):
        for x in range(w2):
            v[y, x] = (src[2 * y, x] + src[2 * y + 1, x] + 1) // 2
    y_end = h - last_avg if last_avg else h
    for y in range(1, max(y_end, 1)):
        for x in range(w2):
            acc = 0
            for t, c in enumerate(taps):
                acc += c * src[2 * y - off + t, x]
            v[y, x] = (acc + rnd) >> shift
    if last_avg:
        for y in range(max(h - 1, 1), h):
            for x in range(w2):
                v[y, x] = (src[2 * y, x] + src[2 * y + 1, x] + 1) // 2
    return v


def _rb2_horizontal_inplace(v, w, taps, off, rnd, shift, last_avg):
    h = v.shape[0]
    dst = np.zeros((h, w), np.int64)
    for y in range(h):
        first = (v[y, 0] + v[y, 1] + 1) // 2
        x_end = w - last_avg if last_avg else w
        for x in range(1, max(x_end, 1)):
            acc = 0
            for t, c in enumerate(taps):
                acc += c * v[y, 2 * x - off + t]
            dst[y, x] = (acc + rnd) >> shift
        dst[y, 0] = first
        if last_avg:
            for x in range(max(w - 1, 1), w):
                dst[y, x] = (v[y, 2 * x] + v[y, 2 * x + 1] + 1) // 2
    return dst


def rb2(src, h, w, rfilter):
    src = src.astype(np.int64)
    if rfilter == 0:
        return rb2_simple(src, h, w)
    if rfilter == 1:
        v = _rb2_vertical(src, h, 2 * w, (1, 2, 1), 1, 2, 2, last_avg=0)
        return _rb2_horizontal_inplace(v, w, (1, 2, 1), 1, 2, 2, last_avg=0)
    if rfilter == 2:
        v = _rb2_vertical(src, h, 2 * w, (1, 3, 3, 1), 1, 4, 3, last_avg=1)
        return _rb2_horizontal_inplace(v, w, (1, 3, 3, 1), 1, 4, 3, last_avg=1)
    if rfilter == 3:
        v = _rb2_vertical(src, h, 2 * w, (1, 9, 22, 22, 9, 1), 2, 32, 6, last_avg=1)
        return _rb2_horizontal_inplace(v, w, (1, 9, 22, 22, 9, 1), 2, 32, 6, last_avg=1)
    if rfilter == 4:
        v = _rb2_vertical(src, h, 2 * w, (1, 5, 10, 10, 5, 1), 2, 16, 5, last_avg=1)
        return _rb2_horizontal_inplace(v, w, (1, 5, 10, 10, 5, 1), 2, 16, 5, last_avg=1)
    raise ValueError(rfilter)


# ---------------------------------------------------------------------------
# Subpel interpolators (operate on padded planes).

def h_bilinear(p):
    h, w = p.shape
    d = np.zeros_like(p)
    for j in range(h):
        for i in range(w - 1):
            d[j, i] = (p[j, i] + p[j, i + 1] + 1) >> 1
        d[j, w - 1] = p[j, w - 1]
    return d


def v_bilinear(p):
    h, w = p.shape
    d = np.zeros_like(p)
    for j in range(h - 1):
        for i in range(w):
            d[j, i] = (p[j, i] + p[j + 1, i] + 1) >> 1
    d[h - 1, :] = p[h - 1, :]
    return d


def diag_bilinear(p):
    h, w = p.shape
    d = np.zeros_like(p)
    for j in range(h - 1):
        for i in range(w - 1):
            d[j, i] = (p[j, i] + p[j, i + 1] + p[j + 1, i] + p[j + 1, i + 1] + 2) >> 2
        d[j, w - 1] = (p[j, w - 1] + p[j + 1, w - 1] + 1) >> 1
    for i in range(w - 1):
        d[h - 1, i] = (p[h - 1, i] + p[h - 1, i + 1] + 1) >> 1
    d[h - 1, w - 1] = p[h - 1, w - 1]
    return d


def h_wiener(p, bits):
    h, w = p.shape
    pmax = (1 << bits) - 1
    d = np.zeros_like(p)
    for j in range(h):
        d[j, 0] = (p[j, 0] + p[j, 1] + 1) >> 1
        d[j, 1] = (p[j, 1] + p[j, 2] + 1) >> 1
        for i in range(2, w - 4):
            m2 = (p[j, i] + p[j, i + 1]) * 4
            m2 -= p[j, i - 1] + p[j, i + 2]
            m2 *= 5
            m0 = p[j, i - 2] + p[j, i + 3] + m2 + 16
            d[j, i] = max(0, min(m0 >> 5, pmax))
        for i in range(w - 4, w - 1):
            d[j, i] = (p[j, i] + p[j, i + 1] + 1) >> 1
        d[j, w - 1] = p[j, w - 1]
    return d


def v_wiener(p, bits):
    return h_wiener(p.T, bits).T


def h_bicubic(p, bits):
    h, w = p.shape
    pmax = (1 << bits) - 1
    d = np.zeros_like(p)
    for j in range(h):
        d[j, 0] = (p[j, 0] + p[j, 1] + 1) >> 1
        for i in range(1, w - 3):
            val = (-(p[j, i - 1] + p[j, i + 2]) + (p[j, i] + p[j, i + 1]) * 9 + 8) >> 4
            d[j, i] = min(pmax, max(0, val))
        for i in range(w - 3, w - 1):
            d[j, i] = (p[j, i] + p[j, i + 1] + 1) >> 1
        d[j, w - 1] = p[j, w - 1]
    return d


def v_bicubic(p, bits):
    return h_bicubic(p.T, bits).T


def avg2(a, b):
    return (a + b + 1) >> 1


def refine_subplanes(p0, pel, sharp, bits):
    """mvpRefine oracle (MVFrame.cpp:1386-1527)."""
    p0 = p0.astype(np.int64)
    if pel == 1:
        return [p0]

    if sharp == 0:
        ph, pv, pd = h_bilinear(p0), v_bilinear(p0), diag_bilinear(p0)
    elif sharp == 1:
        pv = v_bicubic(p0, bits)
        ph, pd = h_bicubic(p0, bits), h_bicubic(pv, bits)
    else:
        pv = v_wiener(p0, bits)
        ph, pd = h_wiener(p0, bits), h_wiener(pv, bits)

    if pel == 2:
        return [p0, ph, pv, pd]

    pl = [np.zeros_like(p0) for _ in range(16)]
    pl[0], pl[2], pl[8], pl[10] = p0, ph, pv, pd
    pl[1] = avg2(pl[0], pl[2])
    pl[9] = avg2(pl[8], pl[10])
    pl[4] = avg2(pl[0], pl[8])
    pl[6] = avg2(pl[2], pl[10])
    pl[5] = avg2(pl[4], pl[6])

    def avg_shift_col(a, b):
        out = np.zeros_like(a)
        out[:, :-1] = avg2(a[:, 1:], b[:, :-1])
        return out

    def avg_shift_row(a, b):
        out = np.zeros_like(a)
        out[:-1, :] = avg2(a[1:, :], b[:-1, :])
        return out

    pl[3] = avg_shift_col(pl[0], pl[2])
    pl[11] = avg_shift_col(pl[8], pl[10])
    pl[12] = avg_shift_row(pl[0], pl[8])
    pl[14] = avg_shift_row(pl[2], pl[10])
    pl[13] = avg2(pl[12], pl[14])
    pl[7] = avg_shift_col(pl[4], pl[6])
    pl[15] = avg_shift_col(pl[12], pl[14])
    return pl


# ---------------------------------------------------------------------------
# Whole-super oracle for one plane.

def plane_height_luma(src_height, level, y_ratio_uv, vpad):
    height = src_height
    for _ in range(1, level + 1):
        if vpad >= y_ratio_uv:
            height = ((height // y_ratio_uv + 1) // 2) * y_ratio_uv
        else:
            height = ((height // y_ratio_uv) // 2) * y_ratio_uv
    return height


def plane_width_luma(src_width, level, x_ratio_uv, hpad):
    width = src_width
    for _ in range(1, level + 1):
        if hpad >= x_ratio_uv:
            width = ((width // x_ratio_uv + 1) // 2) * x_ratio_uv
        else:
            width = ((width // x_ratio_uv) // 2) * x_ratio_uv
    return width


def build_super_plane(plane, hpad, vpad, pel, levels, sharp, rfilter,
                      x_ratio_uv, y_ratio_uv, bits, is_luma=True):
    """Returns (level0_subplanes, [level1_padded, level2_padded, ...])."""
    plane = plane.astype(np.int64)
    H, W = plane.shape
    if is_luma:
        dims = [(plane_width_luma(W, lv, x_ratio_uv, hpad),
                 plane_height_luma(H, lv, y_ratio_uv, vpad))
                for lv in range(levels)]
    else:
        # chroma dims derive from luma dims (mvfInit divides by the ratios)
        lw, lh = W * x_ratio_uv, H * y_ratio_uv
        lhp, lvp = hpad * x_ratio_uv, vpad * y_ratio_uv
        dims = [(plane_width_luma(lw, lv, x_ratio_uv, lhp) // x_ratio_uv,
                 plane_height_luma(lh, lv, y_ratio_uv, lvp) // y_ratio_uv)
                for lv in range(levels)]

    unpadded = [plane]
    padded = [pad_replicate(plane, hpad, vpad)]
    for lv in range(1, levels):
        w, h = dims[lv]
        if lv == 1:
            src = np.pad(unpadded[0], ((0, 4), (0, 4)), mode="constant")
        else:
            src = padded[lv - 1][vpad:, hpad:]
            src = np.pad(src, ((0, 4), (0, 4)), mode="edge")
        red = rb2(src, h, w, rfilter)
        unpadded.append(red)
        padded.append(pad_replicate(red, hpad, vpad))

    subplanes = refine_subplanes(padded[0], pel, sharp, bits)
    return subplanes, padded[1:]
