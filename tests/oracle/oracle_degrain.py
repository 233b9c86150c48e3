"""NumPy oracle for MDegrain (mvdegrainGetFrame MVDegrains.cpp:84-330)."""

from __future__ import annotations

import math

import numpy as np


def degrain_weight(thsad, block_sad):
    if block_sad >= thsad:
        return 0
    return int((thsad - block_sad) * (thsad + block_sad) * 256
               / float(thsad * thsad + block_sad * block_sad))


def normalise_weights(wrefs):
    wsrc = 256
    wsum = wsrc + 1
    for w in wrefs:
        wsum += w
    scale = 256.0 / wsum
    out = []
    for w in wrefs:
        out.append(int(w * scale))
    for w in out:
        wsrc -= w
    return wsrc, out


def overlap_windows(nx, ny, ox, oy):
    """overInit oracle (float32 like cosf)."""
    def axis(n, o):
        win = np.ones(n, np.float32)
        first = np.ones(n, np.float32)
        last = np.ones(n, np.float32)
        for i in range(o):
            c = np.float32(np.cos(np.float32(math.pi) * np.float32(i - o + 0.5)
                                  / np.float32(o * 2)))
            win[i] = c * c
            last[i] = win[i]
        for i in range(n - o, n):
            c = np.float32(np.cos(np.float32(math.pi) * np.float32(i - n + o + 0.5)
                                  / np.float32(o * 2)))
            win[i] = c * c
            first[i] = win[i]
        return win, first, last

    wx, wxf, wxl = axis(nx, ox)
    wy, wyf, wyl = axis(ny, oy)
    ys, xs = [wyf, wy, wyl], [wxf, wx, wxl]
    out = np.zeros((9, ny, nx), np.int64)
    for a in range(3):
        for b in range(3):
            for j in range(ny):
                for i in range(nx):
                    out[a * 3 + b, j, i] = int(
                        np.float32(ys[a][j]) * np.float32(xs[b][i])
                        * np.float32(2048) + np.float32(0.5))
    return out


def get_ref_block(stack, pel, hpad, vpad, blx, bly, bsy, bsx):
    """mvpGetPointer addressing: absolute = pos + pad*pel."""
    xa = blx + hpad * pel
    ya = bly + vpad * pel
    m = pel - 1
    lp = pel.bit_length() - 1
    idx = (xa & m) | ((ya & m) << lp)
    x, y = xa >> lp, ya >> lp
    return stack[idx][y:y + bsy, x:x + bsx].astype(np.int64)


def degrain_plane(src, ref_stacks, mv_list, usable, thsad, nbx, nby,
                  bsx, bsy, ovx, ovy, log_pel, sub_x, sub_y, hpad, vpad,
                  bits, limit):
    """One plane of MDegrain.  mv_list: per ref, list of (x, y, sad) finest
    blocks.  ref_stacks: per ref, list of pel^2 padded subplanes (this
    plane).  src: [h, w].  All block geometry in luma units; sub_x/sub_y
    shift for chroma."""
    h, w = src.shape
    src = src.astype(np.int64)
    pel = 1 << log_pel
    p_bsx, p_bsy = bsx >> sub_x, bsy >> sub_y
    p_ovx, p_ovy = ovx >> sub_x, ovy >> sub_y
    width_b = (bsx - ovx) * nbx + ovx
    height_b = (bsy - ovy) * nby + ovy
    p_wb, p_hb = width_b >> sub_x, height_b >> sub_y
    dst = src.copy()
    radius2 = len(mv_list)

    def block_inputs(i, by, bx):
        pos_x = bx * (bsx - ovx)
        pos_y = by * (bsy - ovy)
        sp_x, sp_y = pos_x >> sub_x, pos_y >> sub_y
        src_blk = src[sp_y:sp_y + p_bsy, sp_x:sp_x + p_bsx]
        refs, weights = [], []
        for r in range(radius2):
            if usable[r]:
                mvx, mvy, msad = mv_list[r][i]
                blx = (pos_x << log_pel) + mvx
                bly = (pos_y << log_pel) + mvy
                if sub_x or sub_y:
                    blx >>= sub_x
                    bly >>= sub_y
                rb = get_ref_block(ref_stacks[r], pel, hpad, vpad, blx, bly,
                                   p_bsy, p_bsx)
                weights.append(degrain_weight(thsad, msad))
            else:
                rb = src_blk
                weights.append(0)
            refs.append(rb)
        wsrc, wrefs = normalise_weights(weights)
        out = 128 + src_blk * wsrc
        for r in range(radius2):
            out = out + refs[r] * wrefs[r]
        return out >> 8

    if ovx == 0 and ovy == 0:
        for by in range(nby):
            for bx in range(nbx):
                blk = block_inputs(by * nbx + bx, by, bx)
                y0, x0 = by * p_bsy, bx * p_bsx
                dst[y0:y0 + p_bsy, x0:x0 + p_bsx] = blk
    else:
        wins = overlap_windows(p_bsx, p_bsy, p_ovx, p_ovy)
        acc = np.zeros((p_hb, p_wb), np.int64)
        for by in range(nby):
            if nby == 1:
                wby = 6
            elif nby == 2:
                wby = 0 if by == 0 else 6
            else:
                wby = ((by + nby - 3) // (nby - 2)) * 3
            for bx in range(nbx):
                wbx = 2 if bx == nbx - 1 else (0 if bx == 0 else 1)
                blk = block_inputs(by * nbx + bx, by, bx)
                win = wins[wby + wbx]
                y0 = by * (p_bsy - p_ovy)
                x0 = bx * (p_bsx - p_ovx)
                acc[y0:y0 + p_bsy, x0:x0 + p_bsx] += (blk * win) >> 6
        pix = np.clip((acc + 16) >> 5, 0, (1 << bits) - 1)
        dst[:p_hb, :p_wb] = pix

    pixel_max = (1 << bits) - 1
    if limit < pixel_max:
        dst = np.minimum(np.maximum(dst, src - limit), src + limit)
    return dst
