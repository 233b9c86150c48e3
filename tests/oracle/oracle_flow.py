"""NumPy oracles for SimpleResize, occlusion masks, and flow kernels."""

from __future__ import annotations

import numpy as np


WEIGHT_SHIFT = 14
WEIGHT_MAX = 1 << WEIGHT_SHIFT
WEIGHT_HALF = WEIGHT_MAX // 2


def init_tables(out, in_):
    """InitTables (SimpleResize.cpp:27-56), float32 arithmetic."""
    leftmost = np.float32(0.5)
    rightmost = np.float32(in_) - np.float32(0.5)
    leftmost_idx = max(int(leftmost), 0)
    rightmost_idx = min(int(rightmost), in_ - 1)
    offsets = np.zeros(out, np.int64)
    weights = np.zeros(out, np.int64)
    for i in range(out):
        position = np.float32((i + np.float32(0.5)) * np.float32(in_)
                              / np.float32(out))
        if position <= leftmost:
            offset, weight = leftmost_idx, np.float32(0)
        elif position >= rightmost:
            offset, weight = rightmost_idx - 1, np.float32(1)
        else:
            offset = int(position - leftmost)
            weight = np.float32(position - leftmost - np.float32(offset))
        offsets[i] = offset
        weights[i] = int(weight * WEIGHT_MAX)
    return offsets, weights


def simple_resize(src, dst_h, dst_w, limit=False, limit_w=0, limit_h=0,
                  pel=1, horizontal_vectors=False):
    """simpleResize (SimpleResize.cpp:60-121)."""
    sh, sw = src.shape
    v_off, v_w = init_tables(dst_h, sh)
    h_off, h_w = init_tables(dst_w, sw)
    src = src.astype(np.int64)
    dst = np.zeros((dst_h, dst_w), np.int64)
    minimum = 0
    maximum = limit_h * pel - 1
    h_step = pel if horizontal_vectors else 0
    v_step = 0 if horizontal_vectors else pel
    for y in range(dst_h):
        wb = v_w[y]
        wt = WEIGHT_MAX - wb
        r1 = src[v_off[y]]
        r2 = src[min(v_off[y] + 1, sh - 1)]
        work = (r1 * wt + r2 * wb + WEIGHT_HALF) >> WEIGHT_SHIFT
        if horizontal_vectors:
            minimum = 0
            maximum = limit_w * pel - 1
        for x in range(dst_w):
            wr = h_w[x]
            wl = WEIGHT_MAX - wr
            off = h_off[x]
            res = (work[off] * wl + work[min(off + 1, sw - 1)] * wr
                   + WEIGHT_HALF) >> WEIGHT_SHIFT
            if limit:
                res = max(minimum, min(res, maximum))
                minimum -= h_step
                maximum -= h_step
            dst[y, x] = res
        if limit:
            minimum -= v_step
            maximum -= v_step
    return dst


def make_vector_occlusion_mask_time(vx, vy, is_backward, mask_norm_divider,
                                    gamma, pel, time256, step_x, step_y):
    """MakeVectorOcclusionMaskTime (MaskFun.cpp:94-132), serial spans."""
    nblky, nblkx = vx.shape
    occ_mask = np.zeros((nblky, nblkx), np.int64)
    time4096x = time256 * 16 // (step_x * pel)
    time4096y = time256 * 16 // (step_y * pel)
    occnorm_x = 80.0 / (mask_norm_divider * step_x * pel)
    occnorm_y = 80.0 / (mask_norm_divider * step_y * pel)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    def byte_occ(cur, occlusion, occnorm):
        if gamma == 1.0:
            return max(cur, min(int(255 * occlusion * occnorm), 255))
        return max(cur, min(int(255 * (occlusion * occnorm) ** gamma), 255))

    for by in range(nblky):
        for bx in range(nblkx):
            v_x, v_y = int(vx[by, bx]), int(vy[by, bx])
            if bx < nblkx - 1:
                vx1 = int(vx[by, bx + 1])
                if vx1 < v_x:
                    occ = v_x - vx1
                    if is_backward:
                        minb = max(0, bx + 1 - tdiv(occ * time4096x, 4096))
                        maxb = bx + 1
                    else:
                        minb = bx
                        maxb = min(bx + 1 - tdiv(occ * time4096x, 4096),
                                   nblkx - 1)
                    for bxi in range(minb, maxb + 1):
                        occ_mask[by, bxi] = byte_occ(occ_mask[by, bxi], occ,
                                                     occnorm_x)
            if by < nblky - 1:
                vy1 = int(vy[by + 1, bx])
                if vy1 < v_y:
                    occ = v_y - vy1
                    if is_backward:
                        minb = max(0, by + 1 - tdiv(occ * time4096y, 4096))
                        maxb = by + 1
                    else:
                        minb = by
                        maxb = min(by + 1 - tdiv(occ * time4096y, 4096),
                                   nblky - 1)
                    for byi in range(minb, maxb + 1):
                        occ_mask[byi, bx] = byte_occ(occ_mask[byi, bx], occ,
                                                     occnorm_y)
    return occ_mask


def flow_inter(pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf, mask_b, mask_f,
               time256, pel):
    """FlowInter (MaskFun.cpp:374-417) with explicit 2-D addressing."""
    pel_log = pel.bit_length() - 1
    h, w = vxb.shape
    dst = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            t = time256
            vxf_t = (int(vxf[y, x]) * t) >> 8
            vyf_t = (int(vyf[y, x]) * t) >> 8
            dst_f = int(pref_f[oy + (y << pel_log) + vyf_t,
                               ox + (x << pel_log) + vxf_t])
            dst_f0 = int(pref_f[oy + (y << pel_log), ox + (x << pel_log)])
            vxb_t = (int(vxb[y, x]) * (256 - t)) >> 8
            vyb_t = (int(vyb[y, x]) * (256 - t)) >> 8
            dst_b = int(pref_b[oy + (y << pel_log) + vyb_t,
                               ox + (x << pel_log) + vxb_t])
            dst_b0 = int(pref_b[oy + (y << pel_log), ox + (x << pel_log)])
            mf, mb = int(mask_f[y, x]), int(mask_b[y, x])
            dst[y, x] = ((((dst_f * (255 - mf)
                            + ((mf * (dst_b * (255 - mb) + mb * dst_f0) + 255) >> 8) + 255) >> 8) * (256 - t)
                          + ((dst_b * (255 - mb)
                              + ((mb * (dst_f * (255 - mf) + mf * dst_b0) + 255) >> 8) + 255) >> 8) * t) >> 8)
    return dst


def flow_inter_simple(pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf, mask_b,
                      mask_f, time256, pel):
    """FlowInterSimple (MaskFun.cpp:491-555)."""
    pel_log = pel.bit_length() - 1
    h, w = vxb.shape
    dst = np.zeros((h, w), np.int64)
    t = time256
    for y in range(h):
        for x in range(w):
            mf, mb = int(mask_f[y, x]), int(mask_b[y, x])
            if t == 128:
                vxf_t, vyf_t = int(vxf[y, x]) >> 1, int(vyf[y, x]) >> 1
                vxb_t, vyb_t = int(vxb[y, x]) >> 1, int(vyb[y, x]) >> 1
                dst_f = int(pref_f[oy + (y << pel_log) + vyf_t,
                                   ox + (x << pel_log) + vxf_t])
                dst_b = int(pref_b[oy + (y << pel_log) + vyb_t,
                                   ox + (x << pel_log) + vxb_t])
                dst[y, x] = (((dst_f + dst_b) << 8)
                             + (dst_b - dst_f) * (mf - mb)) >> 9
            else:
                vxf_t, vyf_t = (int(vxf[y, x]) * t) >> 8, (int(vyf[y, x]) * t) >> 8
                vxb_t = (int(vxb[y, x]) * (256 - t)) >> 8
                vyb_t = (int(vyb[y, x]) * (256 - t)) >> 8
                dst_f = int(pref_f[oy + (y << pel_log) + vyf_t,
                                   ox + (x << pel_log) + vxf_t])
                dst_b = int(pref_b[oy + (y << pel_log) + vyb_t,
                                   ox + (x << pel_log) + vxb_t])
                dst[y, x] = (((dst_f * (255 - mf) + dst_b * mf + 255) >> 8) * (256 - t)
                             + ((dst_b * (255 - mb) + dst_f * mb + 255) >> 8) * t) >> 8
    return dst
