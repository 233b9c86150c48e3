"""NumPy oracle for the motion search engine.

A literal, sequential transliteration of the reference's PlaneOfBlocks /
GroupOfPlanes search (PlaneOfBlocks.cpp, GroupOfPlanes.c), against which the
framework's vectorized engine must be bit-exact.  Slow by design; use small
frames in tests.
"""

from __future__ import annotations

import numpy as np

from . import oracle_sad


def _int32(x):
    return int(np.int32(np.int64(x) & 0xFFFFFFFF))


class Plane:
    """One pyramid level of one color plane: stack [pel^2, ph, pw]."""

    def __init__(self, stack, hpad, vpad, pel):
        self.stack = stack
        self.ph, self.pw = stack[0].shape
        self.hpad = hpad
        self.vpad = vpad
        self.pel = pel
        self.log_pel = pel.bit_length() - 1

    def get_block(self, xa, ya, bsy, bsx):
        """Absolute pel coords -> block (mvpGetAbsolutePointerPelN)."""
        m = self.pel - 1
        idx = (xa & m) | ((ya & m) << self.log_pel)
        x = xa >> self.log_pel
        y = ya >> self.log_pel
        return self.stack[idx][y:y + bsy, x:x + bsx]


class POB:
    """PlaneOfBlocks state (PlaneOfBlocks.h:40-135)."""

    def __init__(self, nblkx, nblky, bsx, bsy, pel, level, smallest, chroma,
                 ovx, ovy, xratio, yratio, bits):
        self.nblkx, self.nblky = nblkx, nblky
        self.bsx, self.bsy = bsx, bsy
        self.pel = pel
        self.log_pel = pel.bit_length() - 1
        self.level = level
        self.scale = 1 << level
        self.smallest = smallest
        self.chroma = chroma
        self.ovx, self.ovy = ovx, ovy
        self.xratio, self.yratio = xratio, yratio
        self.logx = xratio.bit_length() - 1
        self.logy = yratio.bit_length() - 1
        self.bits = bits
        self.verybig = bsx * bsy * (1 << bits)
        self.vectors = [[0, 0, 0] for _ in range(nblkx * nblky)]

    # -- pixel access ------------------------------------------------------
    def ref_block(self, vx, vy):
        return self.ref[0].get_block(self.x0 * self.pel + vx,
                                     self.y0 * self.pel + vy,
                                     self.bsy, self.bsx)

    def ref_block_uv(self, plane_i, vx, vy):
        xbias = ((1 << self.logx) - 1) if vx < 0 else 0
        ybias = ((1 << self.logy) - 1) if vy < 0 else 0
        return self.ref[plane_i].get_block(
            self.xc * self.pel + ((vx + xbias) >> self.logx),
            self.yc * self.pel + ((vy + ybias) >> self.logy),
            self.bsy >> self.logy, self.bsx >> self.logx)

    # -- costs -------------------------------------------------------------
    def luma_sad(self, ref_blk):
        dm = self.dctmode
        src = self.src_blk
        if dm == 0:
            return oracle_sad.sad(src, ref_blk)
        if dm == 1:
            dref = self.dct_fn(ref_blk)
            s = oracle_sad.sad(self.dct_src, dref)
            return (s + abs(int(self.dct_src[0, 0]) - int(dref[0, 0])) * 3) * self.bsx // 2
        if dm == 2:
            s = oracle_sad.sad(src, ref_blk)
            if self.dctweight16 > 0:
                dref = self.dct_fn(ref_blk)
                ds = oracle_sad.sad(self.dct_src, dref)
                dctsad = (ds + abs(int(self.dct_src[0, 0]) - int(dref[0, 0])) * 3) * self.bsx // 2
                s = (s * (16 - self.dctweight16) + dctsad * self.dctweight16) // 16
            return s
        if dm in (3, 4):
            ref_luma = oracle_sad.luma(ref_blk)
            s = oracle_sad.sad(src, ref_blk)
            if abs(self.src_luma - ref_luma) > (self.src_luma + ref_luma) >> 5:
                dref = self.dct_fn(ref_blk)
                dctsad = oracle_sad.sad(self.dct_src, dref) * self.bsx // 2
                s = (s // 2 + dctsad // 2 if dm == 3
                     else s // 4 + dctsad // 2 + dctsad // 4)
            return s
        if dm == 5:
            return oracle_sad.satd(src, ref_blk, self.bits)
        if dm == 6:
            s = oracle_sad.sad(src, ref_blk)
            if self.dctweight16 > 0:
                dctsad = oracle_sad.satd(src, ref_blk, self.bits)
                s = (s * (16 - self.dctweight16) + dctsad * self.dctweight16) // 16
            return s
        if dm in (7, 8):
            ref_luma = oracle_sad.luma(ref_blk)
            s = oracle_sad.sad(src, ref_blk)
            if abs(self.src_luma - ref_luma) > (self.src_luma + ref_luma) >> 5:
                dctsad = oracle_sad.satd(src, ref_blk, self.bits)
                s = (s // 2 + dctsad // 2 if dm == 7
                     else s // 4 + dctsad // 2 + dctsad // 4)
            return s
        if dm == 9:
            s = oracle_sad.sad(src, ref_blk)
            if self.dctweight16 > 1:
                wh = self.dctweight16 // 2
                dctsad = oracle_sad.satd(src, ref_blk, self.bits)
                s = (s * (16 - wh) + dctsad * wh) // 16
            return s
        if dm == 10:
            ref_luma = oracle_sad.luma(ref_blk)
            s = oracle_sad.sad(src, ref_blk)
            if abs(self.src_luma - ref_luma) > (self.src_luma + ref_luma) >> 4:
                dctsad = oracle_sad.satd(src, ref_blk, self.bits)
                s = s // 2 + dctsad // 4 + s // 4
            return s
        raise ValueError(dm)

    def chroma_sad(self, vx, vy):
        if not self.chroma:
            return 0
        return (oracle_sad.sad(self.src_blk_u, self.ref_block_uv(1, vx, vy))
                + oracle_sad.sad(self.src_blk_v, self.ref_block_uv(2, vx, vy)))

    def motion_distortion(self, vx, vy):
        dx = _int32(self.pred[0] - vx)
        dy = _int32(self.pred[1] - vy)
        dist = _int32(_int32(dx * dx) + _int32(dy * dy))
        return _int32((self.lam * dist) >> 8)

    def is_ok(self, vx, vy):
        return (vx >= self.dxmin and vy >= self.dymin
                and vx < self.dxmax and vy < self.dymax)

    def clip_mv(self, v):
        return [min(max(v[0], self.dxmin), self.dxmax - 1),
                min(max(v[1], self.dymin), self.dymax - 1), v[2]]

    # -- CheckMV variants (pobCheckMV_Template) ----------------------------
    def check_mv_t(self, vx, vy, penalty_new, update_xy, dir_box=None, val=0):
        if not self.is_ok(vx, vy):
            return
        cost = self.motion_distortion(vx, vy)
        if cost >= self.min_cost:
            return
        sad = self.luma_sad(self.ref_block(vx, vy))
        cost += sad + ((self.pnew * sad) >> 8 if penalty_new else 0)
        if cost >= self.min_cost:
            return
        saduv = 0
        if self.chroma:
            saduv = self.chroma_sad(vx, vy)
            cost += saduv + ((self.pnew * saduv) >> 8 if penalty_new else 0)
            if cost >= self.min_cost:
                return
        if update_xy:
            self.best[0] = vx
            self.best[1] = vy
        self.min_cost = cost
        self.best[2] = sad + saduv
        if dir_box is not None:
            dir_box[0] = val

    def check_mv0(self, vx, vy):
        self.check_mv_t(vx, vy, False, True)

    def check_mv(self, vx, vy):
        self.check_mv_t(vx, vy, True, True)

    def check_mv2(self, vx, vy, dir_box, val):
        self.check_mv_t(vx, vy, True, True, dir_box, val)

    def check_mv_dir(self, vx, vy, dir_box, val):
        self.check_mv_t(vx, vy, True, False, dir_box, val)

    # -- search algorithms -------------------------------------------------
    def onetime_search(self, length):
        d = [0]
        dx, dy = self.best[0], self.best[1]
        self.check_mv2(dx - length, dy, d, 2)
        self.check_mv2(dx + length, dy, d, 1)
        if d[0] == 1:
            while d[0]:
                d[0] = 0
                dx += length
                self.check_mv2(dx + length, dy, d, 1)
        elif d[0] == 2:
            while d[0]:
                d[0] = 0
                dx -= length
                self.check_mv2(dx - length, dy, d, 1)
        self.check_mv2(dx, dy - length, d, 2)
        self.check_mv2(dx, dy + length, d, 1)
        if d[0] == 1:
            while d[0]:
                d[0] = 0
                dy += length
                self.check_mv2(dx, dy + length, d, 1)
        elif d[0] == 2:
            while d[0]:
                d[0] = 0
                dy -= length
                self.check_mv2(dx, dy - length, d, 1)

    def nstep_search(self, stp):
        length = stp
        while length > 0:
            dx, dy = self.best[0], self.best[1]
            self.check_mv(dx + length, dy + length)
            self.check_mv(dx + length, dy)
            self.check_mv(dx + length, dy - length)
            self.check_mv(dx, dy - length)
            self.check_mv(dx, dy + length)
            self.check_mv(dx - length, dy + length)
            self.check_mv(dx - length, dy)
            self.check_mv(dx - length, dy - length)
            length -= 1

    def diamond_search(self, length):
        R, L, D, U = 1, 2, 4, 8
        direction = [15]
        while direction[0] > 0:
            dx, dy = self.best[0], self.best[1]
            last = direction[0]
            direction[0] = 0
            if last & R:
                self.check_mv2(dx + length, dy, direction, R)
            if last & L:
                self.check_mv2(dx - length, dy, direction, L)
            if last & D:
                self.check_mv2(dx, dy + length, direction, D)
            if last & U:
                self.check_mv2(dx, dy - length, direction, U)
            if direction[0]:
                last = direction[0]
                dx, dy = self.best[0], self.best[1]
                if last & (R + L):
                    self.check_mv2(dx, dy + length, direction, D)
                    self.check_mv2(dx, dy - length, direction, U)
                else:
                    self.check_mv2(dx + length, dy, direction, R)
                    self.check_mv2(dx - length, dy, direction, L)
            else:
                pp, mp = (length, length), (-length, length)
                pm, mm = (length, -length), (-length, -length)
                cases = {
                    R: (pp, pm), L: (mp, mm), D: (pp, mp), U: (pm, mm),
                    R + D: (pp, mp, pm), L + D: (pp, mp, mm),
                    R + U: (pp, mm, pm), L + U: (mm, mp, pm),
                }
                diag_val = {pp: R + D, mp: L + D, pm: R + U, mm: L + U}
                for off in cases.get(last, (pp, mp, pm, mm)):
                    self.check_mv2(dx + off[0], dy + off[1], direction,
                                   diag_val[off])

    def expanding_search(self, r, s, mvx, mvy):
        for i in range(-r + s, r, s):
            self.check_mv(mvx + i, mvy - r)
            self.check_mv(mvx + i, mvy + r)
        for j in range(-r + s, r, s):
            self.check_mv(mvx - r, mvy + j)
            self.check_mv(mvx + r, mvy + j)
        self.check_mv(mvx - r, mvy - r)
        self.check_mv(mvx - r, mvy + r)
        self.check_mv(mvx + r, mvy - r)
        self.check_mv(mvx + r, mvy + r)

    HEX2 = [(-1, -2), (-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2),
            (-1, -2), (-2, 0)]
    MOD6M1 = [5, 0, 1, 2, 3, 4, 5, 0]

    def hex2_search(self, i_me_range):
        d = [-2]
        bmx, bmy = self.best[0], self.best[1]
        if i_me_range > 1:
            self.check_mv_dir(bmx - 2, bmy, d, 0)
            self.check_mv_dir(bmx - 1, bmy + 2, d, 1)
            self.check_mv_dir(bmx + 1, bmy + 2, d, 2)
            self.check_mv_dir(bmx + 2, bmy, d, 3)
            self.check_mv_dir(bmx + 1, bmy - 2, d, 4)
            self.check_mv_dir(bmx - 1, bmy - 2, d, 5)
            if d[0] != -2:
                bmx += self.HEX2[d[0] + 1][0]
                bmy += self.HEX2[d[0] + 1][1]
                i = 1
                while i < i_me_range // 2 and self.is_ok(bmx, bmy):
                    odir = self.MOD6M1[d[0] + 1]
                    d[0] = -2
                    self.check_mv_dir(bmx + self.HEX2[odir][0],
                                      bmy + self.HEX2[odir][1], d, odir - 1)
                    self.check_mv_dir(bmx + self.HEX2[odir + 1][0],
                                      bmy + self.HEX2[odir + 1][1], d, odir)
                    self.check_mv_dir(bmx + self.HEX2[odir + 2][0],
                                      bmy + self.HEX2[odir + 2][1], d, odir + 1)
                    if d[0] == -2:
                        break
                    bmx += self.HEX2[d[0] + 1][0]
                    bmy += self.HEX2[d[0] + 1][1]
                    i += 1
            self.best[0] = bmx
            self.best[1] = bmy
        self.expanding_search(1, 1, bmx, bmy)

    def cross_search(self, start, x_max, y_max, mvx, mvy):
        for i in range(start, x_max, 2):
            self.check_mv(mvx - i, mvy)
            self.check_mv(mvx + i, mvy)
        for j in range(start, y_max, 2):
            self.check_mv(mvx, mvy - j)
            self.check_mv(mvx, mvy + j)

    HEX4 = [(-4, 2), (-4, 1), (-4, 0), (-4, -1), (-4, -2), (4, -2),
            (4, -1), (4, 0), (4, 1), (4, 2), (2, 3), (0, 4), (-2, 3),
            (-2, -3), (0, -4), (2, -3)]

    def umh_search(self, i_me_range, omx, omy):
        self.cross_search(1, i_me_range, i_me_range, omx, omy)
        i = 1
        while True:
            for ox, oy in self.HEX4:
                self.check_mv(omx + ox * i, omy + oy * i)
            i += 1
            if i > i_me_range // 4:
                break
        self.hex2_search(i_me_range)

    def refine(self):
        st, param = self.search_type, self.search_param
        if st == 0:
            i = param
            while i > 0:
                self.onetime_search(i)
                i //= 2
        elif st == 1:
            self.nstep_search(param)
        elif st == 2:
            i = param
            while i > 0:
                self.diamond_search(i)
                i //= 2
        elif st == 3:
            mvx, mvy = self.best[0], self.best[1]
            for i in range(1, param + 1):
                self.expanding_search(i, 1, mvx, mvy)
        elif st == 4:
            self.hex2_search(param)
        elif st == 5:
            self.umh_search(param, self.best[0], self.best[1])
        elif st == 6:
            mvx, mvy = self.best[0], self.best[1]
            for i in range(1, param + 1):
                self.check_mv(mvx - i, mvy)
                self.check_mv(mvx + i, mvy)
        elif st == 7:
            mvx, mvy = self.best[0], self.best[1]
            for i in range(1, param + 1):
                self.check_mv(mvx, mvy - i)
                self.check_mv(mvx, mvy + i)

    # -- pseudo-EPZ (pobPseudoEPZSearch) -----------------------------------
    def fetch_predictors(self):
        sd = self.scan_dir
        zero = [0, self.zero_shift_y, 0]
        if (sd == 1 and self.blkx > 0) or (sd == -1 and self.blkx < self.nblkx - 1):
            self.preds[1] = self.clip_mv(self.vectors[self.blkidx - sd])
        else:
            self.preds[1] = self.clip_mv(zero)
        if self.blky > 0:
            self.preds[2] = self.clip_mv(self.vectors[self.blkidx - self.nblkx])
        else:
            self.preds[2] = self.clip_mv(zero)
        x_ok = (sd == 1 and self.blkx < self.nblkx - 1) or (sd == -1 and self.blkx > 0)
        if self.blky < self.nblky - 1 and x_ok:
            self.preds[3] = self.clip_mv(self.vectors[self.blkidx + self.nblkx + sd])
        elif self.blky > 0 and x_ok:
            self.preds[3] = self.clip_mv(self.vectors[self.blkidx - self.nblkx + sd])
        else:
            self.preds[3] = self.clip_mv(zero)
        if self.blky > 0:
            med = lambda a, b, c: max(min(a, b), min(max(a, b), c))
            self.preds[0] = [med(self.preds[1][0], self.preds[2][0], self.preds[3][0]),
                             med(self.preds[1][1], self.preds[2][1], self.preds[3][1]),
                             max(self.preds[1][2], self.preds[2][2], self.preds[3][2])]
        else:
            self.preds[0] = list(self.preds[1])
        if self.smallest:
            self.pred = list(self.preds[0])
        scale = self.lsad / float(self.lsad + (self.pred[2] >> 1))
        self.lam = int(self.lam * scale * scale)

    def pseudo_epz(self):
        self.fetch_predictors()
        if self.dctmode != 0 and self.dctmode <= 4:
            self.dct_src = self.dct_fn(self.src_blk)
        if self.dctmode >= 3:
            self.src_luma = oracle_sad.luma(self.src_blk)

        self.best = [0, self.zero_shift_y, 0]
        sad = self.luma_sad(self.ref_block(0, self.zero_shift_y))
        if self.chroma:
            sad += self.chroma_sad(0, 0)
        self.best[2] = sad
        self.min_cost = sad + ((self.pzero * sad) >> 8)

        many = []
        if self.trymany:
            self.refine()
            many.append((list(self.best), self.min_cost))

        gmv = self.clip_mv(self.gmv)
        sad = self.luma_sad(self.ref_block(gmv[0], gmv[1]))
        if self.chroma:
            sad += self.chroma_sad(gmv[0], gmv[1])
        cost = sad + ((self.pglobal * sad) >> 8)
        if cost < self.min_cost or self.trymany:
            self.best = [gmv[0], gmv[1], sad]
            self.min_cost = cost
        if self.trymany:
            self.refine()
            many.append((list(self.best), self.min_cost))

        sad = self.luma_sad(self.ref_block(self.pred[0], self.pred[1]))
        if self.chroma:
            sad += self.chroma_sad(self.pred[0], self.pred[1])
        cost = sad
        if cost < self.min_cost or self.trymany:
            self.best = [self.pred[0], self.pred[1], sad]
            self.min_cost = cost
        if self.trymany:
            self.refine()
            many.append((list(self.best), self.min_cost))

        for i in range(4):
            if self.trymany:
                self.min_cost = self.verybig + 1
            self.check_mv0(self.preds[i][0], self.preds[i][1])
            if self.trymany:
                self.refine()
                many.append((list(self.best), self.min_cost))

        if self.trymany:
            self.min_cost = self.verybig + 1
            for bv, mc in many:
                if mc < self.min_cost:
                    self.best = list(bv)
                    self.min_cost = mc
        else:
            self.refine()

        found_sad = self.best[2]
        BADCOUNT_LIMIT = 16
        if (self.blkidx > 1
                and found_sad > self.badsad + self.badsad * self.badcount // BADCOUNT_LIMIT):
            self.badcount += 1
            if self.badrange > 0:
                self.umh_search(self.badrange * self.pel, 0, 0)
            elif self.badrange < 0:
                i = 1
                while i < -self.badrange * self.pel:
                    self.expanding_search(i, self.pel, 0, 0)
                    if self.best[2] < found_sad // 4:
                        break
                    i += self.pel
            mvx, mvy = self.best[0], self.best[1]
            for i in range(1, self.pel):
                self.expanding_search(i, 1, mvx, mvy)

        self.vectors[self.blkidx] = list(self.best)


def search_mvs(pob, src_planes, ref_planes, search_type, search_param,
               lam, lsad, pnew, plevel, field_shift, dctmode, dct_fn,
               mean_luma_change, pzero, pglobal, badsad, badrange,
               meander, trymany):
    """doPobSearchMVs (PlaneOfBlocks.cpp:971-1131).  src/ref_planes: lists of
    Plane per color plane.  Returns new mean_luma_change."""
    pob.dctmode = dctmode
    pob.dct_fn = dct_fn
    pob.dctweight16 = min(16, abs(mean_luma_change) // (pob.bsx * pob.bsy))
    pob.badsad = badsad
    pob.badrange = badrange
    pob.zero_shift_y = field_shift
    pob.gmv = [pob.pel * pob.global_mv[0],
               pob.pel * pob.global_mv[1] + field_shift, pob.global_mv[2]]
    pob.src = src_planes
    pob.ref = ref_planes
    pob.search_type = search_type
    pob.search_param = search_param

    n_lambda_level = lam // (pob.pel * pob.pel)
    if plevel == 1:
        n_lambda_level *= pob.scale
    elif plevel == 2:
        n_lambda_level *= pob.scale * pob.scale

    pob.pzero = pzero
    pob.pglobal = pglobal
    pob.badcount = 0
    pob.trymany = trymany
    sum_luma_change = 0

    luma_plane = src_planes[0]
    hpad, vpad = luma_plane.hpad, luma_plane.vpad
    hps, vps = hpad >> pob.level, vpad >> pob.level
    pw, ph = luma_plane.pw, luma_plane.ph
    logp = pob.log_pel

    out = []
    for blky in range(pob.nblky):
        scan_dir = 1 if (blky % 2 == 0 or not meander) else -1
        blkx_start = 0 if scan_dir == 1 else pob.nblkx - 1
        for iblkx in range(pob.nblkx):
            blkx = blkx_start + iblkx * scan_dir
            pob.blkx, pob.blky = blkx, blky
            pob.blkidx = blky * pob.nblkx + blkx
            pob.scan_dir = scan_dir

            pob.x0 = hpad + (pob.bsx - pob.ovx) * blkx
            pob.y0 = vpad + (pob.bsy - pob.ovy) * blky
            pob.xc = src_planes[1].hpad + ((pob.bsx - pob.ovx) >> pob.logx) * blkx if pob.chroma else 0
            pob.yc = src_planes[1].vpad + ((pob.bsy - pob.ovy) >> pob.logy) * blky if pob.chroma else 0

            pob.src_blk = src_planes[0].stack[0][pob.y0:pob.y0 + pob.bsy,
                                                 pob.x0:pob.x0 + pob.bsx]
            if pob.chroma:
                bcy, bcx = pob.bsy >> pob.logy, pob.bsx >> pob.logx
                pob.src_blk_u = src_planes[1].stack[0][pob.yc:pob.yc + bcy,
                                                       pob.xc:pob.xc + bcx]
                pob.src_blk_v = src_planes[2].stack[0][pob.yc:pob.yc + bcy,
                                                       pob.xc:pob.xc + bcx]

            pob.lam = 0 if blky == 0 else n_lambda_level
            pob.pnew = pnew
            pob.lsad = lsad

            pob.dxmax = (pw - pob.x0 - pob.bsx - hpad + hps) << logp
            pob.dymax = (ph - pob.y0 - pob.bsy - vpad + vps) << logp
            pob.dxmin = -((pob.x0 - hpad + hps) << logp)
            pob.dymin = -((pob.y0 - vpad + vps) << logp)

            pob.pred = pob.clip_mv(pob.vectors[pob.blkidx])
            pob.preds = [None] * 5
            pob.preds[4] = pob.clip_mv([0, 0, -1])

            pob.pseudo_epz()

            if pob.smallest:
                sum_luma_change += (oracle_sad.luma(pob.ref_block(0, 0))
                                    - oracle_sad.luma(pob.src_blk))

    if pob.smallest:
        q = sum_luma_change / (pob.nblkx * pob.nblky)
        mean_luma_change = int(q)  # C int division truncates toward zero
    return mean_luma_change


def estimate_global_mv_doubled(pob):
    """pobEstimateGlobalMVDoubled (PlaneOfBlocks.cpp:1559-1636)."""
    freq_size = 8192 * pob.pel * 2
    half = freq_size >> 1

    def most_frequent(comp):
        freq = {}
        indmin, indmax = freq_size - 1, 0
        for v in pob.vectors:
            ind = half + v[comp]
            if 0 <= ind < freq_size:
                freq[ind] = freq.get(ind, 0) + 1
                indmax = max(indmax, ind)
                indmin = min(indmin, ind)
        count = freq.get(indmin, 0)
        index = indmin
        for i in range(indmin + 1, indmax + 1):
            if freq.get(i, 0) > count:
                count = freq.get(i, 0)
                index = i
        return index - half

    medianx = most_frequent(0)
    mediany = most_frequent(1)
    meanvx = meanvy = num = 0
    for v in pob.vectors:
        if abs(v[0] - medianx) < 6 and abs(v[1] - mediany) < 6:
            meanvx += v[0]
            meanvy += v[1]
            num += 1
    if num > 0:
        gx = int(2 * meanvx / num)
        gy = int(2 * meanvy / num)
    else:
        gx, gy = 2 * medianx, 2 * mediany
    return [gx, gy, -1]


def interpolate_prediction(pob, pob2):
    """pobInterpolatePrediction (PlaneOfBlocks.cpp:1447-1514)."""
    norm_factor = 3 - pob.log_pel + pob2.log_pel
    mul_factor = -norm_factor if norm_factor < 0 else 0
    norm_factor = max(norm_factor, 0)
    normov = (pob.bsx - pob.ovx) * (pob.bsy - pob.ovy)
    aoddx = pob.bsx * 3 - pob.ovx * 2
    aevenx = pob.bsx * 3 - pob.ovx * 4
    aoddy = pob.bsy * 3 - pob.ovy * 2
    aeveny = pob.bsy * 3 - pob.ovy * 4
    scaleov = 1.0 / normov

    index = 0
    for l in range(pob.nblky):
        for k in range(pob.nblkx):
            i, j = k, l
            if i >= 2 * pob2.nblkx:
                i = 2 * pob2.nblkx - 1
            if j >= 2 * pob2.nblky:
                j = 2 * pob2.nblky - 1
            offy = -1 + 2 * (j % 2)
            offx = -1 + 2 * (i % 2)
            if i == 0 or i >= 2 * pob2.nblkx - 1:
                if j == 0 or j >= 2 * pob2.nblky - 1:
                    v1 = v2 = v3 = v4 = pob2.vectors[i // 2 + (j // 2) * pob2.nblkx]
                else:
                    v1 = v2 = pob2.vectors[i // 2 + (j // 2) * pob2.nblkx]
                    v3 = v4 = pob2.vectors[i // 2 + (j // 2 + offy) * pob2.nblkx]
            elif j == 0 or j >= 2 * pob2.nblky - 1:
                v1 = v2 = pob2.vectors[i // 2 + (j // 2) * pob2.nblkx]
                v3 = v4 = pob2.vectors[i // 2 + offx + (j // 2) * pob2.nblkx]
            else:
                v1 = pob2.vectors[i // 2 + (j // 2) * pob2.nblkx]
                v2 = pob2.vectors[i // 2 + offx + (j // 2) * pob2.nblkx]
                v3 = pob2.vectors[i // 2 + (j // 2 + offy) * pob2.nblkx]
                v4 = pob2.vectors[i // 2 + offx + (j // 2 + offy) * pob2.nblkx]

            if pob.ovx == 0 and pob.ovy == 0:
                x = 9 * v1[0] + 3 * v2[0] + 3 * v3[0] + v4[0]
                y = 9 * v1[1] + 3 * v2[1] + 3 * v3[1] + v4[1]
                sad = 9 * v1[2] + 3 * v2[2] + 3 * v3[2] + v4[2] + 8
            elif pob.ovx <= pob.bsx // 2 and pob.ovy <= pob.bsy // 2:
                ax1 = aoddx if offx > 0 else aevenx
                ax2 = (pob.bsx - pob.ovx) * 4 - ax1
                ay1 = aoddy if offy > 0 else aeveny
                ay2 = (pob.bsy - pob.ovy) * 4 - ay1
                a11, a12, a21, a22 = ax1 * ay1, ax1 * ay2, ax2 * ay1, ax2 * ay2
                x = int((a11 * v1[0] + a21 * v2[0] + a12 * v3[0] + a22 * v4[0]) * scaleov)
                y = int((a11 * v1[1] + a21 * v2[1] + a12 * v3[1] + a22 * v4[1]) * scaleov)
                sad = int((a11 * v1[2] + a21 * v2[2] + a12 * v3[2] + a22 * v4[2]) * scaleov)
            else:
                x = (v1[0] + v2[0] + v3[0] + v4[0]) << 2
                y = (v1[1] + v2[1] + v3[1] + v4[1]) << 2
                sad = (v1[2] + v2[2] + v3[2] + v4[2] + 2) << 2

            pob.vectors[index] = [(x >> norm_factor) * (1 << mul_factor),
                                  (y >> norm_factor) * (1 << mul_factor),
                                  sad >> 4]
            index += 1


# ---------------------------------------------------------------------------
# GOP-level driver (gopSearchMVs GroupOfPlanes.c:69-125)


def build_planes(frame_planes, hpad, vpad, pel, levels, sharp, rfilter,
                 xratio, yratio, bits):
    """Build oracle Plane pyramids for all color planes of one frame.
    Returns levels x planes nested list."""
    from . import oracle_frame as of
    per_plane = []
    for pi, plane in enumerate(frame_planes):
        if pi == 0:
            subs, coarse = of.build_super_plane(
                plane, hpad, vpad, pel, levels, sharp, rfilter,
                xratio, yratio, bits, is_luma=True)
            hp, vp = hpad, vpad
        else:
            subs, coarse = of.build_super_plane(
                plane, hpad // xratio, vpad // yratio, pel, levels, sharp,
                rfilter, xratio, yratio, bits, is_luma=False)
            hp, vp = hpad // xratio, vpad // yratio
        lvls = [Plane(subs, hp, vp, pel)]
        for c in coarse:
            lvls.append(Plane([c], hp, vp, 1))
        per_plane.append(lvls)
    # transpose to levels x planes
    return [[per_plane[p][lv] for p in range(len(per_plane))]
            for lv in range(levels)]


def gop_search(src_levels, ref_levels, *, lv_count, blk_x, blk_y, bsx, bsy,
               ovx, ovy, pel, xratio, yratio, bits, chroma,
               search_type, search_coarse, search_param, pel_search,
               lam, lsad, pnew, plevel, global_, pzero, pglobal,
               badsad, badrange, meander, trymany, dctmode=0, dct_fn=None,
               field_shift=0):
    """Returns list over levels (finest first) of vectors lists."""
    width_b = (bsx - ovx) * blk_x + ovx
    height_b = (bsy - ovy) * blk_y + ovy
    pobs = []
    for lv in range(lv_count):
        nbx = ((width_b >> lv) - ovx) // (bsx - ovx)
        nby = ((height_b >> lv) - ovy) // (bsy - ovy)
        pobs.append(POB(nbx, nby, bsx, bsy, pel if lv == 0 else 1, lv,
                        lv == lv_count - 1, chroma, ovx, ovy, xratio, yratio,
                        bits))

    if not global_:
        pglobal = pzero
    global_mv = [0, 0, -1]
    mean = 0
    horiz_vert = search_type in (6, 7)

    for lv in range(lv_count - 1, -1, -1):
        pob = pobs[lv]
        coarsest = lv == lv_count - 1
        if horiz_vert:
            st_lv = search_type
        elif coarsest:
            st_lv = search_type if lv_count == 1 else search_coarse
        elif lv == 0:
            st_lv = search_type
        else:
            st_lv = search_coarse
        if coarsest:
            param_lv = pel_search if lv_count == 1 else search_param
        elif lv == 0:
            param_lv = pel_search
        else:
            param_lv = search_param
        trymany_lv = trymany and lv > 0
        if not coarsest:
            if global_:
                global_mv = estimate_global_mv_doubled(pobs[lv + 1])
            interpolate_prediction(pob, pobs[lv + 1])
        fs_cur = field_shift if lv == 0 else 0
        pob.global_mv = global_mv
        mean = search_mvs(pob, src_levels[lv], ref_levels[lv], st_lv,
                          param_lv, lam, lsad, pnew, plevel, fs_cur,
                          dctmode, dct_fn, mean, pzero, pglobal, badsad,
                          badrange, meander, trymany_lv)
    return [pob.vectors for pob in pobs]


def recalculate_mvs(pob, fgop_vectors, old_meta, src_planes, ref_planes,
                    search_type, search_param, lam, pnew, field_shift,
                    thsad, dctmode, dct_fn, smooth, meander):
    """doPobRecalculateMVs (PlaneOfBlocks.cpp:1158-1424).  fgop_vectors:
    list of (x, y, sad) on the old grid; old_meta: dict with old grid
    geometry (nblkx, nblky, bsx, bsy, ovx, ovy, pel)."""
    pob.dctmode = dctmode
    pob.dct_fn = dct_fn
    pob.dctweight16 = 8
    pob.zero_shift_y = field_shift
    pob.gmv = [0, field_shift, 9999999]
    pob.src = src_planes
    pob.ref = ref_planes
    pob.search_type = search_type
    pob.search_param = search_param
    pob.badcount = 0
    pob.trymany = False

    n_lambda_level = lam // (pob.pel * pob.pel)

    nbxo = old_meta["nblkx"]
    nbyo = old_meta["nblky"]
    bsxo = old_meta["bsx"]
    bsyo = old_meta["bsy"]
    step_xo = bsxo - old_meta["ovx"]
    step_yo = bsyo - old_meta["ovy"]
    pel_old = old_meta["pel"]
    log_pel_old = pel_old.bit_length() - 1

    luma_plane = src_planes[0]
    hpad, vpad = luma_plane.hpad, luma_plane.vpad
    pw, ph = luma_plane.pw, luma_plane.ph
    logp = pob.log_pel

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for blky in range(pob.nblky):
        scan_dir = 1 if (blky % 2 == 0 or not meander) else -1
        blkx_start = 0 if scan_dir == 1 else pob.nblkx - 1
        for iblkx in range(pob.nblkx):
            blkx = blkx_start + iblkx * scan_dir
            pob.blkx, pob.blky = blkx, blky
            pob.blkidx = blky * pob.nblkx + blkx
            pob.scan_dir = scan_dir

            pob.x0 = hpad + (pob.bsx - pob.ovx) * blkx
            pob.y0 = vpad + (pob.bsy - pob.ovy) * blky
            if pob.chroma:
                pob.xc = src_planes[1].hpad + ((pob.bsx - pob.ovx) >> pob.logx) * blkx
                pob.yc = src_planes[1].vpad + ((pob.bsy - pob.ovy) >> pob.logy) * blky

            pob.src_blk = src_planes[0].stack[0][pob.y0:pob.y0 + pob.bsy,
                                                 pob.x0:pob.x0 + pob.bsx]
            if pob.chroma:
                bcy, bcx = pob.bsy >> pob.logy, pob.bsx >> pob.logx
                pob.src_blk_u = src_planes[1].stack[0][pob.yc:pob.yc + bcy,
                                                       pob.xc:pob.xc + bcx]
                pob.src_blk_v = src_planes[2].stack[0][pob.yc:pob.yc + bcy,
                                                       pob.xc:pob.xc + bcx]

            pob.lam = 0 if blky == 0 else n_lambda_level
            pob.pnew = pnew

            pob.dxmax = (pw - pob.x0 - pob.bsx) << logp
            pob.dymax = (ph - pob.y0 - pob.bsy) << logp
            pob.dxmin = -(pob.x0 << logp)
            pob.dymin = -(pob.y0 << logp)

            center_x = pob.bsx // 2 + (pob.bsx - pob.ovx) * blkx
            center_y = pob.bsy // 2 + (pob.bsy - pob.ovy) * blky
            blkxold = tdiv(center_x - bsxo // 2, step_xo)
            blkyold = tdiv(center_y - bsyo // 2, step_yo)
            delta_x = max(0, center_x - (bsxo // 2 + step_xo * blkxold))
            delta_y = max(0, center_y - (bsyo // 2 + step_yo * blkyold))
            bx1 = min(nbxo - 1, max(0, blkxold))
            bx2 = min(nbxo - 1, max(0, blkxold + 1))
            by1 = min(nbyo - 1, max(0, blkyold))
            by2 = min(nbyo - 1, max(0, blkyold + 1))

            if smooth == 1:
                v1 = fgop_vectors[bx1 + by1 * nbxo]
                v2 = fgop_vectors[bx2 + by1 * nbxo]
                v3 = fgop_vectors[bx1 + by2 * nbxo]
                v4 = fgop_vectors[bx2 + by2 * nbxo]

                def lerp(c):
                    a = v1[c] * step_xo + delta_x * (v2[c] - v1[c])
                    b = v3[c] * step_xo + delta_x * (v4[c] - v3[c])
                    return tdiv(a + tdiv(delta_y * (b - a), step_yo), step_xo)
                vector_old = [lerp(0), lerp(1), lerp(2)]
            else:
                if delta_x * 2 < step_xo and delta_y * 2 < step_yo:
                    vector_old = list(fgop_vectors[bx1 + by1 * nbxo])
                elif delta_x * 2 >= step_xo and delta_y * 2 < step_yo:
                    vector_old = list(fgop_vectors[bx2 + by1 * nbxo])
                elif delta_x * 2 < step_xo and delta_y * 2 >= step_yo:
                    vector_old = list(fgop_vectors[bx1 + by2 * nbxo])
                else:
                    vector_old = list(fgop_vectors[bx2 + by2 * nbxo])

            vector_old[0] = (vector_old[0] << logp) >> log_pel_old
            vector_old[1] = (vector_old[1] << logp) >> log_pel_old

            pob.pred = pob.clip_mv(vector_old)
            pob.pred[2] = vector_old[2] * (pob.bsx * pob.bsy) // (bsxo * bsyo)

            pob.best = list(pob.pred)

            if pob.dctmode != 0 and pob.dctmode <= 4:
                pob.dct_src = pob.dct_fn(pob.src_blk)
            if pob.dctmode >= 3:
                pob.src_luma = oracle_sad.luma(pob.src_blk)

            sad = pob.luma_sad(pob.ref_block(pob.pred[0], pob.pred[1]))
            if pob.chroma:
                sad += pob.chroma_sad(pob.pred[0], pob.pred[1])
            pob.best[2] = sad
            pob.min_cost = sad

            if pob.best[2] > thsad:
                pob.refine()

            pob.vectors[pob.blkidx] = list(pob.best)
    return pob.vectors
