"""mv.Analyse equivalent: hierarchical block motion search.

A TPU-first redesign of the reference engine (GroupOfPlanes.c:69-125,
PlaneOfBlocks.cpp:819-1131).  The reference walks blocks serially and probes
candidate vectors one at a time; here every *probe set* (the 6 hexagon
points, an expanding ring, the UMH cross, ...) is evaluated as one batched
gather + SAD reduction with a first-index argmin.  Because the reference's
update rule is strictly-less-than (pobCheckMV_Template
PlaneOfBlocks.cpp:219-261: `cost >= nMinCost` rejects), the first candidate
achieving the batch minimum wins ties — exactly the sequential semantics —
so results are bit-exact while each step keeps whole vectors of work on the
VPU.  The loop-carried block dependencies (left/top predictors,
PlaneOfBlocks.cpp:419-463) are honoured by a lax.scan over blocks in meander
order; batch-of-frames vmap on top of this function is where the TPU gets
its throughput (the reference gets the same parallelism from the
VapourSynth host thread pool instead).

Float islands: the lambda adaptation uses C doubles
(pobFetchPredictors PlaneOfBlocks.cpp:461-462), reproduced here in float64.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import AnalyseSpec
from .core.types import MVField, MVPlaneField, SearchType
from .ops import dct as dct_ops
from .ops import sad as sad_ops
from .super import Super

I32 = jnp.int32
I64 = jnp.int64
_INF = jnp.int64(1 << 62)


def _i32(x):
    return jnp.asarray(x, I32)


def _i64(x):
    return jnp.asarray(x, I64)


class LevelCtx(NamedTuple):
    """Static + array context of one pyramid level of one frame pair."""
    src_planes: Tuple[jnp.ndarray, ...]   # per color plane [ph, pw] (level subplane 0)
    ref_stacks: Tuple[jnp.ndarray, ...]   # per color plane [pel^2, ph, pw]
    # static geometry
    level: int
    pel: int            # this level's pel (1 except finest)
    log_pel: int
    blk_size: Tuple[int, int]       # (bsx, bsy) luma
    blk_size_c: Tuple[int, int]     # chroma block size
    nblk: Tuple[int, int]           # (nblkx, nblky)
    overlap: Tuple[int, int]
    log_ratio_uv: Tuple[int, int]   # (log x, log y)
    hpad: Tuple[int, int]           # (luma, chroma)
    vpad: Tuple[int, int]
    padded: Tuple[int, int]         # luma (pw, ph)
    bits: int
    chroma: bool


class BlockCtx(NamedTuple):
    """Traced per-block search context (fixed during one block's search)."""
    src: jnp.ndarray                  # [bsy, bsx] int32 luma source block
    src_u: Any                        # chroma blocks or None
    src_v: Any
    x0: jnp.ndarray                   # absolute luma coords (incl. padding)
    y0: jnp.ndarray
    xc: jnp.ndarray                   # absolute chroma coords
    yc: jnp.ndarray
    dxmin: jnp.ndarray
    dxmax: jnp.ndarray
    dymin: jnp.ndarray
    dymax: jnp.ndarray
    pred_x: jnp.ndarray               # predictor for motion distortion
    pred_y: jnp.ndarray
    lam: jnp.ndarray                  # int64 lambda (after adaptation)
    pnew: jnp.ndarray                 # int32
    dct_src: Any                      # int32 dct of src block (modes 1-4)
    src_luma: Any                     # int32 luma sum of src (modes >= 3)
    dctweight16: Any                  # traced (modes 2,6,9)


# ---------------------------------------------------------------------------
# Candidate evaluation


def mix_satd_cost(dctmode: int, s, satd_v, src_luma, ref_luma,
                  dctweight16):
    """Luma cost for SATD modes 5-10 from precomputed SAD/SATD/luma
    (pobLumaSAD PlaneOfBlocks.cpp:117-203) — shared by the vmapped
    evaluator and the field-level lockstep path."""
    s = s.astype(I64)
    satd_v = satd_v.astype(I64)
    if dctmode == 5:
        return satd_v
    if dctmode == 6:
        w16 = _i64(dctweight16)
        mixed = (s * (16 - w16) + satd_v * w16) // 16
        return jnp.where(w16 > 0, mixed, s)
    if dctmode in (7, 8):
        adapt = jnp.abs(src_luma - ref_luma) > ((src_luma + ref_luma) >> 5)
        mixed = (s // 2 + satd_v // 2 if dctmode == 7
                 else s // 4 + satd_v // 2 + satd_v // 4)
        return jnp.where(adapt, mixed, s)
    if dctmode == 9:
        w16 = _i64(dctweight16)
        wh = w16 // 2
        mixed = (s * (16 - wh) + satd_v * wh) // 16
        return jnp.where(w16 > 1, mixed, s)
    if dctmode == 10:
        adapt = jnp.abs(src_luma - ref_luma) > ((src_luma + ref_luma) >> 4)
        mixed = s // 2 + satd_v // 4 + s // 4
        return jnp.where(adapt, mixed, s)
    raise ValueError(f"dctmode {dctmode}")


def mix_dct_cost(dctmode: int, s, dct_src, dct_ref, src_luma, ref_luma,
                 dctweight16, bsx: int):
    """Luma cost for DCT modes 1-4 from requantised DCT blocks
    (pobLumaSAD PlaneOfBlocks.cpp:123-163) — shared by the vmapped
    evaluator, the dense evaluator, and the field-level lockstep path.
    dct_src/dct_ref: [..., bh, bw] int32; s: plain SAD (unused by
    mode 1)."""
    ds = jnp.sum(jnp.abs(dct_src - dct_ref), axis=(-2, -1))
    dc = jnp.abs(dct_src[..., 0, 0] - dct_ref[..., 0, 0])
    return mix_dct_cost_sums(dctmode, s, ds, dc, src_luma, ref_luma,
                             dctweight16, bsx)


def mix_dct_cost_sums(dctmode: int, s, ds, dc, src_luma, ref_luma,
                      dctweight16, bsx: int):
    """mix_dct_cost from precomputed |dct diff| sums: ds = sum|dctS-dctR|
    over the block, dc = |dctS[0,0]-dctR[0,0]| (the dct stat-map path
    stores these per grid offset instead of whole DCT blocks)."""
    ds = ds.astype(I64)
    dc = dc.astype(I64)
    if s is not None:
        s = s.astype(I64)
    if dctmode == 1:
        return (ds + dc * 3) * bsx // 2
    if dctmode == 2:
        dctsad = (ds + dc * 3) * bsx // 2
        w16 = _i64(dctweight16)
        mixed = (s * (16 - w16) + dctsad * w16) // 16
        return jnp.where(w16 > 0, mixed, s)
    if dctmode in (3, 4):
        dctsad = ds * bsx // 2
        adapt = jnp.abs(src_luma - ref_luma) > ((src_luma + ref_luma) >> 5)
        mixed = (s // 2 + dctsad // 2 if dctmode == 3
                 else s // 4 + dctsad // 2 + dctsad // 4)
        return jnp.where(adapt, mixed, s)
    raise ValueError(f"dctmode {dctmode}")


def _make_evaluator(ctx: LevelCtx, dctmode: int):
    """Build luma_sad(bc, vxs, vys) and chroma_sad(bc, vxs, vys) closures for
    a batch of candidate vectors [K] (pobLumaSAD PlaneOfBlocks.cpp:117-203,
    pobGetRefBlock* :34-101)."""
    bsx, bsy = ctx.blk_size
    bcx, bcy = ctx.blk_size_c
    logp = ctx.log_pel
    pelm = ctx.pel - 1
    logx, logy = ctx.log_ratio_uv

    def gather_luma(bc: BlockCtx, vx, vy):
        xa = (bc.x0 << logp) + vx
        ya = (bc.y0 << logp) + vy
        idx = (xa & pelm) | ((ya & pelm) << logp)
        blk = jax.lax.dynamic_slice(
            ctx.ref_stacks[0], (idx, ya >> logp, xa >> logp), (1, bsy, bsx))
        return blk[0].astype(I32)

    def gather_chroma(plane_i, bc: BlockCtx, vx, vy):
        xbias = jnp.where(vx < 0, (1 << logx) - 1, 0)
        ybias = jnp.where(vy < 0, (1 << logy) - 1, 0)
        cx = ((bc.xc << logp) + ((vx + xbias) >> logx)).astype(I32)
        cy = ((bc.yc << logp) + ((vy + ybias) >> logy)).astype(I32)
        idx = (cx & pelm) | ((cy & pelm) << logp)
        blk = jax.lax.dynamic_slice(
            ctx.ref_stacks[plane_i], (idx, cy >> logp, cx >> logp), (1, bcy, bcx))
        return blk[0].astype(I32)

    g_luma = jax.vmap(gather_luma, in_axes=(None, 0, 0))
    g_u = jax.vmap(functools.partial(gather_chroma, 1), in_axes=(None, 0, 0))
    g_v = jax.vmap(functools.partial(gather_chroma, 2), in_axes=(None, 0, 0))

    def luma_sad(bc: BlockCtx, vxs, vys):
        refs = g_luma(bc, vxs, vys)        # [K, bsy, bsx]
        if dctmode == 0:
            return sad_ops.sad(bc.src, refs).astype(I64)
        if 1 <= dctmode <= 4:
            dct_ref = dct_ops.dct_block(refs, ctx.bits)
            s = (None if dctmode == 1
                 else sad_ops.sad(bc.src, refs).astype(I64))
            ref_luma = (sad_ops.luma(refs).astype(I64)
                        if dctmode in (3, 4) else None)
            src_luma = _i64(bc.src_luma) if dctmode in (3, 4) else None
            return mix_dct_cost(dctmode, s, bc.dct_src, dct_ref,
                                src_luma, ref_luma, bc.dctweight16, bsx)
        if 5 <= dctmode <= 10:
            s = sad_ops.sad(bc.src, refs)
            satd_v = sad_ops.satd(bc.src, refs)
            ref_luma = (sad_ops.luma(refs).astype(I64)
                        if dctmode in (7, 8, 10) else None)
            src_luma = (_i64(bc.src_luma) if dctmode in (7, 8, 10)
                        else None)
            return mix_satd_cost(dctmode, s, satd_v, src_luma, ref_luma,
                                 bc.dctweight16)
        raise ValueError(f"dctmode {dctmode}")

    def chroma_sad(bc: BlockCtx, vxs, vys):
        if not ctx.chroma:
            return jnp.zeros(vxs.shape, I64)
        su = sad_ops.sad(bc.src_u, g_u(bc, vxs, vys)).astype(I64)
        sv = sad_ops.sad(bc.src_v, g_v(bc, vxs, vys)).astype(I64)
        return su + sv

    return luma_sad, chroma_sad


def _motion_distortion(bc: BlockCtx, vxs, vys):
    """lambda * |v - pred|^2 >> 8, truncated through C int
    (pobMotionDistorsion PlaneOfBlocks.cpp:104-114: the product is int64 but
    the result is cast to int)."""
    dx = (bc.pred_x - vxs).astype(I32)
    dy = (bc.pred_y - vys).astype(I32)
    dist = (dx * dx + dy * dy).astype(I32)  # C int arithmetic (wraps)
    md = (bc.lam * dist.astype(I64)) >> 8
    return md.astype(I32).astype(I64)       # (int) cast, sign-extended back


# search state: best vector, its sad, running min cost, direction flag
def _st(bx, by, bsad, mincost, direction=0):
    return {"bx": _i32(bx), "by": _i32(by), "bsad": _i64(bsad),
            "mincost": _i64(mincost), "dir": _i32(direction)}


class SearchEngine:
    """Per-level search machinery specialised on static config.

    lockstep=True selects mask-based control flow instead of
    lax.cond/lax.switch around inner while loops: under vmap a batched cond
    must evaluate both branches anyway, and the XLA TPU backend
    additionally materializes the gather operand per batch lane for
    cond-wrapped loops (OOM at real sizes) — masked execution avoids both.
    Candidate-evaluation ORDER inside a switch case may differ from the
    reference in lockstep mode (tie-breaks only).
    """

    def __init__(self, ctx: LevelCtx, dctmode: int, lockstep: bool = False):
        self.ctx = ctx
        self.dctmode = dctmode
        self.lockstep = lockstep
        self.luma_sad, self.chroma_sad = _make_evaluator(ctx, dctmode)

    # -- the core batched CheckMV -----------------------------------------
    # Candidate batches larger than this are evaluated as sequential
    # sub-batches: the running-minimum update rule is associative across
    # calls (first strict improvement wins either way), and it bounds the
    # gather working set to nblk * CHUNK * blkarea under the block vmap.
    CANDIDATE_CHUNK = 32

    def check_batch(self, bc: BlockCtx, st, vxs, vys, penalty_new=True,
                    update_xy=True, dir_vals=None, extra_mask=None):
        """Evaluate candidates in order; first strict improvement of the
        batch minimum wins (== sequential pobCheckMV semantics)."""
        vxs = _i32(vxs)
        vys = _i32(vys)
        k_total = vxs.shape[0]
        if k_total > self.CANDIDATE_CHUNK:
            c = self.CANDIDATE_CHUNK
            for lo in range(0, k_total, c):
                dv = None
                if dir_vals is not None:
                    dv = jnp.asarray(dir_vals)[lo:lo + c]
                em = None if extra_mask is None else extra_mask[lo:lo + c]
                st = self.check_batch(bc, st, vxs[lo:lo + c], vys[lo:lo + c],
                                      penalty_new=penalty_new,
                                      update_xy=update_xy, dir_vals=dv,
                                      extra_mask=em)
            return st
        ok = ((vxs >= bc.dxmin) & (vys >= bc.dymin)
              & (vxs < bc.dxmax) & (vys < bc.dymax))
        if extra_mask is not None:
            ok = ok & extra_mask
        # clamp for safe gathering; masked out below
        cvx = jnp.clip(vxs, bc.dxmin, bc.dxmax - 1)
        cvy = jnp.clip(vys, bc.dymin, bc.dymax - 1)
        md = _motion_distortion(bc, cvx, cvy)
        ls = self.luma_sad(bc, cvx, cvy)
        cs = self.chroma_sad(bc, cvx, cvy)
        sad_tot = ls + cs
        cost = md + sad_tot
        if penalty_new:
            pn = _i64(bc.pnew)
            cost = cost + ((pn * ls) >> 8) + ((pn * cs) >> 8)
        cost = jnp.where(ok, cost, _INF)
        k = jnp.argmin(cost)
        improve = cost[k] < st["mincost"]
        new_st = dict(st)
        if update_xy:
            new_st["bx"] = jnp.where(improve, vxs[k], st["bx"])
            new_st["by"] = jnp.where(improve, vys[k], st["by"])
        new_st["bsad"] = jnp.where(improve, sad_tot[k], st["bsad"])
        new_st["mincost"] = jnp.where(improve, cost[k], st["mincost"])
        if dir_vals is not None:
            dv = _i32(jnp.asarray(dir_vals))
            new_st["dir"] = jnp.where(improve, dv[k], st["dir"])
        return new_st

    def is_vector_ok(self, bc: BlockCtx, vx, vy):
        return ((vx >= bc.dxmin) & (vy >= bc.dymin)
                & (vx < bc.dxmax) & (vy < bc.dymax))

    # -- search algorithms -------------------------------------------------
    def expanding(self, bc, st, r: int, s: int, cx, cy, active=None):
        """One thin square ring (pobExpandingSearch PlaneOfBlocks.cpp:635-658).
        r, s static; centre traced."""
        offs = []
        for i in range(-r + s, r, s):
            offs += [(i, -r), (i, r)]
        for j in range(-r + s, r, s):
            offs += [(-r, j), (r, j)]
        offs += [(-r, -r), (-r, r), (r, -r), (r, r)]
        dx = jnp.asarray([o[0] for o in offs], I32)
        dy = jnp.asarray([o[1] for o in offs], I32)
        em = None if active is None else jnp.broadcast_to(active, dx.shape)
        return self.check_batch(bc, st, cx + dx, cy + dy, extra_mask=em)

    def exhaustive(self, bc, st, radius: int):
        """Rings 1..radius around the best-at-entry (pobRefine :786-791)."""
        cx, cy = st["bx"], st["by"]
        offs = []
        for r in range(1, radius + 1):
            for i in range(-r + 1, r):
                offs += [(i, -r), (i, r)]
            for j in range(-r + 1, r):
                offs += [(-r, j), (r, j)]
            offs += [(-r, -r), (-r, r), (r, -r), (r, r)]
        dx = jnp.asarray([o[0] for o in offs], I32)
        dy = jnp.asarray([o[1] for o in offs], I32)
        return self.check_batch(bc, st, cx + dx, cy + dy)

    def nstep(self, bc, st, stp: int):
        """pobNStepSearch (PlaneOfBlocks.cpp:466-485)."""
        for length in range(stp, 0, -1):
            dx, dy = st["bx"], st["by"]
            offs = [(length, length), (length, 0), (length, -length),
                    (0, -length), (0, length), (-length, length),
                    (-length, 0), (-length, -length)]
            ox = jnp.asarray([o[0] for o in offs], I32)
            oy = jnp.asarray([o[1] for o in offs], I32)
            st = self.check_batch(bc, st, dx + ox, dy + oy)
        return st

    def onetime(self, bc, st, length: int):
        """pobOneTimeSearch (PlaneOfBlocks.cpp:488-527) for one length."""
        st = dict(st, dir=_i32(0))
        dx0, dy0 = st["bx"], st["by"]
        st = self.check_batch(bc, st, jnp.stack([dx0 - length, dx0 + length]),
                              jnp.stack([dy0, dy0]), dir_vals=[2, 1])

        # masked walk handles all three dir cases uniformly (dir==0: the
        # loop condition is false on entry and the start value passes
        # through) — identical values to the original 3-way switch, and it
        # avoids lax.switch-around-while (which under vmap makes the XLA
        # TPU backend materialize gather operands per lane).
        def walk_masked(st, dx, dy, axis):
            sign = jnp.where(st["dir"] == 2, _i32(-1), _i32(1))
            start = dx if axis == 0 else dy
            st0 = dict(st, dir=jnp.where(st["dir"] != 0, _i32(1), _i32(0)))

            def cond(c):
                return c[0]["dir"] != 0

            def body(c):
                s, d = c
                s = dict(s, dir=_i32(0))
                d = d + sign * length
                vx = d + sign * length if axis == 0 else dx
                vy = dy if axis == 0 else d + sign * length
                s = self.check_batch(bc, s, jnp.stack([vx]),
                                     jnp.stack([vy]), dir_vals=[1])
                return (s, d)

            return jax.lax.while_loop(cond, body, (st0, start))

        # horizontal phase
        st, dx1 = walk_masked(st, dx0, dy0, 0)
        # vertical phase from (dx1, dy0)
        st = dict(st, dir=_i32(0))
        st = self.check_batch(bc, st, jnp.stack([dx1, dx1]),
                              jnp.stack([dy0 - length, dy0 + length]),
                              dir_vals=[2, 1])
        st, _ = walk_masked(st, dx1, dy0, 1)
        return st

    def diamond(self, bc, st, length: int):
        """pobDiamondSearch (PlaneOfBlocks.cpp:530-632)."""
        R, L, D, U = 1, 2, 4, 8
        st = dict(st, dir=_i32(15))

        def cond(c):
            st, last = c
            return st["dir"] > 0

        def body(c):
            st, _ = c
            dx, dy = st["bx"], st["by"]
            last = st["dir"]
            st = dict(st, dir=_i32(0))
            # probe 1: hinted axis directions, in order R, L, D, U
            vxs = jnp.stack([dx + length, dx - length, dx, dx])
            vys = jnp.stack([dy, dy, dy + length, dy - length])
            mask = jnp.stack([(last & R) != 0, (last & L) != 0,
                              (last & D) != 0, (last & U) != 0])
            st = self.check_batch(bc, st, vxs, vys, dir_vals=[R, L, D, U],
                                  extra_mask=mask)
            found = st["dir"]

            def improved(st):
                last2 = st["dir"]
                dx2, dy2 = st["bx"], st["by"]
                horiz = (last2 & (R + L)) != 0
                vxs = jnp.where(horiz, jnp.stack([dx2, dx2]),
                                jnp.stack([dx2 + length, dx2 - length]))
                vys = jnp.where(horiz, jnp.stack([dy2 + length, dy2 - length]),
                                jnp.stack([dy2, dy2]))
                dvs_h = jnp.asarray([D, U], I32)
                dvs_v = jnp.asarray([R, L], I32)
                # emulate dir_vals select
                st2 = self.check_batch(bc, st, vxs, vys,
                                       dir_vals=jnp.where(horiz, dvs_h, dvs_v))
                return st2

            pp = (length, length)
            mp = (-length, length)
            pm = (length, -length)
            mm = (-length, -length)
            diag = {pp: R + D, mp: L + D, pm: R + U, mm: L + U}
            cases = {
                R: (pp, pm), L: (mp, mm), D: (pp, mp), U: (pm, mm),
                R + D: (pp, mp, pm), L + D: (pp, mp, mm),
                R + U: (pp, mm, pm), L + U: (mm, mp, pm),
            }
            default = (pp, mp, pm, mm)

            def diagonals(st):
                # switch (lastDirection): check 2-3 diagonals in case order
                # (PlaneOfBlocks.cpp:584-629).
                def mk(case_offs):
                    vxs = jnp.stack([dx + o[0] for o in case_offs])
                    vys = jnp.stack([dy + o[1] for o in case_offs])
                    dvs = [diag[o] for o in case_offs]
                    return lambda s: self.check_batch(bc, s, vxs, vys,
                                                      dir_vals=dvs)

                branches = []
                for idx in range(16):
                    branches.append(mk(cases.get(idx, default)))
                return jax.lax.switch(jnp.clip(last, 0, 15), branches, st)

            def diagonals_masked(st):
                # lockstep: evaluate all 4 diagonals once, masked by the
                # per-case inclusion table (canonical candidate order;
                # tie-breaks may differ from the case-specific order)
                order = (pp, mp, pm, mm)
                table = np.zeros((16, 4), bool)
                for case in range(16):
                    offs = cases.get(case, default)
                    for k, o in enumerate(order):
                        table[case, k] = o in offs
                mask = jnp.asarray(table)[jnp.clip(last, 0, 15)]
                vxs = jnp.stack([dx + o[0] for o in order])
                vys = jnp.stack([dy + o[1] for o in order])
                dvs = [diag[o] for o in order]
                return self.check_batch(bc, st, vxs, vys, dir_vals=dvs,
                                        extra_mask=mask)

            if self.lockstep:
                st_imp = improved(st)
                st_diag = diagonals_masked(st)
                st = {k: jnp.where(found != 0, st_imp[k], st_diag[k])
                      for k in st}
            else:
                st = jax.lax.cond(found != 0, improved, diagonals, st)
            return (st, last)

        st, _ = jax.lax.while_loop(cond, body, (st, _i32(15)))
        return st

    def hex2(self, bc, st, i_me_range: int, active=None):
        """pobHex2Search (PlaneOfBlocks.cpp:661-724).  `active` (traced
        bool) masks the whole search for this lane: no probe can improve,
        so dir stays -2 and the walk exits immediately."""
        hexp = [(-1, -2), (-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2),
                (-1, -2), (-2, 0)]
        mod6m1 = [5, 0, 1, 2, 3, 4, 5, 0]
        hx = jnp.asarray([h[0] for h in hexp], I32)
        hy = jnp.asarray([h[1] for h in hexp], I32)
        m6 = jnp.asarray(mod6m1, I32)
        bmx, bmy = st["bx"], st["by"]
        if i_me_range > 1:
            st = dict(st, dir=_i32(-2))
            # 6 hexagon points, dirs 0..5 (order -2,0 ... per code)
            offs = [(-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2)]
            vxs = jnp.stack([bmx + o[0] for o in offs])
            vys = jnp.stack([bmy + o[1] for o in offs])
            em = (None if active is None
                  else jnp.broadcast_to(active, vxs.shape))
            st = self.check_batch(bc, st, vxs, vys, update_xy=False,
                                  dir_vals=[0, 1, 2, 3, 4, 5],
                                  extra_mask=em)

            def refine_walk(op):
                st, bmx, bmy = op
                d = st["dir"]
                bmx = bmx + hx[d + 1]
                bmy = bmy + hy[d + 1]

                def cond(c):
                    st, bmx, bmy, i = c
                    return ((i < i_me_range // 2)
                            & self.is_vector_ok(bc, bmx, bmy)
                            & (st["dir"] != -2))

                def body(c):
                    st, bmx, bmy, i = c
                    odir = m6[st["dir"] + 1]
                    st = dict(st, dir=_i32(-2))
                    vxs = jnp.stack([bmx + hx[odir], bmx + hx[odir + 1],
                                     bmx + hx[odir + 2]])
                    vys = jnp.stack([bmy + hy[odir], bmy + hy[odir + 1],
                                     bmy + hy[odir + 2]])
                    st = self.check_batch(bc, st, vxs, vys, update_xy=False,
                                          dir_vals=jnp.stack([odir - 1, odir, odir + 1]))
                    moved = st["dir"] != -2
                    bmx = jnp.where(moved, bmx + hx[st["dir"] + 1], bmx)
                    bmy = jnp.where(moved, bmy + hy[st["dir"] + 1], bmy)
                    return (st, bmx, bmy, i + 1)

                # note: dir of the first hexagon probe seeds the walk; the C
                # loop re-tests dir == -2 at the top via `break`
                st, bmx, bmy, _ = jax.lax.while_loop(
                    cond, body, (st, bmx, bmy, _i32(1)))
                return st, bmx, bmy

            def no_walk(op):
                return op[0], op[1], op[2]

            if self.lockstep:
                # masked execution: a dir==-2 lane enters refine_walk with a
                # garbage first step but its while condition is false on
                # entry, and the results are discarded by the select below
                walked = st["dir"] != -2
                st_w, bmx_w, bmy_w = refine_walk((st, bmx, bmy))
                st = {k: jnp.where(walked, st_w[k], st[k]) for k in st}
                bmx = jnp.where(walked, bmx_w, bmx)
                bmy = jnp.where(walked, bmy_w, bmy)
            else:
                st, bmx, bmy = jax.lax.cond(st["dir"] != -2, refine_walk,
                                            no_walk, (st, bmx, bmy))
            st = dict(st, bx=bmx, by=bmy)
        # square refine
        return self.expanding(bc, st, 1, 1, st["bx"], st["by"],
                              active=active)

    def cross(self, bc, st, start: int, x_max: int, y_max: int, cx, cy):
        """pobCrossSearch (PlaneOfBlocks.cpp:727-739); bounds static."""
        offs = []
        for i in range(start, x_max, 2):
            offs += [(-i, 0), (i, 0)]
        for j in range(start, y_max, 2):
            offs += [(0, -j), (0, j)]
        if not offs:
            return st
        dx = jnp.asarray([o[0] for o in offs], I32)
        dy = jnp.asarray([o[1] for o in offs], I32)
        return self.check_batch(bc, st, cx + dx, cy + dy)

    def umh(self, bc, st, i_me_range: int, cx, cy):
        """pobUMHSearch (PlaneOfBlocks.cpp:742-769)."""
        st = self.cross(bc, st, 1, i_me_range, i_me_range, cx, cy)
        hex4 = [(-4, 2), (-4, 1), (-4, 0), (-4, -1), (-4, -2), (4, -2),
                (4, -1), (4, 0), (4, 1), (4, 2), (2, 3), (0, 4), (-2, 3),
                (-2, -3), (0, -4), (2, -3)]
        offs = []
        i = 1
        while True:
            offs += [(ox * i, oy * i) for (ox, oy) in hex4]
            i += 1
            if i > i_me_range // 4:
                break
        dx = jnp.asarray([o[0] for o in offs], I32)
        dy = jnp.asarray([o[1] for o in offs], I32)
        st = self.check_batch(bc, st, cx + dx, cy + dy)
        return self.hex2(bc, st, i_me_range)

    def refine(self, bc, st, search: SearchType, param: int):
        """pobRefine (PlaneOfBlocks.cpp:772-816)."""
        if search == SearchType.ONETIME:
            i = param
            while i > 0:
                st = self.onetime(bc, st, i)
                i //= 2
        elif search == SearchType.NSTEP:
            st = self.nstep(bc, st, param)
        elif search == SearchType.LOGARITHMIC:
            i = param
            while i > 0:
                st = self.diamond(bc, st, i)
                i //= 2
        elif search == SearchType.EXHAUSTIVE:
            st = self.exhaustive(bc, st, param)
        elif search == SearchType.HEX2:
            st = self.hex2(bc, st, param)
        elif search == SearchType.UMH:
            st = self.umh(bc, st, param, st["bx"], st["by"])
        elif search == SearchType.HORIZONTAL:
            dx = jnp.concatenate([jnp.asarray([-i, i], I32)
                                  for i in range(1, param + 1)])
            st = self.check_batch(bc, st, st["bx"] + dx,
                                  jnp.broadcast_to(st["by"], dx.shape))
        elif search == SearchType.VERTICAL:
            dy = jnp.concatenate([jnp.asarray([-i, i], I32)
                                  for i in range(1, param + 1)])
            st = self.check_batch(bc, st,
                                  jnp.broadcast_to(st["bx"], dy.shape),
                                  st["by"] + dy)
        else:
            raise ValueError(search)
        return st


# ---------------------------------------------------------------------------
# Per-block pseudo-EPZ search (pobPseudoEPZSearch PlaneOfBlocks.cpp:819-968)


def _trunc_div(a, b):
    """C integer division (truncation toward zero) for positive divisor."""
    return jnp.sign(a) * (jnp.abs(a) // b)


class EPZ(NamedTuple):
    """Traced per-block EPZ inputs besides BlockCtx."""
    zero_shift_y: jnp.ndarray     # fieldShift
    global_x: jnp.ndarray         # globalMVPredictor (already pel-scaled)
    global_y: jnp.ndarray
    pred: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]   # main predictor (x, y, sad)
    preds: Tuple                  # predictors[0..4] as (x, y) tuples
    blkidx_seq: jnp.ndarray       # sequence position (pob->blkIdx semantics)
    badcount: jnp.ndarray


def _pseudo_epz(engine: SearchEngine, bc: BlockCtx, e: EPZ, spec_level):
    """Returns (st, new_badcount). spec_level: dict of static params."""
    search = spec_level["search"]
    param = spec_level["param"]
    pzero = spec_level["pzero"]
    pglobal = spec_level["pglobal"]
    badsad = spec_level["badsad"]
    badrange = spec_level["badrange"]
    trymany = spec_level["trymany"]
    log_pel = engine.ctx.log_pel
    pelf = 1 << log_pel
    verybig = spec_level["verybig"]

    # ---- zero trial (no bounds check, chroma at (0,0)) -------------------
    zx = _i32(0)
    zy = _i32(e.zero_shift_y)
    sad0 = engine.luma_sad(bc, zx[None], zy[None])[0]
    sad0 = sad0 + engine.chroma_sad(bc, _i32(0)[None], _i32(0)[None])[0]
    st = _st(zx, zy, sad0, sad0 + ((_i64(pzero) * sad0) >> 8))

    results = []

    if trymany:
        st = engine.refine(bc, st, search, param)
        results.append(st)

    # ---- global trial ----------------------------------------------------
    gx = jnp.clip(e.global_x, bc.dxmin, bc.dxmax - 1)
    gy = jnp.clip(e.global_y, bc.dymin, bc.dymax - 1)
    sad_g = (engine.luma_sad(bc, gx[None], gy[None])[0]
             + engine.chroma_sad(bc, gx[None], gy[None])[0])
    cost_g = sad_g + ((_i64(pglobal) * sad_g) >> 8)
    take = (cost_g < st["mincost"]) | trymany
    st = dict(st,
              bx=jnp.where(take, gx, st["bx"]),
              by=jnp.where(take, gy, st["by"]),
              bsad=jnp.where(take, sad_g, st["bsad"]),
              mincost=jnp.where(take, cost_g, st["mincost"]))
    if trymany:
        st = engine.refine(bc, st, search, param)
        results.append(st)

    # ---- main predictor trial (cost = plain sad) -------------------------
    px, py, _psad = e.pred
    sad_p = (engine.luma_sad(bc, px[None], py[None])[0]
             + engine.chroma_sad(bc, px[None], py[None])[0])
    take = (sad_p < st["mincost"]) | trymany
    st = dict(st,
              bx=jnp.where(take, px, st["bx"]),
              by=jnp.where(take, py, st["by"]),
              bsad=jnp.where(take, sad_p, st["bsad"]),
              mincost=jnp.where(take, sad_p, st["mincost"]))
    if trymany:
        st = engine.refine(bc, st, search, param)
        results.append(st)

    # ---- the other predictors (CheckMV0: bounds + MD, no penaltyNew) -----
    for i in range(4):
        if trymany:
            st = dict(st, mincost=_i64(verybig + 1))
        qx, qy = e.preds[i]
        st = engine.check_batch(bc, st, qx[None], qy[None], penalty_new=False)
        if trymany:
            st = engine.refine(bc, st, search, param)
            results.append(st)

    if trymany:
        # select best of the 7 refined results, first strict minimum wins
        costs = jnp.stack([r["mincost"] for r in results])
        k = jnp.argmin(costs)
        improve = costs[k] < verybig + 1
        pick = lambda key: jnp.stack([r[key] for r in results])[k]
        st = dict(st,
                  bx=jnp.where(improve, pick("bx"), st["bx"]),
                  by=jnp.where(improve, pick("by"), st["by"]),
                  bsad=jnp.where(improve, pick("bsad"), st["bsad"]),
                  mincost=jnp.where(improve, costs[k], st["mincost"]))
    else:
        st = engine.refine(bc, st, search, param)

    if spec_level.get("skip_rescue"):
        # lockstep: the rescue is applied at field level (dense uniform
        # displacements + vmapped tail) by search_level_lockstep
        return st, e.badcount

    # ---- bad-SAD rescue (PlaneOfBlocks.cpp:938-963) ----------------------
    found_sad = st["bsad"]
    bad = ((e.blkidx_seq > 1)
           & (found_sad > badsad + badsad * _i64(e.badcount) // 16))

    def rescue(st):
        if badrange > 0:  # UMH around zero
            st = engine.umh(bc, st, badrange * pelf, _i32(0), _i32(0))
        elif badrange < 0:  # expanding rings around zero, early break
            done = jnp.asarray(False)
            for i in range(1, -badrange * pelf, pelf):
                if engine.lockstep:
                    st_ring = engine.expanding(bc, st, i, pelf, _i32(0),
                                               _i32(0))
                    st = {k: jnp.where(done, st[k], st_ring[k]) for k in st}
                    done = done | (st["bsad"] < found_sad // 4)
                else:
                    def ring(op):
                        st, done = op
                        st = engine.expanding(bc, st, i, pelf, _i32(0),
                                              _i32(0))
                        return st, st["bsad"] < found_sad // 4
                    st, done = jax.lax.cond(
                        done, lambda op: op, ring, (st, done))
        mvx, mvy = st["bx"], st["by"]
        for i in range(1, pelf):
            st = engine.expanding(bc, st, i, 1, mvx, mvy)
        return st

    if engine.lockstep:
        st_r = rescue(st)
        st = {k: jnp.where(bad, st_r[k], st[k]) for k in st}
    else:
        st = jax.lax.cond(bad, rescue, lambda s: s, st)
    new_badcount = e.badcount + bad.astype(I32)
    return st, new_badcount


# ---------------------------------------------------------------------------
# Level search: lax.scan over blocks in meander order
# (doPobSearchMVs PlaneOfBlocks.cpp:971-1131)


def _clip_xy(x, y, dxmin, dxmax, dymin, dymax):
    return (jnp.clip(x, dxmin, dxmax - 1), jnp.clip(y, dymin, dymax - 1))


def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


def search_level(ctx: LevelCtx, spec, level_params, vectors_in,
                 global_mv, field_shift, mean_luma_change):
    """Search all blocks of one level.

    vectors_in: (x, y, sad) flat arrays [nblk] — the interpolated predictions
    (or zeros at the coarsest level).
    Returns (vx, vy, vsad) plus the updated mean_luma_change.
    """
    nbx, nby = ctx.nblk
    nblk = nbx * nby
    bsx, bsy = ctx.blk_size
    bcx, bcy = ctx.blk_size_c
    ovx, ovy = ctx.overlap
    logx, logy = ctx.log_ratio_uv
    hpad, hpad_c = ctx.hpad
    vpad, vpad_c = ctx.vpad
    pw, ph = ctx.padded
    logp = ctx.log_pel
    level = ctx.level
    dctmode = level_params["dctmode"]
    smallest = level_params["smallest_plane"]
    meander = level_params["meander"]
    lsad_const = level_params["lsad"]
    lambda_level = level_params["lambda_level"]
    pnew = level_params["pnew"]

    engine = SearchEngine(ctx, dctmode)

    # dctweight16 = min(16, |meanLumaChange| / blkArea), traced
    dctweight16 = jnp.minimum(
        16, jnp.abs(_i32(mean_luma_change)) // (bsx * bsy))

    hps = hpad >> level
    vps = vpad >> level

    gx_scaled = _i32((1 << logp) * global_mv[0])
    gy_scaled = _i32((1 << logp) * global_mv[1]) + _i32(field_shift)

    src_plane = ctx.src_planes[0].astype(I32)
    src_u = ctx.src_planes[1].astype(I32) if ctx.chroma else None
    src_v = ctx.src_planes[2].astype(I32) if ctx.chroma else None

    def step(carry, i):
        vx_a, vy_a, vs_a, badcount, sumluma = carry
        blky = i // nbx
        iblkx = i % nbx
        if meander:
            fwd = (blky % 2) == 0
            scan_dir = jnp.where(fwd, 1, -1).astype(I32)
            blkx = jnp.where(fwd, iblkx, nbx - 1 - iblkx).astype(I32)
        else:
            scan_dir = _i32(1)
            blkx = _i32(iblkx)
        blkidx = blky * nbx + blkx

        x0 = _i32(hpad + (bsx - ovx) * blkx)
        y0 = _i32(vpad + (bsy - ovy) * blky)
        xc = _i32(hpad_c + ((bsx - ovx) >> logx) * blkx)
        yc = _i32(vpad_c + ((bsy - ovy) >> logy) * blky)

        src = jax.lax.dynamic_slice(src_plane, (y0, x0), (bsy, bsx))
        if ctx.chroma:
            s_u = jax.lax.dynamic_slice(src_u, (yc, xc), (bcy, bcx))
            s_v = jax.lax.dynamic_slice(src_v, (yc, xc), (bcy, bcx))
        else:
            s_u = s_v = None

        dxmax = _i32((pw - bsx - hpad + hps) - x0) << logp
        dymax = _i32((ph - bsy - vpad + vps) - y0) << logp
        dxmin = -(_i32(x0 - hpad + hps) << logp)
        dymin = -(_i32(y0 - vpad + vps) << logp)

        lam0 = jnp.where(blky == 0, _i64(0), _i64(lambda_level))

        def clip(x, y):
            return _clip_xy(x, y, dxmin, dxmax, dymin, dymax)

        zs_y = _i32(field_shift)

        # predictors (pobFetchPredictors PlaneOfBlocks.cpp:419-463)
        left_ok = jnp.where(scan_dir == 1, blkx > 0, blkx < nbx - 1)
        li = blkidx - scan_dir
        p1x, p1y = clip(jnp.where(left_ok, vx_a[li], 0),
                        jnp.where(left_ok, vy_a[li], zs_y))
        p1s = jnp.where(left_ok, vs_a[li], _i64(0))

        up_ok = blky > 0
        ui = blkidx - nbx
        p2x, p2y = clip(jnp.where(up_ok, vx_a[ui], 0),
                        jnp.where(up_ok, vy_a[ui], zs_y))
        p2s = jnp.where(up_ok, vs_a[ui], _i64(0))

        x_ok = jnp.where(scan_dir == 1, blkx < nbx - 1, blkx > 0)
        br_ok = (blky < nby - 1) & x_ok
        ur_ok = up_ok & x_ok
        bi = blkidx + nbx + scan_dir
        uri = blkidx - nbx + scan_dir
        p3x_raw = jnp.where(br_ok, vx_a[bi], jnp.where(ur_ok, vx_a[uri], 0))
        p3y_raw = jnp.where(br_ok, vy_a[bi], jnp.where(ur_ok, vy_a[uri], zs_y))
        p3s = jnp.where(br_ok, vs_a[bi], jnp.where(ur_ok, vs_a[uri], _i64(0)))
        p3x, p3y = clip(p3x_raw, p3y_raw)

        p0x = jnp.where(up_ok, _median3(p1x, p2x, p3x), p1x)
        p0y = jnp.where(up_ok, _median3(p1y, p2y, p3y), p1y)
        p0s = jnp.where(up_ok, jnp.maximum(p1s, jnp.maximum(p2s, p3s)), p1s)

        # main predictor: interpolated prediction, or the median on the
        # smallest plane (pob->smallestPlane)
        prx, pry = clip(vx_a[blkidx], vy_a[blkidx])
        prs = vs_a[blkidx]
        if smallest:
            prx, pry, prs = p0x, p0y, p0s

        p4x, p4y = clip(_i32(0), _i32(0))

        # lambda adaptation in float64 (pobFetchPredictors :461-462)
        lsad_f = jnp.float64(lsad_const)
        scale = lsad_f / (lsad_f + (prs >> 1).astype(jnp.float64))
        lam = ((lam0.astype(jnp.float64) * scale) * scale).astype(I64)

        bc = BlockCtx(
            src=src, src_u=s_u, src_v=s_v, x0=x0, y0=y0, xc=xc, yc=yc,
            dxmin=dxmin, dxmax=dxmax, dymin=dymin, dymax=dymax,
            pred_x=prx, pred_y=pry, lam=lam, pnew=_i32(pnew),
            dct_src=(dct_ops.dct_block(src, ctx.bits)
                     if 1 <= dctmode <= 4 else None),
            src_luma=(sad_ops.luma(src) if dctmode >= 3 else None),
            dctweight16=dctweight16)

        e = EPZ(zero_shift_y=zs_y, global_x=gx_scaled, global_y=gy_scaled,
                pred=(prx, pry, prs),
                preds=((p0x, p0y), (p1x, p1y), (p2x, p2y), (p3x, p3y),
                       (p4x, p4y)),
                blkidx_seq=blkidx, badcount=badcount)

        st, badcount = _pseudo_epz(engine, bc, e, level_params)

        vx_a = vx_a.at[blkidx].set(st["bx"])
        vy_a = vy_a.at[blkidx].set(st["by"])
        vs_a = vs_a.at[blkidx].set(st["bsad"])

        if smallest:
            ref0 = jax.lax.dynamic_slice(
                ctx.ref_stacks[0], (_i32(0), y0, x0), (1, bsy, bsx))[0]
            sumluma = sumluma + (sad_ops.luma(ref0).astype(I64)
                                 - sad_ops.luma(src).astype(I64))
        return (vx_a, vy_a, vs_a, badcount, sumluma), None

    carry0 = (vectors_in[0], vectors_in[1], vectors_in[2],
              _i32(0), _i64(0))
    (vx, vy, vs, badcount, sumluma), _ = jax.lax.scan(
        step, carry0, jnp.arange(nblk, dtype=I32))

    if smallest:
        mean_luma_change = _trunc_div(sumluma, nblk).astype(I32)
    return (vx, vy, vs), mean_luma_change


# ---------------------------------------------------------------------------
# Lock-step whole-plane search: the TPU-native fast path.
#
# The reference's EPZ walk is Gauss-Seidel: each block's left/up predictors
# read vectors written moments earlier in the same raster pass
# (pobFetchPredictors PlaneOfBlocks.cpp:419-440), which serializes the scan.
# On TPU that means one tiny lax.scan step per block — latency-bound and
# ~10^4x under-utilized.  Here every block searches SIMULTANEOUSLY (one
# vmapped pseudo-EPZ over the whole plane of blocks: all gathers and SAD
# reductions become one batched op), and the neighbour predictors are
# iterated Jacobi-style: iteration k reads the field produced by iteration
# k-1 (iteration 0 reads the inter-level prediction).  Two iterations
# approximate one Gauss-Seidel pass closely (predictor information
# propagates one hop per iteration, and the refinement searches do the
# rest).  Differences vs the exact engine: predictor values lag one
# iteration, and the badcount feedback (PlaneOfBlocks.cpp:942-945) is
# per-block instead of globally accumulated.


class DenseEvaluator:
    """SAD evaluation for UNIFORM displacements: every block probes the
    same vector (the rescue cross/hex4/rings around (0,0),
    PlaneOfBlocks.cpp:727-769, 940-963; the zero and global trials).

    Instead of per-block gathers (XLA TPU gather costs ~ms per op
    regardless of size), a uniform displacement is one dynamic-slice
    SHIFT of the whole ref plane + an elementwise |src-ref| + per-block
    box sums (reshape-reduce without overlap, integral image with) —
    pure VPU work, bit-identical SAD values.
    """

    @staticmethod
    def _blocks_view(region, bs, ov, nb):
        """[nblk, bsy, bsx] block tensor of a (possibly overlapped) grid
        region via static slices (no gathers)."""
        bsx, bsy = bs
        ovx, ovy = ov
        nbx, nby = nb
        sy, sx = bsy - ovy, bsx - ovx
        rows = jnp.stack([
            jax.lax.slice(region, (j * sy, 0),
                          (j * sy + bsy, region.shape[1]))
            for j in range(nby)])
        cols = jnp.stack([
            jax.lax.slice(rows, (0, 0, i * sx), (nby, bsy, i * sx + bsx))
            for i in range(nbx)], axis=1)
        return cols.reshape(nby * nbx, bsy, bsx)

    def __init__(self, ctx: LevelCtx, x0_a, y0_a, xc_a, yc_a, pad: int,
                 dctmode: int = 0, src_luma=None, dctweight16=None,
                 dct_src=None):
        self.ctx = ctx
        self.pad = pad
        self.dctmode = dctmode
        self.src_luma = None if src_luma is None else src_luma.astype(I64)
        self.dctweight16 = dctweight16
        self.dct_src = dct_src          # [nblk, bs, bs] i32 (modes 1-4)
        bsx, bsy = ctx.blk_size
        bcx, bcy = ctx.blk_size_c
        ovx, ovy = ctx.overlap
        nbx, nby = ctx.nblk
        logx, logy = ctx.log_ratio_uv
        hpad, hpad_c = ctx.hpad
        vpad, vpad_c = ctx.vpad

        # luma block-grid region and padded ref stack
        self.hr = (nby - 1) * (bsy - ovy) + bsy
        self.wr = (nbx - 1) * (bsx - ovx) + bsx
        src = ctx.src_planes[0].astype(I32)
        self.src_region = jax.lax.dynamic_slice(
            src, (vpad, hpad), (self.hr, self.wr))
        self.ref_pad = jnp.pad(
            ctx.ref_stacks[0], ((0, 0), (pad, pad), (pad, pad)),
            mode="edge")
        self.base_y = vpad + pad
        self.base_x = hpad + pad
        if ctx.chroma:
            pc = max(pad >> logx, pad >> logy, 2)
            self.pad_c = pc
            self.hr_c = (nby - 1) * ((bsy - ovy) >> logy) + bcy
            self.wr_c = (nbx - 1) * ((bsx - ovx) >> logx) + bcx
            self.src_region_u = jax.lax.dynamic_slice(
                ctx.src_planes[1].astype(I32), (vpad_c, hpad_c),
                (self.hr_c, self.wr_c))
            self.src_region_v = jax.lax.dynamic_slice(
                ctx.src_planes[2].astype(I32), (vpad_c, hpad_c),
                (self.hr_c, self.wr_c))
            self.ref_pad_u = jnp.pad(
                ctx.ref_stacks[1], ((0, 0), (pc, pc), (pc, pc)), mode="edge")
            self.ref_pad_v = jnp.pad(
                ctx.ref_stacks[2], ((0, 0), (pc, pc), (pc, pc)), mode="edge")
            self.base_y_c = vpad_c + pc
            self.base_x_c = hpad_c + pc
        # per-block region-relative offsets for the integral-image path
        self.rel_y = (y0_a - vpad).reshape(-1)
        self.rel_x = (x0_a - hpad).reshape(-1)
        self.rel_y_c = (yc_a - vpad_c).reshape(-1)
        self.rel_x_c = (xc_a - hpad_c).reshape(-1)

    def _block_sums(self, diff, bs, ov, nb, rel_y, rel_x):
        """Per-block sums of `diff` [hr, wr] -> [nblk] int64.

        Block origins form a regular grid, so the integral-image corner
        reads of the overlapped path are STRIDED SLICES, not gathers (a
        TPU gather costs ~1.4us per offset row — ~ms per call at 1080p
        overlap-8 block counts)."""
        bsx, bsy = bs
        ovx, ovy = ov
        nbx, nby = nb
        if ovx == 0 and ovy == 0:
            s = diff.reshape(nby, bsy, nbx, bsx).sum(axis=(1, 3),
                                                     dtype=jnp.int64)
            return s.reshape(-1)
        sy, sx = bsy - ovy, bsx - ovx
        integ = jnp.pad(jnp.cumsum(jnp.cumsum(
            diff.astype(jnp.int64), axis=0), axis=1), ((1, 0), (1, 0)))

        def corners(oy, ox):
            return jax.lax.slice(
                integ, (oy, ox),
                (oy + (nby - 1) * sy + 1, ox + (nbx - 1) * sx + 1),
                (sy, sx))

        tl = corners(0, 0)
        tr = corners(0, bsx)
        bl = corners(bsy, 0)
        br = corners(bsy, bsx)
        return (br - bl - tr + tl).reshape(-1)

    def luma_sads(self, vx, vy):
        """[nblk] int64 luma SAD at the uniform pel-units displacement
        (vx, vy), traced scalars (pobGetRefBlock pel math,
        PlaneOfBlocks.cpp:34-54 — block origins are pel-aligned so the
        subplane index is uniform)."""
        ctx = self.ctx
        pelm = ctx.pel - 1
        logp = ctx.log_pel
        idx = (vx & pelm) | ((vy & pelm) << logp)
        sy = self.base_y + (vy >> logp)
        sx = self.base_x + (vx >> logp)
        region = jax.lax.dynamic_slice(
            self.ref_pad, (idx, sy, sx), (1, self.hr, self.wr)
        )[0].astype(I32)
        diff = jnp.abs(self.src_region - region)
        s = self._block_sums(diff, ctx.blk_size, ctx.overlap, ctx.nblk,
                             self.rel_y, self.rel_x)
        if not self.dctmode:
            return s
        # dct/SATD modes: transform per block (no sliding decomposition)
        # via the static block view; ref luma from box sums
        if not hasattr(self, "_src_view"):
            self._src_view = self._blocks_view(
                self.src_region, ctx.blk_size, ctx.overlap, ctx.nblk)
        ref_view = self._blocks_view(region, ctx.blk_size, ctx.overlap,
                                     ctx.nblk)
        if 1 <= self.dctmode <= 4:
            dct_ref = dct_ops.dct_block(ref_view, ctx.bits)
            ref_luma = (self._block_sums(region, ctx.blk_size,
                                         ctx.overlap, ctx.nblk,
                                         self.rel_y, self.rel_x)
                        if self.dctmode in (3, 4) else None)
            return mix_dct_cost(self.dctmode, s, self.dct_src, dct_ref,
                                self.src_luma, ref_luma,
                                self.dctweight16, ctx.blk_size[0])
        satd_v = sad_ops.satd(self._src_view, ref_view).astype(I64)
        ref_luma = self._block_sums(region, ctx.blk_size, ctx.overlap,
                                    ctx.nblk, self.rel_y, self.rel_x)
        return mix_satd_cost(self.dctmode, s, satd_v, self.src_luma,
                             ref_luma, self.dctweight16)

    def chroma_sads(self, vx, vy):
        ctx = self.ctx
        if not ctx.chroma:
            return jnp.zeros_like(self.rel_y, dtype=jnp.int64)
        pelm = ctx.pel - 1
        logp = ctx.log_pel
        logx, logy = ctx.log_ratio_uv
        xbias = jnp.where(vx < 0, (1 << logx) - 1, 0)
        ybias = jnp.where(vy < 0, (1 << logy) - 1, 0)
        tx = (vx + xbias) >> logx
        ty = (vy + ybias) >> logy
        idx = (tx & pelm) | ((ty & pelm) << logp)
        sy = self.base_y_c + (ty >> logp)
        sx = self.base_x_c + (tx >> logp)
        bs = (ctx.blk_size_c[0], ctx.blk_size_c[1])
        ov = (ctx.overlap[0] >> logx, ctx.overlap[1] >> logy)
        total = jnp.zeros_like(self.rel_y, dtype=jnp.int64)
        for ref_pad, src_region in ((self.ref_pad_u, self.src_region_u),
                                    (self.ref_pad_v, self.src_region_v)):
            region = jax.lax.dynamic_slice(
                ref_pad, (idx, sy, sx), (1, self.hr_c, self.wr_c)
            )[0].astype(I32)
            diff = jnp.abs(src_region - region)
            total = total + self._block_sums(diff, bs, ov, ctx.nblk,
                                             self.rel_y_c, self.rel_x_c)
        return total

    def check_uniform(self, field, offsets, bounds, pred, lam, pnew,
                      active):
        """Sequential running-min update over a static list of uniform
        displacements — same update rule as SearchEngine.check_batch but
        one plane-shift per candidate instead of per-block gathers.

        field: dict of [nblk] arrays (bx, by, bsad, mincost);
        offsets: static [(dx, dy)] in pel units, evaluated in order;
        bounds: (dxmin, dxmax, dymin, dymax) [nblk];
        pred: (pred_x, pred_y) [nblk]; active: [nblk] bool gate.
        """
        dxmin, dxmax, dymin, dymax = bounds
        px, py = pred
        offs = jnp.asarray(offsets, I32)          # [D, 2]

        def body(carry, off):
            bx, by, bsad, mincost = carry
            vx, vy = off[0], off[1]
            ls = self.luma_sads(vx, vy)
            cs = self.chroma_sads(vx, vy)
            ok = (active & (vx >= dxmin) & (vy >= dymin)
                  & (vx < dxmax) & (vy < dymax))
            dx = (px - vx).astype(I32)
            dy = (py - vy).astype(I32)
            dist = (dx * dx + dy * dy).astype(I32)
            md = ((lam * dist.astype(I64)) >> 8).astype(I32).astype(I64)
            pn = _i64(pnew)
            cost = md + ls + cs + ((pn * ls) >> 8) + ((pn * cs) >> 8)
            cost = jnp.where(ok, cost, _INF)
            improve = cost < mincost
            bx = jnp.where(improve, vx, bx)
            by = jnp.where(improve, vy, by)
            bsad = jnp.where(improve, ls + cs, bsad)
            mincost = jnp.where(improve, cost, mincost)
            return (bx, by, bsad, mincost), None

        carry = (field["bx"], field["by"], field["bsad"], field["mincost"])
        (bx, by, bsad, mincost), _ = jax.lax.scan(body, carry, offs)
        return dict(bx=bx, by=by, bsad=bsad, mincost=mincost)


def _umh_uniform_offsets(i_me_range: int):
    """Cross + multi-hexagon offsets around (0,0) in reference order
    (pobCrossSearch PlaneOfBlocks.cpp:727-739, pobUMHSearch :742-760)."""
    offs = []
    for i in range(1, i_me_range, 2):
        offs += [(-i, 0), (i, 0)]
    for j in range(1, i_me_range, 2):
        offs += [(0, -j), (0, j)]
    hex4 = [(-4, 2), (-4, 1), (-4, 0), (-4, -1), (-4, -2), (4, -2),
            (4, -1), (4, 0), (4, 1), (4, 2), (2, 3), (0, 4), (-2, 3),
            (-2, -3), (0, -4), (2, -3)]
    i = 1
    while True:
        offs += [(ox * i, oy * i) for (ox, oy) in hex4]
        i += 1
        if i > i_me_range // 4:
            break
    return offs


def _ring_offsets(r: int, s: int):
    """One expanding square ring (pobExpandingSearch order,
    PlaneOfBlocks.cpp:635-658)."""
    offs = []
    for i in range(-r + s, r, s):
        offs += [(i, -r), (i, r)]
    for j in range(-r + s, r, s):
        offs += [(-r, j), (r, j)]
    offs += [(-r, -r), (-r, r), (r, -r), (r, r)]
    return offs


def search_level_lockstep(ctx: LevelCtx, spec, level_params, vectors_in,
                          global_mv, field_shift, mean_luma_change,
                          iters: int = 2, rescue_mode: str = "inline",
                          resc_state=None):
    """Lock-step variant of search_level: same inputs/outputs.

    rescue_mode: "inline" (default) runs the bad-SAD rescue inside this
    call; "defer" skips it and returns (vectors, mlc, resc_state) so a
    frame-batched caller can hoist the rescue's probe DMAs out of a
    vmapped search; "apply" skips the search and runs ONLY the rescue
    from a previously returned resc_state (per job, real lax.cond)."""
    nbx, nby = ctx.nblk
    nblk = nbx * nby
    bsx, bsy = ctx.blk_size
    bcx, bcy = ctx.blk_size_c
    ovx, ovy = ctx.overlap
    logx, logy = ctx.log_ratio_uv
    hpad, hpad_c = ctx.hpad
    vpad, vpad_c = ctx.vpad
    pw, ph = ctx.padded
    logp = ctx.log_pel
    level = ctx.level
    dctmode = level_params["dctmode"]
    smallest = level_params["smallest_plane"]
    meander = level_params["meander"]
    lsad_const = level_params["lsad"]
    lambda_level = level_params["lambda_level"]
    pnew = level_params["pnew"]

    engine = SearchEngine(ctx, dctmode, lockstep=True)

    dctweight16 = jnp.minimum(
        16, jnp.abs(_i32(mean_luma_change)) // (bsx * bsy))
    hps = hpad >> level
    vps = vpad >> level
    gx_scaled = _i32((1 << logp) * global_mv[0])
    gy_scaled = _i32((1 << logp) * global_mv[1]) + _i32(field_shift)

    src_plane = ctx.src_planes[0].astype(I32)
    src_u = ctx.src_planes[1].astype(I32) if ctx.chroma else None
    src_v = ctx.src_planes[2].astype(I32) if ctx.chroma else None

    idx = jnp.arange(nblk, dtype=I32)
    blky_a = idx // nbx
    blkx_a = idx % nbx
    if meander:
        scan_dir_a = jnp.where((blky_a % 2) == 0, 1, -1).astype(I32)
    else:
        scan_dir_a = jnp.ones((nblk,), I32)

    x0_a = _i32(hpad) + (bsx - ovx) * blkx_a
    y0_a = _i32(vpad) + (bsy - ovy) * blky_a
    xc_a = _i32(hpad_c) + ((bsx - ovx) >> logx) * blkx_a
    yc_a = _i32(vpad_c) + ((bsy - ovy) >> logy) * blky_a
    dxmax_a = (_i32(pw - bsx - hpad + hps) - x0_a) << logp
    dymax_a = (_i32(ph - bsy - vpad + vps) - y0_a) << logp
    dxmin_a = -((x0_a - _i32(hpad - hps)) << logp)
    dymin_a = -((y0_a - _i32(vpad - vps)) << logp)
    lam0_a = jnp.where(blky_a == 0, _i64(0), _i64(lambda_level))
    zs_y = _i32(field_shift)

    def blocks_of(plane, base_y, base_x, nb_y, nb_x, bh, bw, step_y,
                  step_x):
        """[nblk, bh, bw] source blocks.  Regular non-overlapping grids
        reshape for free; overlapped grids use static strided slices
        (a per-block gather costs ~1.4us per block on the TPU backend —
        ~100ms per analyse at 1080p overlap 8)."""
        if step_y == bh and step_x == bw:
            region = jax.lax.dynamic_slice(
                plane, (base_y, base_x), (nb_y * bh, nb_x * bw))
            return (region.reshape(nb_y, bh, nb_x, bw)
                    .transpose(0, 2, 1, 3).reshape(nb_y * nb_x, bh, bw))
        region = jax.lax.dynamic_slice(
            plane, (base_y, base_x),
            ((nb_y - 1) * step_y + bh, (nb_x - 1) * step_x + bw))
        return DenseEvaluator._blocks_view(
            region, (bw, bh), (bw - step_x, bh - step_y), (nb_x, nb_y))

    src_blocks = blocks_of(src_plane, vpad, hpad, nby, nbx, bsy, bsx,
                           bsy - ovy, bsx - ovx)
    if ctx.chroma:
        src_u_blocks = blocks_of(src_u, vpad_c, hpad_c, nby, nbx, bcy,
                                 bcx, (bsy - ovy) >> logy,
                                 (bsx - ovx) >> logx)
        src_v_blocks = blocks_of(src_v, vpad_c, hpad_c, nby, nbx, bcy,
                                 bcx, (bsy - ovy) >> logy,
                                 (bsx - ovx) >> logx)
    else:
        src_u_blocks = src_v_blocks = None

    if 1 <= dctmode <= 4:
        dct_src_blocks = jax.vmap(
            lambda b: dct_ops.dct_block(b, ctx.bits))(src_blocks)
    else:
        dct_src_blocks = None
    if dctmode >= 3:
        src_luma_blocks = jax.vmap(sad_ops.luma)(src_blocks)
    else:
        src_luma_blocks = None

    # static per-row scan direction mask for the grid-shift predictor
    # fetch ([nby, 1] bool: True = raster order, i.e. predecessor left)
    if meander:
        fwd_row = (np.arange(nby) % 2 == 0)[:, None]
    else:
        fwd_row = np.ones((nby, 1), bool)

    def _nbr(a, dy_n: int, signed_dx: int):
        """[nblk] value at grid neighbour (by + dy_n,
        bx + scan_dir*signed_dx) as pad+slice shifts (a TPU gather costs
        ~1.4us per offset row; shifts are free).  Out-of-grid entries
        carry arbitrary values — callers mask them."""
        a2 = a.reshape(nby, nbx)
        pad = jnp.pad(a2, ((1, 1), (1, 1)))

        def at(dy2, dx2):
            return jax.lax.slice(pad, (1 + dy2, 1 + dx2),
                                 (1 + dy2 + nby, 1 + dx2 + nbx))

        if signed_dx == 0:
            out = at(dy_n, 0)
        else:
            out = jnp.where(jnp.asarray(fwd_row), at(dy_n, signed_dx),
                            at(dy_n, -signed_dx))
        return out.reshape(-1)

    def predictors_from(vx_a, vy_a, vs_a):
        """Jacobi neighbour predictors, meander-aware layout
        (pobFetchPredictors PlaneOfBlocks.cpp:419-463)."""
        def clip(x, y):
            return (jnp.clip(x, dxmin_a, dxmax_a - 1),
                    jnp.clip(y, dymin_a, dymax_a - 1))

        left_ok = jnp.where(scan_dir_a == 1, blkx_a > 0, blkx_a < nbx - 1)
        p1x, p1y = clip(jnp.where(left_ok, _nbr(vx_a, 0, -1), 0),
                        jnp.where(left_ok, _nbr(vy_a, 0, -1), zs_y))
        p1s = jnp.where(left_ok, _nbr(vs_a, 0, -1), _i64(0))

        up_ok = blky_a > 0
        p2x, p2y = clip(jnp.where(up_ok, _nbr(vx_a, -1, 0), 0),
                        jnp.where(up_ok, _nbr(vy_a, -1, 0), zs_y))
        p2s = jnp.where(up_ok, _nbr(vs_a, -1, 0), _i64(0))

        x_ok = jnp.where(scan_dir_a == 1, blkx_a < nbx - 1, blkx_a > 0)
        br_ok = (blky_a < nby - 1) & x_ok
        ur_ok = up_ok & x_ok
        p3x_raw = jnp.where(br_ok, _nbr(vx_a, 1, 1),
                            jnp.where(ur_ok, _nbr(vx_a, -1, 1), 0))
        p3y_raw = jnp.where(br_ok, _nbr(vy_a, 1, 1),
                            jnp.where(ur_ok, _nbr(vy_a, -1, 1), zs_y))
        p3s = jnp.where(br_ok, _nbr(vs_a, 1, 1),
                        jnp.where(ur_ok, _nbr(vs_a, -1, 1), _i64(0)))
        p3x, p3y = clip(p3x_raw, p3y_raw)

        p0x = jnp.where(up_ok, _median3(p1x, p2x, p3x), p1x)
        p0y = jnp.where(up_ok, _median3(p1y, p2y, p3y), p1y)
        p0s = jnp.where(up_ok, jnp.maximum(p1s, jnp.maximum(p2s, p3s)), p1s)
        return (p0x, p0y, p0s), (p1x, p1y), (p2x, p2y), (p3x, p3y)

    pred_in_x = jnp.clip(vectors_in[0], dxmin_a, dxmax_a - 1)
    pred_in_y = jnp.clip(vectors_in[1], dymin_a, dymax_a - 1)
    pred_in_s = vectors_in[2]

    # ---- fast path: field-level engine (dct 0, DCT 1-4, SATD 5-10) -------
    field_dct_ok = (5 <= dctmode <= 10 and ctx.bits == 8
                    and sad_ops.satd_supported(bsx, bsy))
    field_dct14 = 1 <= dctmode <= 4
    if dctmode == 0 or field_dct_ok or field_dct14:
        from . import field_engine as fe
        bounds = (dxmin_a, dxmax_a, dymin_a, dymax_a)
        src_luma_a = (src_luma_blocks.reshape(-1)
                      if dctmode in (3, 4, 7, 8, 10)
                      else (jnp.zeros((nblk,), I64) if dctmode
                            else None))
        prober = fe.FieldProber(ctx, src_blocks, src_u_blocks,
                                src_v_blocks, x0_a, y0_a, xc_a, yc_a,
                                bounds, pnew, dctmode=dctmode,
                                src_luma=src_luma_a,
                                dctweight16=dctweight16,
                                dct_src=dct_src_blocks)
        if level_params["badrange"] > 0:
            max_off = level_params["badrange"] * ctx.pel + 4
        elif level_params["badrange"] < 0:
            max_off = -level_params["badrange"] * ctx.pel + ctx.pel
        else:
            max_off = 1
        dense = DenseEvaluator(ctx, x0_a, y0_a, xc_a, yc_a,
                               (max_off >> ctx.log_pel) + 2,
                               dctmode=dctmode, src_luma=src_luma_a,
                               dctweight16=dctweight16,
                               dct_src=dct_src_blocks)
        if rescue_mode == "apply":
            # rescue-only pass (the frame-batched engine defers the
            # rescue here, one job at a time behind a real cond)
            st = {k: resc_state[k]
                  for k in ("bx", "by", "bsad", "mincost", "dir")}
            st = fe.field_rescue(
                prober, dense, level_params, st, resc_state["lam"],
                (resc_state["prx"], resc_state["pry"]), idx,
                probe_p=prober)
            return (st["bx"], st["by"], st["bsad"]), mean_luma_change

        # dense tile-level SAD maps (ops/sadmap.py): for plain-SAD
        # search the per-candidate probes collapse into one map-kernel
        # pass per plane; every check() becomes a pure XLA lookup
        import os as _os
        use_map = (_os.environ.get("MVT_SADMAP", "1") != "0"
                   and fe.map_supported(ctx, fe.map_radius(ctx),
                                        dctmode))
        vx_a, vy_a, vs_a = vectors_in
        for it in range(iters):
            p0, p1, p2, p3 = predictors_from(vx_a, vy_a, vs_a)
            if smallest:
                prx, pry, prs = p0
            else:
                prx, pry, prs = pred_in_x, pred_in_y, pred_in_s
            lsad_f = jnp.float64(lsad_const)
            scale = lsad_f / (lsad_f + (prs >> 1).astype(jnp.float64))
            lam_a = ((lam0_a.astype(jnp.float64) * scale)
                     * scale).astype(I64)
            if use_map:
                p_it = fe.MapProber(ctx, src_blocks, src_u_blocks,
                                    src_v_blocks, x0_a, y0_a, xc_a,
                                    yc_a, bounds, pnew,
                                    pred_vx=prx, pred_vy=pry,
                                    dctmode=dctmode,
                                    src_luma=src_luma_a,
                                    dctweight16=dctweight16,
                                    dct_src=dct_src_blocks)
            else:
                p_it = prober
            # the bad-SAD rescue runs once per reference block pass;
            # intermediate Jacobi sweeps skip it
            st = fe.field_epz(p_it, dense, level_params, zs_y,
                              gx_scaled, gy_scaled, (prx, pry, prs),
                              (p0[:2], p1, p2, p3), lam_a, idx,
                              do_rescue=(rescue_mode == "inline"
                                         and it == iters - 1),
                              probe_p=prober)
            vx_a, vy_a, vs_a = st["bx"], st["by"], st["bsad"]
        if smallest:
            ref0_blocks = blocks_of(ctx.ref_stacks[0][0], vpad, hpad,
                                    nby, nbx, bsy, bsx, bsy - ovy,
                                    bsx - ovx)
            sumluma = jnp.sum(
                jax.vmap(sad_ops.luma)(ref0_blocks).astype(I64)
                - jax.vmap(sad_ops.luma)(src_blocks).astype(I64))
            mean_luma_change = _trunc_div(sumluma, nblk).astype(I32)
        if rescue_mode == "defer":
            resc = dict(bx=vx_a, by=vy_a, bsad=vs_a,
                        mincost=st["mincost"], dir=st["dir"],
                        lam=lam_a, prx=prx, pry=pry)
            return (vx_a, vy_a, vs_a), mean_luma_change, resc
        return (vx_a, vy_a, vs_a), mean_luma_change

    # ---- general path: vmapped per-block engine (dct modes) ---------------
    lp_norescue = dict(level_params, skip_rescue=True)
    badsad = level_params["badsad"]
    badrange = level_params["badrange"]
    pelf = ctx.pel

    def make_bc(bc_arrays):
        (src, s_u, s_v, x0, y0, xc, yc, dxmin, dxmax, dymin, dymax,
         prx, pry, lam, dct_src, src_luma) = bc_arrays
        return BlockCtx(
            src=src, src_u=s_u, src_v=s_v, x0=x0, y0=y0, xc=xc, yc=yc,
            dxmin=dxmin, dxmax=dxmax, dymin=dymin, dymax=dymax,
            pred_x=prx, pred_y=pry, lam=lam, pnew=_i32(pnew),
            dct_src=dct_src, src_luma=src_luma, dctweight16=dctweight16)

    def one_block(i, bc_arrays, e_arrays):
        """Scalar view of block i; vmapped below."""
        bc = make_bc(bc_arrays)
        pred, p0, p1, p2, p3 = e_arrays
        e = EPZ(zero_shift_y=zs_y, global_x=gx_scaled, global_y=gy_scaled,
                pred=pred, preds=(p0, p1, p2, p3, (_i32(0), _i32(0))),
                blkidx_seq=i, badcount=_i32(0))
        st, _ = _pseudo_epz(engine, bc, e, lp_norescue)
        return st["bx"], st["by"], st["bsad"], st["mincost"]

    def rescue_tail(bc_arrays, stf, bad, use_hex2: bool):
        """Per-block tail of the bad-SAD rescue (the parts whose centres
        differ per block): the UMH's hex2 refine and the final pel rings
        (PlaneOfBlocks.cpp:953-961).  `bad` masks the probes so healthy
        lanes do no walk iterations."""
        if not use_hex2 and pelf <= 1:
            return stf["bx"], stf["by"], stf["bsad"], stf["mincost"]

        def f(bc_arrays, bx, by, bsad, mincost, active):
            bc = make_bc(bc_arrays)
            st = {"bx": bx, "by": by, "bsad": bsad, "mincost": mincost,
                  "dir": _i32(0)}
            if use_hex2:
                st = engine.hex2(bc, st, badrange * pelf, active=active)
            mvx, mvy = st["bx"], st["by"]
            for i in range(1, pelf):
                st = engine.expanding(bc, st, i, 1, mvx, mvy, active=active)
            return st["bx"], st["by"], st["bsad"], st["mincost"]

        return jax.vmap(f)(bc_arrays, stf["bx"], stf["by"], stf["bsad"],
                           stf["mincost"], bad)

    # dense-rescue displacement sets (uniform across blocks, around (0,0))
    if badrange > 0:
        umh_offs = _umh_uniform_offsets(badrange * pelf)
        max_off = max(max(abs(o[0]), abs(o[1])) for o in umh_offs)
    elif badrange < 0:
        max_off = -badrange * pelf + pelf
    else:
        max_off = 1
    dense_pad = (max_off >> ctx.log_pel) + 2

    vx_a, vy_a, vs_a = vectors_in
    dense = DenseEvaluator(ctx, x0_a, y0_a, xc_a, yc_a, dense_pad)
    bounds = (dxmin_a, dxmax_a, dymin_a, dymax_a)

    for it in range(iters):
        p0, p1, p2, p3 = predictors_from(vx_a, vy_a, vs_a)
        # main predictor: inter-level prediction (or the median on the
        # coarsest plane), exactly as the exact engine
        if smallest:
            prx, pry, prs = p0
        else:
            prx, pry, prs = pred_in_x, pred_in_y, pred_in_s
        # lambda adaptation (float64 islands, PlaneOfBlocks.cpp:461-462)
        lsad_f = jnp.float64(lsad_const)
        scale = lsad_f / (lsad_f + (prs >> 1).astype(jnp.float64))
        lam_a = ((lam0_a.astype(jnp.float64) * scale) * scale).astype(I64)

        bc_arrays = (src_blocks, src_u_blocks, src_v_blocks, x0_a, y0_a,
                     xc_a, yc_a, dxmin_a, dxmax_a, dymin_a, dymax_a,
                     prx, pry, lam_a, dct_src_blocks, src_luma_blocks)
        e_arrays = ((prx, pry, prs), p0[:2], p1, p2, p3)
        bx, by, bsad, mincost = jax.vmap(one_block)(idx, bc_arrays,
                                                    e_arrays)

        # ---- field-level bad-SAD rescue (PlaneOfBlocks.cpp:938-963);
        # badcount feedback is per-block (0) in lockstep mode
        bad = (idx > 1) & (bsad > _i64(badsad))
        stf = dict(bx=bx, by=by, bsad=bsad, mincost=mincost)
        if badrange > 0:
            stf = dense.check_uniform(stf, umh_offs, bounds, (prx, pry),
                                      lam_a, pnew, bad)
            rbx, rby, rbsad, rmin = rescue_tail(bc_arrays, stf, bad, True)
        elif badrange < 0:
            found = bsad
            done = jnp.zeros_like(bad)
            for i in range(1, -badrange * pelf, pelf):
                stf = dense.check_uniform(stf, _ring_offsets(i, pelf),
                                          bounds, (prx, pry), lam_a, pnew,
                                          bad & ~done)
                done = done | (stf["bsad"] < found // 4)
            rbx, rby, rbsad, rmin = rescue_tail(bc_arrays, stf, bad, False)
        else:
            rbx, rby, rbsad, rmin = rescue_tail(bc_arrays, stf, bad, False)
        vx_a = jnp.where(bad, rbx, bx)
        vy_a = jnp.where(bad, rby, by)
        vs_a = jnp.where(bad, rbsad, bsad)

    if smallest:
        ref0_blocks = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            ctx.ref_stacks[0], (_i32(0), y, x), (1, bsy, bsx))[0]
        )(y0_a, x0_a)
        sumluma = jnp.sum(jax.vmap(sad_ops.luma)(ref0_blocks).astype(I64)
                          - jax.vmap(sad_ops.luma)(src_blocks).astype(I64))
        mean_luma_change = _trunc_div(sumluma, nblk).astype(I32)
    return (vx_a, vy_a, vs_a), mean_luma_change


# ---------------------------------------------------------------------------
# Global MV estimation (pobEstimateGlobalMVDoubled PlaneOfBlocks.cpp:1559-1636)


def estimate_global_mv_doubled(vx, vy, pel_level: int):
    """Most-frequent x/y (first max wins) + mean of joint inliers within +-6,
    doubled for the next finer level.  Returns (gx, gy) int32 scalars."""
    freq_size = 8192 * pel_level * 2
    half = freq_size >> 1

    def most_frequent(v):
        # reference: histogram argmax, first max wins = smallest value
        # among the modes (PlaneOfBlocks.cpp:1568-1599).  A scatter-add
        # histogram is slow on TPU; sort + run lengths is equivalent:
        # search bounds keep |v| << half, so every value is in range
        # and the leftmost longest run is exactly the histogram argmax.
        vals = jnp.sort(v.reshape(-1))
        n = vals.shape[0]
        pos = jnp.arange(n, dtype=I32)
        start_flag = jnp.concatenate(
            [jnp.ones((1,), bool), vals[1:] != vals[:-1]])
        end_flag = jnp.concatenate(
            [vals[1:] != vals[:-1], jnp.ones((1,), bool)])
        run_start = jax.lax.cummax(jnp.where(start_flag, pos, -1))
        run_len = pos - run_start + 1
        score = jnp.where(end_flag, run_len, 0)
        k = jnp.argmax(score)               # first max = smallest value
        mode = jax.lax.dynamic_slice(vals, (k,), (1,))[0]
        return _i32(mode)

    medianx = most_frequent(vx)
    mediany = most_frequent(vy)
    inlier = ((jnp.abs(vx - medianx) < 6) & (jnp.abs(vy - mediany) < 6))
    num = jnp.sum(inlier.astype(I32))
    sumx = jnp.sum(jnp.where(inlier, vx, 0))
    sumy = jnp.sum(jnp.where(inlier, vy, 0))
    gx = jnp.where(num > 0, _trunc_div(2 * sumx, jnp.maximum(num, 1)),
                   2 * medianx)
    gy = jnp.where(num > 0, _trunc_div(2 * sumy, jnp.maximum(num, 1)),
                   2 * mediany)
    return _i32(gx), _i32(gy)


# ---------------------------------------------------------------------------
# Hierarchical prediction (pobInterpolatePrediction PlaneOfBlocks.cpp:1447-1514)


def interpolate_prediction(coarse, nbx2: int, nby2: int, nbx: int, nby: int,
                           blk_size, overlap, log_pel_fine: int):
    """Interpolate level lv+1 vectors [nby2*nbx2] to level lv grid
    [nby*nbx].  Returns (x, y, sad) flat arrays."""
    cvx, cvy, cvs = coarse
    bsx, bsy = blk_size
    ovx, ovy = overlap
    norm_factor = 3 - log_pel_fine + 0  # coarse level pel is always 1
    mul_factor = -norm_factor if norm_factor < 0 else 0
    norm_factor = max(norm_factor, 0)
    normov = (bsx - ovx) * (bsy - ovy)
    aoddx = bsx * 3 - ovx * 2
    aevenx = bsx * 3 - ovx * 4
    aoddy = bsy * 3 - ovy * 2
    aeveny = bsy * 3 - ovy * 4

    # clamped fine->coarse index maps are static; the corner reads are
    # a regular 2x nearest upsample with +-1 parity shifts — pure
    # repeat/pad/slice/select, no gathers (a TPU gather costs ~1.4us
    # per offset row; 12 corner gathers per level transition added ms)
    i_np = np.minimum(np.arange(nbx), 2 * nbx2 - 1)
    j_np = np.minimum(np.arange(nby), 2 * nby2 - 1)
    offx = jnp.asarray(-1 + 2 * (i_np % 2), I32)[None, :]
    offy = jnp.asarray(-1 + 2 * (j_np % 2), I32)[:, None]
    odd_x = jnp.asarray((i_np % 2) == 1)[None, :]
    odd_y = jnp.asarray((j_np % 2) == 1)[:, None]
    edge_x = jnp.asarray((i_np == 0) | (i_np >= 2 * nbx2 - 1))[None, :]
    edge_y = jnp.asarray((j_np == 0) | (j_np >= 2 * nby2 - 1))[:, None]
    edge_x, edge_y = jnp.broadcast_arrays(edge_x, edge_y)

    def up2(a2):
        """[nby2, nbx2] -> [nby, nbx] nearest upsample, edge-clamped."""
        u = jnp.repeat(jnp.repeat(a2, 2, 0), 2, 1)
        py = max(0, nby - 2 * nby2)
        px = max(0, nbx - 2 * nbx2)
        if py or px:
            u = jnp.pad(u, ((0, py), (0, px)), mode="edge")
        return u[:nby, :nbx]

    def shifted(a2, dy_, dx_):
        """value at (clip(j2+dy_), clip(i2+dx_)) on the coarse grid."""
        p = jnp.pad(a2, ((1, 1), (1, 1)), mode="edge")
        return jax.lax.slice(p, (1 + dy_, 1 + dx_),
                             (1 + dy_ + nby2, 1 + dx_ + nbx2))

    def corners(cv):
        a2 = cv.reshape(nby2, nbx2)
        cc = up2(a2)
        cx = jnp.where(odd_x, up2(shifted(a2, 0, 1)),
                       up2(shifted(a2, 0, -1)))
        cy = jnp.where(odd_y, up2(shifted(a2, 1, 0)),
                       up2(shifted(a2, -1, 0)))
        xy = jnp.where(
            odd_y,
            jnp.where(odd_x, up2(shifted(a2, 1, 1)),
                      up2(shifted(a2, 1, -1))),
            jnp.where(odd_x, up2(shifted(a2, -1, 1)),
                      up2(shifted(a2, -1, -1))))
        return cc, cx, cy, xy

    ccx, cxx, cyx, xyx = corners(cvx)
    ccy, cxy, cyy, xyy = corners(cvy)
    ccs, cxs, cys, xys = corners(cvs)
    v_cc = (ccx, ccy, ccs)
    v_cx = (cxx, cxy, cxs)
    v_cy = (cyx, cyy, cys)
    v_xy = (xyx, xyy, xys)

    # v1..v4 per the three cases (PlaneOfBlocks.cpp:1470-1485)
    v1 = v_cc
    v2 = tuple(jnp.where(edge_x & edge_y, v_cc[t],
               jnp.where(edge_x, v_cc[t],
               jnp.where(edge_y, v_cc[t], v_cx[t]))) for t in range(3))
    v3 = tuple(jnp.where(edge_x & edge_y, v_cc[t],
               jnp.where(edge_x, v_cy[t],
               jnp.where(edge_y, v_cx[t], v_cy[t]))) for t in range(3))
    v4 = tuple(jnp.where(edge_x & edge_y, v_cc[t],
               jnp.where(edge_x, v_cy[t],
               jnp.where(edge_y, v_cx[t], v_xy[t]))) for t in range(3))

    if ovx == 0 and ovy == 0:
        x = 9 * v1[0] + 3 * v2[0] + 3 * v3[0] + v4[0]
        y = 9 * v1[1] + 3 * v2[1] + 3 * v3[1] + v4[1]
        sad = (9 * _i64(v1[2]) + 3 * _i64(v2[2]) + 3 * _i64(v3[2])
               + _i64(v4[2]) + 8)
    elif ovx <= bsx // 2 and ovy <= bsy // 2:
        ax1 = jnp.where(offx > 0, aoddx, aevenx)
        ax2 = (bsx - ovx) * 4 - ax1
        ay1 = jnp.where(offy > 0, aoddy, aeveny)
        ay2 = (bsy - ovy) * 4 - ay1
        a11 = _i64(ax1 * ay1)
        a12 = _i64(ax1 * ay2)
        a21 = _i64(ax2 * ay1)
        a22 = _i64(ax2 * ay2)
        scaleov = 1.0 / normov
        fx = (a11 * v1[0] + a21 * v2[0] + a12 * v3[0] + a22 * v4[0]
              ).astype(jnp.float64) * scaleov
        fy = (a11 * v1[1] + a21 * v2[1] + a12 * v3[1] + a22 * v4[1]
              ).astype(jnp.float64) * scaleov
        fs = (a11 * v1[2] + a21 * v2[2] + a12 * v3[2] + a22 * v4[2]
              ).astype(jnp.float64) * scaleov
        x = fx.astype(I32)   # C (int) cast truncates toward zero
        y = fy.astype(I32)
        sad = fs.astype(I64)
    else:  # dead branch in the reference (overlap > half block forbidden)
        x = (v1[0] + v2[0] + v3[0] + v4[0]) << 2
        y = (v1[1] + v2[1] + v3[1] + v4[1]) << 2
        sad = (_i64(v1[2]) + v2[2] + v3[2] + v4[2] + 2) << 2

    x = (x >> norm_factor) * (1 << mul_factor)
    y = (y >> norm_factor) * (1 << mul_factor)
    sad = sad >> 4
    return (_i32(x).reshape(-1), _i32(y).reshape(-1), _i64(sad).reshape(-1))


# ---------------------------------------------------------------------------
# Divide-extra (gopExtraDivide GroupOfPlanes.c:206-302)


def _get_median_xy(vx1, vy1, vx2, vy2, vx3, vy3):
    """GetMedian (GroupOfPlanes.c:187-196): component medians if they equal
    one of the input vectors, else the first vector."""
    mx = _median3(vx1, vx2, vx3)
    my = _median3(vy1, vy2, vy3)
    is_input = (((mx == vx1) & (my == vy1)) | ((mx == vx2) & (my == vy2))
                | ((mx == vx3) & (my == vy3)))
    return (jnp.where(is_input, mx, vx1), jnp.where(is_input, my, vy1))


def divide_extra(finest, nbx: int, nby: int, divide_mode: int):
    """Make the divided sub-block level [2*nby, 2*nbx] from the finest level
    [nby, nbx]; sad >> 2; divide==2 replaces interior sub-block vectors with
    neighbourhood medians."""
    vx, vy, vs = (a.reshape(nby, nbx) for a in finest)
    ox = jnp.repeat(jnp.repeat(vx, 2, axis=0), 2, axis=1)
    oy = jnp.repeat(jnp.repeat(vy, 2, axis=0), 2, axis=1)
    os_ = jnp.repeat(jnp.repeat(vs >> 2, 2, axis=0), 2, axis=1)

    if divide_mode > 1 and nby > 2 and nbx > 2:
        left = (jnp.roll(vx, 1, axis=1), jnp.roll(vy, 1, axis=1))
        right = (jnp.roll(vx, -1, axis=1), jnp.roll(vy, -1, axis=1))
        up = (jnp.roll(vx, 1, axis=0), jnp.roll(vy, 1, axis=0))
        down = (jnp.roll(vx, -1, axis=0), jnp.roll(vy, -1, axis=0))
        # interior mask (by in [1, nby-1), bx in [1, nbx-1))
        by = jnp.arange(nby)[:, None]
        bx = jnp.arange(nbx)[None, :]
        interior = (by > 0) & (by < nby - 1) & (bx > 0) & (bx < nbx - 1)

        tl = _get_median_xy(vx, vy, left[0], left[1], up[0], up[1])
        tr = _get_median_xy(vx, vy, right[0], right[1], up[0], up[1])
        bl = _get_median_xy(vx, vy, left[0], left[1], down[0], down[1])
        br = _get_median_xy(vx, vy, right[0], right[1], down[0], down[1])

        def put(o, quad, comp):
            sub = jnp.where(interior, quad, o[comp::2][..., comp % 2::2]
                            if False else 0)
            return sub

        # assemble via interleave
        def interleave(tlv, trv, blv, brv, base):
            out = base
            out = out.at[0::2, 0::2].set(jnp.where(interior, tlv, base[0::2, 0::2]))
            out = out.at[0::2, 1::2].set(jnp.where(interior, trv, base[0::2, 1::2]))
            out = out.at[1::2, 0::2].set(jnp.where(interior, blv, base[1::2, 0::2]))
            out = out.at[1::2, 1::2].set(jnp.where(interior, brv, base[1::2, 1::2]))
            return out

        ox = interleave(tl[0], tr[0], bl[0], br[0], ox)
        oy = interleave(tl[1], tr[1], bl[1], br[1], oy)

    return (ox.reshape(-1), oy.reshape(-1), os_.reshape(-1))


# ---------------------------------------------------------------------------
# Top level (gopSearchMVs GroupOfPlanes.c:69-125, mvanalyseGetFrame)


def _level_ctx(src_super: Super, ref_super: Super, spec: AnalyseSpec,
               level: int) -> LevelCtx:
    sspec = src_super.spec
    m = spec.meta
    from .core import geometry
    geos = geometry.level_geometries(
        sspec.width, sspec.height, sspec.hpad, sspec.vpad, sspec.pel,
        sspec.levels, sspec.x_ratio_uv, sspec.y_ratio_uv)
    g = geos[level]
    gc = geometry.chroma_geometry(g, sspec.x_ratio_uv, sspec.y_ratio_uv)
    pel = sspec.pel if level == 0 else 1

    width_b = (m.blk_size_x - m.overlap_x) * m.blk_x + m.overlap_x
    height_b = (m.blk_size_y - m.overlap_y) * m.blk_y + m.overlap_y
    nbx, nby = geometry.level_block_counts(
        width_b, height_b, m.blk_size_x, m.blk_size_y, m.overlap_x,
        m.overlap_y, level)

    nplanes = 3 if spec.chroma else 1

    def stack_of(sup: Super, p: int):
        arr = sup.planes[p][level]
        if arr.ndim == 2:
            arr = arr[None]
        return arr

    def sub0(sup: Super, p: int):
        arr = sup.planes[p][level]
        return arr[0] if arr.ndim == 3 else arr

    logx = geometry.ilog2(sspec.x_ratio_uv)
    logy = geometry.ilog2(sspec.y_ratio_uv)
    return LevelCtx(
        src_planes=tuple(sub0(src_super, p) for p in range(nplanes)),
        ref_stacks=tuple(stack_of(ref_super, p) for p in range(nplanes)),
        level=level, pel=pel, log_pel=geometry.ilog2(pel),
        blk_size=(m.blk_size_x, m.blk_size_y),
        blk_size_c=(m.blk_size_x >> logx, m.blk_size_y >> logy),
        nblk=(nbx, nby), overlap=(m.overlap_x, m.overlap_y),
        log_ratio_uv=(logx, logy),
        hpad=(g.hpad, gc.hpad), vpad=(g.vpad, gc.vpad),
        padded=(g.padded_width, g.padded_height),
        bits=sspec.bits, chroma=spec.chroma)


def _level_plan(spec: AnalyseSpec, lv: int) -> dict:
    """Static per-level search parameters — the per-level switches of
    gopSearchMVs (GroupOfPlanes.c:69-125) shared by analyse and
    analyse_batch."""
    m = spec.meta
    lv_count = m.lv_count
    verybig = m.blk_size_x * m.blk_size_y * (1 << m.bits_per_sample)
    pglobal = spec.pglobal if spec.global_ else spec.pzero
    coarsest = lv == lv_count - 1
    finest = lv == 0
    if spec.search in (SearchType.HORIZONTAL, SearchType.VERTICAL):
        search_lv = spec.search
    elif coarsest:
        search_lv = spec.search if lv_count == 1 else spec.search_coarse
    elif finest:
        search_lv = spec.search
    else:
        search_lv = spec.search_coarse
    if coarsest:
        param_lv = (spec.pel_search if lv_count == 1
                    else spec.n_search_param)
    elif finest:
        param_lv = spec.pel_search
    else:
        param_lv = spec.n_search_param
    trymany_lv = spec.trymany and lv > 0

    # lambda scaling (doPobSearchMVs PlaneOfBlocks.cpp:1024-1028)
    pel_lv = m.pel if lv == 0 else 1
    lambda_level = spec.lambda_ // (pel_lv * pel_lv)
    if spec.plevel == 1:
        lambda_level *= (1 << lv)
    elif spec.plevel == 2:
        lambda_level *= (1 << lv) * (1 << lv)

    return dict(
        search=search_lv, param=param_lv, pzero=spec.pzero,
        pglobal=pglobal, badsad=_i64(spec.badsad),
        badrange=spec.badrange, trymany=trymany_lv,
        dctmode=spec.dct, smallest_plane=coarsest,
        meander=spec.meander, lsad=spec.lsad,
        lambda_level=lambda_level, pnew=spec.pnew, verybig=verybig)


def analyse(src_super: Super, ref_super: Super, spec: AnalyseSpec,
            field_shift=0, engine: str = "exact",
            lockstep_iters: int = 1) -> MVField:
    """Run the full hierarchical search for one frame pair.

    src_super / ref_super: Super pyramids of the current and reference
    frame.  Returns an MVField (finest level first; plus the divided
    sub-block level at index 0 if spec.divide).

    engine: "exact" reproduces the reference's sequential Gauss-Seidel
    block scan bit-exactly (lax.scan over blocks — the parity oracle);
    "lockstep" is the TPU-native whole-plane search (all blocks per step,
    Jacobi predictors, `lockstep_iters` sweeps) — the production path.
    One sweep matches two within noise on real content (the inter-level
    prediction carries the propagation); raise lockstep_iters for extra
    neighbour-predictor hops.
    """
    if engine not in ("exact", "lockstep"):
        raise ValueError(f"Analyse: unknown engine {engine!r}")
    m = spec.meta
    lv_count = m.lv_count

    global_mv = (_i32(0), _i32(0))
    mean_luma_change = _i32(0)
    field_shift = _i32(field_shift)

    level_fields = {}
    vectors = None
    for lv in range(lv_count - 1, -1, -1):
        ctx = _level_ctx(src_super, ref_super, spec, lv)
        nbx, nby = ctx.nblk
        coarsest = lv == lv_count - 1
        finest = lv == 0
        level_params = _level_plan(spec, lv)

        if coarsest:
            vectors_in = (jnp.zeros((nbx * nby,), I32),
                          jnp.zeros((nbx * nby,), I32),
                          jnp.zeros((nbx * nby,), I64))
        else:
            if spec.global_:
                global_mv = estimate_global_mv_doubled(
                    vectors[0], vectors[1], 1)
            vectors_in = interpolate_prediction(
                vectors, *level_fields[lv + 1]["nblk"], nbx, nby,
                (m.blk_size_x, m.blk_size_y), (m.overlap_x, m.overlap_y),
                ctx.log_pel)

        fs_cur = jnp.where(finest, field_shift, 0).astype(I32)

        if engine == "exact":
            vectors, mean_luma_change = search_level(
                ctx, spec, level_params, vectors_in, global_mv, fs_cur,
                mean_luma_change)
        else:
            vectors, mean_luma_change = search_level_lockstep(
                ctx, spec, level_params, vectors_in, global_mv, fs_cur,
                mean_luma_change, iters=lockstep_iters)
        level_fields[lv] = {"vectors": vectors, "nblk": (nbx, nby)}

    levels_out = []
    for lv in range(lv_count):
        vx, vy, vs = level_fields[lv]["vectors"]
        nbx, nby = level_fields[lv]["nblk"]
        levels_out.append(MVPlaneField(vx.reshape(nby, nbx),
                                       vy.reshape(nby, nbx),
                                       vs.reshape(nby, nbx)))
    meta = m
    if spec.divide:
        dx, dy, ds = divide_extra(
            tuple(a.reshape(-1) for a in
                  (levels_out[0].x, levels_out[0].y, levels_out[0].sad)),
            m.blk_x, m.blk_y, spec.divide)
        levels_out.insert(0, MVPlaneField(dx.reshape(2 * m.blk_y, 2 * m.blk_x),
                                          dy.reshape(2 * m.blk_y, 2 * m.blk_x),
                                          ds.reshape(2 * m.blk_y, 2 * m.blk_x)))
        meta = spec.divided_meta
    return MVField(tuple(levels_out), jnp.ones((), I32), meta)


def batch_supported(spec: AnalyseSpec, sspec) -> bool:
    """Static predicate: every pyramid level of this config rides the
    dense-map search (no per-candidate probe DMAs inside the vmapped
    field search), so analyse_batch can vmap the whole engine."""
    import os as _os
    from . import field_engine as fe
    if _os.environ.get("MVT_SADMAP", "1") == "0":
        return False
    for lv in range(spec.meta.lv_count):
        ctx = _level_ctx_static(spec, sspec, lv)
        if not fe.map_supported(ctx, fe.map_radius(ctx), spec.dct):
            return False
    return True


def _level_ctx_static(spec: AnalyseSpec, sspec, level: int) -> LevelCtx:
    """LevelCtx with src/ref array slots EMPTY — only the static
    geometry fields are populated (enough for map_supported)."""
    m = spec.meta
    from .core import geometry
    geos = geometry.level_geometries(
        sspec.width, sspec.height, sspec.hpad, sspec.vpad, sspec.pel,
        sspec.levels, sspec.x_ratio_uv, sspec.y_ratio_uv)
    g = geos[level]
    gc = geometry.chroma_geometry(g, sspec.x_ratio_uv, sspec.y_ratio_uv)
    pel = sspec.pel if level == 0 else 1
    width_b = (m.blk_size_x - m.overlap_x) * m.blk_x + m.overlap_x
    height_b = (m.blk_size_y - m.overlap_y) * m.blk_y + m.overlap_y
    nbx, nby = geometry.level_block_counts(
        width_b, height_b, m.blk_size_x, m.blk_size_y, m.overlap_x,
        m.overlap_y, level)
    logx = geometry.ilog2(sspec.x_ratio_uv)
    logy = geometry.ilog2(sspec.y_ratio_uv)
    return LevelCtx(
        src_planes=(), ref_stacks=(), level=level, pel=pel,
        log_pel=geometry.ilog2(pel),
        blk_size=(m.blk_size_x, m.blk_size_y),
        blk_size_c=(m.blk_size_x >> logx, m.blk_size_y >> logy),
        nblk=(nbx, nby), overlap=(m.overlap_x, m.overlap_y),
        log_ratio_uv=(logx, logy),
        hpad=(g.hpad, gc.hpad), vpad=(g.vpad, gc.vpad),
        padded=(g.padded_width, g.padded_height),
        bits=sspec.bits, chroma=spec.chroma)


def analyse_batch(src_supers: Super, ref_supers: Super,
                  spec: AnalyseSpec, field_shift=0,
                  lockstep_iters: int = 1) -> MVField:
    """Frame-batched lockstep analyse: Super pytrees with a leading job
    axis [J] -> MVField with [J]-leading leaves.

    The whole hierarchical search runs as ONE vmapped program per level:
    every whole-field XLA op serves all J jobs at once (amortising the
    per-op dispatch that dominates single-frame analyse), and the dense
    SAD-map kernel builds fold the job axis into the Pallas grid (one
    launch per plane per level for the whole batch — sadmap.sad_map).
    The bad-SAD rescue (whose probe DMAs must stay behind genuine
    runtime branches; a vmapped cond runs both sides) is deferred out of
    the vmap and applied per job behind one global scalar short-circuit
    — semantics identical to per-job analyse(engine="lockstep").

    Configs where some level cannot ride the dense map (pel 4, deep
    bits, dct 1-4, tiny coarse planes) fall back to lax.map over
    analyse().  The innermost loop replaced is the reference's per-block
    pobPseudoEPZSearch scan (PlaneOfBlocks.cpp:819-968) — here the
    batch axis is frames, not blocks."""
    m = spec.meta
    lv_count = m.lv_count
    nj = jax.tree_util.tree_leaves(src_supers)[0].shape[0]

    if not batch_supported(spec, src_supers.spec):
        fs_all = jnp.broadcast_to(_i32(field_shift), (nj,))

        def one(args):
            ss, rs, fs = args
            return analyse(ss, rs, spec, fs, engine="lockstep",
                           lockstep_iters=lockstep_iters)
        return jax.lax.map(one, (src_supers, ref_supers, fs_all))

    # field_shift: scalar (shared) or [J] (per-job, e.g. alternating
    # odd/even deltas of an interlaced MDegrainN graph)
    field_shift = jnp.broadcast_to(_i32(field_shift), (nj,))
    mlc = jnp.zeros((nj,), I32)
    gmx = jnp.zeros((nj,), I32)
    gmy = jnp.zeros((nj,), I32)
    nplanes = 3 if spec.chroma else 1

    level_fields = {}
    vectors = None
    for lv in range(lv_count - 1, -1, -1):
        level_params = _level_plan(spec, lv)
        coarsest = lv == lv_count - 1
        finest = lv == 0
        ctx0 = _level_ctx_static(spec, src_supers.spec, lv)
        nbx, nby = ctx0.nblk
        nblk = nbx * nby

        def stack_of_b(sup, p):
            arr = sup.planes[p][lv]
            return arr[:, None] if arr.ndim == 3 else arr

        def sub0_b(sup, p):
            arr = sup.planes[p][lv]
            return arr[:, 0] if arr.ndim == 4 else arr

        src_planes_b = tuple(sub0_b(src_supers, p)
                             for p in range(nplanes))
        ref_stacks_b = tuple(stack_of_b(ref_supers, p)
                             for p in range(nplanes))

        if coarsest:
            vectors_in = (jnp.zeros((nj, nblk), I32),
                          jnp.zeros((nj, nblk), I32),
                          jnp.zeros((nj, nblk), I64))
        else:
            if spec.global_:
                gmx, gmy = jax.vmap(
                    lambda vx, vy: estimate_global_mv_doubled(vx, vy, 1)
                )(vectors[0], vectors[1])
            pnbx, pnby = level_fields[lv + 1]["nblk"]
            vectors_in = jax.vmap(
                lambda v: interpolate_prediction(
                    v, pnbx, pnby, nbx, nby,
                    (m.blk_size_x, m.blk_size_y),
                    (m.overlap_x, m.overlap_y), ctx0.log_pel))(vectors)

        fs_cur = jnp.where(finest, field_shift, 0).astype(I32)  # [J]

        def search_one(src_planes, ref_stacks, vin, gx, gy, mlc_j, fs_j):
            ctx = ctx0._replace(src_planes=src_planes,
                                ref_stacks=ref_stacks)
            return search_level_lockstep(
                ctx, spec, level_params, vin, (gx, gy), fs_j, mlc_j,
                iters=lockstep_iters, rescue_mode="defer")

        (vx, vy, vs), mlc, resc = jax.vmap(search_one)(
            src_planes_b, ref_stacks_b, vectors_in, gmx, gmy, mlc, fs_cur)

        idx = jnp.arange(nblk, dtype=I32)
        bad_any = jnp.any((idx[None, :] > 1)
                          & (resc["bsad"] > level_params["badsad"]))

        def apply_all(ops):
            def one(args):
                vin_j, gx_j, gy_j, mlc_j, resc_j, sp_j, rs_j, fs_j = args
                ctx = ctx0._replace(src_planes=sp_j, ref_stacks=rs_j)
                (bx, by, bs_), _ = search_level_lockstep(
                    ctx, spec, level_params, vin_j, (gx_j, gy_j),
                    fs_j, mlc_j, iters=lockstep_iters,
                    rescue_mode="apply", resc_state=resc_j)
                return bx, by, bs_
            return jax.lax.map(one, ops)

        ops = (vectors_in, gmx, gmy, mlc, resc, src_planes_b,
               ref_stacks_b, fs_cur)
        vectors = jax.lax.cond(
            bad_any, apply_all,
            lambda o: (o[4]["bx"], o[4]["by"], o[4]["bsad"]), ops)
        level_fields[lv] = {"vectors": vectors, "nblk": (nbx, nby)}

    levels_out = []
    for lv in range(lv_count):
        vx, vy, vs = level_fields[lv]["vectors"]
        nbx, nby = level_fields[lv]["nblk"]
        levels_out.append(MVPlaneField(vx.reshape(nj, nby, nbx),
                                       vy.reshape(nj, nby, nbx),
                                       vs.reshape(nj, nby, nbx)))
    meta = m
    if spec.divide:
        flat = tuple(a.reshape(nj, -1) for a in
                     (levels_out[0].x, levels_out[0].y,
                      levels_out[0].sad))
        dx, dy, ds = jax.vmap(
            lambda v: divide_extra(v, m.blk_x, m.blk_y,
                                   spec.divide))(flat)
        levels_out.insert(
            0, MVPlaneField(dx.reshape(nj, 2 * m.blk_y, 2 * m.blk_x),
                            dy.reshape(nj, 2 * m.blk_y, 2 * m.blk_x),
                            ds.reshape(nj, 2 * m.blk_y, 2 * m.blk_x)))
        meta = spec.divided_meta
    return MVField(tuple(levels_out), jnp.ones((nj,), I32), meta)
