"""Field-level lock-step motion search (the TPU production path).

The whole plane of blocks advances through pseudo-EPZ together
(PlaneOfBlocks.cpp:819-968 semantics, Jacobi predictors instead of the
reference's Gauss-Seidel raster): every stage is one of exactly two
TPU-shaped primitives —

* `DenseEvaluator.check_uniform` (analyse.py): a displacement every block
  shares (zero trial, the rescue cross/hex4 around (0,0)) costs one
  whole-plane shift + box sums; no gathers at all.
* `FieldProber.check`: per-block candidates.  One window DMA per
  (block, centre) via ops.probe.probe_sads; all static offsets around
  that centre (a hexagon, a ring, an exhaustive square, the walk steps of
  NSTEP/ONETIME/LOGARITHMIC) are in-register slices of the same window.

Data-dependent search trajectories (hex2's direction walk, diamond's
last-direction cases) become field-level while-loops whose candidate
sets are static supersets gated by per-block masks — candidate
EVALUATION ORDER within a batch matches the reference's enumeration, so
ties resolve identically wherever the iteration pattern itself coincides.

Not bit-exact vs the sequential engine by design (SURVEY §7 hard part 1):
neighbour predictors lag one Jacobi iteration and badcount feedback is
per-block; `analyse(engine="exact")` remains the parity oracle.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.types import SearchType
from .ops import probe as probe_ops

I32 = jnp.int32
I64 = jnp.int64
_INF = jnp.int64(1 << 62)


def _i32(x):
    return jnp.asarray(x, I32)


def _i64(x):
    return jnp.asarray(x, I64)


def _sat_add(a, b):
    """i64 sum of two i32 SAD maps — i32 addition would wrap when both
    carry the tiled probe's INVALID_SAD sentinel."""
    return a.astype(I64) + b.astype(I64)


class FieldProber:
    """Per-block probe evaluation: windows + static offsets.

    Holds the padded subplane stacks and per-block static context of one
    pyramid level.  All check* methods take and return a field state
    dict of [nblk] arrays (bx, by, bsad, mincost + extras).
    """

    PAD = 16  # full-pel window padding beyond the frame's own padding

    def __init__(self, ctx, src_blocks, src_u_blocks, src_v_blocks,
                 x0_a, y0_a, xc_a, yc_a, bounds, pnew,
                 dctmode: int = 0, src_luma=None, dctweight16=None,
                 dct_src=None):
        self.ctx = ctx
        self.pel = ctx.pel
        self.logp = ctx.log_pel
        self.bs = ctx.blk_size
        self.bsc = ctx.blk_size_c
        self.chroma = ctx.chroma
        self.bounds = bounds
        self.pnew = pnew
        self.dctmode = dctmode          # 0, DCT modes 1-4, SATD 5-10
        self.src_luma = (None if src_luma is None
                         else src_luma.astype(I64))
        self.dctweight16 = dctweight16
        self.dct_src = dct_src          # [nblk, bs, bs] i32 (modes 1-4)
        self.bits = ctx.bits
        self.src_blocks = src_blocks.astype(I32)
        self.stack = probe_ops.pad_stack(ctx.ref_stacks[0], self.PAD)
        # block origin in padded pel coordinates
        self.base_y = (y0_a + self.PAD) << self.logp
        self.base_x = (x0_a + self.PAD) << self.logp
        # tiled probes: one window DMA per tile of consecutive blocks
        # (probe_sads_tiled), keyed off the block grid's row length
        self.tiled = os.environ.get("MVT_TILED", "1") != "0"
        self.nbx = ctx.nblk[0]
        self.pitch_x = ctx.blk_size[0] - ctx.overlap[0]
        logx = ctx.log_ratio_uv[0]
        self.pitch_xc = max(1, self.pitch_x >> logx)
        if ctx.chroma:
            logx, logy = ctx.log_ratio_uv
            padc = max(self.PAD >> logx, self.PAD >> logy, 4)
            self.padc = padc
            self.stack_u = probe_ops.pad_stack(ctx.ref_stacks[1], padc)
            self.stack_v = probe_ops.pad_stack(ctx.ref_stacks[2], padc)
            self.src_u_blocks = src_u_blocks.astype(I32)
            self.src_v_blocks = src_v_blocks.astype(I32)
            self.cbase_y = yc_a
            self.cbase_x = xc_a

    # -- raw SAD evaluation -------------------------------------------------

    def _probe(self, stack, cy, cx, src, offsets, bs_y, bs_x, pitch,
               stats="sad"):
        """probe_sads with the tiled window path when enabled; tiled
        invalid candidates surface as INVALID_SAD and lose every cost
        comparison (the dense zero trial guarantees a real bound)."""
        if self.tiled:
            return probe_ops.probe_sads_tiled(
                stack, cy, cx, src, offsets, bs_y, bs_x, self.pel,
                row_len=self.nbx, pitch_x=pitch, stats=stats)
        return probe_ops.probe_sads(stack, cy, cx, src, offsets, bs_y,
                                    bs_x, self.pel, stats=stats)

    def _fetch_ref_blocks(self, cy, cx):
        """[nblk, K, bs, bs] i32 ref blocks at padded pel positions
        (window-DMA fetch kernel on TPU, vmapped slices elsewhere and
        for tiny block counts — see probe_ops.TINY_PROBE)."""
        bs_y, bs_x = self.bs[1], self.bs[0]
        tiny = cy.shape[0] * cy.shape[1] <= probe_ops.TINY_PROBE
        if jax.default_backend() == "tpu" and not tiny:
            return probe_ops.fetch_blocks(self.stack, cy, cx,
                                          bs_y, bs_x, self.pel)
        pelm = self.pel - 1
        logp = self.logp

        def one(y, x):
            sub = (x & pelm) | ((y & pelm) << logp)
            return jax.lax.dynamic_slice(
                self.stack, (sub, y >> logp, x >> logp),
                (1, bs_y, bs_x))[0].astype(I32)

        return jax.vmap(jax.vmap(one))(cy, cx)

    def _dct_cost(self, cy, cx, tiled: bool = False):
        """[nblk, K] DCT modes 1-4 luma costs at padded pel coords: the
        field-level replacement for the vmapped per-block fallback —
        fetch the candidate blocks (one window DMA each; `tiled` shares
        one window DMA per block tile when the candidates of a tile
        cluster, as the dct map build's grid rows do), DCT them as
        batched MXU matmuls, and mix per pobLumaSAD."""
        from .analyse import mix_dct_cost
        from .ops import dct as dct_ops
        if tiled and jax.default_backend() == "tpu":
            refs = probe_ops.fetch_blocks_tiled(
                self.stack, cy, cx, self.bs[1], self.bs[0], self.pel,
                row_len=self.nbx, pitch_x=self.pitch_x)
        else:
            refs = self._fetch_ref_blocks(cy, cx)   # [nblk, K, bs, bs]
        dct_ref = dct_ops.dct_block(refs, self.bits)
        s = (None if self.dctmode == 1
             else jnp.sum(jnp.abs(refs - self.src_blocks[:, None]),
                          axis=(-2, -1)).astype(I64))
        ref_luma = (jnp.sum(refs, axis=(-2, -1)).astype(I64)
                    if self.dctmode in (3, 4) else None)
        sl = (self.src_luma[:, None] if self.dctmode in (3, 4) else None)
        return mix_dct_cost(self.dctmode, s, self.dct_src[:, None],
                            dct_ref, sl, ref_luma, self.dctweight16,
                            self.bs[0])

    def _mix(self, stats3):
        """[..., 3] (sad, satd, ref-luma) -> mixed luma cost per
        dctmode (pobLumaSAD)."""
        from .analyse import mix_satd_cost
        s = stats3[..., 0].astype(I64)
        satd_v = stats3[..., 1].astype(I64)
        rl = stats3[..., 2].astype(I64)
        sl = self.src_luma
        while sl.ndim < rl.ndim:
            sl = sl[..., None]
        return mix_satd_cost(self.dctmode, s, satd_v, sl, rl,
                             self.dctweight16)

    def luma_sads(self, vx, vy, offsets=((0, 0),)):
        """[nblk, D] luma costs at per-block candidates (vx, vy) + static
        pel offsets (plain SAD, or the SATD-mixed cost for dct 5-10)."""
        cy = (self.base_y + vy)[:, None]
        cx = (self.base_x + vx)[:, None]
        if 1 <= self.dctmode <= 4:
            offy = jnp.asarray([o[1] for o in offsets], I32)
            offx = jnp.asarray([o[0] for o in offsets], I32)
            return self._dct_cost(cy + offy[None], cx + offx[None])
        if self.dctmode:
            out = self._probe(
                self.stack, cy, cx, self.src_blocks, offsets,
                self.bs[1], self.bs[0], self.pitch_x,
                stats="sad_satd_luma")[:, 0]        # [nblk, D, 3]
            return self._mix(out)
        out = self._probe(self.stack, cy, cx, self.src_blocks,
                          offsets, self.bs[1], self.bs[0], self.pitch_x)
        return out[:, 0, :].astype(I64)

    def chroma_sads(self, vx, vy, offsets=((0, 0),)):
        """[nblk, D] chroma SADs; candidate chroma coordinates follow the
        negative-bias rounding of pobGetRefBlockU/V
        (PlaneOfBlocks.cpp:57-77).

        Multi-offset sets share ONE window per candidate per plane: the
        chroma displacement of a luma offset is one of a small static
        delta grid (the subsampling floor can land on either of two
        chroma-pel cells depending on the candidate's parity/sign), so
        the kernel probes the whole grid and the exact column is
        selected per (block, offset) afterwards — no per-offset DMAs."""
        if not self.chroma:
            return jnp.zeros((vx.shape[0], len(offsets)), I64)
        logx, logy = self.ctx.log_ratio_uv
        logp = self.logp
        rx, ry = (1 << logx) - 1, (1 << logy) - 1

        def cpos(v, bias_mask, logr):
            bias = jnp.where(v < 0, bias_mask, 0)
            return (v + bias) >> logr

        if len(offsets) == 1:
            dx, dy = offsets[0]
            cx = (((self.cbase_x + self.padc)) << logp) \
                + cpos(vx + dx, rx, logx)
            cy = (((self.cbase_y + self.padc)) << logp) \
                + cpos(vy + dy, ry, logy)
            su = self._probe(
                self.stack_u, cy[:, None], cx[:, None],
                self.src_u_blocks, ((0, 0),), self.bsc[1], self.bsc[0],
                self.pitch_xc)[:, :, 0]
            sv = self._probe(
                self.stack_v, cy[:, None], cx[:, None],
                self.src_v_blocks, ((0, 0),), self.bsc[1], self.bsc[0],
                self.pitch_xc)[:, :, 0]
            return _sat_add(su, sv)

        xs = [o[0] for o in offsets]
        ys = [o[1] for o in offsets]
        gx = range((min(xs) - rx) >> logx, ((max(xs) + rx) >> logx) + 1)
        gy = range((min(ys) - ry) >> logy, ((max(ys) + ry) >> logy) + 1)
        grid = [(ddx, ddy) for ddy in gy for ddx in gx]
        c0x = ((self.cbase_x + self.padc) << logp) + cpos(vx, rx, logx)
        c0y = ((self.cbase_y + self.padc) << logp) + cpos(vy, ry, logy)
        su = self._probe(
            self.stack_u, c0y[:, None], c0x[:, None], self.src_u_blocks,
            tuple(grid), self.bsc[1], self.bsc[0], self.pitch_xc)[:, 0, :]
        sv = self._probe(
            self.stack_v, c0y[:, None], c0x[:, None], self.src_v_blocks,
            tuple(grid), self.bsc[1], self.bsc[0], self.pitch_xc)[:, 0, :]
        tot = _sat_add(su, sv)                       # [nblk, |grid|]
        base_dx = cpos(vx, rx, logx)
        base_dy = cpos(vy, ry, logy)
        cols = []
        for (dx, dy) in offsets:
            ddx = cpos(vx + dx, rx, logx) - base_dx
            ddy = cpos(vy + dy, ry, logy) - base_dy
            col = jnp.zeros((vx.shape[0],), I64)
            for gi, (ax, ay) in enumerate(grid):
                col = jnp.where((ddx == ax) & (ddy == ay), tot[:, gi],
                                col)
            cols.append(col)
        return jnp.stack(cols, axis=1)

    # -- check primitives ---------------------------------------------------

    def check(self, st, cand_x, cand_y, offsets=((0, 0),),
              penalty_new=True, update_xy=True, dir_vals=None,
              extra_mask=None, lam=None, pred=None):
        """check_batch semantics over per-block candidates x static
        offsets, enumerated offset-major in order (first strict
        improvement wins — pobCheckMV PlaneOfBlocks.cpp:219-261)."""
        dxmin, dxmax, dymin, dymax = self.bounds
        cvx = jnp.clip(cand_x, dxmin, dxmax - 1)
        cvy = jnp.clip(cand_y, dymin, dymax - 1)
        ls = self.luma_sads(cvx, cvy, offsets)          # [nblk, D]
        cs = self.chroma_sads(cvx, cvy, offsets)
        for d, (dx, dy) in enumerate(offsets):
            vx = cand_x + dx
            vy = cand_y + dy
            ok = ((vx >= dxmin) & (vy >= dymin)
                  & (vx < dxmax) & (vy < dymax))
            if extra_mask is not None:
                ok = ok & extra_mask[:, d]
            # the gathered SAD used clamped coords; exact only when valid
            sad_tot = ls[:, d] + cs[:, d]
            pdx = (pred[0] - jnp.clip(vx, dxmin, dxmax - 1)).astype(I32)
            pdy = (pred[1] - jnp.clip(vy, dymin, dymax - 1)).astype(I32)
            dist = (pdx * pdx + pdy * pdy).astype(I32)
            md = ((lam * dist.astype(I64)) >> 8).astype(I32).astype(I64)
            cost = md + sad_tot
            if penalty_new:
                pn = _i64(self.pnew)
                cost = cost + ((pn * ls[:, d]) >> 8) + ((pn * cs[:, d]) >> 8)
            cost = jnp.where(ok, cost, _INF)
            improve = cost < st["mincost"]
            if update_xy:
                st = dict(st,
                          bx=jnp.where(improve, vx, st["bx"]),
                          by=jnp.where(improve, vy, st["by"]))
            st = dict(st,
                      bsad=jnp.where(improve, sad_tot, st["bsad"]),
                      mincost=jnp.where(improve, cost, st["mincost"]))
            if dir_vals is not None:
                st = dict(st, dir=jnp.where(improve, _i32(dir_vals[d]),
                                            st["dir"]))
        return st

    def plain_sad(self, vx, vy):
        """Unmasked SAD at clamped per-block candidates (zero/global/pred
        trials clamp beforehand and skip the bounds check)."""
        ls = self.luma_sads(vx, vy)[:, 0]
        cs = self.chroma_sads(vx, vy)[:, 0]
        return ls + cs

    def plain_sads_multi(self, vxs, vys):
        """[nblk, K] unmasked luma costs at K clamped candidates per
        block — one probe launch for all K (the predictor trials
        batched)."""
        cy = self.base_y[:, None] + jnp.stack(vys, axis=1)
        cx = self.base_x[:, None] + jnp.stack(vxs, axis=1)
        if 1 <= self.dctmode <= 4:
            ls = self._dct_cost(cy, cx)
        elif self.dctmode:
            out = self._probe(
                self.stack, cy, cx, self.src_blocks, ((0, 0),),
                self.bs[1], self.bs[0], self.pitch_x,
                stats="sad_satd_luma")[:, :, 0]     # [nblk, K, 3]
            ls = self._mix(out)
        else:
            ls = self._probe(
                self.stack, cy, cx, self.src_blocks, ((0, 0),),
                self.bs[1], self.bs[0],
                self.pitch_x)[:, :, 0].astype(I64)
        if not self.chroma:
            return ls
        k = len(vxs)
        vx_flat = jnp.stack(vxs, axis=1).reshape(-1)
        vy_flat = jnp.stack(vys, axis=1).reshape(-1)
        logx, logy = self.ctx.log_ratio_uv
        logp = self.logp
        xbias = jnp.where(vx_flat < 0, (1 << logx) - 1, 0)
        ybias = jnp.where(vy_flat < 0, (1 << logy) - 1, 0)
        n = self.cbase_x.shape[0]
        cxc = ((jnp.repeat(self.cbase_x + self.padc, k) << logp)
               + ((vx_flat + xbias) >> logx)).reshape(n, k)
        cyc = ((jnp.repeat(self.cbase_y + self.padc, k) << logp)
               + ((vy_flat + ybias) >> logy)).reshape(n, k)
        su = self._probe(self.stack_u, cyc, cxc,
                         self.src_u_blocks, ((0, 0),),
                         self.bsc[1], self.bsc[0], self.pitch_xc)
        sv = self._probe(self.stack_v, cyc, cxc,
                         self.src_v_blocks, ((0, 0),),
                         self.bsc[1], self.bsc[0], self.pitch_xc)
        return ls + _sat_add(su[:, :, 0], sv[:, :, 0])

    def sad_table(self, cx0, cy0, offsets):
        """(luma, chroma) SAD tables [nblk, D] for static pel `offsets`
        around per-block centres — ONE window probe per block for luma
        (the whole offset set shares a window)."""
        cy = (self.base_y + cy0)[:, None]
        cx = (self.base_x + cx0)[:, None]
        ls = self._probe(self.stack, cy, cx, self.src_blocks,
                         offsets, self.bs[1], self.bs[0],
                         self.pitch_x)[:, 0, :].astype(I64)
        cs = self.chroma_sads(cx0, cy0, offsets)
        return ls, cs


def _map_tile(ctx) -> int:
    """Blocks per map tile: fill ~MVT_MAP_SPAN lanes (default 256 — two
    vregs; the per-offset fixed costs in the map kernel amortise over
    the span, so wider tiles cut the dominant per-(tile, offset) op
    count roughly in half vs one vreg)."""
    env = os.environ.get("MVT_MAP_TILE")
    if env:
        return min(int(env), ctx.nblk[0])
    span = int(os.environ.get("MVT_MAP_SPAN", "256"))
    bsx = ctx.blk_size[0]
    pitch = bsx - ctx.overlap[0]
    t = max(2, min(32, (span - bsx) // max(1, pitch) + 1))
    return min(t, ctx.nblk[0])


def map_radius(ctx) -> int:
    """Default pel-grid radius: walk drift (hex2 range + ring) plus the
    anchor's alignment rounding loss.  Base 6: the lockstep parity
    gates (translation/rotation/zoom/occlusion, test_parity_report)
    hold at a flat radius 6, and map cost scales linearly with the
    grid area — 6+align/2 keeps a margin over the tested floor while
    cutting ~40% of the kernel work vs the old base 8."""
    env = os.environ.get("MVT_MAP_R")
    if env:
        return int(env)
    logx, logy = ctx.log_ratio_uv
    align = 1 << (ctx.log_pel + (max(logx, logy) if ctx.chroma else 0))
    return 6 + align // 2


def map_supported(ctx, r: int, dctmode: int = 0) -> bool:
    """Static predicate: MapProber usable on this level's geometry
    (block sums f32-exact, windows fit the padded stacks, chroma pitch
    integral; dct modes 5-10 additionally need the span-SATD column
    alignment; dct modes 1-4 build a mixed-cost map from fetched blocks
    and need 8-bit sources)."""
    from .ops import sad as sad_ops
    from .ops import sadmap
    bsx, bsy = ctx.blk_size
    if dctmode and not 1 <= dctmode <= 10:
        return False
    if 5 <= dctmode <= 10:
        pitch_s = bsx - ctx.overlap[0]
        if (ctx.bits != 8 or pitch_s % 8 or bsx % 8 or bsy % 4
                or not sad_ops.satd_supported(bsx, bsy)):
            return False
    # the kernel's f32 column-sum + pooling matmul is exact while block
    # sums stay under 2^24 (8-bit: every size; 16-bit: up to 16x16)
    if ((1 << ctx.bits) - 1) * bsx * bsy >= (1 << 24):
        return False
    if ctx.bits != 8 and jax.default_backend() == "tpu":
        # the Pallas kernel's DMA base alignment (8 sublanes) is tuned
        # for the u8 (32, 128) VMEM tile; u16 windows need 16-sublane
        # alignment — unvalidated on hardware, so deep bits keep probes
        # on TPU (the XLA map path still serves CPU/tests)
        return False
    if ctx.pel > 2:
        # the pel-4 hex2 walk drifts up to ~11 pel from its start, past
        # any affordable grid radius (measured: rotation parity 1.039 at
        # r=10 vs the 1.02 gate); the window probes stay in charge there
        return False
    if 1 <= dctmode <= 4 and ctx.bits != 8:
        # the dct map's mixed-cost entries assume 8-bit block sums; the
        # deep-bit TPU guard above already keeps probes in charge there
        return False
    pitch = bsx - ctx.overlap[0]
    tile = _map_tile(ctx)
    hp = ctx.padded[1] + 2 * FieldProber.PAD + probe_ops.ALIGN_SLACK_Y
    wp = ctx.padded[0] + 2 * FieldProber.PAD + probe_ops.ALIGN_SLACK_X
    (lo_y, hi_y), (lo_x, hi_x) = sadmap.anchor_bounds(
        r, r, bsy, bsx, ctx.pel, tile, pitch, hp, wp)
    if hi_y < lo_y or hi_x < lo_x:
        return False
    if ctx.chroma:
        logx, logy = ctx.log_ratio_uv
        if pitch % (1 << logx) != 0:
            return False
        bcx, bcy = ctx.blk_size_c
        rc_y = (r >> logy) + 1
        rc_x = (r >> logx) + 1
        padc = max(FieldProber.PAD >> logx, FieldProber.PAD >> logy, 4)
        hp_c = (ctx.padded[1] >> logy) + 2 * padc + probe_ops.ALIGN_SLACK_Y
        wp_c = (ctx.padded[0] >> logx) + 2 * padc + probe_ops.ALIGN_SLACK_X
        (lo, hi), (lo2, hi2) = sadmap.anchor_bounds(
            rc_y, rc_x, bcy, bcx, ctx.pel, tile, pitch >> logx, hp_c,
            wp_c)
        if hi < lo or hi2 < lo2:
            return False
    return True


def _med3_tiles(a, nby, ntx, tile):
    """[nblk(row-padded to ntx*tile)] -> per-tile med3 of the first,
    middle and last entry, [nby*ntx]."""
    t = a.reshape(nby, ntx, tile)
    return probe_ops._med3(t[:, :, 0], t[:, :, tile // 2],
                           t[:, :, tile - 1]).reshape(-1)


def _row_pad(a, nby, nbx, rlp):
    """Edge-pad each block row of a [nby*nbx, ...] array to rlp."""
    if rlp == nbx:
        return a
    t = a.reshape((nby, nbx) + a.shape[1:])
    pad = [(0, 0), (0, rlp - nbx)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(t, pad, mode="edge").reshape((nby * rlp,)
                                                + a.shape[1:])


class MapProber(FieldProber):
    """FieldProber whose SAD source is a dense per-block offset map
    (ops/sadmap.py) instead of per-candidate window probes.

    One SAD-map kernel pass per plane per level evaluates the whole
    +-R pel grid around a per-tile predictor anchor; every check()
    thereafter — predictor trials, the hex2/UMH walks, expanding rings
    — is a pure one-hot lookup with no DMA at all.  Candidates outside
    the grid report INVALID_SAD and lose (the dense zero trial bounds
    every block); the bad-SAD rescue keeps using a probe-based prober
    via field_epz's probe_p argument.  Serves plain SAD (dctmode 0),
    SATD-stat maps (5-10) and mixed-cost DCT maps (1-4)."""

    def __init__(self, ctx, src_blocks, src_u_blocks, src_v_blocks,
                 x0_a, y0_a, xc_a, yc_a, bounds, pnew, pred_vx, pred_vy,
                 r: int = 0, dctmode: int = 0, src_luma=None,
                 dctweight16=None, dct_src=None):
        super().__init__(ctx, src_blocks, src_u_blocks, src_v_blocks,
                         x0_a, y0_a, xc_a, yc_a, bounds, pnew,
                         dctmode=dctmode, src_luma=src_luma,
                         dctweight16=dctweight16, dct_src=dct_src)
        self._stats = ("sad_satd_luma" if 5 <= dctmode <= 10
                       else "sad")
        # dct 1-4: the luma map stores the MIXED cost per grid offset,
        # computed from fetched blocks by the same _dct_cost the probe
        # path uses — map entries stay bit-identical to probes, and the
        # single-channel lookup path serves them unchanged
        dct14 = 1 <= dctmode <= 4
        from .ops import sadmap
        if not r:
            r = map_radius(ctx)
        self.r = r
        logp = self.logp
        pel = self.pel
        logx, logy = ctx.log_ratio_uv
        logx_e = logx if ctx.chroma else 0
        logy_e = logy if ctx.chroma else 0
        bsx, bsy = ctx.blk_size
        nbx, nby = ctx.nblk
        pitch = self.pitch_x
        pitch_y = bsy - ctx.overlap[1]
        tile = _map_tile(ctx)
        rlp = -(-nbx // tile) * tile
        ntx = rlp // tile
        hpad, hpad_c = ctx.hpad
        vpad, vpad_c = ctx.vpad
        PAD = self.PAD

        # ---- anchors: per-tile med3 of the predictor field, aligned so
        # every derived plane anchor is full-pel, clamped so the window
        # DMA fits the padded stack
        pvx = _row_pad(jnp.asarray(pred_vx, I32), nby, nbx, rlp)
        pvy = _row_pad(jnp.asarray(pred_vy, I32), nby, nbx, rlp)
        med_x = _med3_tiles(pvx, nby, ntx, tile)       # [ntile]
        med_y = _med3_tiles(pvy, nby, ntx, tile)
        sh_x = logp + logx_e
        sh_y = logp + logy_e
        # static block-0 source origins per tile column / block row and
        # their probe-padded window-coordinate counterparts
        s_x = hpad + pitch * tile * np.arange(ntx, dtype=np.int32)
        s_y = vpad + pitch_y * np.arange(nby, dtype=np.int32)
        c_x = s_x + PAD
        c_y = s_y + PAD
        hp, wp = self.stack.shape[1], self.stack.shape[2]
        (lo_y, hi_y), (lo_x, hi_x) = sadmap.anchor_bounds(
            r, r, bsy, bsx, pel, tile, pitch, hp, wp)

        def clamp_align(av, c, lo, hi, sh):
            """Clamp the pel-units anchor so fp = c + (av >> logp) lands
            in [lo, hi], stepping only in 2^sh units."""
            s = 1 << sh
            lo_v = -(-((lo - c) << logp) // s) * s          # ceil-align
            hi_v = (((hi - c) << logp) // s) * s            # floor-align
            return jnp.clip(av, jnp.asarray(lo_v, I32),
                            jnp.asarray(hi_v, I32))

        av_x = ((med_x >> sh_x) << sh_x).reshape(nby, ntx)
        av_y = ((med_y >> sh_y) << sh_y).reshape(nby, ntx)
        av_x = clamp_align(av_x, c_x[None, :], lo_x, hi_x,
                           sh_x).reshape(-1)               # [ntile] pel
        av_y = clamp_align(av_y, c_y[:, None], lo_y, hi_y,
                           sh_y).reshape(-1)
        af_x = (jnp.tile(jnp.asarray(c_x, I32), nby)
                + (av_x >> logp))                          # [ntile] fp
        af_y = (jnp.repeat(jnp.asarray(c_y, I32), ntx)
                + (av_y >> logp))

        def per_block(a_tile):
            t = jnp.repeat(a_tile.reshape(nby, ntx), tile, axis=1)
            return t[:, :nbx].reshape(-1)

        self._av_x = per_block(av_x)                       # [nblk] pel
        self._av_y = per_block(av_y)

        def spans_of(plane, y0s, x0s, bh, span_pad):
            """[ntile, bh, span_pad] spans by static slices (tail tiles
            read edge padding; only their padded blocks see it)."""
            padr = max(0, int(x0s[-1]) + span_pad - plane.shape[1])
            if padr:
                plane = jnp.pad(plane, ((0, 0), (0, padr)), mode="edge")
            rows = jnp.stack([
                jax.lax.slice(plane, (int(y), 0),
                              (int(y) + bh, plane.shape[1]))
                for y in y0s])                           # [nby, bh, W]
            cols = jnp.stack([
                jax.lax.slice(rows, (0, 0, int(x)),
                              (len(y0s), bh, int(x) + span_pad))
                for x in x0s], axis=1)
            return cols.reshape(len(y0s) * len(x0s), bh, span_pad)

        def build(stack, plane, y0s, x0s, afy, afx, ry, rx, bh, bw,
                  pit, anchor_cy, anchor_cx, src_blk, stats="sad"):
            span_pad = sadmap.map_geom(ry, rx, bh, bw, pel, tile,
                                       pit)[3]
            ch = (3,) if stats == "sad_satd_luma" else ()
            if jax.default_backend() == "tpu":
                spans = spans_of(plane, y0s, x0s, bh, span_pad)

                def run(fy, fx, sp):
                    # vmap-aware: a frame-batched analyse folds the
                    # batch into one kernel launch (sadmap.sad_map)
                    return sadmap.sad_map(
                        stack, fy, fx, sp, ry, rx, bh, bw, pel, tile,
                        pit, stats=stats)

                out = probe_ops.spatial_shard(
                    run, [afy, afx, spans], row_len=ntx)
                m = out.transpose(0, 2, 1).reshape(nby, rlp, -1)
                m = m[:, :nbx].reshape(nby * nbx, -1)
            else:
                def run(cy, cx, sb):
                    return sadmap.sad_map_xla(stack, cy, cx, sb, ry,
                                              rx, bh, bw, pel,
                                              stats=stats)

                m = probe_ops.spatial_shard(
                    run, [anchor_cy, anchor_cx,
                          src_blk.astype(I32)], row_len=nbx)
            return m.reshape((nby * nbx, 2 * ry + 1, 2 * rx + 1) + ch)

        if dct14:
            # mixed-cost dct map: one _dct_cost row per grid dy (fetch
            # kernel windows + batched f64 DCT matmuls), stacked to the
            # same [nblk, Dy, Dx] layout as the plain-SAD map
            cys = self.base_y + self._av_y
            cxs = self.base_x + self._av_x
            dxs = jnp.arange(-r, r + 1, dtype=I32)
            rows_m = []
            for iy in range(-r, r + 1):
                cx = cxs[:, None] + dxs[None, :]
                cy = jnp.broadcast_to((cys + iy)[:, None], cx.shape)
                rows_m.append(self._dct_cost(cy, cx,
                                             tiled=True).astype(I32))
            self._m_l = jnp.stack(rows_m, axis=1)
        else:
            self._m_l = build(self.stack, ctx.src_planes[0], s_y, s_x,
                              af_y, af_x, r, r, bsy, bsx, pitch,
                              self.base_y + self._av_y,
                              self.base_x + self._av_x, src_blocks,
                              stats=self._stats)
        if ctx.chroma:
            self._rc_y = (r >> logy) + 1
            self._rc_x = (r >> logx) + 1
            bcx, bcy = ctx.blk_size_c
            pit_c = pitch >> logx
            padc = self.padc
            sc_x = hpad_c + pit_c * tile * np.arange(ntx,
                                                     dtype=np.int32)
            sc_y = vpad_c + (pitch_y >> logy) * np.arange(
                nby, dtype=np.int32)
            hp_c, wp_c = self.stack_u.shape[1], self.stack_u.shape[2]
            (lo_cy, hi_cy), (lo_cx, hi_cx) = sadmap.anchor_bounds(
                self._rc_y, self._rc_x, bcy, bcx, pel, tile, pit_c,
                hp_c, wp_c)
            # derived chroma anchors stay full-pel (av mult of 2^sh);
            # the chroma clamp steps in pel units only
            avc_x_t = clamp_align((av_x >> logx).reshape(nby, ntx),
                                  (sc_x + padc)[None, :], lo_cx, hi_cx,
                                  logp).reshape(-1)
            avc_y_t = clamp_align((av_y >> logy).reshape(nby, ntx),
                                  (sc_y + padc)[:, None], lo_cy, hi_cy,
                                  logp).reshape(-1)
            self._avc_x = per_block(avc_x_t)
            self._avc_y = per_block(avc_y_t)
            afc_x = (jnp.tile(jnp.asarray(sc_x + padc, I32), nby)
                     + (avc_x_t >> logp))
            afc_y = (jnp.repeat(jnp.asarray(sc_y + padc, I32), ntx)
                     + (avc_y_t >> logp))
            cbase_y = ((yc_a + padc) << logp)
            cbase_x = ((xc_a + padc) << logp)
            mu = build(self.stack_u, ctx.src_planes[1], sc_y, sc_x,
                       afc_y, afc_x, self._rc_y, self._rc_x, bcy,
                       bcx, pit_c, cbase_y + self._avc_y,
                       cbase_x + self._avc_x, src_u_blocks)
            mv = build(self.stack_v, ctx.src_planes[2], sc_y, sc_x,
                       afc_y, afc_x, self._rc_y, self._rc_x, bcy,
                       bcx, pit_c, cbase_y + self._avc_y,
                       cbase_x + self._avc_x, src_v_blocks)
            self._m_c = mu + mv

    # -- lookups ------------------------------------------------------------

    @staticmethod
    def _lookup(m, iy, ix):
        """[nblk] I64 values of m [nblk, Dy, Dx] at per-block grid
        indices; INVALID_SAD outside the grid.  One-hot contractions —
        a per-block gather would cost ~1.4us per row on this backend."""
        _, dy_n, dx_n = m.shape
        ok = (iy >= 0) & (iy < dy_n) & (ix >= 0) & (ix < dx_n)
        iyc = jnp.clip(iy, 0, dy_n - 1)
        ixc = jnp.clip(ix, 0, dx_n - 1)
        ohy = jnp.arange(dy_n, dtype=I32)[None] == iyc[:, None]
        row = jnp.sum(jnp.where(ohy[:, :, None], m, 0), axis=1)
        v = jnp.sum(jnp.where(
            jnp.arange(dx_n, dtype=I32)[None] == ixc[:, None], row, 0),
            axis=1)
        return jnp.where(ok, v, probe_ops.INVALID_SAD).astype(I64)

    @staticmethod
    def _lookup3(m, iy, ix):
        """[nblk, 3] stat triples of m [nblk, Dy, Dx, 3] + validity."""
        _, dy_n, dx_n, _ = m.shape
        ok = (iy >= 0) & (iy < dy_n) & (ix >= 0) & (ix < dx_n)
        iyc = jnp.clip(iy, 0, dy_n - 1)
        ixc = jnp.clip(ix, 0, dx_n - 1)
        ohy = jnp.arange(dy_n, dtype=I32)[None] == iyc[:, None]
        row = jnp.sum(jnp.where(ohy[:, :, None, None], m, 0), axis=1)
        ohx = jnp.arange(dx_n, dtype=I32)[None] == ixc[:, None]
        v = jnp.sum(jnp.where(ohx[:, :, None], row, 0), axis=1)
        return v, ok

    def _luma_at(self, vx, vy):
        iy = vy - self._av_y + self.r
        ix = vx - self._av_x + self.r
        if self._stats == "sad":
            return self._lookup(self._m_l, iy, ix)
        v3, ok = self._lookup3(self._m_l, iy, ix)
        mix = self._mix(v3)
        return jnp.where(ok, mix,
                         probe_ops.INVALID_SAD).astype(I64)

    def _chroma_at(self, vx, vy):
        if not self.chroma:
            return jnp.zeros(vx.shape, I64)
        logx, logy = self.ctx.log_ratio_uv
        tx = (vx + jnp.where(vx < 0, (1 << logx) - 1, 0)) >> logx
        ty = (vy + jnp.where(vy < 0, (1 << logy) - 1, 0)) >> logy
        return self._lookup(self._m_c, ty - self._avc_y + self._rc_y,
                            tx - self._avc_x + self._rc_x)

    def luma_sads(self, vx, vy, offsets=((0, 0),)):
        return jnp.stack([self._luma_at(vx + dx, vy + dy)
                          for (dx, dy) in offsets], axis=1)

    def chroma_sads(self, vx, vy, offsets=((0, 0),)):
        if not self.chroma:
            return jnp.zeros((vx.shape[0], len(offsets)), I64)
        return jnp.stack([self._chroma_at(vx + dx, vy + dy)
                          for (dx, dy) in offsets], axis=1)

    def plain_sads_multi(self, vxs, vys):
        return jnp.stack(
            [self._luma_at(vx, vy) + self._chroma_at(vx, vy)
             for vx, vy in zip(vxs, vys)], axis=1)

    def sad_table(self, cx0, cy0, offsets):
        ls = self.luma_sads(cx0, cy0, offsets)
        cs = self.chroma_sads(cx0, cy0, offsets)
        return ls, cs


def _ring_offsets(r, s):
    offs = []
    for i in range(-r + s, r, s):
        offs += [(i, -r), (i, r)]
    for j in range(-r + s, r, s):
        offs += [(-r, j), (r, j)]
    offs += [(-r, -r), (-r, r), (r, -r), (r, r)]
    return offs


def _expanding(p: FieldProber, st, r, s, cx, cy, lam, pred, active=None):
    offs = _ring_offsets(r, s)
    em = (None if active is None
          else jnp.broadcast_to(active[:, None], (active.shape[0],
                                                  len(offs))))
    return p.check(st, cx, cy, offs, lam=lam, pred=pred, extra_mask=em)


def _exhaustive(p, st, radius, lam, pred, active=None):
    offs = []
    for r in range(1, radius + 1):
        offs += _ring_offsets(r, 1)
    em = (None if active is None
          else jnp.broadcast_to(active[:, None], (active.shape[0],
                                                  len(offs))))
    return p.check(st, st["bx"], st["by"], offs, lam=lam, pred=pred,
                   extra_mask=em)


_HEXP = [(-1, -2), (-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2),
         (-1, -2), (-2, 0)]
_MOD6M1 = [5, 0, 1, 2, 3, 4, 5, 0]


def _table(tbl, idx):
    """tbl[idx] for a tiny static table via one-hot selects (a per-block
    XLA gather costs ~1.4us per row on TPU; K selects are ~free).
    Result shape: idx.shape + tbl.shape[1:]."""
    t = np.asarray(tbl)
    out = jnp.zeros(idx.shape + t.shape[1:],
                    jnp.asarray(t.reshape(-1)[0]).dtype)
    for k in range(t.shape[0]):
        sel = idx == k
        if t.ndim > 1:
            sel = sel.reshape(sel.shape + (1,) * (t.ndim - 1))
        out = jnp.where(sel, jnp.asarray(t[k]), out)
    return out


def _update_from_cols(p: FieldProber, st, ls_cols, cs_cols, vxs, vys,
                      lam, pred, dir_vals=None, masks=None,
                      update_xy=True, penalty_new=True):
    """check() semantics (first strict improvement in order) from
    precomputed SAD columns: ls_cols/cs_cols/vxs/vys are equal-length
    lists of [nblk] arrays, one per candidate, already in evaluation
    order."""
    dxmin, dxmax, dymin, dymax = p.bounds
    for d in range(len(ls_cols)):
        vx, vy = vxs[d], vys[d]
        ok = ((vx >= dxmin) & (vy >= dymin) & (vx < dxmax) & (vy < dymax))
        if masks is not None and masks[d] is not None:
            ok = ok & masks[d]
        ls = ls_cols[d]
        cs = cs_cols[d]
        sad_tot = ls + cs
        pdx = (pred[0] - jnp.clip(vx, dxmin, dxmax - 1)).astype(I32)
        pdy = (pred[1] - jnp.clip(vy, dymin, dymax - 1)).astype(I32)
        dist = (pdx * pdx + pdy * pdy).astype(I32)
        cost = ((lam * dist.astype(I64)) >> 8).astype(I32).astype(I64) \
            + sad_tot
        if penalty_new:
            pn = _i64(p.pnew)
            cost = cost + ((pn * ls) >> 8) + ((pn * cs) >> 8)
        cost = jnp.where(ok, cost, _INF)
        improve = cost < st["mincost"]
        if update_xy:
            st = dict(st,
                      bx=jnp.where(improve, vx, st["bx"]),
                      by=jnp.where(improve, vy, st["by"]))
        st = dict(st,
                  bsad=jnp.where(improve, sad_tot, st["bsad"]),
                  mincost=jnp.where(improve, cost, st["mincost"]))
        if dir_vals is not None:
            st = dict(st, dir=jnp.where(improve, _i32(dir_vals[d]),
                                        st["dir"]))
    return st


def _hex2_range2(p: FieldProber, st, lam, pred, active=None):
    """pobHex2Search for i_me_range == 2 (the default searchparam) from a
    SINGLE window probe: at range 2 the direction walk never iterates
    (i starts at 1, bound range/2 == 1), so the whole search is the
    initial hexagon + the final ±1 ring at the (possibly moved) centre —
    all 7 possible centres' ring candidates live in one static offset
    set.  Exactly the candidate order of the masked implementation."""
    nblk = st["bx"].shape[0]
    hex6 = [(-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2)]
    ring = _ring_offsets(1, 1)
    centres = [(0, 0)] + hex6          # dir -2 -> stay, dir d -> hex6[d]
    # static offset table: hexagon + every centre's ring, dedup'd
    table = list(hex6)
    index = {o: i for i, o in enumerate(table)}
    for c in centres:
        for r in ring:
            o = (c[0] + r[0], c[1] + r[1])
            if o not in index:
                index[o] = len(table)
                table.append(o)
    cx0, cy0 = st["bx"], st["by"]
    ls, cs = p.sad_table(cx0, cy0, tuple(table))

    def col(o):
        i = index[o]
        return ls[:, i], cs[:, i]

    # stage A: hexagon, update_xy=False, dirs 0..5
    st = dict(st, dir=jnp.full((nblk,), -2, I32))
    masks = None if active is None else [active] * 6
    lsA, csA, vxA, vyA = [], [], [], []
    for (dx, dy) in hex6:
        lcol, ccol = col((dx, dy))
        lsA.append(lcol)
        csA.append(ccol)
        vxA.append(cx0 + dx)
        vyA.append(cy0 + dy)
    st = _update_from_cols(p, st, lsA, csA, vxA, vyA, lam, pred,
                           dir_vals=[0, 1, 2, 3, 4, 5], masks=masks,
                           update_xy=False)

    # move the centre per dir (walk loop is empty at range 2)
    d0 = jnp.clip(st["dir"], -1, 6)
    hx = np.asarray([h[0] for h in _HEXP], np.int32)
    hy = np.asarray([h[1] for h in _HEXP], np.int32)
    walked = st["dir"] != -2
    bmx = jnp.where(walked, cx0 + _table(hx, d0 + 1), cx0)
    bmy = jnp.where(walked, cy0 + _table(hy, d0 + 1), cy0)
    st = dict(st, bx=bmx, by=bmy)

    # final ring at the moved centre: per ring slot, select the SAD
    # column by centre case (7 static cases — no gathers)
    case = jnp.where(walked, st["dir"], -1)      # -1 = stayed
    lsR, csR, vxR, vyR = [], [], [], []
    for (rx, ry) in ring:
        lcol = jnp.zeros((nblk,), I64)
        ccol = jnp.zeros((nblk,), I64)
        for ci, (cxo, cyo) in enumerate(centres):
            l_c, c_c = col((cxo + rx, cyo + ry))
            sel = case == (ci - 1)
            lcol = jnp.where(sel, l_c, lcol)
            ccol = jnp.where(sel, c_c, ccol)
        lsR.append(lcol)
        csR.append(ccol)
        vxR.append(bmx + rx)
        vyR.append(bmy + ry)
    masks = None if active is None else [active] * len(ring)
    return _update_from_cols(p, st, lsR, csR, vxR, vyR, lam, pred,
                             masks=masks)


def _hex2(p: FieldProber, st, i_me_range, lam, pred, active=None):
    # the single-probe merged variant trades ~2x per-offset VPU work for
    # one less DMA pass; on current hardware the two-call path measures
    # faster at blk16 (see BASELINE.md), so it stays opt-in
    import os
    if i_me_range == 2 and os.environ.get("MVT_HEX2_MERGED", "0") == "1":
        return _hex2_range2(p, st, lam, pred, active=active)
    return _hex2_general(p, st, i_me_range, lam, pred, active=active)


def _hex2_general(p: FieldProber, st, i_me_range, lam, pred, active=None):
    """pobHex2Search (PlaneOfBlocks.cpp:661-724) at field level: the
    direction walk probes the full 8-entry hexagon window with a
    direction-dependent per-block mask."""
    nblk = st["bx"].shape[0]
    hx = np.asarray([h[0] for h in _HEXP], np.int32)
    hy = np.asarray([h[1] for h in _HEXP], np.int32)
    m6 = np.asarray(_MOD6M1, np.int32)
    bmx, bmy = st["bx"], st["by"]

    def act(mask):
        return mask if active is None else (mask & active)

    if i_me_range > 1:
        st = dict(st, dir=jnp.full((nblk,), -2, I32))
        offs = [(-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2)]
        em = jnp.broadcast_to(act(jnp.ones((nblk,), bool))[:, None],
                              (nblk, 6))
        st = p.check(st, bmx, bmy, offs, update_xy=False,
                     dir_vals=[0, 1, 2, 3, 4, 5], extra_mask=em,
                     lam=lam, pred=pred)

        walked = st["dir"] != -2
        d0 = jnp.clip(st["dir"], -1, 6)
        bmx = jnp.where(walked, bmx + _table(hx, d0 + 1), bmx)
        bmy = jnp.where(walked, bmy + _table(hy, d0 + 1), bmy)

        dxmin, dxmax, dymin, dymax = p.bounds

        def in_bounds(x, y):
            return (x >= dxmin) & (y >= dymin) & (x < dxmax) & (y < dymax)

        # candidate superset = the 8 hexp entries; per block, entries
        # odir, odir+1, odir+2 are live, in that order (the reference
        # checks them in exactly this order)
        live_table = np.zeros((6, 8), bool)
        for odir in range(6):
            live_table[odir, odir:odir + 3] = True
        def cond(c):
            st, bmx, bmy, i, walking = c
            return jnp.any(walking & (i < i_me_range // 2))

        def body(c):
            st, bmx, bmy, i, walking = c
            walking = (walking & (i < i_me_range // 2)
                       & in_bounds(bmx, bmy) & (st["dir"] != -2))
            odir = _table(m6, jnp.clip(st["dir"], -1, 6) + 1)
            st2 = dict(st, dir=jnp.full((nblk,), -2, I32))
            mask = _table(live_table, odir) & act(walking)[:, None]
            dirs8 = [od - 1 for od in range(-1, 7)]
            # dir value for entry e when odir=od is e-1 (odir-1, odir,
            # odir+1 for entries odir..odir+2)
            st2 = p.check(st2, bmx, bmy, _HEXP, update_xy=False,
                          dir_vals=[e - 1 for e in range(8)],
                          extra_mask=mask, lam=lam, pred=pred)
            moved = st2["dir"] != -2
            d = jnp.clip(st2["dir"], -1, 6)
            bmx2 = jnp.where(moved & walking, bmx + _table(hx, d + 1),
                             bmx)
            bmy2 = jnp.where(moved & walking, bmy + _table(hy, d + 1),
                             bmy)
            st3 = {k: jnp.where(walking, st2[k], st[k]) for k in st}
            return (st3, bmx2, bmy2, i + 1, walking & moved)

        st, bmx, bmy, _, _ = jax.lax.while_loop(
            cond, body, (st, bmx, bmy, _i32(1), walked))
        st = dict(st, bx=bmx, by=bmy)

    return _expanding(p, st, 1, 1, st["bx"], st["by"], lam, pred,
                      active=active)


def _umh(p, st, i_me_range, cx, cy, lam, pred, active=None):
    """pobUMHSearch around a per-block centre (PlaneOfBlocks.cpp:742-769)."""
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
    if offs:
        em = (None if active is None
              else jnp.broadcast_to(active[:, None],
                                    (active.shape[0], len(offs))))
        st = p.check(st, cx, cy, offs, extra_mask=em, lam=lam, pred=pred)
    return _hex2(p, st, i_me_range, lam, pred, active=active)


def _nstep(p, st, stp, lam, pred):
    for length in range(stp, 0, -1):
        offs = [(length, length), (length, 0), (length, -length),
                (0, -length), (0, length), (-length, length),
                (-length, 0), (-length, -length)]
        st = p.check(st, st["bx"], st["by"], offs, lam=lam, pred=pred)
    return st


def _onetime(p, st, length, lam, pred):
    """pobOneTimeSearch (PlaneOfBlocks.cpp:488-527), field level."""
    nblk = st["bx"].shape[0]
    st = dict(st, dir=jnp.zeros((nblk,), I32))
    dx0, dy0 = st["bx"], st["by"]
    st = p.check(st, dx0, dy0, [(-length, 0), (length, 0)],
                 dir_vals=[2, 1], lam=lam, pred=pred)

    def walk(st, fixed, start, axis):
        sign = jnp.where(st["dir"] == 2, _i32(-1), _i32(1))
        st0 = dict(st, dir=jnp.where(st["dir"] != 0, _i32(1), _i32(0)))

        def cond(c):
            return jnp.any(c[0]["dir"] != 0)

        def body(c):
            s, d = c
            alive = s["dir"] != 0
            s2 = dict(s, dir=jnp.zeros((nblk,), I32))
            d2 = jnp.where(alive, d + sign * length, d)
            probe_c = d2 + sign * length
            vx = probe_c if axis == 0 else fixed
            vy = fixed if axis == 0 else probe_c
            s2 = p.check(s2, vx, vy, [(0, 0)], dir_vals=[1],
                         extra_mask=alive[:, None], lam=lam, pred=pred)
            s3 = {k: jnp.where(alive, s2[k], s[k]) for k in s2}
            return (s3, d2)

        return jax.lax.while_loop(cond, body, (st0, start))

    st, dx1 = walk(st, dy0, dx0, 0)
    st = dict(st, dir=jnp.zeros((nblk,), I32))
    st = p.check(st, dx1, dy0, [(0, -length), (0, length)],
                 dir_vals=[2, 1], lam=lam, pred=pred)
    st, _ = walk(st, dx1, dy0, 1)
    return st


def _diamond(p, st, length, lam, pred):
    """pobDiamondSearch (PlaneOfBlocks.cpp:530-632), field level with
    masked direction cases."""
    nblk = st["bx"].shape[0]
    R, L, D, U = 1, 2, 4, 8
    st = dict(st, dir=jnp.full((nblk,), 15, I32))
    pp = (length, length)
    mp = (-length, length)
    pm = (length, -length)
    mm = (-length, -length)
    diag_order = (pp, mp, pm, mm)
    diag_dirs = [R + D, L + D, R + U, L + U]
    cases = {
        R: (pp, pm), L: (mp, mm), D: (pp, mp), U: (pm, mm),
        R + D: (pp, mp, pm), L + D: (pp, mp, mm),
        R + U: (pp, mm, pm), L + U: (mm, mp, pm),
    }
    default = (pp, mp, pm, mm)
    table = np.zeros((16, 4), bool)
    for case in range(16):
        offs = cases.get(case, default)
        for kk, o in enumerate(diag_order):
            table[case, kk] = o in offs
    def cond(c):
        st, last = c
        return jnp.any(st["dir"] > 0)

    def body(c):
        st, _ = c
        alive = st["dir"] > 0
        last = st["dir"]
        st2 = dict(st, dir=jnp.zeros((nblk,), I32))
        axis_offs = [(length, 0), (-length, 0), (0, length), (0, -length)]
        mask = jnp.stack([(last & R) != 0, (last & L) != 0,
                          (last & D) != 0, (last & U) != 0],
                         axis=1) & alive[:, None]
        st2 = p.check(st2, st["bx"], st["by"], axis_offs,
                      dir_vals=[R, L, D, U], extra_mask=mask,
                      lam=lam, pred=pred)
        found = st2["dir"]

        # improved branch: perpendicular probes
        horiz = (found & (R + L)) != 0
        perp_mask = jnp.stack([horiz, horiz, ~horiz, ~horiz], axis=1) \
            & (found != 0)[:, None] & alive[:, None]
        perp_offs = [(0, length), (0, -length), (length, 0), (-length, 0)]
        st_imp = p.check(dict(st2), st2["bx"], st2["by"], perp_offs,
                         dir_vals=[D, U, R, L], extra_mask=perp_mask,
                         lam=lam, pred=pred)

        # diagonals branch for blocks that found nothing on the axes
        diag_mask = _table(table, jnp.clip(last, 0, 15)) \
            & (found == 0)[:, None] & alive[:, None]
        st_diag = p.check(dict(st2), st["bx"], st["by"],
                          list(diag_order), dir_vals=diag_dirs,
                          extra_mask=diag_mask, lam=lam, pred=pred)

        st3 = {k: jnp.where(found != 0, st_imp[k], st_diag[k])
               for k in st2}
        st4 = {k: jnp.where(alive, st3[k], st[k]) for k in st3}
        return (st4, last)

    st, _ = jax.lax.while_loop(cond, body,
                               (st, jnp.full((nblk,), 15, I32)))
    return st


def refine(p: FieldProber, st, search: SearchType, param: int, lam, pred,
           active=None):
    """pobRefine (PlaneOfBlocks.cpp:772-816), field level."""
    if search == SearchType.ONETIME:
        i = param
        while i > 0:
            st = _onetime(p, st, i, lam, pred)
            i //= 2
    elif search == SearchType.NSTEP:
        st = _nstep(p, st, param, lam, pred)
    elif search == SearchType.LOGARITHMIC:
        i = param
        while i > 0:
            st = _diamond(p, st, i, lam, pred)
            i //= 2
    elif search == SearchType.EXHAUSTIVE:
        st = _exhaustive(p, st, param, lam, pred, active=active)
    elif search == SearchType.HEX2:
        st = _hex2(p, st, param, lam, pred, active=active)
    elif search == SearchType.UMH:
        st = _umh(p, st, param, st["bx"], st["by"], lam, pred,
                  active=active)
    elif search == SearchType.HORIZONTAL:
        offs = []
        for i in range(1, param + 1):
            offs += [(-i, 0), (i, 0)]
        st = p.check(st, st["bx"], st["by"], offs, lam=lam, pred=pred)
    elif search == SearchType.VERTICAL:
        offs = []
        for i in range(1, param + 1):
            offs += [(0, -i), (0, i)]
        st = p.check(st, st["bx"], st["by"], offs, lam=lam, pred=pred)
    else:
        raise ValueError(search)
    return st


def field_epz(p: FieldProber, dense, level_params, zs_y, gx, gy,
              pred_main, preds, lam, idx, do_rescue: bool = True,
              probe_p: Optional[FieldProber] = None):
    """Whole-plane pseudo-EPZ for one Jacobi iteration
    (pobPseudoEPZSearch PlaneOfBlocks.cpp:819-968, dctmode 0).

    pred_main: (x, y, sad) main predictor arrays; preds: list of 4
    (x, y) predictor pairs; lam: adapted lambda per block.  Returns the
    field state dict.  probe_p (default p) serves the bad-SAD rescue:
    when p is a MapProber the rescue walks far from the map anchor, so
    it needs a window-probing prober — its DMAs only run inside the
    any(bad) cond.
    """
    if probe_p is None:
        probe_p = p
    search = level_params["search"]
    param = level_params["param"]
    pzero = level_params["pzero"]
    pglobal = level_params["pglobal"]
    badsad = level_params["badsad"]
    badrange = level_params["badrange"]
    trymany = level_params["trymany"]
    verybig = level_params["verybig"]
    pel = p.pel
    nblk = pred_main[0].shape[0]
    dxmin, dxmax, dymin, dymax = p.bounds
    prx, pry, prs = pred_main
    pred = (prx, pry)

    # ---- zero trial (dense; no bounds check, chroma at (0,0)) ------------
    sad0 = (dense.luma_sads(_i32(0), zs_y)
            + dense.chroma_sads(_i32(0), _i32(0)))
    st = dict(bx=jnp.zeros((nblk,), I32),
              by=jnp.full((nblk,), 1, I32) * zs_y,
              bsad=sad0,
              mincost=sad0 + ((_i64(pzero) * sad0) >> 8),
              dir=jnp.zeros((nblk,), I32))
    results = []
    if trymany:
        st = refine(p, st, search, param, lam, pred)
        results.append(st)

    gxc = jnp.clip(jnp.broadcast_to(gx, (nblk,)), dxmin, dxmax - 1)
    gyc = jnp.clip(jnp.broadcast_to(gy, (nblk,)), dymin, dymax - 1)

    if trymany:
        # ---- global trial --------------------------------------------------
        sad_g = p.plain_sad(gxc, gyc)
        cost_g = sad_g + ((_i64(pglobal) * sad_g) >> 8)
        st = dict(st, bx=gxc, by=gyc, bsad=sad_g, mincost=cost_g)
        st = refine(p, st, search, param, lam, pred)
        results.append(st)

        # ---- main predictor (cost = plain sad) -----------------------------
        sad_p = p.plain_sad(prx, pry)
        st = dict(st, bx=prx, by=pry, bsad=sad_p, mincost=sad_p)
        st = refine(p, st, search, param, lam, pred)
        results.append(st)

        # ---- neighbour predictors (bounds + MD, no penaltyNew) -------------
        for i in range(4):
            st = dict(st, mincost=jnp.full((nblk,), verybig + 1, I64))
            qx, qy = preds[i]
            st = p.check(st, qx, qy, penalty_new=False, lam=lam, pred=pred)
            st = refine(p, st, search, param, lam, pred)
            results.append(st)
        costs = jnp.stack([r["mincost"] for r in results])
        k = jnp.argmin(costs, axis=0)
        improve = jnp.take_along_axis(costs, k[None], axis=0)[0] \
            < verybig + 1
        pick = lambda key: jnp.take_along_axis(
            jnp.stack([r[key] for r in results]), k[None], axis=0)[0]
        st = dict(st,
                  bx=jnp.where(improve, pick("bx"), st["bx"]),
                  by=jnp.where(improve, pick("by"), st["by"]),
                  bsad=jnp.where(improve, pick("bsad"), st["bsad"]),
                  mincost=jnp.where(improve, pick("mincost"),
                                    st["mincost"]))
    else:
        # ---- global + main + 4 neighbour predictors, ONE probe launch ------
        qs = [(jnp.clip(q[0], dxmin, dxmax - 1),
               jnp.clip(q[1], dymin, dymax - 1)) for q in preds]
        sads = p.plain_sads_multi(
            [gxc, prx] + [q[0] for q in qs],
            [gyc, pry] + [q[1] for q in qs])          # [nblk, 6]
        # global: cost = sad + pglobal penalty, unconditional bounds-free
        sad_g = sads[:, 0]
        cost_g = sad_g + ((_i64(pglobal) * sad_g) >> 8)
        take = cost_g < st["mincost"]
        st = dict(st,
                  bx=jnp.where(take, gxc, st["bx"]),
                  by=jnp.where(take, gyc, st["by"]),
                  bsad=jnp.where(take, sad_g, st["bsad"]),
                  mincost=jnp.where(take, cost_g, st["mincost"]))
        # main predictor: cost = plain sad
        sad_p = sads[:, 1]
        take = sad_p < st["mincost"]
        st = dict(st,
                  bx=jnp.where(take, prx, st["bx"]),
                  by=jnp.where(take, pry, st["by"]),
                  bsad=jnp.where(take, sad_p, st["bsad"]),
                  mincost=jnp.where(take, sad_p, st["mincost"]))
        # neighbours: bounds mask + MD cost, no penaltyNew (the SAD was
        # probed at the clamped position, exact whenever valid)
        st = _update_from_cols(
            p, st,
            [sads[:, 2 + i] for i in range(4)],
            [jnp.zeros((nblk,), I64)] * 4,
            [preds[i][0] for i in range(4)],
            [preds[i][1] for i in range(4)],
            lam, pred, penalty_new=False)
        st = refine(p, st, search, param, lam, pred)

    # ---- bad-SAD rescue (PlaneOfBlocks.cpp:938-963) ------------------------
    if not do_rescue:
        return st
    return field_rescue(p, dense, level_params, st, lam, pred, idx,
                        probe_p)


def field_rescue(p: FieldProber, dense, level_params, st, lam, pred,
                 idx, probe_p: Optional[FieldProber] = None):
    """The bad-SAD rescue tail of field_epz (PlaneOfBlocks.cpp:938-963),
    standalone so a frame-batched analyse can defer it out of the
    vmapped search (its probe DMAs must stay behind a genuine runtime
    branch — under vmap a batched cond runs both sides)."""
    if probe_p is None:
        probe_p = p
    badsad = level_params["badsad"]
    badrange = level_params["badrange"]
    nblk = st["bx"].shape[0]
    found_sad = st["bsad"]
    bad = (idx > 1) & (found_sad > _i64(badsad))
    pelf = p.pel

    def rescue(st):
        st = dict(st)
        if badrange > 0:
            # cross + hex4 around (0,0) are uniform -> dense; the hex2
            # tail walks per block
            offs = _umh_uniform_offsets(badrange * pelf)
            stf = dense.check_uniform(
                {"bx": st["bx"], "by": st["by"], "bsad": st["bsad"],
                 "mincost": st["mincost"]},
                offs, p.bounds, pred, lam, p.pnew, bad)
            st = dict(st, **stf)
            st = _hex2(probe_p, st, badrange * pelf, lam, pred,
                       active=bad)
        elif badrange < 0:
            done = jnp.zeros((nblk,), bool)
            for i in range(1, -badrange * pelf, pelf):
                stf = dense.check_uniform(
                    {"bx": st["bx"], "by": st["by"], "bsad": st["bsad"],
                     "mincost": st["mincost"]},
                    _ring_offsets(i, pelf), p.bounds, pred, lam, p.pnew,
                    bad & ~done)
                st = dict(st, **stf)
                done = done | (st["bsad"] < found_sad // 4)
        if pelf > 1:
            mvx, mvy = st["bx"], st["by"]
            for i in range(1, pelf):
                st = _expanding(probe_p, st, i, 1, mvx, mvy, lam, pred,
                                active=bad)
        return st

    # field-level cond with a SCALAR predicate: a genuine runtime branch
    # (unlike batched conds), so healthy frames skip the whole rescue
    return jax.lax.cond(jnp.any(bad), rescue, lambda s: dict(s), st)


def _umh_uniform_offsets(i_me_range: int):
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
