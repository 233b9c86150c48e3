"""mv.Recalculate equivalent: refine an MV field at the finest level.

Equivalent of MVRecalculate.c + pobRecalculateMVs
(PlaneOfBlocks.cpp:1158-1424): each new block takes a bilinear/nearest
interpolation of the old field as its predictor, rescaled to the new pel
and block area, and is re-searched only when the predictor's SAD exceeds
`thsad`.

TPU design note: unlike Analyse, Recalculate has NO loop-carried dependency
between blocks (the reference's scan writes vectors but never reads
neighbours), so all blocks run the search in lockstep via vmap — the
whole-plane-per-step vectorization SURVEY.md §2.2 calls for — while staying
bit-exact (each block's candidate ordering is its own).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .analyse import (BlockCtx, LevelCtx, SearchEngine, _i32, _i64,
                      _level_ctx, _trunc_div)
from .core.config import AnalyseSpec
from .core.types import AnalysisMeta, MVField, MVPlaneField, SearchType
from .ops import dct as dct_ops
from .ops import sad as sad_ops
from .super import Super

I32 = jnp.int32
I64 = jnp.int64


@dataclasses.dataclass(frozen=True)
class RecalculateConfig:
    """mv.Recalculate parameters (MVRecalculate.c create)."""
    thsad: int = 200
    smooth: int = 1
    blksize: int = 8
    blksizev: Optional[int] = None
    search: SearchType = SearchType.HEX2
    searchparam: int = 2
    chroma: bool = True
    truemotion: bool = True
    lambda_: Optional[int] = None
    pnew: Optional[int] = None
    overlap: int = 0
    overlapv: Optional[int] = None
    divide: int = 0
    meander: bool = True
    fields: bool = False
    tff: Optional[bool] = None
    dct: int = 0

    def to_analyse_config(self):
        from .core.config import AnalyseConfig
        return AnalyseConfig(
            blksize=self.blksize, blksizev=self.blksizev, levels=1,
            search=self.search, searchparam=self.searchparam,
            chroma=self.chroma, truemotion=self.truemotion,
            lambda_=self.lambda_, pnew=self.pnew, overlap=self.overlap,
            overlapv=self.overlapv, divide=self.divide, meander=self.meander,
            fields=self.fields, tff=self.tff, dct=self.dct)


def _interpolate_old_vectors(old: MVPlaneField, old_meta: AnalysisMeta,
                             meta: AnalysisMeta, smooth: int, log_pel: int):
    """Map old-grid vectors onto the new block grid
    (PlaneOfBlocks.cpp:1279-1330).  Returns (x, y, sad) [nby, nbx]."""
    nbx, nby = meta.blk_x, meta.blk_y
    bsx, bsy = meta.blk_size_x, meta.blk_size_y
    ovx, ovy = meta.overlap_x, meta.overlap_y
    bsxo, bsyo = old_meta.blk_size_x, old_meta.blk_size_y
    nbxo, nbyo = old_meta.blk_x, old_meta.blk_y
    step_xo = bsxo - old_meta.overlap_x
    step_yo = bsyo - old_meta.overlap_y
    log_pel_old = old_meta.pel.bit_length() - 1

    by, bx = jnp.meshgrid(jnp.arange(nby, dtype=I32),
                          jnp.arange(nbx, dtype=I32), indexing="ij")
    center_x = bsx // 2 + (bsx - ovx) * bx
    center_y = bsy // 2 + (bsy - ovy) * by
    blkxold = _trunc_div(center_x - bsxo // 2, step_xo).astype(I32)
    blkyold = _trunc_div(center_y - bsyo // 2, step_yo).astype(I32)
    delta_x = jnp.maximum(0, center_x - (bsxo // 2 + step_xo * blkxold))
    delta_y = jnp.maximum(0, center_y - (bsyo // 2 + step_yo * blkyold))
    bx1 = jnp.clip(blkxold, 0, nbxo - 1)
    bx2 = jnp.clip(blkxold + 1, 0, nbxo - 1)
    by1 = jnp.clip(blkyold, 0, nbyo - 1)
    by2 = jnp.clip(blkyold + 1, 0, nbyo - 1)

    def at(byi, bxi, comp):
        return comp[byi, bxi]

    if smooth == 1:
        def lerp(comp, dtype):
            v1 = at(by1, bx1, comp).astype(dtype)
            v2 = at(by1, bx2, comp).astype(dtype)
            v3 = at(by2, bx1, comp).astype(dtype)
            v4 = at(by2, bx2, comp).astype(dtype)
            dx = delta_x.astype(dtype)
            dy = delta_y.astype(dtype)
            a = v1 * step_xo + dx * (v2 - v1)
            b = v3 * step_xo + dx * (v4 - v3)
            return _trunc_div(a + _trunc_div(dy * (b - a), step_yo), step_xo)
        x = lerp(old.x, I32)
        y = lerp(old.y, I32)
        sad = lerp(old.sad, I64)
    else:
        right = delta_x * 2 >= step_xo
        down = delta_y * 2 >= step_yo
        sel_bx = jnp.where(right, bx2, bx1)
        sel_by = jnp.where(down, by2, by1)
        x = old.x[sel_by, sel_bx]
        y = old.y[sel_by, sel_bx]
        sad = old.sad[sel_by, sel_bx]

    # rescale to new pel and new block area (:1326-1330)
    x = (x << log_pel) >> log_pel_old
    y = (y << log_pel) >> log_pel_old
    sad = sad * (bsx * bsy) // (bsxo * bsyo)
    return x, y, sad


def recalculate(src_super: Super, ref_super: Super, old_mv: MVField,
                spec: AnalyseSpec, cfg: RecalculateConfig,
                field_shift=0, engine: str = "lockstep") -> MVField:
    """Refine `old_mv` on the finest level.  `spec` is the resolved
    AnalyseSpec of the *new* grid (from cfg.to_analyse_config()), `old_mv`
    carries its own meta.

    `engine` mirrors analyse's engine choice: "lockstep" (production) uses
    masked control flow — batched cond-around-while makes the XLA TPU
    backend materialize gather operands per lane — at the cost of a
    candidate-evaluation-order difference inside switch cases (tie-breaks
    only); "exact" keeps the reference's sequential candidate order
    (pobRecalculateMVs PlaneOfBlocks.cpp:1158-1424) for parity work.
    """
    if engine not in ("exact", "lockstep"):
        raise ValueError(f"recalculate: unknown engine {engine!r}")
    meta = spec.meta
    old_meta = old_mv.meta if old_mv.meta is not None else meta
    ctx = _level_ctx(src_super, ref_super, spec, 0)
    from .ops import sad as satd_ops
    use_field = (engine == "lockstep"
                 and spec.search in (SearchType.EXHAUSTIVE,
                                     SearchType.HEX2, SearchType.UMH)
                 and (spec.dct == 0
                      or 1 <= spec.dct <= 4
                      or (5 <= spec.dct <= 10 and ctx.bits == 8
                          and satd_ops.satd_supported(*ctx.blk_size))))
    if use_field:
        return _recalculate_field(src_super, ref_super, old_mv, spec, cfg,
                                  field_shift, ctx, old_meta)
    engine = SearchEngine(ctx, spec.dct, lockstep=(engine == "lockstep"))
    nbx, nby = ctx.nblk
    bsx, bsy = ctx.blk_size
    bcx, bcy = ctx.blk_size_c
    ovx, ovy = ctx.overlap
    logx, logy = ctx.log_ratio_uv
    hpad, hpad_c = ctx.hpad
    vpad, vpad_c = ctx.vpad
    pw, ph = ctx.padded
    logp = ctx.log_pel

    # thSAD scaling: like Analyse's lsad path (MVRecalculate.c:thsad is
    # scaled by bit depth and block size at create time)
    pixel_max = (1 << meta.bits_per_sample) - 1
    thsad_scaled = int(cfg.thsad * pixel_max / 255.0 + 0.5)
    thsad_scaled = thsad_scaled * (meta.blk_size_x * meta.blk_size_y) // 64
    thsad = _i64(thsad_scaled)

    lambda_level = spec.lambda_ // ((1 << logp) * (1 << logp))
    fs = _i32(field_shift)

    # fgopGetPlane(fgop, 0) is the finest level of the blob — for a divided
    # input field that is the divided sub-block level (levels[0] here too).
    old_finest = old_mv.levels[0]
    px_a, py_a, ps_a = _interpolate_old_vectors(
        old_finest, old_meta, meta, cfg.smooth, logp)

    src_plane = ctx.src_planes[0].astype(I32)
    src_u = ctx.src_planes[1].astype(I32) if ctx.chroma else None
    src_v = ctx.src_planes[2].astype(I32) if ctx.chroma else None

    by_g, bx_g = jnp.meshgrid(jnp.arange(nby, dtype=I32),
                              jnp.arange(nbx, dtype=I32), indexing="ij")

    def one_block(blkx, blky, pred_x, pred_y, pred_sad):
        x0 = _i32(hpad + (bsx - ovx) * blkx)
        y0 = _i32(vpad + (bsy - ovy) * blky)
        xc = _i32(hpad_c + ((bsx - ovx) >> logx) * blkx)
        yc = _i32(vpad_c + ((bsy - ovy) >> logy) * blky)
        src = jax.lax.dynamic_slice(src_plane, (y0, x0), (bsy, bsx))
        s_u = (jax.lax.dynamic_slice(src_u, (yc, xc), (bcy, bcx))
               if ctx.chroma else None)
        s_v = (jax.lax.dynamic_slice(src_v, (yc, xc), (bcy, bcx))
               if ctx.chroma else None)

        # search bounds (PlaneOfBlocks.cpp:1274-1277 — no scaled padding)
        dxmax = _i32((pw - bsx) - x0) << logp
        dymax = _i32((ph - bsy) - y0) << logp
        dxmin = -(x0 << logp)
        dymin = -(y0 << logp)

        lam0 = jnp.where(blky == 0, _i64(0), _i64(lambda_level))
        cpx = jnp.clip(pred_x, dxmin, dxmax - 1)
        cpy = jnp.clip(pred_y, dymin, dymax - 1)

        bc = BlockCtx(
            src=src, src_u=s_u, src_v=s_v, x0=x0, y0=y0, xc=xc, yc=yc,
            dxmin=dxmin, dxmax=dxmax, dymin=dymin, dymax=dymax,
            pred_x=cpx, pred_y=cpy, lam=lam0, pnew=_i32(spec.pnew),
            dct_src=(dct_ops.dct_block(src, ctx.bits)
                     if 1 <= spec.dct <= 4 else None),
            src_luma=(sad_ops.luma(src) if spec.dct >= 3 else None),
            dctweight16=_i32(8))

        sad0 = (engine.luma_sad(bc, cpx[None], cpy[None])[0]
                + engine.chroma_sad(bc, cpx[None], cpy[None])[0])
        st = {"bx": cpx, "by": cpy, "bsad": sad0, "mincost": sad0,
              "dir": _i32(0)}

        refined = engine.refine(bc, dict(st), spec.search,
                                spec.n_search_param)
        bad = sad0 > thsad
        out = {k: jnp.where(bad, refined[k], st[k]) for k in st}
        return out["bx"], out["by"], out["bsad"]

    vx, vy, vs = jax.vmap(one_block)(
        bx_g.reshape(-1), by_g.reshape(-1), px_a.reshape(-1),
        py_a.reshape(-1), ps_a.reshape(-1))

    levels = [MVPlaneField(vx.reshape(nby, nbx), vy.reshape(nby, nbx),
                           vs.reshape(nby, nbx))]
    out_meta = meta
    if spec.divide:
        from .analyse import divide_extra
        dx, dy, ds = divide_extra((vx, vy, vs), nbx, nby, spec.divide)
        levels.insert(0, MVPlaneField(dx.reshape(2 * nby, 2 * nbx),
                                      dy.reshape(2 * nby, 2 * nbx),
                                      ds.reshape(2 * nby, 2 * nbx)))
        out_meta = spec.divided_meta
    return MVField(tuple(levels), jnp.ones((), I32), out_meta)


def _recalculate_field(src_super: Super, ref_super: Super, old_mv: MVField,
                       spec: AnalyseSpec, cfg: RecalculateConfig,
                       field_shift, ctx, old_meta) -> MVField:
    """Field-level Recalculate: every block refines in lockstep through
    the window-probe kernel (FieldProber) instead of per-block vmapped
    gathers.  Blocks are independent in Recalculate
    (pobRecalculateMVs PlaneOfBlocks.cpp:1158-1424 never reads
    neighbours), so this is semantically the per-block masked engine —
    candidate order per block follows the masked lockstep enumeration."""
    from . import field_engine as fe
    from .ops import sad as sad_ops

    meta = spec.meta
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

    pixel_max = (1 << meta.bits_per_sample) - 1
    thsad_scaled = int(cfg.thsad * pixel_max / 255.0 + 0.5)
    thsad_scaled = thsad_scaled * (meta.blk_size_x * meta.blk_size_y) // 64
    thsad = _i64(thsad_scaled)
    lambda_level = spec.lambda_ // ((1 << logp) * (1 << logp))

    old_finest = old_mv.levels[0]
    px_a, py_a, ps_a = _interpolate_old_vectors(
        old_finest, old_meta, meta, cfg.smooth, logp)
    px_a = px_a.reshape(-1)
    py_a = py_a.reshape(-1)

    idx = jnp.arange(nblk, dtype=I32)
    blky_a = idx // nbx
    blkx_a = idx % nbx
    x0_a = _i32(hpad) + (bsx - ovx) * blkx_a
    y0_a = _i32(vpad) + (bsy - ovy) * blky_a
    xc_a = _i32(hpad_c) + ((bsx - ovx) >> logx) * blkx_a
    yc_a = _i32(vpad_c) + ((bsy - ovy) >> logy) * blky_a
    # search bounds (PlaneOfBlocks.cpp:1274-1277 — no scaled padding)
    dxmax_a = (_i32(pw - bsx) - x0_a) << logp
    dymax_a = (_i32(ph - bsy) - y0_a) << logp
    dxmin_a = -(x0_a << logp)
    dymin_a = -(y0_a << logp)
    bounds = (dxmin_a, dxmax_a, dymin_a, dymax_a)
    lam_a = jnp.where(blky_a == 0, _i64(0), _i64(lambda_level))

    def blocks_of(plane, base_y, base_x, bh, bw, step_y, step_x):
        if step_y == bh and step_x == bw:
            region = jax.lax.dynamic_slice(
                plane, (base_y, base_x), (nby * bh, nbx * bw))
            return (region.reshape(nby, bh, nbx, bw)
                    .transpose(0, 2, 1, 3).reshape(nblk, bh, bw))
        from .analyse import DenseEvaluator
        region = jax.lax.dynamic_slice(
            plane, (base_y, base_x),
            ((nby - 1) * step_y + bh, (nbx - 1) * step_x + bw))
        return DenseEvaluator._blocks_view(
            region, (bw, bh), (bw - step_x, bh - step_y), (nbx, nby))

    src_plane = ctx.src_planes[0].astype(I32)
    src_blocks = blocks_of(src_plane, vpad, hpad, bsy, bsx,
                           bsy - ovy, bsx - ovx)
    if ctx.chroma:
        src_u_blocks = blocks_of(ctx.src_planes[1].astype(I32), vpad_c,
                                 hpad_c, bcy, bcx, (bsy - ovy) >> logy,
                                 (bsx - ovx) >> logx)
        src_v_blocks = blocks_of(ctx.src_planes[2].astype(I32), vpad_c,
                                 hpad_c, bcy, bcx, (bsy - ovy) >> logy,
                                 (bsx - ovx) >> logx)
    else:
        src_u_blocks = src_v_blocks = None

    src_luma_a = (jax.vmap(sad_ops.luma)(src_blocks).astype(I64)
                  if spec.dct in (3, 4, 7, 8, 10)
                  else (jnp.zeros((nblk,), I64) if spec.dct else None))
    if 1 <= spec.dct <= 4:
        from .ops import dct as dct_ops
        dct_src_blocks = jax.vmap(
            lambda b: dct_ops.dct_block(b, ctx.bits))(src_blocks)
    else:
        dct_src_blocks = None
    prober = fe.FieldProber(ctx, src_blocks, src_u_blocks, src_v_blocks,
                            x0_a, y0_a, xc_a, yc_a, bounds, spec.pnew,
                            dctmode=spec.dct, src_luma=src_luma_a,
                            dctweight16=_i32(8), dct_src=dct_src_blocks)

    cpx = jnp.clip(px_a, dxmin_a, dxmax_a - 1)
    cpy = jnp.clip(py_a, dymin_a, dymax_a - 1)
    # the initial predictor SAD comes from a real probe (every block
    # needs a valid bound — an off-map predictor would otherwise emit
    # INVALID_SAD as the block's output SAD); the refine walk stays
    # within map range of the old vector, so it runs on the dense
    # tile map when available (anchor = old predictor field)
    sad0 = prober.plain_sad(cpx, cpy)
    refine_p = prober
    import os as _os
    if (_os.environ.get("MVT_SADMAP", "1") != "0"
            and fe.map_supported(ctx, fe.map_radius(ctx), spec.dct)):
        refine_p = fe.MapProber(ctx, src_blocks, src_u_blocks,
                                src_v_blocks, x0_a, y0_a, xc_a, yc_a,
                                bounds, spec.pnew, pred_vx=cpx,
                                pred_vy=cpy, dctmode=spec.dct,
                                src_luma=src_luma_a,
                                dctweight16=_i32(8),
                                dct_src=dct_src_blocks)
    st = {"bx": cpx, "by": cpy, "bsad": sad0, "mincost": sad0,
          "dir": jnp.zeros((nblk,), I32)}
    bad = sad0 > thsad
    st = fe.refine(refine_p, st, spec.search, spec.n_search_param,
                   lam_a, (cpx, cpy), active=bad)

    levels = [MVPlaneField(st["bx"].reshape(nby, nbx),
                           st["by"].reshape(nby, nbx),
                           st["bsad"].reshape(nby, nbx))]
    out_meta = meta
    if spec.divide:
        from .analyse import divide_extra
        dx, dy, ds = divide_extra((st["bx"], st["by"], st["bsad"]),
                                  nbx, nby, spec.divide)
        levels.insert(0, MVPlaneField(dx.reshape(2 * nby, 2 * nbx),
                                      dy.reshape(2 * nby, 2 * nbx),
                                      ds.reshape(2 * nby, 2 * nbx)))
        out_meta = spec.divided_meta
    return MVField(tuple(levels), jnp.ones((), I32), out_meta)
