"""mv.Degrain1-6 equivalent: motion-compensated temporal denoising.

TPU-first redesign of MVDegrains.cpp: instead of a serial per-block loop,
all blocks' reference patches are gathered at once (vmapped pel-aware
gathers into the super pyramid), the SAD-driven weights are computed for the
whole block grid in one shot (DegrainWeight / normaliseWeights
MVDegrains.h:184-223), the weighted sum runs as one fused elementwise pass
(Degrain_C MVDegrains.h:31-53), and overlapped blending is the phase-
decomposed overlap-add of ops.overlap.  Bit-exact against the reference's
scalar path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.thscd import scale_thscd
from .core.types import AnalysisMeta, MVField, check_vectors_similarity
from .ops import overlap as overlap_ops
from .super import Super

I32 = jnp.int32
I64 = jnp.int64


@dataclasses.dataclass(frozen=True)
class DegrainConfig:
    """mv.Degrain1-6 parameters (MVDegrains.cpp:475-599)."""
    thsad: int = 400
    thsadc: Optional[int] = None     # defaults to thsad
    plane: int = 4                   # 0 luma, 1/2 chroma, 3 both chroma, 4 all
    limit: Optional[int] = None      # defaults to pixel max
    limitc: Optional[int] = None     # defaults to limit
    thscd1: int = 400                # MV_DEFAULT_SCD1
    thscd2: int = 130                # MV_DEFAULT_SCD2


def _degrain_weight(thsad, block_sad):
    """DegrainWeight (MVDegrains.h:184-189): 0 if sad >= thsad, else
    (th-s)*(th+s)*256 / (th^2 + s^2) with double division, truncated."""
    thsad = _to64(thsad)
    block_sad = _to64(block_sad)
    num = ((thsad - block_sad) * (thsad + block_sad) * 256).astype(jnp.float64)
    den = (thsad * thsad + block_sad * block_sad).astype(jnp.float64)
    w = (num / den).astype(I32)
    return jnp.where(block_sad >= thsad, 0, w)


def _to64(x):
    return jnp.asarray(x, I64)


def _normalise_weights(wrefs: List[jnp.ndarray]):
    """normaliseWeights (MVDegrains.h:209-223)."""
    wsum = jnp.asarray(257, I32)
    for w in wrefs:
        wsum = wsum + w
    scale = 256.0 / wsum.astype(jnp.float64)
    out = [(w.astype(jnp.float64) * scale).astype(I32) for w in wrefs]
    wsrc = jnp.asarray(256, I32)
    for w in out:
        wsrc = wsrc - w
    return wsrc, out


def gather_blocks(plane_stack: jnp.ndarray, block_x, block_y, mv_x, mv_y,
                  bsy: int, bsx: int, log_pel: int, pad_x_pel: int,
                  pad_y_pel: int, sub_x: int = 0, sub_y: int = 0,
                  pitch_fp: int = 0):
    """Gather one [bsy, bsx] patch per block from a pel-subplane stack.

    block_x/y: per-block unpadded pixel position of the block (luma units
    pre-shifted by caller for chroma).  mv values in pel units.
    Matches useBlock's mvpGetPointer addressing (MVDegrains.h:192-206):
    blx = (block_pos << log_pel) + mv, chroma shifted arithmetically.
    pitch_fp: full-pel distance between consecutive blocks in a grid row
    (when block_x is a 2-D [nby, nbx] grid) — enables the tiled fetch
    kernel (one window DMA per tile of blocks; exact per-block fallback).
    """
    stack_pel = int(round(plane_stack.shape[0] ** 0.5))
    from .ops import probe as probe_ops

    if jax.default_backend() == "tpu":
        # window-DMA fetch kernel (~0.3us/block vs ~1.4us for the XLA
        # per-block gather); tiled when the caller supplies grid info
        xa = (((block_x.reshape(-1) << log_pel) + mv_x.reshape(-1))
              >> sub_x) + pad_x_pel
        ya = (((block_y.reshape(-1) << log_pel) + mv_y.reshape(-1))
              >> sub_y) + pad_y_pel
        # dynamic_slice clamped out-of-range starts; clamp explicitly for
        # the DMA path
        lp = max(stack_pel.bit_length() - 1, 0)
        xa = jnp.clip(xa, 0, (plane_stack.shape[2] - bsx) << lp)
        ya = jnp.clip(ya, 0, (plane_stack.shape[1] - bsy) << lp)
        stackp = probe_ops.pad_stack(plane_stack, 0)
        tiled = pitch_fp > 0 and block_x.ndim == 2
        if tiled:
            flat = probe_ops.fetch_blocks_tiled(
                stackp, ya[:, None], xa[:, None], bsy, bsx, stack_pel,
                row_len=block_x.shape[1], pitch_x=pitch_fp)[:, 0]
        else:
            flat = probe_ops.spatial_shard(
                lambda y, x: probe_ops.fetch_blocks(
                    stackp, y[:, None], x[:, None], bsy, bsx,
                    stack_pel)[:, 0],
                [ya, xa])
        return flat.reshape(*block_x.shape, bsy, bsx)

    def one(bx, by, vx, vy):
        xa = ((bx << log_pel) + vx) >> sub_x
        ya = ((by << log_pel) + vy) >> sub_y
        xa = xa + pad_x_pel
        ya = ya + pad_y_pel
        m = stack_pel - 1
        lp = max(stack_pel.bit_length() - 1, 0)
        idx = (xa & m) | ((ya & m) << lp)
        blk = jax.lax.dynamic_slice(plane_stack, (idx, ya >> lp, xa >> lp),
                                    (1, bsy, bsx))
        return blk[0].astype(I32)

    flat = probe_ops.spatial_shard(
        lambda bx, by, vx, vy: jax.vmap(one)(bx, by, vx, vy),
        [block_x.reshape(-1), block_y.reshape(-1),
         mv_x.reshape(-1), mv_y.reshape(-1)])
    return flat.reshape(*block_x.shape, bsy, bsx)


def extract_grid_blocks(plane, nby: int, nbx: int, bsy: int, bsx: int,
                        pitch_y: int, pitch_x: int):
    """[nby, nbx, bsy, bsx] blocks of the static degrain block grid.

    The grid is fully static (FakePlaneOfBlocks fpobInit positions).
    Extraction is reshape-based: chunk each axis at the block pitch and,
    when blocks overlap (pitch < bs, always with bs <= 2*pitch since
    overlap <= blksize/2), concatenate each chunk with its successor —
    two slices + one concat per axis, no per-block stacking.  (The
    previous per-column jax.lax.slice stack produced nbx copies with
    size-1/16 trailing dims that tile-pad 128x under a batched vmap —
    the round-4 bench OOM.)"""
    hh, ww = plane.shape
    ky = 0 if pitch_y >= bsy else 1
    kx = 0 if pitch_x >= bsx else 1
    if ky:
        assert bsy <= 2 * pitch_y, (bsy, pitch_y)
    if kx:
        assert bsx <= 2 * pitch_x, (bsx, pitch_x)
    need_h = (nby + ky) * pitch_y if ky else (nby - 1) * pitch_y + bsy
    need_w = (nbx + kx) * pitch_x if kx else (nbx - 1) * pitch_x + bsx
    padb = max(0, need_h - hh)
    padr = max(0, need_w - ww)
    if padb or padr:
        plane = jnp.pad(plane, ((0, padb), (0, padr)), mode="edge")
    ww2 = plane.shape[1]
    # rows: [nby, bsy, W]
    if ky:
        v = plane[:(nby + 1) * pitch_y].reshape(nby + 1, pitch_y, ww2)
        rows = jnp.concatenate([v[:-1], v[1:]], axis=1)[:, :bsy]
    else:
        rows = plane[:(nby - 1) * pitch_y + bsy]
        if pitch_y == bsy:
            rows = rows.reshape(nby, bsy, ww2)
        else:  # pitch > bs: gap between rows; pad rows out to the pitch
            rows = jnp.pad(rows, ((0, nby * pitch_y - rows.shape[0]),
                                  (0, 0)), mode="edge")
            rows = rows.reshape(nby, pitch_y, ww2)[:, :bsy]
    # cols: [nby, bsy, nbx, bsx]
    if kx:
        v = rows[:, :, :(nbx + 1) * pitch_x].reshape(
            nby, bsy, nbx + 1, pitch_x)
        cols = jnp.concatenate([v[:, :, :-1], v[:, :, 1:]],
                               axis=3)[..., :bsx]
    elif pitch_x == bsx:
        cols = rows[:, :, :nbx * bsx].reshape(nby, bsy, nbx, bsx)
    else:  # pitch > bs
        v = jnp.pad(rows, ((0, 0), (0, 0),
                           (0, nbx * pitch_x - rows.shape[2])),
                    mode="edge")
        cols = v.reshape(nby, bsy, nbx, pitch_x)[..., :bsx]
    return cols.transpose(0, 2, 1, 3)


def degrain(src_planes: Sequence[jnp.ndarray], super_refs: Sequence[Super],
            mv_fields: Sequence[MVField], meta: AnalysisMeta,
            cfg: DegrainConfig, usable: Optional[Sequence] = None,
            valid: Optional[Sequence] = None):
    """Degrain one frame.

    src_planes: the frame to denoise ([Y] or [Y, U, V]).
    super_refs: one Super per vector clip, in Backward1, Forward1,
    Backward2, ... order (the reference's VectorOrder, MVDegrains.h:10-23).
    mv_fields: matching MVFields.  radius = len(mv_fields) // 2.
    usable: optional traced bools per ref (default: computed from thSCD).
    valid: optional traced bools per ref ANDed into usability — False
    marks a neighbour that does not exist in the clip (reference
    default-field semantics at clip edges, MVAnalyse.c:219-222).
    Returns the denoised planes.
    """
    radius2 = len(mv_fields)
    filter_name = f"Degrain{radius2 // 2}"
    # pairwise vector-clip compatibility (MVDegrains.cpp:599-600) and
    # source frame size (:682-683)
    check_vectors_similarity([f.meta for f in mv_fields], filter_name)
    if tuple(src_planes[0].shape) != (meta.height, meta.width):
        raise ValueError(
            f"{filter_name}: wrong source or super clip frame size.")
    sspec = super_refs[0].spec
    bits = meta.bits_per_sample
    pixel_max = (1 << bits) - 1
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "Degrain")
    thsadc = cfg.thsadc if cfg.thsadc is not None else cfg.thsad
    # thSAD normalised to block SAD (MVDegrains.cpp:658-660)
    thsad = [cfg.thsad * nscd1 // cfg.thscd1,
             thsadc * nscd1 // cfg.thscd1,
             thsadc * nscd1 // cfg.thscd1]
    limit = cfg.limit if cfg.limit is not None else pixel_max
    limitc = cfg.limitc if cfg.limitc is not None else limit
    limits = [limit, limitc, limitc]
    process = [cfg.plane in (0, 4),
               cfg.plane in (1, 3, 4),
               cfg.plane in (2, 3, 4)]

    if usable is None:
        from .core.thscd import is_usable
        usable = [is_usable(mv, nscd1, nscd2) for mv in mv_fields]
    if valid is not None:
        usable = [jnp.logical_and(u, v) for u, v in zip(usable, valid)]

    nbx, nby = meta.blk_x, meta.blk_y
    bsx, bsy = meta.blk_size_x, meta.blk_size_y
    ovx, ovy = meta.overlap_x, meta.overlap_y
    log_pel = {1: 0, 2: 1, 4: 2}[meta.pel]
    logx = meta.x_ratio_uv.bit_length() - 1
    logy = meta.y_ratio_uv.bit_length() - 1

    # per-block positions (FakePlaneOfBlocks fpobInit Fakery.c:17-35)
    by_g, bx_g = jnp.meshgrid(jnp.arange(nby, dtype=I32),
                              jnp.arange(nbx, dtype=I32), indexing="ij")
    pos_x = bx_g * (bsx - ovx)
    pos_y = by_g * (bsy - ovy)

    width_b = (bsx - ovx) * nbx + ovx
    height_b = (bsy - ovy) * nby + ovy

    out_planes = []
    nplanes = len(src_planes)
    for plane in range(nplanes):
        src = src_planes[plane]
        if not process[plane]:
            out_planes.append(src)
            continue
        h, w = src.shape
        src32 = src.astype(I32)
        p_bsx = bsx >> (logx if plane else 0)
        p_bsy = bsy >> (logy if plane else 0)
        p_ovx = ovx >> (logx if plane else 0)
        p_ovy = ovy >> (logy if plane else 0)
        p_wb = width_b >> (logx if plane else 0)
        p_hb = height_b >> (logy if plane else 0)
        sub_x = logx if plane else 0
        sub_y = logy if plane else 0
        pel = sspec.pel
        hpad_p = sspec.hpad >> sub_x
        vpad_p = sspec.vpad >> sub_y

        # per-ref weights + reference blocks
        wrefs = []
        ref_blocks = []
        for r in range(radius2):
            mv = mv_fields[r]
            finest = mv.levels[0]
            w_r = _degrain_weight(thsad[plane], finest.sad)
            w_r = jnp.where(usable[r], w_r, 0)
            wrefs.append(w_r.astype(I32))
            stack = super_refs[r].planes[plane][0]
            if stack.ndim == 2:
                stack = stack[None]
            rb = gather_blocks(stack, pos_x, pos_y, finest.x, finest.y,
                               p_bsy, p_bsx, log_pel,
                               hpad_p * pel, vpad_p * pel, sub_x, sub_y,
                               pitch_fp=(bsx - ovx) >> sub_x)
            ref_blocks.append(rb)

        wsrc, wrefs = _normalise_weights(wrefs)

        if ovx == 0 and ovy == 0:
            # plane-level weighted sum: no block layout at all.  Source
            # blocks ARE the grid region of the plane; per-block weights
            # upsample by repeat; each fetched ref grid reshapes to
            # plane layout.  Everything stays in lane-friendly [H, W]
            # tiles (block-layout [.., bsy, bsx] temps tile-pad 8-128x
            # under a batched vmap — the round-4 bench OOM).
            def up(wb):
                return jnp.repeat(jnp.repeat(wb, p_bsy, axis=0),
                                  p_bsx, axis=1)

            gh, gw = nby * p_bsy, nbx * p_bsx
            acc = 128 + src32[:gh, :gw] * up(wsrc)
            for r in range(radius2):
                rg = ref_blocks[r].transpose(0, 2, 1, 3).reshape(gh, gw)
                acc = acc + rg * up(wrefs[r])
            grid = acc >> 8
            out = src32.at[:p_hb, :p_wb].set(grid[:p_hb, :p_wb])
        else:
            # overlapped: block layout feeds the phase-decomposed
            # overlap-add
            src_blocks = extract_grid_blocks(
                src32, nby, nbx, p_bsy, p_bsx,
                p_bsy - p_ovy, p_bsx - p_ovx)
            acc = jnp.full((nby, nbx, p_bsy, p_bsx), 128, I32)
            acc = acc + src_blocks * wsrc[..., None, None]
            for r in range(radius2):
                acc = acc + ref_blocks[r] * wrefs[r][..., None, None]
            blocks = acc >> 8  # [nby, nbx, p_bsy, p_bsx]
            wins = overlap_ops.overlap_windows(p_bsx, p_bsy, p_ovx, p_ovy)
            acc_plane = overlap_ops.overlap_add(
                blocks, nbx, nby, (p_bsx, p_bsy), (p_ovx, p_ovy), wins)
            pix = overlap_ops.to_pixels(acc_plane, bits)
            out = src32.at[:p_hb, :p_wb].set(pix)

        if limits[plane] < pixel_max:
            out = jnp.clip(out, src32 - limits[plane], src32 + limits[plane])
        out_planes.append(out.astype(src.dtype))
    return out_planes
