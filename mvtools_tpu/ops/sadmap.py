"""Dense tile-level SAD maps — one window DMA per block tile evaluates
a whole +-R pel-offset grid for every block in the tile.

The per-block probe kernel (ops/probe.py) is DMA-latency bound at
~0.3us/window and, worse, wastes 7/8 of every vector register: each
(block, offset) evaluation runs |src-ref| on a 16-lane block slice of a
128-lane register.  This kernel changes the unit of work a second time
(the reference's innermost unit is one SAD per candidate per block,
pobCheckMV PlaneOfBlocks.cpp:219-261): a TILE of consecutive blocks in
one block row shares a single [pel^2, WY, WX] window anchored near the
median of the tile's predictors, and every static grid offset (dx, dy)
in [-Rx, Rx] x [-Ry, Ry] pel is evaluated for ALL blocks of the tile at
once — |src_span - ref_span| over the tile's full lane span, column
sums, then one per-block pooling matmul on the MXU.  The whole
hierarchical search (predictor trials, hex2 walk, expanding rings) then
runs as pure XLA one-hot lookups into the resulting [nblk, Dy, Dx] map
with ZERO further DMA (field_engine.MapProber).

Contract: map entries are bit-identical to probe_sads SADs for the same
candidate.  Candidates outside the grid report INVALID_SAD and lose
every cost comparison (same convention as the tiled probe; the dense
zero trial guarantees a real cost bound exists for every block).

Sources up to 16-bit as long as a block sum stays under 2^24 (exact in
the f32 pooling matmul — every 8-bit size, 16-bit up to 16x16); the
field engine falls back to probes beyond that (map_supported).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import probe as probe_ops

I32 = jnp.int32
INVALID_SAD = probe_ops.INVALID_SAD


def map_geom(r_y: int, r_x: int, bs_y: int, bs_x: int, pel: int,
             tile: int, pitch_fp: int):
    """Static window geometry of a tile map.

    Returns (min_oy, min_ox, span_x, span_pad, rows2, wy_total,
    wx_total): min_o* are the most-negative full-pel grid offsets,
    span_x the tile's source lane span, span_pad its 128-lane rounding,
    rows2 the row count kept after the sublane roll, w*_total the DMA
    window size (alignment shift + tile rounding included)."""
    logp = pel.bit_length() - 1
    min_oy = (-r_y) >> logp
    max_oy = r_y >> logp
    min_ox = (-r_x) >> logp
    max_ox = r_x >> logp
    span_x = (tile - 1) * pitch_fp + bs_x
    span_pad = -(-span_x // 128) * 128
    wy_logical = bs_y + (max_oy - min_oy)
    rows2 = -(-wy_logical // 8) * 8
    wx_logical = span_pad + (max_ox - min_ox)
    # the sublane-stacked kernel slides an SL-row window over bs_y
    # source rows: keep the DMA tall enough for that path too
    sl = -(-(max_oy - min_oy + 1) // 8) * 8
    rows_v2 = -(-(bs_y + sl - 1) // 8) * 8
    wy_total = -(-max(wy_logical + 8, rows_v2) // 32) * 32
    wx_total = -(-(wx_logical + 128) // 128) * 128
    return min_oy, min_ox, span_x, span_pad, rows2, wy_total, wx_total


def v2_geom(r_y: int, r_x: int, bs_y: int, pel: int, tile: int,
            bs_x: int, pitch_fp: int):
    """Static geometry of the sublane-stacked kernel path: n_oy full-pel
    rows in the offset grid, SL sublanes holding them in the
    accumulator, rows_v2 window rows the per-y slide reads.  The path
    is usable when rows_v2 fits the DMA'd window."""
    logp = pel.bit_length() - 1
    n_oy = (r_y >> logp) - ((-r_y) >> logp) + 1
    sl = -(-n_oy // 8) * 8
    rows_v2 = -(-(bs_y + sl - 1) // 8) * 8
    wy_total = map_geom(r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp)[5]
    return n_oy, sl, rows_v2, rows_v2 <= wy_total


def grid_offsets(r_y: int, r_x: int):
    """The static pel-offset grid, dy-major (row index iy = dy + r_y,
    column index ix = dx + r_x)."""
    return [(dx, dy) for dy in range(-r_y, r_y + 1)
            for dx in range(-r_x, r_x + 1)]


def anchor_bounds(r_y: int, r_x: int, bs_y: int, bs_x: int, pel: int,
                  tile: int, pitch_fp: int, hp: int, wp: int):
    """Inclusive [lo, hi] full-pel anchor ranges (y, x) such that the
    aligned-down window DMA stays inside a [hp, wp] padded stack."""
    min_oy, min_ox, _, _, _, wy_total, wx_total = map_geom(
        r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp)
    lo_y, lo_x = -min_oy, -min_ox
    hi_y = hp - wy_total - min_oy
    hi_x = wp - wx_total - min_ox
    return (lo_y, hi_y), (lo_x, hi_x)


def _pool_matrix(span_pad: int, bs_x: int, pitch_fp: int, tile: int):
    """[span_pad, tile] f32: column b sums source columns
    [b*pitch, b*pitch + bs_x) — per-block SADs from the span's column
    sums in one matmul (overlapped grids simply share columns)."""
    m = np.zeros((span_pad, tile), np.float32)
    for b in range(tile):
        m[b * pitch_fp:b * pitch_fp + bs_x, b] = 1.0
    return m


def _satd_span_mats(span_pad: int, bs_y: int, bs_x: int, pitch_fp: int,
                    tile: int):
    """Span-wide SATD as dense matmuls (the whole tile's blocks
    transformed at once): the reference Satd_C (SADFunctions.cpp:713-741
    == ops.sad.satd) is 4x4 Hadamards + per-tile abs sums + horizontal
    8-column pairing, all COLUMN-ALIGNED across blocks whenever
    pitch %% 8 == 0 — so one block-diagonal column transform serves
    every block of the span.  Returns (hb_r, hb_c_span_t, p_r,
    p_c_span, q_span, pool8); pool8 pools the pair columns per block."""
    h4 = np.array([[1, 1, 1, 1],
                   [1, -1, 1, -1],
                   [1, 1, -1, -1],
                   [1, -1, -1, 1]], np.float32)
    hb_r = np.kron(np.eye(bs_y // 4, dtype=np.float32), h4)
    hb_c_t = np.kron(np.eye(span_pad // 4, dtype=np.float32), h4.T)
    p_r = np.kron(np.eye(bs_y // 4, dtype=np.float32),
                  np.ones((1, 4), np.float32))
    p_c = np.kron(np.eye(span_pad // 4, dtype=np.float32),
                  np.ones((4, 1), np.float32))
    q = np.kron(np.eye(span_pad // 8, dtype=np.float32),
                np.array([[1.0], [1.0]], np.float32))
    pool8 = np.zeros((span_pad // 8, tile), np.float32)
    for b in range(tile):
        g0 = b * pitch_fp // 8
        pool8[g0:g0 + bs_x // 8, b] = 1.0
    return hb_r, hb_c_t, p_r, p_c, q, pool8


def _sadmap_kernel(afy_ref, afx_ref, stack_ref, src_ref, pool_ref,
                   *rest, r_y, r_x, bs_y, bs_x, pel, tile, chunk_t,
                   pitch_fp, grid_n, stats="sad", n_pad=0):
    if stats == "sad_satd_luma":
        satd_mats = tuple(r[...] for r in rest[:6])
        rest = rest[6:]
    else:
        satd_mats = None
    out_ref, win_scratch, a_smem, sems, a_sems = rest
    logp = pel.bit_length() - 1
    pelm = np.int32(pel - 1)
    (min_oy, min_ox, span_x, span_pad, rows2, wy_total,
     wx_total) = map_geom(r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp)
    n_sub = pel * pel
    g = pl.program_id(0)

    def a_copies(buf, step):
        row = pl.multiple_of(step * np.int32(chunk_t), chunk_t)
        return [pltpu.make_async_copy(
                    ref.at[pl.ds(row, chunk_t)],
                    a_smem.at[np.int32(buf), np.int32(i)],
                    a_sems.at[np.int32(buf)])
                for i, ref in ((0, afy_ref), (1, afx_ref))]

    def base_of(buf, j):
        by = a_smem[np.int32(buf), np.int32(0), np.int32(j),
                    np.int32(0)] + np.int32(min_oy)
        bx = a_smem[np.int32(buf), np.int32(1), np.int32(j),
                    np.int32(0)] + np.int32(min_ox)
        return (pl.multiple_of(by & np.int32(~7), 8),
                pl.multiple_of(bx & np.int32(~127), 128),
                by & np.int32(7), bx & np.int32(127))

    def tile_dmas(buf, j, step):
        """Window DMAs for tile `step*chunk_t + j`; in frame-batched
        maps (n_pad > 0: tiles of a whole frame batch laid out frame-
        major, each frame's tile count padded to n_pad) the subplane
        base is the tile's frame id times pel^2."""
        ay, ax, _, _ = base_of(buf, j)
        if n_pad:
            fid = (step * np.int32(chunk_t) + np.int32(j)) \
                // np.int32(n_pad)
            base = fid * np.int32(n_sub)
            return [pltpu.make_async_copy(
                        stack_ref.at[pl.ds(base + np.int32(s), 1),
                                     pl.ds(ay, wy_total),
                                     pl.ds(ax, wx_total)],
                        win_scratch.at[np.int32(j),
                                       pl.ds(np.int32(s), 1)],
                        sems.at[np.int32(j)])
                    for s in range(n_sub)]
        return [pltpu.make_async_copy(
                    stack_ref.at[np.int32(s), pl.ds(ay, wy_total),
                                 pl.ds(ax, wx_total)],
                    win_scratch.at[np.int32(j), np.int32(s)],
                    sems.at[np.int32(j)])
                for s in range(n_sub)]

    # anchors: this step into buf 0, next step's into buf 1
    for c in a_copies(0, g):
        c.start()
        c.wait()
    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in a_copies(1, g + 1):
                c.start()

    # the first step starts its own window DMAs; later steps find them
    # in flight from the previous step's tail
    @pl.when(g == np.int32(0))
    def _():
        for j in range(chunk_t):
            for c in tile_dmas(0, j, g):
                c.start()

    for j in range(chunk_t):
        for c in tile_dmas(0, j, g):
            c.wait()
        _, _, ry, rx = base_of(0, j)
        # un-rotate the alignment shift once per (tile, subplane); every
        # grid offset is then a STATIC slice of the rolled plane (the
        # sad path's sublane-stacked slide reads rows_v2 >= rows2 rows)
        rows_v2 = v2_geom(r_y, r_x, bs_y, pel, tile, bs_x, pitch_fp)[2]
        rows_keep = max(rows2, rows_v2 if satd_mats is None else 0)
        planes = []
        for s in range(n_sub):
            w2 = win_scratch[np.int32(j), np.int32(s)].astype(I32)
            w2 = pltpu.roll(w2, -ry, 0)
            w2 = jax.lax.slice(w2, (0, 0), (rows_keep, wx_total))
            w2 = probe_ops._lane_unrotate(w2, rx, wx_total)
            planes.append(w2)
        src = src_ref[j].astype(I32)            # [bs_y, span_pad]
        pool = pool_ref[...]

        def dot(x, y):
            # HIGHEST keeps the MXU in its exact-f32 pass: all values
            # here are integers below 2^24
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        if satd_mats is None:
            # sublane-stacked evaluation: for each (dx, sub-y-parity)
            # the SL accumulator sublanes hold ALL the grid's full-pel
            # dy rows at once — row oy of `acc` accumulates
            # sum_y |C[oy+y, x] - src[y, x]| via a per-source-row slide
            # — and ONE [SL, span] x [span, tile] pool matmul yields SL
            # offsets' SADs.  This exists because tiny per-offset pool
            # dots measured ~70 cycles each on this MXU (the v1 layout
            # paid D of them per tile); here it is (2*r_x+1)*pel dots
            # per tile.  The host reorders the (dx, parity, oy) rows to
            # the dy-major map order (static take, outside the kernel).
            n_oy, sl, rows_v2, _ = v2_geom(r_y, r_x, bs_y, pel, tile,
                                           bs_x, pitch_fp)
            # i16 slide: |diff| <= 255 and column sums <= bs_y*255 =
            # 4080 fit int16, and i16 vregs pack twice the lanes of
            # i32/f32 — halves the per-y VPU op count (8-bit sources
            # only; hi-bit sums would overflow).  DEFAULT OFF: this
            # Mosaic build legalizes neither math.absi nor arith.maxsi
            # on packed <8x128x2xi16> vregs (BENCH_r03 compile failure),
            # so the i16 path cannot express |diff| on hardware today.
            i16 = (os.environ.get("MVT_MAP_I16", "0") == "1"
                   and bs_y * 255 < (1 << 15))
            acc_t = jnp.int16 if i16 else I32
            pieces = []
            for dx in range(-r_x, r_x + 1):
                ox = (dx >> logp) - min_ox
                px = int(dx & int(pelm))
                for py in range(pel):
                    sub = px | (py << logp)
                    c = jax.lax.slice(planes[sub], (0, ox),
                                      (rows_v2, ox + span_pad))
                    if i16:
                        c = c.astype(jnp.int16)
                    src_c = src.astype(acc_t)
                    acc = jnp.zeros((sl, span_pad), acc_t)
                    for y in range(bs_y):
                        wnd = jax.lax.slice(c, (y, 0),
                                            (y + sl, span_pad))
                        srow = jax.lax.slice(src_c, (y, 0),
                                             (y + 1, span_pad))
                        # |wnd - srow| spelled as max-min: Mosaic has no
                        # legalization for math.absi on packed i16 vregs
                        # (BENCH_r03 compile failure), max/min/sub lower
                        # fine and both operands are non-negative pixels
                        acc = acc + (jnp.maximum(wnd, srow)
                                     - jnp.minimum(wnd, srow))
                    # 8-bit data: block sums < 2^24, exact in the f32
                    # pooling matmul
                    pieces.append(dot(acc.astype(jnp.float32),
                                      pool).astype(I32))
            rows_out = pieces
        else:
            rows_out = []
            for dy in range(-r_y, r_y + 1):
                oy = (dy >> logp) - min_oy
                for dx in range(-r_x, r_x + 1):
                    sub = (dx & int(pelm)) | ((dy & int(pelm)) << logp)
                    ox = (dx >> logp) - min_ox
                    ref = jax.lax.slice(planes[sub], (oy, ox),
                                        (oy + bs_y, ox + span_pad))
                    d = ref - src
                    colsum = jnp.sum(jnp.abs(d).astype(jnp.float32),
                                     axis=0, keepdims=True)
                    rows_out.append(dot(colsum, pool).astype(I32))
                    hb_r, hb_c_t, p_r, p_c, q, pool8 = satd_mats
                    t = dot(hb_r, dot(d.astype(jnp.float32), hb_c_t))
                    ts = dot(p_r, dot(jnp.abs(t), p_c))
                    pair = dot(ts, q)
                    fl = jnp.floor(pair * 0.5)
                    cs2 = jnp.sum(fl, axis=0, keepdims=True)
                    rows_out.append(dot(cs2, pool8).astype(I32))
                    lsum = jnp.sum(ref.astype(jnp.float32), axis=0,
                                   keepdims=True)
                    rows_out.append(dot(lsum, pool).astype(I32))
        out_ref[j] = jnp.concatenate(rows_out, axis=0)

    # tail: prefetch the next step's tile windows
    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in a_copies(1, g + 1):
                c.wait()
            for j in range(chunk_t):
                for c in tile_dmas(1, j, g + 1):
                    c.start()


def sad_map_pallas(stack, anchor_fy, anchor_fx, src_spans, r_y: int,
                   r_x: int, bs_y: int, bs_x: int, pel: int, tile: int,
                   pitch_fp: int, stats: str = "sad"):
    """[ntile, D*n_stats, tile] i32 map (D = (2*r_y+1)*(2*r_x+1),
    dy-major; stats="sad_satd_luma" emits (sad, satd, ref-luma) row
    triples per offset).

    stack: [pel^2, Hp, Wp] pad_stack output; anchor_fy/fx: [ntile]
    full-pel window-coordinate anchors, pre-clamped to anchor_bounds;
    src_spans: [ntile, bs_y, span_pad] source spans (block b of a tile
    at span columns [b*pitch_fp, b*pitch_fp + bs_x)).

    Frame-batched form (one kernel launch for a whole frame batch):
    stack [F, pel^2, Hp, Wp], anchor_fy/fx [F, ntile], src_spans
    [F, ntile, bs_y, span_pad] -> [F, ntile, D*n_stats, tile]."""
    batched = anchor_fy.ndim == 2
    if not batched:
        stack = stack[None]
        anchor_fy = anchor_fy[None]
        anchor_fx = anchor_fx[None]
        src_spans = src_spans[None]
    nf, ntile = anchor_fy.shape
    (_, _, _, span_pad, _, wy_total, wx_total) = map_geom(
        r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp)
    n_stats = 3 if stats == "sad_satd_luma" else 1
    if n_stats == 3 and (pitch_fp % 8 or bs_x % 8 or bs_y % 4
                         or stack.dtype != jnp.uint8):
        raise ValueError("satd map needs u8 data, pitch%8==0, bs_x%8==0")
    d = (2 * r_y + 1) * (2 * r_x + 1)
    logp = pel.bit_length() - 1
    min_oy = (-r_y) >> logp
    n_oy, sl, _, _ = v2_geom(r_y, r_x, bs_y, pel, tile, bs_x, pitch_fp)
    # the sad path emits (dx, sub-y-parity, oy) rows (the sublane-
    # stacked kernel's natural order); reordered to dy-major below
    d_rows = (2 * r_x + 1) * pel * sl if n_stats == 1 else d * n_stats
    # window slots under ~2MB VMEM; modest chunks also bound the unroll
    slot_bytes = pel * pel * wy_total * wx_total * stack.dtype.itemsize
    chunk_t = max(1, min(2, (2 << 20) // max(1, slot_bytes)))
    if n_stats == 3:
        chunk_t = 1    # 3x the unrolled work per tile

    pad_t = (-ntile) % chunk_t
    if pad_t:
        anchor_fy = jnp.pad(anchor_fy, ((0, 0), (0, pad_t)), mode="edge")
        anchor_fx = jnp.pad(anchor_fx, ((0, 0), (0, pad_t)), mode="edge")
        src_spans = jnp.pad(src_spans,
                            ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    n_pad = anchor_fy.shape[1]
    n = nf * n_pad
    grid = n // chunk_t
    # lane-pad the per-tile scalars so the SMEM DMA is tile-aligned
    afy = jnp.broadcast_to(anchor_fy.reshape(n)[:, None], (n, 128))
    afx = jnp.broadcast_to(anchor_fx.reshape(n)[:, None], (n, 128))
    src_spans = src_spans.reshape((n,) + src_spans.shape[2:])
    # frame-major subplane stack; the kernel derives each tile's frame
    # id (and so its subplane base) from the tile index alone
    stack = stack.reshape((nf * pel * pel,) + stack.shape[-2:])

    pool = jnp.asarray(_pool_matrix(span_pad, bs_x, pitch_fp, tile))
    kernel = functools.partial(
        _sadmap_kernel, r_y=r_y, r_x=r_x, bs_y=bs_y, bs_x=bs_x, pel=pel,
        tile=tile, chunk_t=chunk_t, pitch_fp=pitch_fp, grid_n=grid,
        stats=stats, n_pad=(n_pad if nf > 1 else 0))
    z = np.int32(0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # anchor_fy in HBM
        pl.BlockSpec(memory_space=pl.ANY),      # anchor_fx in HBM
        pl.BlockSpec(memory_space=pl.ANY),      # subplane stack
        pl.BlockSpec((chunk_t, bs_y, span_pad),
                     lambda g: (g, z, z), memory_space=pltpu.VMEM),
        pl.BlockSpec(pool.shape, lambda g: (z, z),
                     memory_space=pltpu.VMEM),
    ]
    extra_inputs = []
    if n_stats == 3:
        # matmul constants ride along as whole-array VMEM inputs (a
        # Pallas kernel may not capture array constants)
        for m in _satd_span_mats(span_pad, bs_y, bs_x, pitch_fp, tile):
            in_specs.append(pl.BlockSpec(
                m.shape, lambda g: (z, z), memory_space=pltpu.VMEM))
            extra_inputs.append(jnp.asarray(m))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk_t, d_rows, tile),
                               lambda g: (g, z, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk_t, pel * pel, wy_total, wx_total),
                       stack.dtype),
            pltpu.SMEM((2, 2, chunk_t, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((chunk_t,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n, d_rows, tile), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(afy, afx, stack, src_spans, pool, *extra_inputs)
    if n_stats == 1:
        # (dx, py, oy) rows -> dy-major [D, tile] (static take: XLA
        # data movement outside the kernel)
        ncol = 2 * r_x + 1
        m = out.reshape(n, ncol, pel * sl, tile)
        idx = np.array([(dy & (pel - 1)) * sl
                        + ((dy >> logp) - min_oy)
                        for dy in range(-r_y, r_y + 1)], np.int32)
        m = m[:, :, idx, :]                     # [n, Dx, Dy, tile]
        out = m.transpose(0, 2, 1, 3).reshape(n, d, tile)
    out = out.reshape((nf, n_pad) + out.shape[1:])[:, :ntile]
    return out if batched else out[0]


@functools.lru_cache(maxsize=None)
def _sad_map_vmappable(r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp, stats):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(stack, afy, afx, spans):
        return sad_map_pallas(stack, afy, afx, spans, r_y, r_x, bs_y,
                              bs_x, pel, tile, pitch_fp, stats=stats)

    @f.def_vmap
    def _rule(axis_size, in_batched, stack, afy, afx, spans):
        def bc(x, is_b):
            return x if is_b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
        out = sad_map_pallas(
            bc(stack, in_batched[0]), bc(afy, in_batched[1]),
            bc(afx, in_batched[2]), bc(spans, in_batched[3]),
            r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp, stats=stats)
        return out, True

    return f


def sad_map(stack, anchor_fy, anchor_fx, src_spans, r_y: int, r_x: int,
            bs_y: int, bs_x: int, pel: int, tile: int, pitch_fp: int,
            stats: str = "sad"):
    """vmap-aware sad_map_pallas: under jax.vmap the frame axis folds
    into the kernel grid — ONE launch serves the whole batch instead of
    a lax.map re-entering the kernel per frame."""
    return _sad_map_vmappable(r_y, r_x, bs_y, bs_x, pel, tile, pitch_fp,
                              stats)(stack, anchor_fy, anchor_fx,
                                     src_spans)


def sad_map_xla(stack, anchor_cy, anchor_cx, src_blocks, r_y: int,
                r_x: int, bs_y: int, bs_x: int, pel: int,
                stats: str = "sad"):
    """Reference semantics, per block: [nblk, D] i32 (or [nblk, D, 3]
    for stats="sad_satd_luma") where anchor_cy/cx are each block's
    rel-(0,0) PEL positions (probe coordinates)."""
    grid = tuple(grid_offsets(r_y, r_x))
    out = probe_ops.probe_sads_xla(stack, anchor_cy[:, None],
                                   anchor_cx[:, None], src_blocks,
                                   grid, bs_y, bs_x, pel, stats=stats)
    return out[:, 0]
