"""Batched block-probe SAD kernel — the innermost op of motion search.

The reference's innermost loop is one SAD per candidate vector per block
(pobCheckMV_Template PlaneOfBlocks.cpp:219-261 over pobGetRefBlock's
pel-plane pointer math :34-54).  On TPU the equivalent XLA gather costs
~1.4us per offset row regardless of row size, so the kernel here changes
the unit of work: ONE window DMA per (block, candidate-centre) fetches a
[pel^2, w, w] patch of the subplane stack big enough for a whole STATIC
pel-offset set, and every candidate SAD is then a stride-1 dynamic slice
(subplane index + full-pel offset derived from the candidate's parity,
exactly the `(x&pel-1)|((y&pel-1)<<logpel)` addressing of
MVFrame.cpp:1707-1754) + a VPU reduction.  A hexagon probe (6
candidates), an exhaustive ring set (24), or a single predictor trial
each cost one DMA per block.

Two implementations with identical semantics:
  * probe_sads_pallas — TPU Pallas kernel, multi-buffered async DMA.
  * probe_sads_xla    — vmapped dynamic-slice fallback (CPU tests).

Coordinates: candidates are PEL-space positions of the block origin
including the frame padding and the extra probe padding applied by
pad_stack (i.e. (hpad + probe_pad + x) * pel + vx).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


# extra bottom/right padding so tile-aligned window reads (start aligned
# down to the (8, 128) grid, sizes rounded up to the u8 (32, 128) VMEM
# tile) stay in bounds.  The DMA end is (base & ~(tile-1)) + rounded
# size <= base + rounded size, so the worst overshoot past the last
# logical window column is the tile rounding alone (<= 255 X, <= 39 Y);
# tests/test_dma_audit.py re-derives the exact requirement for every
# probe call-site of the benched configs (max seen: 232 X, 28 Y) and
# fails if a new offset set breaks containment.  The constants carry
# extra headroom because padding is cheap.
ALIGN_SLACK_Y = 64
ALIGN_SLACK_X = 384


# ---------------------------------------------------------------------------
# Spatial sharding: inside a `spatial_axis(name)` context (entered from a
# shard_map body over a mesh axis `name`), every probe/fetch call shards
# its BLOCK axis across the axis's devices and all_gathers the results.
# This is the TPU-first answer to the reference's within-frame
# parallelism (SURVEY §2.2 "spatial sharding"): the pixel planes are
# small (a 1080p super is a few MB) and stay replicated; what scales is
# the per-block window-DMA work — the dominant analyse cost — and the
# exchanged SAD columns are ~100KB per probe over ICI.  Results are
# bit-identical to the unsharded run by construction.

_SPATIAL_AXIS: list = []


class spatial_axis:
    """Context manager naming the shard_map mesh axis to shard block
    work over (see parallel.spatial)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        _SPATIAL_AXIS.append(self.name)
        return self

    def __exit__(self, *exc):
        _SPATIAL_AXIS.pop()
        return False


def spatial_shard(call, blocked_args, row_len: int = 0):
    """Run `call(*blocked_args)` on this device's band of the leading
    (block) axis and all_gather the result; identity outside a
    spatial_axis context.  blocked_args share the leading axis; the
    band is edge-padded so every device runs the same static shapes.
    row_len > 0 makes bands whole multiples of the block grid's row
    length (required by the tiled probes, whose tiles group consecutive
    blocks of one row)."""
    if not _SPATIAL_AXIS:
        return call(*blocked_args)
    ax = _SPATIAL_AXIS[-1]
    try:
        n = jax.lax.axis_size(ax)
    except (NameError, KeyError):
        return call(*blocked_args)          # not inside shard_map(ax)
    if n == 1:
        return call(*blocked_args)
    nblk = blocked_args[0].shape[0]
    if row_len > 0 and nblk % row_len == 0:
        band = -(-(nblk // row_len) // n) * row_len
    else:
        band = -(-nblk // n)
    i = jax.lax.axis_index(ax)

    def cut(a):
        pad = band * n - nblk
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0)
        return jax.lax.dynamic_slice_in_dim(a, i * band, band, 0)

    out_local = call(*[cut(a) for a in blocked_args])
    out = jax.lax.all_gather(out_local, ax, axis=0, tiled=True)
    return out[:nblk]


def pad_stack(stack: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-pad every subplane of a [pel^2, ph, pw] stack by `pad`
    full-pel pixels (plus alignment slack on the bottom/right) so any
    probe window read stays in bounds."""
    if stack.ndim == 2:
        stack = stack[None]
    return jnp.pad(stack, ((0, 0), (pad, pad + ALIGN_SLACK_Y),
                           (pad, pad + ALIGN_SLACK_X)), mode="edge")


def _lane_unrotate(w2, rx, width: int):
    """roll(w2, -rx, axis=1) with the amount spelled POSITIVE.

    This Mosaic build lowers dynamic NEGATIVE lane rolls one vreg (128
    lanes) short when the array is wider than 2 vregs — measured on
    v5e: roll(w, -rx, 1) on a 384-lane window lands at -(rx + 128),
    and a static negative amount crashes the compiler outright
    (apply_vector_layout "padding_cst >= 0").  Positive amounts are
    exact at every width, so un-rotate by the complement.  rx must be
    a non-negative traced scalar < width."""
    amt = jax.lax.rem(np.int32(width) - rx, np.int32(width))
    return pltpu.roll(w2, amt, 1)


def _window_geom(offsets, bs_y: int, bs_x: int, pel: int):
    """Full-pel window size and base pel-offset for a static offset set."""
    logp = pel.bit_length() - 1
    min_dx = min(o[0] for o in offsets)
    max_dx = max(o[0] for o in offsets)
    min_dy = min(o[1] for o in offsets)
    max_dy = max(o[1] for o in offsets)
    # full-pel span: positions (c+d)>>logp for d in [min_d, max_d]
    wy = bs_y + ((max_dy >> logp) - (min_dy >> logp)) + 1
    wx = bs_x + ((max_dx >> logp) - (min_dx >> logp)) + 1
    return min_dx, min_dy, wy, wx


def probe_sads_xla(stack, cand_y, cand_x, src_blocks, offsets,
                   bs_y: int, bs_x: int, pel: int, stats: str = "sad"):
    """Reference implementation: [nblk, K, D] int32 SADs — or
    [nblk, K, D, 3] (sad, satd, ref-luma) with stats="sad_satd_luma".

    stack: [pel^2, Hp, Wp] padded subplane stack (pad_stack output);
    cand_y/cand_x: [nblk, K] candidate pel positions (see module doc);
    src_blocks: [nblk, bs_y, bs_x] int32;
    offsets: static [(dx, dy), ...] pel offsets evaluated per candidate.
    """
    from . import sad as sad_ops
    logp = pel.bit_length() - 1
    pelm = pel - 1
    min_dx, min_dy, wy, wx = _window_geom(offsets, bs_y, bs_x, pel)

    def per_cand(cy, cx, src):
        wb_y = (cy + min_dy) >> logp
        wb_x = (cx + min_dx) >> logp
        win = jax.lax.dynamic_slice(
            stack, (jnp.int32(0), wb_y, wb_x),
            (pel * pel, wy, wx)).astype(I32)
        sads = []
        for (dx, dy) in offsets:
            ay = cy + dy
            ax = cx + dx
            sub = (ax & pelm) | ((ay & pelm) << logp)
            oy = (ay >> logp) - wb_y
            ox = (ax >> logp) - wb_x
            blk = jax.lax.dynamic_slice(win, (sub, oy, ox),
                                        (1, bs_y, bs_x))[0]
            if stats == "sad_satd_luma":
                sads.append(jnp.stack([
                    jnp.sum(jnp.abs(blk - src)).astype(I32),
                    sad_ops.satd(src, blk).astype(I32),
                    jnp.sum(blk).astype(I32)]))
            else:
                sads.append(jnp.sum(jnp.abs(blk - src)).astype(I32))
        return jnp.stack(sads)

    return jax.vmap(jax.vmap(per_cand, in_axes=(0, 0, None)))(
        cand_y, cand_x, src_blocks)


def _offset_classes(offsets, pel):
    """Distinct (dy mod pel, dx mod pel) parity classes of an offset set,
    in first-appearance order; only these subplanes are DMA'd."""
    classes = []
    for (dx, dy) in offsets:
        c = (dy % pel, dx % pel)
        if c not in classes:
            classes.append(c)
    return classes


def _satd_mats(bs_y: int, bs_x: int):
    """Constant matrices expressing the reference SATD (Satd_C
    SADFunctions.cpp:713-741 == ops.sad.satd) as dense matmuls — the
    only way to tile 4x4 Hadamards in a Mosaic kernel (no strided vector
    slices): t = HB d HB', per-tile abs sums ts = P |t| P', horizontal
    8x4-partition pairing pair = ts Q, satd = sum(floor(pair / 2)).

    A Pallas kernel may not capture array constants (and building them
    from in-kernel iotas hits unbounded trace recursion), so these are
    plain numpy arrays passed to pallas_call as VMEM INPUTS; the
    column-side matrices are pre-transposed so the kernel never
    transposes."""
    h4 = np.array([[1, 1, 1, 1],
                   [1, -1, 1, -1],
                   [1, 1, -1, -1],
                   [1, -1, -1, 1]], np.float32)
    hb_r = np.kron(np.eye(bs_y // 4, dtype=np.float32), h4)
    hb_c_t = np.kron(np.eye(bs_x // 4, dtype=np.float32), h4.T)
    p_r = np.kron(np.eye(bs_y // 4, dtype=np.float32),
                  np.ones((1, 4), np.float32))
    p_c_t = np.kron(np.eye(bs_x // 4, dtype=np.float32),
                    np.ones((4, 1), np.float32))
    q = np.kron(np.eye(bs_x // 8, dtype=np.float32),
                np.array([[1.0], [1.0]], np.float32))
    return hb_r, hb_c_t, p_r, p_c_t, q


def _kernel_satd(d_f32, mats):
    # Precision.HIGHEST: the MXU's default bf16-pass f32 matmul is not
    # exact at these magnitudes (observed ±20 of ~44k); all values are
    # small integers, so the exact-f32 pass reproduces integer SATD
    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    hb_r, hb_c_t, p_r, p_c_t, q = mats
    t = dot(hb_r, dot(d_f32, hb_c_t))
    a = jnp.abs(t)
    ts = dot(p_r, dot(a, p_c_t))
    pair = dot(ts, q)
    return jnp.sum(jnp.floor(pair * 0.5))


def _eval_offsets(planes, src, offsets, classes, bs_y, bs_x, pel,
                  min_dx, min_dy, par_y, par_x, single_sum, satd_mats):
    """Per-offset costs from rolled class planes (shared by the
    per-block and tiled kernels).

    planes[ci] is the candidate's window for parity class ci with its
    origin at the candidate's window base wb = (c + min_d) >> logp;
    par_y/par_x are the candidate's pel parities.  Returns the flat
    stat list (offset-major; 1 or 3 entries per offset)."""
    logp = pel.bit_length() - 1
    sads = []

    def case_geometry(qy, qx, dy, dx):
        """Static window-relative (oy, ox) when the candidate parity is
        (qy, qx) — every dynamic index reduces to one of pel^2 static
        cases (Mosaic has no unaligned dynamic vector slices); the
        subplane is the offset's parity class, independent of (qy, qx)."""
        oy = ((qy + dy) >> logp) - ((qy + min_dy) >> logp)
        ox = ((qx + dx) >> logp) - ((qx + min_dx) >> logp)
        return oy, ox

    for (dx, dy) in offsets:
        ci = classes.index((dy % pel, dx % pel))
        # group the pel^2 parity cases by their (oy, ox) window
        # geometry — most offsets collapse to 1-2 distinct slices —
        # select the block VECTOR by parity, then do one SAD
        geoms = {}
        for qy in range(pel):
            for qx in range(pel):
                oy, ox = case_geometry(qy, qx, dy, dx)
                geoms.setdefault((oy, ox), []).append((qy, qx))
        blk = None
        for (oy, ox), cases_list in geoms.items():
            cand = jax.lax.slice(planes[ci], (oy, ox),
                                 (oy + bs_y, ox + bs_x))
            if blk is None:
                blk = cand
            else:
                sel = None
                for (qy, qx) in cases_list:
                    c = ((par_y == np.int32(qy))
                         & (par_x == np.int32(qx)))
                    sel = c if sel is None else (sel | c)
                blk = jnp.where(sel, cand, blk)
        # i64-free SAD (jnp.sum(int32) accumulates in i64 under
        # x64, which Mosaic rejects): 8-bit data sums exactly in
        # one f32 pass (max 255*blkarea < 2^24); 16-bit needs the
        # hi/lo split
        v = jnp.abs(blk - src)
        if single_sum:
            sads.append(jnp.sum(v.astype(jnp.float32))
                        .astype(jnp.int32))
        else:
            lo = jnp.sum((v & 255).astype(jnp.float32))
            hi = jnp.sum((v >> 8).astype(jnp.float32))
            sads.append(lo.astype(jnp.int32)
                        + (hi.astype(jnp.int32) << 8))
        if satd_mats is not None:
            d_f32 = (blk - src).astype(jnp.float32)
            sads.append(_kernel_satd(
                d_f32, satd_mats).astype(jnp.int32))
            sads.append(jnp.sum(blk.astype(jnp.float32))
                        .astype(jnp.int32))
    return sads


def _probe_kernel(cy_ref, cx_ref, stack_ref, src_ref, *rest,
                  offsets, bs_y, bs_x, pel, chunk, k, single_sum,
                  stats="sad"):
    # stats mode appends the 5 SATD matmul constants as VMEM inputs
    # between src and the output (see probe_sads_pallas)
    if stats == "sad_satd_luma":
        satd_mats = tuple(r[...] for r in rest[:5])
        rest = rest[5:]
    else:
        satd_mats = None
    out_ref, win_scratch, coord_smem, sems, coord_sem = rest
    logp = pel.bit_length() - 1
    pelm = np.int32(pel - 1)
    min_dx, min_dy, wy, wx = _window_geom(offsets, bs_y, bs_x, pel)
    # DMA slice shapes must be tile-aligned: copy a full tile-rounded
    # window, enlarged by the max align-down shift (8, 128); pad_stack
    # guarantees the overshoot stays in bounds
    wy = -(-(wy + 8) // 32) * 32
    wx = -(-(wx + 128) // 128) * 128
    classes = _offset_classes(offsets, pel)
    n_dma = chunk * k
    n_buf = win_scratch.shape[0]
    g = pl.program_id(0)

    # fetch this chunk's candidate coordinates into SMEM (a full-clip
    # scalar-prefetch array would be tiled out to 128 lanes and overflow)
    row = pl.multiple_of(g * np.int32(chunk), chunk)
    cpy = pltpu.make_async_copy(cy_ref.at[pl.ds(row, chunk)],
                                coord_smem.at[np.int32(0)],
                                coord_sem)
    cpy.start()
    cpy.wait()
    cpx = pltpu.make_async_copy(cx_ref.at[pl.ds(row, chunk)],
                                coord_smem.at[np.int32(1)],
                                coord_sem)
    cpx.start()
    cpx.wait()

    def center(t):
        b = t // k
        kk = t % k
        return (coord_smem[np.int32(0), np.int32(b), np.int32(kk)],
                coord_smem[np.int32(1), np.int32(b), np.int32(kk)])

    def window_base(t):
        cy, cx = center(t)
        wb_y = (cy + np.int32(min_dy)) >> logp
        wb_x = (cx + np.int32(min_dx)) >> logp
        # DMA start offsets must be tile-aligned: align down, compensate
        # with an in-register rotate after the copy (multiple_of lets the
        # Mosaic divisibility prover accept the masked index)
        ay = pl.multiple_of(wb_y & np.int32(~7), 8)
        ax = pl.multiple_of(wb_x & np.int32(~127), 128)
        return ay, ax, wb_y & np.int32(7), wb_x & np.int32(127)

    def make_dmas(t, slot):
        """One copy per needed parity class (dynamic subplane index)."""
        ay, ax, _, _ = window_base(t)
        cy, cx = center(t)
        copies = []
        for ci, (py, px) in enumerate(classes):
            sub = (((cx & pelm) + np.int32(px)) & pelm) \
                | ((((cy & pelm) + np.int32(py)) & pelm) << logp)
            copies.append(pltpu.make_async_copy(
                stack_ref.at[sub, pl.ds(ay, wy), pl.ds(ax, wx)],
                win_scratch.at[np.int32(slot), np.int32(ci)],
                sems.at[np.int32(slot)]))
        return copies

    def start_dmas(t, slot):
        for c in make_dmas(t, slot):
            c.start()

    def wait_dmas(t, slot):
        for c in make_dmas(t, slot):
            c.wait()

    for t in range(min(n_buf, n_dma)):
        start_dmas(t, t)

    for b in range(chunk):
        src = src_ref[b].astype(jnp.int32)
        rows = []
        for kk in range(k):
            t = b * k + kk
            slot = t % n_buf
            wait_dmas(t, slot)
            cy, cx = center(t)
            _, _, ry, rx = window_base(t)
            # un-rotate the alignment shift so window-relative indices
            # match the unaligned base (dynamic rotate needs 32-bit
            # data); the sublane roll runs on the full window, then the
            # rows in use are sliced before the costlier lane roll
            logical_wy, logical_wx = _window_geom(offsets, bs_y, bs_x,
                                                  pel)[2:]
            rows2 = min(-(-logical_wy // 8) * 8, win_scratch.shape[2])
            planes = []
            for ci in range(len(classes)):
                w2 = win_scratch[slot, ci].astype(jnp.int32)
                w2 = pltpu.roll(w2, -ry, 0)
                w2 = jax.lax.slice(w2, (0, 0), (rows2, w2.shape[1]))
                w2 = _lane_unrotate(w2, rx, w2.shape[1])
                planes.append(w2)
            par_y = cy & pelm
            par_x = cx & pelm
            sads = _eval_offsets(planes, src, offsets, classes, bs_y,
                                 bs_x, pel, min_dx, min_dy, par_y,
                                 par_x, single_sum, satd_mats)
            rows.append(jnp.stack(sads))
            nxt = t + n_buf
            if nxt < n_dma:
                start_dmas(nxt, slot)
        # vector store per block (scalar VMEM stores are unsupported)
        out_ref[b] = jnp.stack(rows)


def probe_sads_pallas(stack, cand_y, cand_x, src_blocks, offsets,
                      bs_y: int, bs_x: int, pel: int,
                      chunk: int = 0, n_buf: int = 8,
                      stats: str = "sad"):
    """Pallas TPU version of probe_sads_xla: [nblk, K, D] int32 SADs —
    or [nblk, K, D, 3] (sad, satd, ref-luma) with stats="sad_satd_luma"
    (8-bit data only; SATD via the in-kernel Hadamard matmuls)."""
    nblk, kk = cand_y.shape
    n_stats = 3 if stats == "sad_satd_luma" else 1
    if n_stats == 3 and stack.dtype != jnp.uint8:
        raise ValueError("probe stats path supports 8-bit stacks only")
    if chunk <= 0:
        # the kernel body unrolls chunk*K (DMA + compute) steps; bound the
        # unroll so Mosaic compile time stays sane, and keep enough DMAs
        # in flight to hide the ~tens-of-us copy latency
        chunk = max(1, min(64, 64 // kk))
    if n_buf <= 0 or n_buf == 8:
        n_classes = max(1, len(_offset_classes(offsets, pel)))
        n_buf = max(4, min(48 // n_classes, chunk * kk))
    offsets = tuple(tuple(int(v) for v in o) for o in offsets)
    _, _, wy, wx = _window_geom(offsets, bs_y, bs_x, pel)
    wy = -(-(wy + 8) // 32) * 32
    wx = -(-(wx + 128) // 128) * 128

    pad_blk = (-nblk) % chunk
    if pad_blk:
        cand_y = jnp.pad(cand_y, ((0, pad_blk), (0, 0)), mode="edge")
        cand_x = jnp.pad(cand_x, ((0, pad_blk), (0, 0)), mode="edge")
        src_blocks = jnp.pad(src_blocks, ((0, pad_blk), (0, 0), (0, 0)))
    n = cand_y.shape[0]
    grid = n // chunk
    # pad the candidate axis to a full 128-lane row so the per-chunk
    # coordinate DMA into SMEM is tile-aligned
    cand_y = jnp.pad(cand_y, ((0, 0), (0, 128 - kk)), mode="edge")
    cand_x = jnp.pad(cand_x, ((0, 0), (0, 128 - kk)), mode="edge")

    single_sum = (stack.dtype == jnp.uint8
                  and 255 * bs_y * bs_x < (1 << 24))
    kernel = functools.partial(
        _probe_kernel, offsets=offsets, bs_y=bs_y, bs_x=bs_x, pel=pel,
        chunk=chunk, k=kk, single_sum=single_sum, stats=stats)

    z = np.int32(0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),    # cand_y in HBM
        pl.BlockSpec(memory_space=pl.ANY),    # cand_x in HBM
        pl.BlockSpec(memory_space=pl.ANY),    # subplane stack in HBM
        pl.BlockSpec((chunk, src_blocks.shape[1],
                      src_blocks.shape[2]),
                     lambda g: (g, z, z),
                     memory_space=pltpu.VMEM),
    ]
    extra_inputs = []
    if n_stats == 3:
        # the SATD matmul constants ride along as whole-array VMEM
        # inputs (a Pallas kernel may not capture array constants)
        for m in _satd_mats(bs_y, bs_x):
            in_specs.append(pl.BlockSpec(
                m.shape, lambda g: (z, z), memory_space=pltpu.VMEM))
            extra_inputs.append(jnp.asarray(m))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, kk, len(offsets) * n_stats),
                               lambda g: (g, z, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, len(_offset_classes(offsets, pel)),
                        wy, wx), stack.dtype),
            pltpu.SMEM((2, chunk, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((n, kk, len(offsets) * n_stats),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cand_y, cand_x, stack, src_blocks, *extra_inputs)
    out = out[:nblk]
    if n_stats == 3:
        return out.reshape(nblk, kk, len(offsets), 3)
    return out


# below this many (block, candidate) pairs the vmapped-slice XLA path
# beats the Pallas kernel's fixed costs — and the deepest coarse pyramid
# levels (~tens of blocks) never touch Pallas at all (the 1080p
# levels=0 "TPU kernel fault" lives somewhere in that regime)
TINY_PROBE = 64


def probe_sads(stack, cand_y, cand_x, src_blocks, offsets,
               bs_y: int, bs_x: int, pel: int, stats: str = "sad"):
    """Backend dispatch: Pallas on TPU, vmapped slices elsewhere (and
    for tiny block counts).  Inside a `spatial_axis` context the block
    axis is sharded over the mesh axis and the SAD columns
    all_gathered."""
    tiny = cand_y.shape[0] * cand_y.shape[1] <= TINY_PROBE
    impl = (probe_sads_pallas
            if jax.default_backend() == "tpu" and not tiny
            else probe_sads_xla)
    return spatial_shard(
        lambda cy, cx, sb: impl(stack, cy, cx, sb.astype(I32), offsets,
                                bs_y, bs_x, pel, stats=stats),
        [cand_y, cand_x, src_blocks])


# ---------------------------------------------------------------------------
# Tiled probe: one window DMA per TILE of consecutive blocks instead of
# one per (block, candidate).  The per-window DMA latency (~0.3us) is
# the probe floor (BASELINE.md); adjacent blocks' windows overlap almost
# entirely (16px apart, MVs spatially smooth), so the tile kernel DMAs a
# single [pel^2, WY, WX] window per tile — base anchored at the
# median-of-3 of the tile's first candidates — and every (block,
# candidate) reads its subwindow from VMEM scratch with tile-aligned
# dynamic slices + in-register rolls.  Candidates whose window falls
# outside the static tile extent report INVALID_SAD (they lose every
# comparison; the dense zero-trial guarantees a real cost bound exists),
# the field engine's equivalent of skipping a rare far-flung candidate.

INVALID_SAD = np.int32(np.iinfo(np.int32).max)


def _tile_geom(offsets, bs_y: int, bs_x: int, pel: int):
    """(min_dx, min_dy, wy, wx, rows2, cxs): logical window of the
    offset set plus the tile-kernel slice sizes — rows2 rows are kept
    after the sublane roll, cxs lanes are loaded at a 128-aligned
    offset (worst within-slice start 127)."""
    min_dx, min_dy, wy, wx = _window_geom(offsets, bs_y, bs_x, pel)
    rows2 = -(-wy // 8) * 8
    cxs = -(-(wx + 127) // 128) * 128
    return min_dx, min_dy, wy, wx, rows2, cxs


def tile_params(offsets, bs_y: int, bs_x: int, pel: int, tile: int,
                pitch_x: int, margin_y: int = 20, margin_x: int = 64):
    """Static tile-window extents and anchor centering for
    probe_sads_tiled.

    pitch_x: full-pel distance between consecutive blocks' window
    bases ((bsx - overlap) for the engine's block grids); margins are
    the tolerated full-pel MV deviation from the tile anchor."""
    _, _, wy, wx, rows2, cxs = _tile_geom(offsets, bs_y, bs_x, pel)
    wy_total = -(-(max(rows2, wy + 2 * margin_y)) // 32) * 32
    span = (tile - 1) * pitch_x
    wx_total = -(-(span + cxs + 2 * margin_x) // 128) * 128
    center_y = margin_y
    center_x = (tile // 2) * pitch_x + margin_x
    return wy_total, wx_total, center_y, center_x


def _med3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


def _tile_base(wb0, wbm, wb1, center, lo_max, align_mask):
    """Clamped, aligned-down tile window base from the med3 anchor."""
    anchor = _med3(wb0, wbm, wb1)
    base = jnp.clip(anchor - np.int32(center), np.int32(0),
                    np.int32(lo_max))
    return base & np.int32(align_mask)


def probe_sads_tiled_xla(stack, cand_y, cand_x, src_blocks, offsets,
                         bs_y: int, bs_x: int, pel: int, tile: int,
                         wy_total: int, wx_total: int, center_y: int,
                         center_x: int, stats: str = "sad"):
    """Reference semantics of the tiled probe: per-block SADs where the
    candidate window fits the tile extent, INVALID_SAD elsewhere.
    nblk must be a multiple of `tile` (probe_sads_tiled pads)."""
    logp = pel.bit_length() - 1
    min_dx, min_dy, wy, wx, rows2, cxs = _tile_geom(offsets, bs_y, bs_x,
                                                    pel)
    H, W = stack.shape[1], stack.shape[2]
    nblk, kk = cand_y.shape
    ntile = nblk // tile
    wb_y = (cand_y + min_dy) >> logp
    wb_x = (cand_x + min_dx) >> logp
    wyt = wb_y.reshape(ntile, tile, kk)
    wxt = wb_x.reshape(ntile, tile, kk)
    ay = _tile_base(wyt[:, 0, 0], wyt[:, tile // 2, 0], wyt[:, -1, 0],
                    center_y, H - wy_total, ~7)
    ax = _tile_base(wxt[:, 0, 0], wxt[:, tile // 2, 0], wxt[:, -1, 0],
                    center_x, W - wx_total, ~127)
    rel_y = wyt - ay[:, None, None]
    rel_x = wxt - ax[:, None, None]
    valid = ((rel_y >= 0) & (rel_y + wy <= wy_total)
             & (rel_x >= 0)
             & ((rel_x & ~127) + cxs <= wx_total))
    valid = valid.reshape(nblk, kk)
    out = probe_sads_xla(stack, cand_y, cand_x, src_blocks, offsets,
                         bs_y, bs_x, pel, stats=stats)
    mask = valid[:, :, None]
    if stats == "sad_satd_luma":
        mask = mask[..., None]
    return jnp.where(mask, out, INVALID_SAD)


def _tiled_probe_kernel(cy_ref, cx_ref, stack_ref, src_ref, *rest,
                        offsets, bs_y, bs_x, pel, tile, chunk_t, k,
                        wy_total, wx_total, center_y, center_x, grid_n,
                        single_sum, stats="sad"):
    if stats == "sad_satd_luma":
        satd_mats = tuple(r[...] for r in rest[:5])
        rest = rest[5:]
    else:
        satd_mats = None
    out_ref, win_scratch, coord_smem, sems, coord_sems = rest
    logp = pel.bit_length() - 1
    pelm = np.int32(pel - 1)
    min_dx, min_dy, wy, wx, rows2, cxs = _tile_geom(offsets, bs_y, bs_x,
                                                    pel)
    rows2 = min(rows2, wy_total)
    n_sub = pel * pel
    H, W = stack_ref.shape[1], stack_ref.shape[2]
    classes = _offset_classes(offsets, pel)
    nblocks = chunk_t * tile
    g = pl.program_id(0)

    def coord_copies(buf, step_row):
        row = pl.multiple_of(step_row * np.int32(nblocks), nblocks)
        return [pltpu.make_async_copy(
                    ref.at[pl.ds(row, nblocks)],
                    coord_smem.at[np.int32(buf), np.int32(i)],
                    coord_sems.at[np.int32(buf)])
                for i, ref in ((0, cy_ref), (1, cx_ref))]

    def center(buf, blk, kk_):
        return (coord_smem[np.int32(buf), np.int32(0), np.int32(blk),
                           np.int32(kk_)],
                coord_smem[np.int32(buf), np.int32(1), np.int32(blk),
                           np.int32(kk_)])

    def wb_of(buf, blk, kk_):
        cy, cx = center(buf, blk, kk_)
        return ((cy + np.int32(min_dy)) >> logp,
                (cx + np.int32(min_dx)) >> logp)

    def base_of(buf, j):
        b0 = j * tile
        y0, x0 = wb_of(buf, b0, 0)
        ym, xm = wb_of(buf, b0 + tile // 2, 0)
        y1, x1 = wb_of(buf, b0 + tile - 1, 0)
        ay = _tile_base(y0, ym, y1, center_y, H - wy_total, ~7)
        ax = _tile_base(x0, xm, x1, center_x, W - wx_total, ~127)
        return (pl.multiple_of(ay, 8), pl.multiple_of(ax, 128))

    def tile_dmas(buf, j):
        ay, ax = base_of(buf, j)
        return [pltpu.make_async_copy(
                    stack_ref.at[np.int32(s), pl.ds(ay, wy_total),
                                 pl.ds(ax, wx_total)],
                    win_scratch.at[np.int32(j), np.int32(s)],
                    sems.at[np.int32(j)])
                for s in range(n_sub)]

    # step coords: this step into buf 0, next step's into buf 1
    for c in coord_copies(0, g):
        c.start()
        c.wait()
    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in coord_copies(1, g + 1):
                c.start()

    # the first step must start its own window DMAs (later steps find
    # them already in flight from the previous step's tail)
    @pl.when(g == np.int32(0))
    def _():
        for j in range(chunk_t):
            for c in tile_dmas(0, j):
                c.start()

    for j in range(chunk_t):
        for c in tile_dmas(0, j):
            c.wait()
        ay, ax = base_of(0, j)
        for b in range(tile):
            blk = j * tile + b
            src = src_ref[blk].astype(jnp.int32)
            rows = []
            for kk_ in range(k):
                cy, cx = center(0, blk, kk_)
                wb_y, wb_x = wb_of(0, blk, kk_)
                rel_y = wb_y - ay
                rel_x = wb_x - ax
                valid = ((rel_y >= np.int32(0))
                         & (rel_y + np.int32(wy) <= np.int32(wy_total))
                         & (rel_x >= np.int32(0))
                         & ((rel_x & np.int32(~127)) + np.int32(cxs)
                            <= np.int32(wx_total)))
                ry = jnp.clip(rel_y, np.int32(0),
                              np.int32(wy_total - 1))
                rxp = jnp.maximum(rel_x, np.int32(0))
                rx128 = jnp.minimum(rxp & np.int32(~127),
                                    np.int32(wx_total - cxs))
                rxr = jnp.clip(rxp - rx128, np.int32(0), np.int32(127))
                par_y = cy & pelm
                par_x = cx & pelm
                planes = {}
                for ci, (py, px) in enumerate(classes):
                    sub = (((cx & pelm) + np.int32(px)) & pelm) \
                        | ((((cy & pelm) + np.int32(py)) & pelm) << logp)
                    w2 = win_scratch[np.int32(j), sub, :,
                                     pl.ds(pl.multiple_of(rx128, 128),
                                           cxs)].astype(jnp.int32)
                    w2 = pltpu.roll(w2, -ry, 0)
                    w2 = jax.lax.slice(w2, (0, 0), (rows2, cxs))
                    w2 = _lane_unrotate(w2, rxr, cxs)
                    planes[ci] = w2
                sads = _eval_offsets(planes, src, offsets, classes,
                                     bs_y, bs_x, pel, min_dx, min_dy,
                                     par_y, par_x, single_sum,
                                     satd_mats)
                row = jnp.stack(sads)
                rows.append(jnp.where(valid, row,
                                      jnp.full_like(row, INVALID_SAD)))
            out_ref[blk] = jnp.stack(rows)

    # tail: prefetch the next step's tile windows (slots are free — this
    # step's waits all happened above)
    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in coord_copies(1, g + 1):
                c.wait()
            for j in range(chunk_t):
                for c in tile_dmas(1, j):
                    c.start()


def probe_sads_tiled_pallas(stack, cand_y, cand_x, src_blocks, offsets,
                            bs_y: int, bs_x: int, pel: int, tile: int,
                            wy_total: int, wx_total: int, center_y: int,
                            center_x: int, stats: str = "sad"):
    """Pallas TPU tiled probe; same contract as probe_sads_tiled_xla.
    nblk must be a multiple of `tile`."""
    nblk, kk = cand_y.shape
    n_stats = 3 if stats == "sad_satd_luma" else 1
    if n_stats == 3 and stack.dtype != jnp.uint8:
        raise ValueError("probe stats path supports 8-bit stacks only")
    offsets = tuple(tuple(int(v) for v in o) for o in offsets)
    chunk_t = max(1, min(8, 64 // (tile * kk)))
    # keep the tile-window scratch under ~4MB of VMEM (pel=4 stacks
    # carry 16 subplanes per window)
    slot_bytes = pel * pel * wy_total * wx_total * stack.dtype.itemsize
    chunk_t = max(1, min(chunk_t, (4 << 20) // slot_bytes))
    nblocks = chunk_t * tile

    pad_blk = (-nblk) % nblocks
    if pad_blk:
        cand_y = jnp.pad(cand_y, ((0, pad_blk), (0, 0)), mode="edge")
        cand_x = jnp.pad(cand_x, ((0, pad_blk), (0, 0)), mode="edge")
        src_blocks = jnp.pad(src_blocks, ((0, pad_blk), (0, 0), (0, 0)))
    n = cand_y.shape[0]
    grid = n // nblocks
    cand_y = jnp.pad(cand_y, ((0, 0), (0, 128 - kk)), mode="edge")
    cand_x = jnp.pad(cand_x, ((0, 0), (0, 128 - kk)), mode="edge")

    single_sum = (stack.dtype == jnp.uint8
                  and 255 * bs_y * bs_x < (1 << 24))
    kernel = functools.partial(
        _tiled_probe_kernel, offsets=offsets, bs_y=bs_y, bs_x=bs_x,
        pel=pel, tile=tile, chunk_t=chunk_t, k=kk, wy_total=wy_total,
        wx_total=wx_total, center_y=center_y, center_x=center_x,
        grid_n=grid, single_sum=single_sum, stats=stats)

    z = np.int32(0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),    # cand_y in HBM
        pl.BlockSpec(memory_space=pl.ANY),    # cand_x in HBM
        pl.BlockSpec(memory_space=pl.ANY),    # subplane stack in HBM
        pl.BlockSpec((nblocks, src_blocks.shape[1],
                      src_blocks.shape[2]),
                     lambda g: (g, z, z),
                     memory_space=pltpu.VMEM),
    ]
    extra_inputs = []
    if n_stats == 3:
        for m in _satd_mats(bs_y, bs_x):
            in_specs.append(pl.BlockSpec(
                m.shape, lambda g: (z, z), memory_space=pltpu.VMEM))
            extra_inputs.append(jnp.asarray(m))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nblocks, kk, len(offsets) * n_stats),
                               lambda g: (g, z, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk_t, pel * pel, wy_total, wx_total),
                       stack.dtype),
            pltpu.SMEM((2, 2, nblocks, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((chunk_t,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n, kk, len(offsets) * n_stats),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cand_y, cand_x, stack, src_blocks, *extra_inputs)
    out = out[:nblk]
    if n_stats == 3:
        return out.reshape(nblk, kk, len(offsets), 3)
    return out


def probe_sads_tiled(stack, cand_y, cand_x, src_blocks, offsets,
                     bs_y: int, bs_x: int, pel: int, row_len: int,
                     pitch_x: int, tile: int = 0,
                     margin_y: int = 20, margin_x: int = 64,
                     stats: str = "sad"):
    """Tiled probe over a [nrows, row_len] block grid: pads each block
    row to a multiple of `tile`, dispatches Pallas/XLA, and falls back
    to the per-block probe when the plane is too small for the tile
    window.  Inside a spatial_axis context the block axis is sharded in
    row-aligned bands (tiles never span shard boundaries)."""
    nblk, kk = cand_y.shape
    if tile <= 0:
        tile = 8 if kk <= 2 else 4
    wy_total, wx_total, center_y, center_x = tile_params(
        offsets, bs_y, bs_x, pel, tile, pitch_x,
        margin_y=margin_y, margin_x=margin_x)
    too_small = (stack.shape[1] < wy_total
                 or stack.shape[2] < wx_total)
    if too_small or nblk % row_len != 0:
        return probe_sads(stack, cand_y, cand_x, src_blocks, offsets,
                          bs_y, bs_x, pel, stats=stats)
    impl = (probe_sads_tiled_pallas if jax.default_backend() == "tpu"
            else probe_sads_tiled_xla)

    def run(cy, cx, sb):
        nb = cy.shape[0]
        nrows = nb // row_len
        rlp = -(-row_len // tile) * tile

        def rpad(a):
            if rlp == row_len:
                return a
            a = a.reshape((nrows, row_len) + a.shape[1:])
            pad = [(0, 0), (0, rlp - row_len)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad, mode="edge").reshape(
                (nrows * rlp,) + a.shape[2:])

        out = impl(stack, rpad(cy), rpad(cx), rpad(sb).astype(I32),
                   offsets, bs_y, bs_x, pel, tile, wy_total, wx_total,
                   center_y, center_x, stats=stats)
        if rlp != row_len:
            out = out.reshape((nrows, rlp) + out.shape[1:])[:, :row_len]
            out = out.reshape((nb,) + out.shape[2:])
        return out

    # spatial sharding: row-aligned bands so tiles never span bands
    return spatial_shard(run, [cand_y, cand_x, src_blocks],
                         row_len=row_len)


# ---------------------------------------------------------------------------
# Block fetch: the consumer-side gather (Degrain/Compensate useBlock,
# MVDegrains.h:192-206) as a window-DMA kernel — per (block, ref) the XLA
# per-block dynamic-slice gather costs ~1.4us; the DMA pipeline here
# sustains ~0.3us.


def _fetch_kernel(cy_ref, cx_ref, stack_ref, out_ref, win_scratch,
                  coord_smem, sems, coord_sem, *, bs_y, bs_x, pel, chunk,
                  k, n_pad=0):
    logp = pel.bit_length() - 1
    pelm = np.int32(pel - 1)
    wy = -(-(bs_y + 8) // 32) * 32
    wx = -(-(bs_x + 128) // 128) * 128
    n_dma = chunk * k
    n_buf = win_scratch.shape[0]
    g = pl.program_id(0)

    row = pl.multiple_of(g * np.int32(chunk), chunk)
    cpy = pltpu.make_async_copy(cy_ref.at[pl.ds(row, chunk)],
                                coord_smem.at[np.int32(0)], coord_sem)
    cpy.start()
    cpy.wait()
    cpx = pltpu.make_async_copy(cx_ref.at[pl.ds(row, chunk)],
                                coord_smem.at[np.int32(1)], coord_sem)
    cpx.start()
    cpx.wait()

    def center(t):
        b = t // k
        kk = t % k
        return (coord_smem[np.int32(0), np.int32(b), np.int32(kk)],
                coord_smem[np.int32(1), np.int32(b), np.int32(kk)])

    def window_base(t):
        cy, cx = center(t)
        wb_y = cy >> logp
        wb_x = cx >> logp
        ay = pl.multiple_of(wb_y & np.int32(~7), 8)
        ax = pl.multiple_of(wb_x & np.int32(~127), 128)
        return ay, ax, wb_y & np.int32(7), wb_x & np.int32(127)

    def make_dma(t, slot):
        ay, ax, _, _ = window_base(t)
        cy, cx = center(t)
        sub = (cx & pelm) | ((cy & pelm) << logp)
        if n_pad:
            # frame-batched fetch: blocks laid out frame-major, each
            # frame's count padded to n_pad
            fid = (g * np.int32(chunk) + np.int32(t // k)) \
                // np.int32(n_pad)
            sub = fid * np.int32(pel * pel) + sub
        return pltpu.make_async_copy(
            stack_ref.at[sub, pl.ds(ay, wy), pl.ds(ax, wx)],
            win_scratch.at[np.int32(slot)], sems.at[np.int32(slot)])

    for t in range(min(n_buf, n_dma)):
        make_dma(t, t).start()

    rows2 = min(-(-bs_y // 8) * 8, wy)
    for b in range(chunk):
        blks = []
        for kk in range(k):
            t = b * k + kk
            slot = t % n_buf
            make_dma(t, slot).wait()
            _, _, ry, rx = window_base(t)
            w2 = win_scratch[slot].astype(jnp.int32)
            w2 = pltpu.roll(w2, -ry, 0)
            w2 = jax.lax.slice(w2, (0, 0), (rows2, w2.shape[1]))
            w2 = _lane_unrotate(w2, rx, w2.shape[1])
            blks.append(jax.lax.slice(w2, (0, 0), (bs_y, bs_x)))
            nxt = t + n_buf
            if nxt < n_dma:
                make_dma(nxt, slot).start()
        out_ref[b] = jnp.stack(blks)


def _tiled_fetch_kernel(cy_ref, cx_ref, stack_ref, out_ref, win_scratch,
                        fb_scratch, coord_smem, sems, fb_sem, coord_sems,
                        *, bs_y, bs_x, pel, tile, chunk_t, k, wy_total,
                        wx_total, center_y, center_x, grid_n, n_pad=0):
    """Tiled variant of _fetch_kernel: one [pel^2, WY, WX] window DMA
    per tile of consecutive blocks; a block whose window misses the
    tile extent falls back to its own private window DMA (predicated —
    rare), so the fetch is EXACT for every block."""
    logp = pel.bit_length() - 1
    pelm = np.int32(pel - 1)
    rows2 = min(-(-bs_y // 8) * 8, wy_total)
    cxs = -(-(bs_x + 127) // 128) * 128
    fwy = -(-(bs_y + 8) // 32) * 32
    fwx = -(-(bs_x + 128) // 128) * 128
    n_sub = pel * pel
    H, W = stack_ref.shape[1], stack_ref.shape[2]
    nblocks = chunk_t * tile
    g = pl.program_id(0)

    def coord_copies(buf, step_row):
        row = pl.multiple_of(step_row * np.int32(nblocks), nblocks)
        return [pltpu.make_async_copy(
                    ref.at[pl.ds(row, nblocks)],
                    coord_smem.at[np.int32(buf), np.int32(i)],
                    coord_sems.at[np.int32(buf)])
                for i, ref in ((0, cy_ref), (1, cx_ref))]

    def center(buf, blk, kk_):
        return (coord_smem[np.int32(buf), np.int32(0), np.int32(blk),
                           np.int32(kk_)],
                coord_smem[np.int32(buf), np.int32(1), np.int32(blk),
                           np.int32(kk_)])

    def wb_of(buf, blk, kk_):
        cy, cx = center(buf, blk, kk_)
        return (cy >> logp, cx >> logp)

    def base_of(buf, j):
        b0 = j * tile
        y0, x0 = wb_of(buf, b0, 0)
        ym, xm = wb_of(buf, b0 + tile // 2, 0)
        y1, x1 = wb_of(buf, b0 + tile - 1, 0)
        ay = _tile_base(y0, ym, y1, center_y, H - wy_total, ~7)
        ax = _tile_base(x0, xm, x1, center_x, W - wx_total, ~127)
        return (pl.multiple_of(ay, 8), pl.multiple_of(ax, 128))

    def sub_base(step, j):
        """Frame-batched fetches (n_pad > 0: tiles per frame, frame-
        major layout): the subplane base of tile `step*chunk_t + j`."""
        if not n_pad:
            return np.int32(0)
        fid = (step * np.int32(chunk_t) + np.int32(j)) // np.int32(n_pad)
        return fid * np.int32(n_sub)

    def tile_dmas(buf, j, step):
        ay, ax = base_of(buf, j)
        sb = sub_base(step, j)
        return [pltpu.make_async_copy(
                    stack_ref.at[sb + np.int32(s), pl.ds(ay, wy_total),
                                 pl.ds(ax, wx_total)],
                    win_scratch.at[np.int32(j), np.int32(s)],
                    sems.at[np.int32(j)])
                for s in range(n_sub)]

    for c in coord_copies(0, g):
        c.start()
        c.wait()
    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in coord_copies(1, g + 1):
                c.start()

    @pl.when(g == np.int32(0))
    def _():
        for j in range(chunk_t):
            for c in tile_dmas(0, j, g):
                c.start()

    for j in range(chunk_t):
        for c in tile_dmas(0, j, g):
            c.wait()
        ay, ax = base_of(0, j)
        sb = sub_base(g, j)
        for b in range(tile):
            blk = j * tile + b
            blks = []
            for kk_ in range(k):
                cy, cx = center(0, blk, kk_)
                wb_y, wb_x = wb_of(0, blk, kk_)
                # win_scratch holds this tile's own frame: LOCAL
                # subplane index; the fallback DMA reads the stack:
                # frame-offset (global) index
                sub = (cx & pelm) | ((cy & pelm) << logp)
                rel_y = wb_y - ay
                rel_x = wb_x - ax
                valid = ((rel_y >= np.int32(0))
                         & (rel_y + np.int32(bs_y) <= np.int32(wy_total))
                         & (rel_x >= np.int32(0))
                         & ((rel_x & np.int32(~127)) + np.int32(cxs)
                            <= np.int32(wx_total)))
                # rare fallback: a private window DMA for this block
                fy = pl.multiple_of(wb_y & np.int32(~7), 8)
                fx = pl.multiple_of(wb_x & np.int32(~127), 128)
                fb = pltpu.make_async_copy(
                    stack_ref.at[sb + sub, pl.ds(fy, fwy),
                                 pl.ds(fx, fwx)],
                    fb_scratch, fb_sem)

                @pl.when(jnp.logical_not(valid))
                def _(fb=fb):
                    fb.start()
                    fb.wait()

                ry = jnp.clip(rel_y, np.int32(0),
                              np.int32(wy_total - 1))
                rxp = jnp.maximum(rel_x, np.int32(0))
                rx128 = jnp.minimum(rxp & np.int32(~127),
                                    np.int32(wx_total - cxs))
                rxr = jnp.clip(rxp - rx128, np.int32(0), np.int32(127))
                w2 = win_scratch[np.int32(j), sub, :,
                                 pl.ds(pl.multiple_of(rx128, 128),
                                       cxs)].astype(jnp.int32)
                w2 = pltpu.roll(w2, -ry, 0)
                w2 = jax.lax.slice(w2, (0, 0), (rows2, cxs))
                w2 = _lane_unrotate(w2, rxr, cxs)
                blk_t = jax.lax.slice(w2, (0, 0), (bs_y, bs_x))
                f2 = fb_scratch[...].astype(jnp.int32)
                f2 = pltpu.roll(f2, -(wb_y & np.int32(7)), 0)
                f2 = jax.lax.slice(f2, (0, 0),
                                   (min(rows2, fwy), fwx))
                # dynamic NEGATIVE lane rolls land a vreg short on >2-vreg
                # arrays (CLAUDE.md); un-rotate with the positive
                # complement regardless of fwx
                f2 = _lane_unrotate(f2, wb_x & np.int32(127), fwx)
                blk_f = jax.lax.slice(f2, (0, 0), (bs_y, bs_x))
                blks.append(jnp.where(valid, blk_t, blk_f))
            out_ref[blk] = jnp.stack(blks)

    if grid_n > 1:
        @pl.when(g < np.int32(grid_n - 1))
        def _():
            for c in coord_copies(1, g + 1):
                c.wait()
            for j in range(chunk_t):
                for c in tile_dmas(1, j, g + 1):
                    c.start()


def fetch_blocks_tiled_pallas(stack, cand_y, cand_x, bs_y: int,
                              bs_x: int, pel: int, tile: int,
                              wy_total: int, wx_total: int,
                              center_y: int, center_x: int):
    """[nblk, K, bs_y, bs_x] int32 blocks, tiled window DMAs + exact
    per-block fallback.  nblk must be a multiple of `tile`.

    Frame-batched form: stack [F, pel^2, Hp, Wp], cand_y/x [F, nblk, K]
    -> [F, nblk, K, bs_y, bs_x] from ONE kernel launch."""
    batched = cand_y.ndim == 3
    if not batched:
        stack = stack[None]
        cand_y = cand_y[None]
        cand_x = cand_x[None]
    nf, nblk, kk = cand_y.shape
    chunk_t = max(1, min(8, 64 // (tile * kk)))
    slot_bytes = pel * pel * wy_total * wx_total * stack.dtype.itemsize
    chunk_t = max(1, min(chunk_t, (4 << 20) // slot_bytes))
    nblocks = chunk_t * tile

    pad_blk = (-nblk) % nblocks
    if pad_blk:
        cand_y = jnp.pad(cand_y, ((0, 0), (0, pad_blk), (0, 0)),
                         mode="edge")
        cand_x = jnp.pad(cand_x, ((0, 0), (0, pad_blk), (0, 0)),
                         mode="edge")
    nb_pad = cand_y.shape[1]
    n = nf * nb_pad
    grid = n // nblocks
    cand_y = cand_y.reshape(n, kk)
    cand_x = cand_x.reshape(n, kk)
    cand_y = jnp.pad(cand_y, ((0, 0), (0, 128 - kk)), mode="edge")
    cand_x = jnp.pad(cand_x, ((0, 0), (0, 128 - kk)), mode="edge")
    stack = stack.reshape((nf * pel * pel,) + stack.shape[-2:])

    fwy = -(-(bs_y + 8) // 32) * 32
    fwx = -(-(bs_x + 128) // 128) * 128
    kernel = functools.partial(
        _tiled_fetch_kernel, bs_y=bs_y, bs_x=bs_x, pel=pel, tile=tile,
        chunk_t=chunk_t, k=kk, wy_total=wy_total, wx_total=wx_total,
        center_y=center_y, center_x=center_x, grid_n=grid,
        n_pad=(nb_pad // tile if nf > 1 else 0))
    z = np.int32(0)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nblocks, kk, bs_y, bs_x),
                               lambda g: (g, z, z, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk_t, pel * pel, wy_total, wx_total),
                       stack.dtype),
            pltpu.VMEM((fwy, fwx), stack.dtype),
            pltpu.SMEM((2, 2, nblocks, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((chunk_t,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n, kk, bs_y, bs_x), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cand_y, cand_x, stack)
    out = out.reshape((nf, nb_pad) + out.shape[1:])[:, :nblk]
    return out if batched else out[0]


@functools.lru_cache(maxsize=None)
def _fetch_tiled_vmappable(bs_y, bs_x, pel, tile, wy_total, wx_total,
                           center_y, center_x):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(stack, cand_y, cand_x):
        return fetch_blocks_tiled_pallas(stack, cand_y, cand_x, bs_y,
                                         bs_x, pel, tile, wy_total,
                                         wx_total, center_y, center_x)

    @f.def_vmap
    def _rule(axis_size, in_batched, stack, cand_y, cand_x):
        def bc(x, is_b):
            return x if is_b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
        out = fetch_blocks_tiled_pallas(
            bc(stack, in_batched[0]), bc(cand_y, in_batched[1]),
            bc(cand_x, in_batched[2]), bs_y, bs_x, pel, tile, wy_total,
            wx_total, center_y, center_x)
        return out, True

    return f


def fetch_blocks_tiled(stack, cand_y, cand_x, bs_y: int, bs_x: int,
                       pel: int, row_len: int, pitch_x: int,
                       tile: int = 8, margin_y: int = 20,
                       margin_x: int = 64):
    """Tiled block fetch over a [nrows, row_len] block grid (TPU only;
    call sites fall back to fetch_blocks_pallas themselves elsewhere).
    Exact for every block — out-of-extent blocks take a private DMA."""
    nblk, kk = cand_y.shape
    wy_total, wx_total, center_y, center_x = tile_params(
        ((0, 0),), bs_y, bs_x, pel, tile, pitch_x,
        margin_y=margin_y, margin_x=margin_x)
    too_small = (stack.shape[1] < wy_total
                 or stack.shape[2] < wx_total)
    if too_small or nblk % row_len != 0:
        return spatial_shard(
            lambda cy, cx: fetch_blocks(stack, cy, cx, bs_y, bs_x, pel),
            [cand_y, cand_x])

    def run(cy, cx):
        nb = cy.shape[0]
        nrows = nb // row_len
        rlp = -(-row_len // tile) * tile

        def rpad(a):
            if rlp == row_len:
                return a
            a = a.reshape((nrows, row_len) + a.shape[1:])
            pad = [(0, 0), (0, rlp - row_len)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad, mode="edge").reshape(
                (nrows * rlp,) + a.shape[2:])

        # vmap-aware: a frame-batched degrain folds its batch into one
        # fetch-kernel launch
        out = _fetch_tiled_vmappable(
            bs_y, bs_x, pel, tile, wy_total, wx_total, center_y,
            center_x)(stack, rpad(cy), rpad(cx))
        if rlp != row_len:
            out = out.reshape((nrows, rlp) + out.shape[1:])[:, :row_len]
            out = out.reshape((nb,) + out.shape[2:])
        return out

    return spatial_shard(run, [cand_y, cand_x], row_len=row_len)


def fetch_blocks_pallas(stack, cand_y, cand_x, bs_y: int, bs_x: int,
                        pel: int, chunk: int = 0, n_buf: int = 0):
    """[nblk, K, bs_y, bs_x] int32 blocks at per-block pel positions.

    stack: pad_stack output; cand_y/cand_x: [nblk, K] PEL positions of
    the block origin (frame padding + probe padding included).

    Frame-batched form: stack [F, pel^2, Hp, Wp], cand_y/x [F, nblk, K]
    -> [F, nblk, K, bs_y, bs_x] from ONE kernel launch."""
    batched = cand_y.ndim == 3
    if not batched:
        stack = stack[None]
        cand_y = cand_y[None]
        cand_x = cand_x[None]
    nf, nblk, kk = cand_y.shape
    if chunk <= 0:
        chunk = max(1, min(64, 64 // kk))
    if n_buf <= 0:
        n_buf = max(4, min(48, chunk * kk))
    wy = -(-(bs_y + 8) // 32) * 32
    wx = -(-(bs_x + 128) // 128) * 128

    pad_blk = (-nblk) % chunk
    if pad_blk:
        cand_y = jnp.pad(cand_y, ((0, 0), (0, pad_blk), (0, 0)),
                         mode="edge")
        cand_x = jnp.pad(cand_x, ((0, 0), (0, pad_blk), (0, 0)),
                         mode="edge")
    nb_pad = cand_y.shape[1]
    n = nf * nb_pad
    grid = n // chunk
    cand_y = cand_y.reshape(n, kk)
    cand_x = cand_x.reshape(n, kk)
    cand_y = jnp.pad(cand_y, ((0, 0), (0, 128 - kk)), mode="edge")
    cand_x = jnp.pad(cand_x, ((0, 0), (0, 128 - kk)), mode="edge")
    stack = stack.reshape((nf * pel * pel,) + stack.shape[-2:])

    kernel = functools.partial(_fetch_kernel, bs_y=bs_y, bs_x=bs_x,
                               pel=pel, chunk=chunk, k=kk,
                               n_pad=(nb_pad if nf > 1 else 0))
    z = np.int32(0)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, kk, bs_y, bs_x),
                               lambda g: (g, z, z, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, wy, wx), stack.dtype),
            pltpu.SMEM((2, chunk, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((n, kk, bs_y, bs_x), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cand_y, cand_x, stack)
    out = out.reshape((nf, nb_pad) + out.shape[1:])[:, :nblk]
    return out if batched else out[0]


@functools.lru_cache(maxsize=None)
def _fetch_vmappable(bs_y, bs_x, pel):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(stack, cand_y, cand_x):
        return fetch_blocks_pallas(stack, cand_y, cand_x, bs_y, bs_x,
                                   pel)

    @f.def_vmap
    def _rule(axis_size, in_batched, stack, cand_y, cand_x):
        def bc(x, is_b):
            return x if is_b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
        out = fetch_blocks_pallas(
            bc(stack, in_batched[0]), bc(cand_y, in_batched[1]),
            bc(cand_x, in_batched[2]), bs_y, bs_x, pel)
        return out, True

    return f


def fetch_blocks(stack, cand_y, cand_x, bs_y: int, bs_x: int, pel: int):
    """vmap-aware fetch_blocks_pallas (frame batches fold into the
    kernel grid)."""
    return _fetch_vmappable(bs_y, bs_x, pel)(stack, cand_y, cand_x)
