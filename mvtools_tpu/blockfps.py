"""mv.BlockFPS equivalent: block-based frame-rate conversion.

Equivalent of MVBlockFPS.c: per-block motion-compensated fetch from both
neighbour frames with mode 0-8 combination rules (RealResultBlock
:117-228), occlusion = product of forward/backward small masks (MultMasks
:93-101), both non-overlapped and windowed overlap-add assembly, and
time-weighted blending of uncovered margins.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp

from .core.thscd import is_usable, scale_thscd
from .core.types import AnalysisMeta, MVField, check_similarity
from .degrain import gather_blocks
from .flowutils import FlowGeometry
from .ops import maskfun, overlap as overlap_ops, resize
from .super import Super

I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class BlockFPSConfig:
    """mv.BlockFPS parameters (MVBlockFPS.c create)."""
    num: int = 0
    den: int = 1
    mode: int = 3
    ml: float = 100.0
    blend: bool = True
    thscd1: int = 400
    thscd2: int = 130

    def __post_init__(self):
        if not 0 <= self.mode <= 8:
            raise ValueError("BlockFPS: mode must be between 0 and 8 (inclusive).")


def _median(a, b, c):
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def _trunc_div(a, b: int):
    if b == 1:
        return a
    return jnp.sign(a) * (jnp.abs(a) // b)


def blockfps_frame(src_planes: Sequence[jnp.ndarray],
                   ref_planes: Sequence[jnp.ndarray],
                   src_super: Super, ref_super: Super,
                   mv_b: MVField, mv_f: MVField,
                   meta: AnalysisMeta, cfg: BlockFPSConfig,
                   time256: int) -> List[jnp.ndarray]:
    """Synthesise the intermediate frame between nleft (src) and nright
    (ref).  mv_b = mvbw at nleft, mv_f = mvfw at nright."""
    if time256 == 0:
        return list(src_planes)
    if time256 == 256:
        return list(ref_planes)

    if mv_b.meta is not None and mv_f.meta is not None:
        check_similarity(mv_b.meta, mv_f.meta, "BlockFPS", "mvbw", "mvfw")
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "BlockFPS")
    usable = jnp.logical_and(is_usable(mv_b, nscd1, nscd2),
                             is_usable(mv_f, nscd1, nscd2))
    geo = FlowGeometry.from_meta(meta)
    mode = cfg.mode
    pel = meta.pel
    log_pel = pel.bit_length() - 1
    bits = meta.bits_per_sample
    nbx, nby = meta.blk_x, meta.blk_y
    bsx, bsy = meta.blk_size_x, meta.blk_size_y
    ovx, ovy = meta.overlap_x, meta.overlap_y
    logx = meta.x_ratio_uv.bit_length() - 1
    logy = meta.y_ratio_uv.bit_length() - 1
    width_b = (bsx - ovx) * nbx + ovx
    height_b = (bsy - ovy) * nby + ovy

    fb = mv_b.levels[0]
    ff = mv_f.levels[0]

    # small masks (mode dependent, MVBlockFPS.c:170-205)
    need_masks = 3 <= mode <= 8
    need_occ = mode in (4, 5, 7, 8)
    mask_small_f = mask_small_b = occ_small = None
    if need_masks:
        if mode <= 5:
            mask_small_f = maskfun.make_vector_occlusion_mask_time(
                ff.x, ff.y, False, float(cfg.ml), 1.0, pel, time256,
                bsx - ovx, bsy - ovy)
            mask_small_b = maskfun.make_vector_occlusion_mask_time(
                fb.x, fb.y, True, float(cfg.ml), 1.0, pel, 256 - time256,
                bsx - ovx, bsy - ovy)
        else:
            mask_small_f = maskfun.make_sad_mask_time(
                ff.x, ff.y, ff.sad, 4.0 / (cfg.ml * bsx * bsy), 1.0, pel,
                time256, bsx - ovx, bsy - ovy, bits)
            mask_small_b = maskfun.make_sad_mask_time(
                fb.x, fb.y, fb.sad, 4.0 / (cfg.ml * bsx * bsy), 1.0, pel,
                256 - time256, bsx - ovx, bsy - ovy, bits)
        mask_small_f = maskfun.check_and_pad_mask(mask_small_f, geo.nblkx_p,
                                                  geo.nblky_p)
        mask_small_b = maskfun.check_and_pad_mask(mask_small_b, geo.nblkx_p,
                                                  geo.nblky_p)
        if need_occ:
            occ_small = (mask_small_f * mask_small_b) // 255

    by_g, bx_g = jnp.meshgrid(jnp.arange(nby, dtype=I32),
                              jnp.arange(nbx, dtype=I32), indexing="ij")
    pos_x = bx_g * (bsx - ovx)
    pos_y = by_g * (bsy - ovy)

    # MC positions in pel units (MVBlockFPS.c:477-483): block pos * pel +
    # (v * t) >> 8 (arithmetic shift).
    mcb_x = (pos_x << log_pel) + ((fb.x * (256 - time256)) >> 8)
    mcb_y = (pos_y << log_pel) + ((fb.y * (256 - time256)) >> 8)
    mcf_x = (pos_x << log_pel) + ((ff.x * time256) >> 8)
    mcf_y = (pos_y << log_pel) + ((ff.y * time256) >> 8)

    out = []
    nplanes = len(src_planes)
    for plane in range(nplanes):
        sub_x = logx if plane else 0
        sub_y = logy if plane else 0
        xr = meta.x_ratio_uv if plane else 1
        yr = meta.y_ratio_uv if plane else 1
        p_bsx, p_bsy = bsx >> sub_x, bsy >> sub_y
        p_ovx, p_ovy = ovx >> sub_x, ovy >> sub_y
        p_wb, p_hb = width_b >> sub_x, height_b >> sub_y
        p_w = meta.width >> sub_x
        p_h = meta.height >> sub_y
        hpad_p = meta.hpadding >> sub_x
        vpad_p = meta.vpadding >> sub_y

        def stack(sup):
            arr = sup.planes[plane][0]
            return arr if arr.ndim == 3 else arr[None]

        ref_stack_b = stack(ref_super)   # B vectors point into ref (nright)
        ref_stack_f = stack(src_super)   # F vectors point into src (nleft)

        def gather_mc(stk, mx, my):
            # positions already in pel units; chroma divides (truncating)
            import jax as _jax
            gx = _trunc_div(mx, xr) + hpad_p * pel
            gy = _trunc_div(my, yr) + vpad_p * pel
            stk_pel = int(stk.shape[0] ** 0.5)
            m = stk_pel - 1
            lp = max(stk_pel.bit_length() - 1, 0)

            def one(x, y):
                idx = (x & m) | ((y & m) << lp)
                blk = _jax.lax.dynamic_slice(stk, (idx, y >> lp, x >> lp),
                                             (1, p_bsy, p_bsx))
                return blk[0].astype(I32)

            return _jax.vmap(one)(gx.reshape(-1), gy.reshape(-1)).reshape(
                nby, nbx, p_bsy, p_bsx)

        mcb = gather_mc(ref_stack_b, mcb_x, mcb_y)
        mcf = gather_mc(ref_stack_f, mcf_x, mcf_y)

        # src/ref unpadded planes (from the supers)
        def unpadded(sup):
            arr = sup.planes[plane][0]
            base = arr[0] if arr.ndim == 3 else arr
            return base[vpad_p:vpad_p + p_h, hpad_p:hpad_p + p_w].astype(I32)

        src_u = unpadded(src_super)
        ref_u = unpadded(ref_super)

        sp_x = pos_x >> sub_x
        sp_y = pos_y >> sub_y
        zeros = jnp.zeros_like(pos_x)
        src_blocks = gather_blocks(src_u[None], sp_x, sp_y, zeros, zeros,
                                   p_bsy, p_bsx, 0, 0, 0,
                                   pitch_fp=p_bsx - p_ovx)
        ref_blocks = gather_blocks(ref_u[None], sp_x, sp_y, zeros, zeros,
                                   p_bsy, p_bsx, 0, 0, 0,
                                   pitch_fp=p_bsx - p_ovx)

        # full-res masks, sliced per block
        def mask_blocks(small):
            if plane:
                full = resize.simple_resize(small, geo.height_p // yr,
                                            geo.width_p // xr)
            else:
                full = resize.simple_resize(small, geo.height_p, geo.width_p)
            return gather_blocks(full[None], sp_x, sp_y, zeros, zeros,
                                 p_bsy, p_bsx, 0, 0, 0,
                                 pitch_fp=p_bsx - p_ovx)

        mb = mask_blocks(mask_small_b) if need_masks else None
        mf = mask_blocks(mask_small_f) if need_masks else None
        occ = mask_blocks(occ_small) if need_occ else None

        t = time256
        if mode == 0:
            blocks = (mcb * t + mcf * (256 - t)) >> 8
        elif mode == 1:
            mca = (mcb * t + mcf * (256 - t)) >> 8
            blocks = _median(ref_blocks, src_blocks, mca)
        elif mode == 2:
            avg = (ref_blocks * t + src_blocks * (256 - t)) >> 8
            blocks = _median(avg, mcb, mcf)
        elif mode in (3, 6):
            blocks = (((mb * mcf + (255 - mb) * mcb + 255) >> 8) * t
                      + ((mf * mcb + (255 - mf) * mcf + 255) >> 8) * (256 - t)
                      ) >> 8
        elif mode in (4, 7):
            f = (mf * mcb + (255 - mf) * mcf + 255) >> 8
            b = (mb * mcf + (255 - mb) * mcb + 255) >> 8
            avg = (ref_blocks * t + src_blocks * (256 - t) + 255) >> 8
            m = (b * t + f * (256 - t)) >> 8
            blocks = (avg * occ + m * (255 - occ) + 255) >> 8
        else:  # 5, 8: show occlusion mask
            blocks = occ << (bits - 8)

        blended = maskfun.blend(src_u, ref_u, t, bits)
        if ovx == 0 and ovy == 0:
            grid = blocks.transpose(0, 2, 1, 3).reshape(nby * p_bsy,
                                                        nbx * p_bsx)
            res = blended.at[:nby * p_bsy, :nbx * p_bsx].set(grid)
        else:
            wins = overlap_ops.overlap_windows(p_bsx, p_bsy, p_ovx, p_ovy)
            acc = overlap_ops.overlap_add(blocks, nbx, nby, (p_bsx, p_bsy),
                                          (p_ovx, p_ovy), wins)
            pix = overlap_ops.to_pixels(acc, bits)
            res = blended.at[:p_hb, :p_wb].set(pix)

        src_p = src_planes[plane].astype(I32)
        ref_p = ref_planes[plane].astype(I32)
        if cfg.blend:
            fallback = maskfun.blend(src_p, ref_p, t, bits)
        else:
            fallback = src_p
        out.append(jnp.where(usable, res, fallback
                             ).astype(src_planes[plane].dtype))
    return out
