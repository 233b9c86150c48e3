"""Flow toolbox: vector fields, occlusion/SAD masks, blend, flow kernels.

TPU-native equivalents of MaskFun.cpp.  The reference's serial span-update
occlusion loop (MakeVectorOcclusionMaskTime :85-132) becomes a dense
all-pairs max along each axis; the per-pixel flow interpolation kernels
(FlowInter* :374-555) become whole-plane gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

I32 = jnp.int32


def _trunc_div(a, b):
    """C integer division (truncate toward zero), b > 0."""
    return jnp.sign(a) * (jnp.abs(a) // b)


def check_and_pad_small(vx: jnp.ndarray, vy: jnp.ndarray, nblkx_p: int,
                        nblky_p: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad the [nblky, nblkx] vector grids to [nblky_p, nblkx_p]
    (CheckAndPadSmallY MaskFun.cpp:38-60): right columns replicate with vx
    clamped non-positive; bottom rows replicate with vy clamped
    non-positive."""
    nblky, nblkx = vx.shape
    if nblkx_p > nblkx:
        vx_right = jnp.minimum(vx[:, -1:], 0)
        vy_right = vy[:, -1:]
        vx = jnp.concatenate([vx] + [vx_right] * (nblkx_p - nblkx), axis=1)
        vy = jnp.concatenate([vy] + [vy_right] * (nblkx_p - nblkx), axis=1)
    if nblky_p > nblky:
        vx_bottom = vx[-1:, :]
        vy_bottom = jnp.minimum(vy[-1:, :], 0)
        vx = jnp.concatenate([vx] + [vx_bottom] * (nblky_p - nblky), axis=0)
        vy = jnp.concatenate([vy] + [vy_bottom] * (nblky_p - nblky), axis=0)
    return vx, vy


def check_and_pad_mask(mask: jnp.ndarray, nblkx_p: int, nblky_p: int) -> jnp.ndarray:
    """CheckAndPadMaskSmall (MaskFun.cpp:64-82): plain edge replication."""
    nblky, nblkx = mask.shape
    if nblkx_p > nblkx:
        mask = jnp.concatenate([mask] + [mask[:, -1:]] * (nblkx_p - nblkx),
                               axis=1)
    if nblky_p > nblky:
        mask = jnp.concatenate([mask] + [mask[-1:, :]] * (nblky_p - nblky),
                               axis=0)
    return mask


def vector_small_mask_y_to_half_uv(v: jnp.ndarray, ratio_uv: int) -> jnp.ndarray:
    """VectorSmallMaskYToHalfUV (MaskFun.cpp:183-203)."""
    return (v >> 1) if ratio_uv == 2 else v


def _byte_occ_value(occlusion, occnorm: float, gamma: float):
    """ByteOccMask value (MaskFun.cpp:85-91): 255*(occ*occnorm)^gamma,
    truncated and clamped to 255; 0 where occlusion <= 0."""
    occf = occlusion.astype(jnp.float64) * occnorm
    if gamma == 1.0:
        val = (255.0 * occf).astype(I32)
    else:
        val = (255.0 * jnp.power(occf, gamma)).astype(I32)
    val = jnp.minimum(val, 255)
    return jnp.where(occlusion > 0, val, 0)


def make_vector_occlusion_mask_time(vx: jnp.ndarray, vy: jnp.ndarray,
                                    is_backward: bool, mask_norm_divider: float,
                                    gamma: float, pel: int, time256,
                                    blk_step_x: int, blk_step_y: int) -> jnp.ndarray:
    """MakeVectorOcclusionMaskTime (MaskFun.cpp:94-132).

    vx/vy: [nblky, nblkx] int32 finest vectors.  Returns uint8-range int32
    occlusion mask [nblky, nblkx].
    """
    nblky, nblkx = vx.shape
    time4096x = time256 * 16 // (blk_step_x * pel)
    time4096y = time256 * 16 // (blk_step_y * pel)
    occnorm_x = 80.0 / (mask_norm_divider * blk_step_x * pel)
    occnorm_y = 80.0 / (mask_norm_divider * blk_step_y * pel)

    # X direction: block bx vs right neighbour
    occ_x = jnp.where(vx[:, 1:] < vx[:, :-1], vx[:, :-1] - vx[:, 1:], 0)
    occ_x = jnp.pad(occ_x, ((0, 0), (0, 1)))  # source bx in [0, nblkx-1)
    val_x = _byte_occ_value(occ_x, occnorm_x, gamma)
    shift_x = _trunc_div(occ_x * time4096x, 4096)
    if is_backward:
        minb_x = jnp.maximum(0, (jnp.arange(nblkx, dtype=I32) + 1)[None, :] - shift_x)
        maxb_x = jnp.broadcast_to(jnp.arange(nblkx, dtype=I32)[None, :] + 1,
                                  occ_x.shape)
    else:
        minb_x = jnp.broadcast_to(jnp.arange(nblkx, dtype=I32)[None, :],
                                  occ_x.shape)
        maxb_x = jnp.minimum((jnp.arange(nblkx, dtype=I32) + 1)[None, :] - shift_x,
                             nblkx - 1)
    # dense all-pairs: target bxi gets val_x[by, bx] if minb<=bxi<=maxb
    bxi = jnp.arange(nblkx, dtype=I32)[None, None, :]
    in_span = (bxi >= minb_x[:, :, None]) & (bxi <= maxb_x[:, :, None]) \
        & (occ_x[:, :, None] > 0)
    contrib_x = jnp.where(in_span, val_x[:, :, None], 0)
    mask = jnp.max(contrib_x, axis=1)  # [nblky, nblkx]

    # Y direction: block by vs bottom neighbour
    occ_y = jnp.where(vy[1:, :] < vy[:-1, :], vy[:-1, :] - vy[1:, :], 0)
    occ_y = jnp.pad(occ_y, ((0, 1), (0, 0)))
    val_y = _byte_occ_value(occ_y, occnorm_y, gamma)
    shift_y = _trunc_div(occ_y * time4096y, 4096)
    if is_backward:
        minb_y = jnp.maximum(0, (jnp.arange(nblky, dtype=I32) + 1)[:, None] - shift_y)
        maxb_y = jnp.broadcast_to(jnp.arange(nblky, dtype=I32)[:, None] + 1,
                                  occ_y.shape)
    else:
        minb_y = jnp.broadcast_to(jnp.arange(nblky, dtype=I32)[:, None],
                                  occ_y.shape)
        maxb_y = jnp.minimum((jnp.arange(nblky, dtype=I32) + 1)[:, None] - shift_y,
                             nblky - 1)
    # build [src_by, target_by, bx]: target byi gets val_y[src_by, bx]
    byi = jnp.arange(nblky, dtype=I32)[None, :, None]
    in_span_y = ((byi >= minb_y[:, None, :]) & (byi <= maxb_y[:, None, :])
                 & (occ_y[:, None, :] > 0))
    contrib_y = jnp.where(in_span_y, val_y[:, None, :], 0)
    mask_y = jnp.max(contrib_y, axis=0)  # [nblky, nblkx]

    return jnp.maximum(mask, mask_y)


def byte_norm(sad, sad_norm_factor: float, gamma: float):
    """ByteNorm (MaskFun.cpp:135-140)."""
    l = 255.0 * jnp.power(sad.astype(jnp.float64) * sad_norm_factor, gamma)
    return jnp.minimum(l, 255.0).astype(I32)


def make_sad_mask_time(vx, vy, sad, sad_norm_factor: float, gamma: float,
                       pel: int, time256, blk_step_x: int, blk_step_y: int,
                       bits: int) -> jnp.ndarray:
    """MakeSADMaskTime (MaskFun.cpp:143-166): SAD mask sampled at the
    time-projected block position."""
    nblky, nblkx = vx.shape
    time4096x = (256 - time256) * 16 // (blk_step_x * pel)
    time4096y = (256 - time256) * 16 // (blk_step_y * pel)
    by, bx = jnp.meshgrid(jnp.arange(nblky, dtype=I32),
                          jnp.arange(nblkx, dtype=I32), indexing="ij")
    bxi = bx - _trunc_div(vx * time4096x, 4096)
    byi = by - _trunc_div(vy * time4096y, 4096)
    oob = (bxi < 0) | (bxi >= nblkx) | (byi < 0) | (byi >= nblky)
    bxi = jnp.where(oob, bx, bxi)
    byi = jnp.where(oob, by, byi)
    sad_s = sad[byi, bxi] >> (bits - 8)
    return byte_norm(sad_s, sad_norm_factor, gamma)


def sad_to_mask(sad, sadnorm1024) -> jnp.ndarray:
    """SADToMask (MaskFun.cpp:340-345)."""
    l = sadnorm1024 * sad // 1024
    return jnp.minimum(l, 255).astype(I32)


def blend(src, ref, time256, bits: int):
    """Time-weighted blend (Blend MaskFun.cpp:348-371)."""
    s = src.astype(I32)
    r = ref.astype(I32)
    return (s * (256 - time256) + r * time256) >> 8


def _gather_fine(pref, oy, ox, h_idx, w_idx, vy, vx, pel_log: int):
    """pref[(h<<pel_log) + vy + oy, (w<<pel_log) + vx + ox] with clamping
    (the reference relies on frame padding; we clamp for safety — vectors
    produced by SimpleResize limiting stay in range anyway)."""
    y = (h_idx << pel_log) + vy + oy
    x = (w_idx << pel_log) + vx + ox
    y = jnp.clip(y, 0, pref.shape[0] - 1)
    x = jnp.clip(x, 0, pref.shape[1] - 1)
    return pref[y, x].astype(jnp.int64)


def _hw_grids(height, width):
    h_idx = jnp.arange(height, dtype=I32)[:, None]
    w_idx = jnp.arange(width, dtype=I32)[None, :]
    return h_idx, w_idx


def flow_inter(pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf, mask_b, mask_f,
               time256, pel: int):
    """FlowInter (MaskFun.cpp:374-417).  pref_*: finest planes; oy/ox:
    offset of the unpadded origin inside them.  vx/vy/masks: full-res int32
    fields.  Returns int64->int32 pixels."""
    pel_log = pel.bit_length() - 1
    h, w = vxb.shape
    h_idx, w_idx = _hw_grids(h, w)
    t = time256
    vxf_t = (vxf * t) >> 8
    vyf_t = (vyf * t) >> 8
    vxb_t = (vxb * (256 - t)) >> 8
    vyb_t = (vyb * (256 - t)) >> 8
    zero = jnp.zeros_like(vxf)
    dst_f = _gather_fine(pref_f, oy, ox, h_idx, w_idx, vyf_t, vxf_t, pel_log)
    dst_f0 = _gather_fine(pref_f, oy, ox, h_idx, w_idx, zero, zero, pel_log)
    dst_b = _gather_fine(pref_b, oy, ox, h_idx, w_idx, vyb_t, vxb_t, pel_log)
    dst_b0 = _gather_fine(pref_b, oy, ox, h_idx, w_idx, zero, zero, pel_log)
    mf = mask_f.astype(jnp.int64)
    mb = mask_b.astype(jnp.int64)
    out = ((((dst_f * (255 - mf)
              + ((mf * (dst_b * (255 - mb) + mb * dst_f0) + 255) >> 8) + 255) >> 8)
            * (256 - t)
            + ((dst_b * (255 - mb)
                + ((mb * (dst_f * (255 - mf) + mf * dst_b0) + 255) >> 8) + 255) >> 8)
            * t) >> 8)
    return out.astype(I32)


def flow_inter_extra(pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf,
                     mask_b, mask_f, time256, pel: int,
                     vxbb, vxff, vybb, vyff):
    """FlowInterExtra (MaskFun.cpp:420-488)."""
    pel_log = pel.bit_length() - 1
    h, w = vxb.shape
    h_idx, w_idx = _hw_grids(h, w)
    t = time256
    dst_f = _gather_fine(pref_f, oy, ox, h_idx, w_idx, (vyf * t) >> 8,
                         (vxf * t) >> 8, pel_log)
    dst_ff = _gather_fine(pref_f, oy, ox, h_idx, w_idx, (vyff * t) >> 8,
                          (vxff * t) >> 8, pel_log)
    dst_b = _gather_fine(pref_b, oy, ox, h_idx, w_idx, (vyb * (256 - t)) >> 8,
                         (vxb * (256 - t)) >> 8, pel_log)
    dst_bb = _gather_fine(pref_b, oy, ox, h_idx, w_idx, (vybb * (256 - t)) >> 8,
                          (vxbb * (256 - t)) >> 8, pel_log)
    minfb = jnp.minimum(dst_b, dst_f)
    maxfb = jnp.maximum(dst_b, dst_f)
    median_bb = jnp.maximum(minfb, jnp.minimum(dst_bb, maxfb))
    median_ff = jnp.maximum(minfb, jnp.minimum(dst_ff, maxfb))
    mf = mask_f.astype(jnp.int64)
    mb = mask_b.astype(jnp.int64)
    out = ((((median_bb * mf + dst_f * (255 - mf) + 255) >> 8) * (256 - t)
            + ((median_ff * mb + dst_b * (255 - mb) + 255) >> 8) * t) >> 8)
    return out.astype(I32)


def flow_inter_simple(pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf,
                      mask_b, mask_f, time256, pel: int):
    """FlowInterSimple (MaskFun.cpp:491-555), incl. the time256==128 fast
    path with its different rounding."""
    pel_log = pel.bit_length() - 1
    h, w = vxb.shape
    h_idx, w_idx = _hw_grids(h, w)
    t = time256
    mf = mask_f.astype(jnp.int64)
    mb = mask_b.astype(jnp.int64)

    def special(_):
        dst_f = _gather_fine(pref_f, oy, ox, h_idx, w_idx, vyf >> 1, vxf >> 1,
                             pel_log)
        dst_b = _gather_fine(pref_b, oy, ox, h_idx, w_idx, vyb >> 1, vxb >> 1,
                             pel_log)
        return (((dst_f + dst_b) << 8) + (dst_b - dst_f) * (mf - mb)) >> 9

    def general(_):
        dst_f = _gather_fine(pref_f, oy, ox, h_idx, w_idx, (vyf * t) >> 8,
                             (vxf * t) >> 8, pel_log)
        dst_b = _gather_fine(pref_b, oy, ox, h_idx, w_idx,
                             (vyb * (256 - t)) >> 8, (vxb * (256 - t)) >> 8,
                             pel_log)
        return (((dst_f * (255 - mf) + dst_b * mf + 255) >> 8) * (256 - t)
                + ((dst_b * (255 - mb) + dst_f * mb + 255) >> 8) * t) >> 8

    if isinstance(time256, int):
        out = special(None) if time256 == 128 else general(None)
    else:
        import jax
        out = jax.lax.cond(time256 == 128, special, general, None)
    return out.astype(I32)
