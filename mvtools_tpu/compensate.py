"""mv.Compensate equivalent: motion-compensated frame.

TPU-first version of MVCompensate.c: all block patches are gathered from
the reference super in one vmapped pel-aware gather; blocks whose SAD fails
`thsad` fall back to the source-super patch (occlusion handling,
MVCompensate.c:233-246); overlapped assembly reuses the phase-decomposed
overlap-add; scene changes select a whole-frame copy (src or ref per
`scbehavior`, :319-364) with jnp.where, keeping shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .core.thscd import is_usable, scale_thscd
from .core.types import AnalysisMeta, MVField
from .degrain import gather_blocks
from .ops import overlap as overlap_ops
from .super import Super

I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class CompensateConfig:
    """mv.Compensate parameters (MVCompensate.c:421-476)."""
    scbehavior: bool = True     # on scene change: True -> keep src, False -> ref
    thsad: int = 10000
    fields: bool = False
    time: float = 100.0
    thscd1: int = 400
    thscd2: int = 130
    tff: Optional[bool] = None

    def __post_init__(self):
        if not 0.0 <= self.time <= 100.0:
            raise ValueError(
                "Compensate: time must be between 0.0 and 100.0 (inclusive).")

    @property
    def time256(self) -> int:
        return int(self.time * 256 / 100)


def _trunc_div256(v):
    """C `v * time256 / 256` truncation toward zero for possibly negative v."""
    return jnp.sign(v) * (jnp.abs(v) // 256)


def compensate(src_super: Super, ref_super: Super, mv: MVField,
               meta: AnalysisMeta, cfg: CompensateConfig,
               field_shift=0):
    """Compensate one frame; returns frame-sized planes (unpadded)."""
    sspec = src_super.spec
    bits = meta.bits_per_sample
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "Compensate")
    thsad = cfg.thsad * nscd1 // cfg.thscd1  # MVCompensate.c:521
    time256 = cfg.time256

    nbx, nby = meta.blk_x, meta.blk_y
    bsx, bsy = meta.blk_size_x, meta.blk_size_y
    ovx, ovy = meta.overlap_x, meta.overlap_y
    pel = meta.pel
    log_pel = pel.bit_length() - 1
    logx = meta.x_ratio_uv.bit_length() - 1
    logy = meta.y_ratio_uv.bit_length() - 1
    width_b = (bsx - ovx) * nbx + ovx
    height_b = (bsy - ovy) * nby + ovy

    finest = mv.levels[0]
    usable = is_usable(mv, nscd1, nscd2)

    by_g, bx_g = jnp.meshgrid(jnp.arange(nby, dtype=I32),
                              jnp.arange(nbx, dtype=I32), indexing="ij")
    pos_x = bx_g * (bsx - ovx)
    pos_y = by_g * (bsy - ovy)

    good = finest.sad < thsad
    # MC position in pel units (MVCompensate.c:239-240); fallback = source
    # block at the *non-overlapped* grid for ov=0, the overlapped grid
    # otherwise (:246-248, :293-295) — both equal pos_x/pos_y.
    mc_x = (pos_x << log_pel) + _trunc_div256(finest.x * time256)
    mc_y = (pos_y << log_pel) + _trunc_div256(finest.y * time256) + field_shift
    fb_x = (pos_x << log_pel)
    fb_y = (pos_y << log_pel) + field_shift

    vx = jnp.where(good, mc_x, fb_x) - (pos_x << log_pel)
    vy = jnp.where(good, mc_y, fb_y) - (pos_y << log_pel)

    num_planes = src_super.num_planes
    out_planes = []
    for plane in range(num_planes):
        sub_x = logx if plane else 0
        sub_y = logy if plane else 0
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

        ref_stack = stack(ref_super)
        src_stack = stack(src_super)

        rb = gather_blocks(ref_stack, pos_x, pos_y, vx, vy, p_bsy, p_bsx,
                           log_pel, hpad_p * pel, vpad_p * pel, sub_x, sub_y,
                           pitch_fp=p_bsx - p_ovx)
        zero = jnp.zeros_like(vx)
        sb = gather_blocks(src_stack, pos_x, pos_y, zero, zero + field_shift,
                           p_bsy, p_bsx, log_pel, hpad_p * pel, vpad_p * pel,
                           sub_x, sub_y, pitch_fp=p_bsx - p_ovx)
        blocks = jnp.where(good[..., None, None], rb, sb)

        src_plane0 = src_super.planes[plane][0]
        src_unpadded = (src_plane0[0] if src_plane0.ndim == 3 else src_plane0
                        )[vpad_p:vpad_p + p_h, hpad_p:hpad_p + p_w].astype(I32)
        ref_plane0 = ref_super.planes[plane][0]
        ref_unpadded = (ref_plane0[0] if ref_plane0.ndim == 3 else ref_plane0
                        )[vpad_p:vpad_p + p_h, hpad_p:hpad_p + p_w].astype(I32)
        sc_frame = src_unpadded if cfg.scbehavior else ref_unpadded

        if ovx == 0 and ovy == 0:
            grid = blocks.transpose(0, 2, 1, 3).reshape(nby * p_bsy,
                                                        nbx * p_bsx)
            out = sc_frame.at[:p_hb, :p_wb].set(grid[:p_hb, :p_wb])
        else:
            wins = overlap_ops.overlap_windows(p_bsx, p_bsy, p_ovx, p_ovy)
            acc = overlap_ops.overlap_add(blocks, nbx, nby, (p_bsx, p_bsy),
                                          (p_ovx, p_ovy), wins)
            pix = overlap_ops.to_pixels(acc, bits)
            out = sc_frame.at[:p_hb, :p_wb].set(pix)
        # uncovered margins come from scSrc (src or ref super, :319-340)
        # which is exactly sc_frame here; .set above only covered the block
        # region, so margins already hold sc_frame pixels.

        final = jnp.where(usable, out, sc_frame)
        dtype = src_plane0.dtype
        out_planes.append(final.astype(dtype))
    return out_planes
