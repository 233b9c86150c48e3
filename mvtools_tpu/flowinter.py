"""mv.FlowInter equivalent: time-interpolated intermediate frame.

Equivalent of MVFlowInter.c: forward+backward full-res vector fields with
occlusion masks, per-pixel two-sided interpolation (FlowInter /
FlowInterExtra kernels), and time-weighted Blend fallback on scene change
(:419-446).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp

from .core.thscd import is_usable, scale_thscd
from .core.types import AnalysisMeta, MVField, check_similarity
from .finest import finest as make_finest
from .flowutils import (FlowGeometry, occlusion_mask_small,
                        small_vector_fields, upsize_mask, upsize_vectors)
from .ops import maskfun
from .super import Super

I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class FlowInterConfig:
    """mv.FlowInter parameters (MVFlowInter.c:470-530)."""
    time: float = 50.0
    ml: float = 100.0
    blend: bool = True
    thscd1: int = 400
    thscd2: int = 130

    def __post_init__(self):
        if not 0.0 <= self.time <= 100.0:
            raise ValueError(
                "FlowInter: time must be between 0.0 and 100.0 (inclusive).")

    @property
    def time256(self) -> int:
        return int(self.time * 256 / 100)


def _plane_geom(meta, chroma, pel):
    if chroma:
        w = meta.width // meta.x_ratio_uv
        h = meta.height // meta.y_ratio_uv
        oy = (meta.vpadding // meta.y_ratio_uv) * pel
        ox = (meta.hpadding // meta.x_ratio_uv) * pel
    else:
        w, h = meta.width, meta.height
        oy = meta.vpadding * pel
        ox = meta.hpadding * pel
    return w, h, oy, ox


def flowinter(src_planes: Sequence[jnp.ndarray],
              ref_planes: Sequence[jnp.ndarray],
              src_super: Super, ref_super: Super,
              mv_b: MVField, mv_f: MVField,
              meta: AnalysisMeta, cfg: FlowInterConfig,
              mv_bb: Optional[MVField] = None,
              mv_ff: Optional[MVField] = None) -> List[jnp.ndarray]:
    """Interpolate between frame n (src) and n+off (ref) at cfg.time.

    mv_b: backward vectors at frame n; mv_f: forward vectors at frame n+off
    (MVFlowInter.c:119-131).  mv_bb / mv_ff: the extra fields (mvbw at
    n+off / mvfw at n, :264-276) enabling the median-corrected kernel.
    src_planes/ref_planes: the ordinary clip frames for the blend fallback.
    """
    if mv_b.meta is not None and mv_f.meta is not None:
        check_similarity(mv_b.meta, mv_f.meta, "FlowInter", "mvbw", "mvfw")
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "FlowInter")
    usable = jnp.logical_and(is_usable(mv_b, nscd1, nscd2),
                             is_usable(mv_f, nscd1, nscd2))
    geo = FlowGeometry.from_meta(meta)
    time256 = cfg.time256
    pel = meta.pel

    vxb_s, vyb_s = small_vector_fields(mv_b, meta, geo)
    vxf_s, vyf_s = small_vector_fields(mv_f, meta, geo)
    mask_b_small = occlusion_mask_small(mv_b, meta, True, cfg.ml,
                                        256 - time256)
    mask_f_small = occlusion_mask_small(mv_f, meta, False, cfg.ml, time256)

    extra = mv_bb is not None and mv_ff is not None
    if extra:
        extra_usable = jnp.logical_and(is_usable(mv_bb, nscd1, nscd2),
                                       is_usable(mv_ff, nscd1, nscd2))
        vxbb_s, vybb_s = small_vector_fields(mv_bb, meta, geo)
        vxff_s, vyff_s = small_vector_fields(mv_ff, meta, geo)

    fine_src = make_finest(src_super)
    fine_ref = make_finest(ref_super)

    out = []
    for p in range(len(fine_src)):
        chroma = p > 0
        w, h, oy, ox = _plane_geom(meta, chroma, pel)
        vxb, vyb = upsize_vectors(vxb_s, vyb_s, meta, geo, chroma)
        vxf, vyf = upsize_vectors(vxf_s, vyf_s, meta, geo, chroma)
        mb = upsize_mask(mask_b_small, meta, geo, chroma)[:h, :w]
        mf = upsize_mask(mask_f_small, meta, geo, chroma)[:h, :w]
        vxb, vyb = vxb[:h, :w], vyb[:h, :w]
        vxf, vyf = vxf[:h, :w], vyf[:h, :w]
        pref_b = fine_ref[p].astype(I32)   # prefB = ref (n+off)
        pref_f = fine_src[p].astype(I32)   # prefF = src (n)

        plain = maskfun.flow_inter(pref_b, pref_f, oy, ox, vxb, vxf, vyb,
                                   vyf, mb, mf, time256, pel)
        if extra:
            vxbb, vybb = upsize_vectors(vxbb_s, vybb_s, meta, geo, chroma)
            vxff, vyff = upsize_vectors(vxff_s, vyff_s, meta, geo, chroma)
            rich = maskfun.flow_inter_extra(
                pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf, mb, mf, time256,
                pel, vxbb[:h, :w], vxff[:h, :w], vybb[:h, :w], vyff[:h, :w])
            res = jnp.where(extra_usable, rich, plain)
        else:
            res = plain

        src_p = src_planes[p].astype(I32)
        ref_p = ref_planes[p].astype(I32)
        if cfg.blend:
            fallback = maskfun.blend(src_p, ref_p, time256,
                                     meta.bits_per_sample)
        else:
            fallback = src_p
        out.append(jnp.where(usable, res, fallback
                             ).astype(src_planes[p].dtype))
    return out
