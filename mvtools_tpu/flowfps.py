"""mv.FlowFPS equivalent: motion-interpolated frame-rate conversion.

Equivalent of MVFlowFPS.c.  The reference wraps each MV clip in an internal
FlowFPSHelper filter so the host scheduler caches/parallelises the full-res
vector fields (MVFlowFPSHelper.c:11-110); here those fields are pure
functions of the MV field and XLA schedules them.  An output frame n of an
fa/fb retimed clip maps to source pair (nleft, nleft+off) with fractional
position time256 (MVFlowFPS.c:94-136); time256 == 0/256 passes the source
frame through, scene changes blend or repeat (:479-519).
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import List, Optional, Sequence, Tuple

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
class FlowFPSConfig:
    """mv.FlowFPS parameters (MVFlowFPS.c:531-620)."""
    num: int = 0               # output fps numerator (0 -> x2)
    den: int = 1
    maskmode: int = 2
    ml: float = 100.0
    blend: bool = True
    thscd1: int = 400
    thscd2: int = 130

    def __post_init__(self):
        if self.maskmode not in (0, 1, 2):
            raise ValueError("FlowFPS: mask must be 0, 1 or 2.")


def output_frame_mapping(n: int, fa: Fraction, off: int) -> Tuple[int, int, int]:
    """Map output frame n to (nleft, nright, time256)
    (MVFlowFPS.c:94-136).  fa = input_fps/output_fps as an exact fraction."""
    nleft = int(n * fa)
    time256 = int((float(n * fa) - nleft) * 256 + 0.5)
    if off > 1:
        time256 = time256 // off
    return nleft, nleft + off, time256


def flowfps_frame(src_planes: Sequence[jnp.ndarray],
                  ref_planes: Sequence[jnp.ndarray],
                  src_super: Super, ref_super: Super,
                  mv_b: MVField, mv_f: MVField,
                  meta: AnalysisMeta, cfg: FlowFPSConfig, time256: int,
                  mv_bb: Optional[MVField] = None,
                  mv_ff: Optional[MVField] = None) -> List[jnp.ndarray]:
    """Synthesise the intermediate frame at `time256` between nleft (src)
    and nright (ref).  mv_b = mvbw at nleft, mv_f = mvfw at nright;
    mv_bb/mv_ff = mvbw at nright / mvfw at nleft (maskmode 2)."""
    if time256 == 0:
        return list(src_planes)
    if time256 == 256:
        return list(ref_planes)

    if mv_b.meta is not None and mv_f.meta is not None:
        check_similarity(mv_b.meta, mv_f.meta, "FlowFPS", "mvbw", "mvfw")
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "FlowFPS")
    usable = jnp.logical_and(is_usable(mv_b, nscd1, nscd2),
                             is_usable(mv_f, nscd1, nscd2))
    geo = FlowGeometry.from_meta(meta)
    pel = meta.pel

    vxb_s, vyb_s = small_vector_fields(mv_b, meta, geo)
    vxf_s, vyf_s = small_vector_fields(mv_f, meta, geo)
    mask_b_small = occlusion_mask_small(mv_b, meta, True, cfg.ml,
                                        256 - time256)
    mask_f_small = occlusion_mask_small(mv_f, meta, False, cfg.ml, time256)

    extra = cfg.maskmode == 2 and mv_bb is not None and mv_ff is not None
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
        if chroma:
            w = meta.width // meta.x_ratio_uv
            h = meta.height // meta.y_ratio_uv
            oy = (meta.vpadding // meta.y_ratio_uv) * pel
            ox = (meta.hpadding // meta.x_ratio_uv) * pel
        else:
            w, h = meta.width, meta.height
            oy = meta.vpadding * pel
            ox = meta.hpadding * pel
        vxb, vyb = upsize_vectors(vxb_s, vyb_s, meta, geo, chroma)
        vxf, vyf = upsize_vectors(vxf_s, vyf_s, meta, geo, chroma)
        mb = upsize_mask(mask_b_small, meta, geo, chroma)[:h, :w]
        mf = upsize_mask(mask_f_small, meta, geo, chroma)[:h, :w]
        vxb, vyb = vxb[:h, :w], vyb[:h, :w]
        vxf, vyf = vxf[:h, :w], vyf[:h, :w]
        pref_b = fine_ref[p].astype(I32)
        pref_f = fine_src[p].astype(I32)

        if cfg.maskmode == 0:
            res = maskfun.flow_inter_simple(pref_b, pref_f, oy, ox, vxb, vxf,
                                            vyb, vyf, mb, mf, time256, pel)
        elif cfg.maskmode == 1 or not extra:
            res = maskfun.flow_inter(pref_b, pref_f, oy, ox, vxb, vxf, vyb,
                                     vyf, mb, mf, time256, pel)
        else:
            vxbb, vybb = upsize_vectors(vxbb_s, vybb_s, meta, geo, chroma)
            vxff, vyff = upsize_vectors(vxff_s, vyff_s, meta, geo, chroma)
            rich = maskfun.flow_inter_extra(
                pref_b, pref_f, oy, ox, vxb, vxf, vyb, vyf, mb, mf, time256,
                pel, vxbb[:h, :w], vxff[:h, :w], vybb[:h, :w], vyff[:h, :w])
            plain = maskfun.flow_inter(pref_b, pref_f, oy, ox, vxb, vxf,
                                       vyb, vyf, mb, mf, time256, pel)
            res = jnp.where(extra_usable, rich, plain)

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
