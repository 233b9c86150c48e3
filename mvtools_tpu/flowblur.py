"""mv.FlowBlur equivalent: motion blur along the flow paths.

Equivalent of MVFlowBlur.c: for each pixel, average samples along the
backward and forward motion paths; the step count per pixel is
max(|v*blur256|)/prec >> 8 (RealFlowBlur :72-128).  The data-dependent path
length becomes a masked fixed-bound loop (max_steps) — contributions past a
pixel's own step count are masked out, keeping shapes static for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .core.thscd import is_usable, scale_thscd
from .core.types import AnalysisMeta, MVField, check_similarity
from .finest import finest as make_finest
from .flowutils import FlowGeometry, small_vector_fields, upsize_vectors
from .super import Super

I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class FlowBlurConfig:
    """mv.FlowBlur parameters (MVFlowBlur.c:396-460)."""
    blur: float = 50.0
    prec: int = 1
    thscd1: int = 400
    thscd2: int = 130
    max_steps: int = 128   # static bound on the per-pixel path length

    def __post_init__(self):
        if not 0.0 <= self.blur <= 200.0:
            raise ValueError("FlowBlur: blur must be between 0 and 200 (inclusive).")
        if self.prec < 1:
            raise ValueError("FlowBlur: prec must be at least 1.")

    @property
    def blur256(self) -> int:
        return int(self.blur * 256 / 200)


def _trunc_div(a, b):
    return jnp.sign(a) * (jnp.abs(a) // jnp.maximum(jnp.abs(b), 1))


def _path_sum(pref, oy, ox, vx_full, vy_full, blur256, prec, pel_log,
              max_steps):
    """Accumulate samples along one direction's motion path; returns
    (sum, steps)."""
    h, w = vx_full.shape
    h_idx = jnp.arange(h, dtype=I32)[:, None]
    w_idx = jnp.arange(w, dtype=I32)[None, :]
    vx0 = vx_full * blur256
    vy0 = vy_full * blur256
    m = (jnp.maximum(jnp.abs(vx0), jnp.abs(vy0)) // prec) >> 8
    m = jnp.minimum(m, max_steps)
    step_x = jnp.where(m > 0, _trunc_div(vx0, m), 0)
    step_y = jnp.where(m > 0, _trunc_div(vy0, m), 0)

    def body(i, acc):
        total, vx, vy = acc
        active = i < m
        y = jnp.clip((h_idx << pel_log) + (vy >> 8) + oy, 0,
                     pref.shape[0] - 1)
        x = jnp.clip((w_idx << pel_log) + (vx >> 8) + ox, 0,
                     pref.shape[1] - 1)
        sample = pref[y, x]
        total = total + jnp.where(active, sample, 0)
        return (total, vx + step_x, vy + step_y)

    total0 = jnp.zeros((h, w), I32)
    total, _, _ = jax.lax.fori_loop(0, max_steps, body,
                                    (total0, step_x, step_y))
    return total, m


def flowblur(src_planes: Sequence[jnp.ndarray], src_super: Super,
             mv_b: MVField, mv_f: MVField, meta: AnalysisMeta,
             cfg: FlowBlurConfig) -> List[jnp.ndarray]:
    """Blur frame n along its own backward/forward flow
    (mvbw and mvfw both at frame n)."""
    if mv_b.meta is not None and mv_f.meta is not None:
        check_similarity(mv_b.meta, mv_f.meta, "FlowBlur", "mvbw", "mvfw")
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "FlowBlur")
    usable = jnp.logical_and(is_usable(mv_b, nscd1, nscd2),
                             is_usable(mv_f, nscd1, nscd2))
    geo = FlowGeometry.from_meta(meta)
    pel = meta.pel
    pel_log = pel.bit_length() - 1
    blur256 = cfg.blur256

    vxb_s, vyb_s = small_vector_fields(mv_b, meta, geo)
    vxf_s, vyf_s = small_vector_fields(mv_f, meta, geo)
    fine = make_finest(src_super)

    out = []
    for p in range(len(fine)):
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
        vxb, vyb = vxb[:h, :w], vyb[:h, :w]
        vxf, vyf = vxf[:h, :w], vyf[:h, :w]
        pref = fine[p].astype(I32)
        h_idx = jnp.arange(h, dtype=I32)[:, None]
        w_idx = jnp.arange(w, dtype=I32)[None, :]
        base = pref[jnp.clip((h_idx << pel_log) + oy, 0, pref.shape[0] - 1),
                    jnp.clip((w_idx << pel_log) + ox, 0, pref.shape[1] - 1)]
        sum_f, m_f = _path_sum(pref, oy, ox, vxf, vyf, blur256, cfg.prec,
                               pel_log, cfg.max_steps)
        sum_b, m_b = _path_sum(pref, oy, ox, vxb, vyb, blur256, cfg.prec,
                               pel_log, cfg.max_steps)
        res = (base + sum_f + sum_b) // (m_f + m_b + 1)
        fallback = src_planes[p].astype(I32)
        out.append(jnp.where(usable, res, fallback
                             ).astype(src_planes[p].dtype))
    return out
