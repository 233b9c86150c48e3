"""mv.Flow equivalent: per-pixel warp by a motion-vector field.

Equivalent of MVFlow.cpp: upsizes the block MV field to full resolution and
either gathers ("Fetch" mode, :93-116) or scatters ("Shift" mode, :119-148)
pixels of the Finest-resolution reference.  The scatter reproduces the
reference's raster-order last-write-wins semantics via a per-target
source-order argmax instead of a serial loop.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp

from .core.thscd import is_usable, scale_thscd
from .core.types import AnalysisMeta, MVField
from .finest import finest as make_finest
from .flowutils import FlowGeometry, small_vector_fields, upsize_vectors
from .super import Super

I32 = jnp.int32

FLOW_FETCH = 0
FLOW_SHIFT = 1


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """mv.Flow parameters (MVFlow.cpp:391-470)."""
    time: float = 100.0
    mode: int = 0          # 0 fetch, 1 shift
    fields: bool = False
    thscd1: int = 400
    thscd2: int = 130
    tff: Optional[bool] = None

    def __post_init__(self):
        if not 0.0 <= self.time <= 100.0:
            raise ValueError("Flow: time must be between 0.0 and 100.0 (inclusive).")
        if self.mode not in (0, 1):
            raise ValueError("Flow: mode must be 0 or 1.")

    @property
    def time256(self) -> int:
        return int(self.time * 256 / 100)


def _fetch(plane_fine, oy, ox, vx_full, vy_full, time256, pel):
    """flowFetch (MVFlow.cpp:93-116): vx = (VX*time256 + 128) >> 8."""
    pel_log = pel.bit_length() - 1
    h, w = vx_full.shape
    h_idx = jnp.arange(h, dtype=I32)[:, None]
    w_idx = jnp.arange(w, dtype=I32)[None, :]
    vx = (vx_full * time256 + 128) >> 8
    vy = (vy_full * time256 + 128) >> 8
    y = jnp.clip((h_idx << pel_log) + vy + oy, 0, plane_fine.shape[0] - 1)
    x = jnp.clip((w_idx << pel_log) + vx + ox, 0, plane_fine.shape[1] - 1)
    return plane_fine[y, x]


def _shift(plane_fine, oy, ox, vx_full, vy_full, time256, pel, pixel_max):
    """flowShift (MVFlow.cpp:119-148): raster-order scatter, last write
    wins; uncovered pixels = pixel_max (:311-312)."""
    pel_log = pel.bit_length() - 1
    h, w = vx_full.shape
    h_idx = jnp.arange(h, dtype=I32)[:, None]
    w_idx = jnp.arange(w, dtype=I32)[None, :]
    rounding = 128 << pel_log
    shift = 8 + pel_log
    vx = (-vx_full * time256 + rounding) >> shift
    vy = (-vy_full * time256 + rounding) >> shift
    href = h_idx + vy
    wref = w_idx + vx
    valid = (href >= 0) & (href < h) & (wref >= 0) & (wref < w)
    src_vals = plane_fine[jnp.clip((h_idx << pel_log) + oy, 0,
                                   plane_fine.shape[0] - 1),
                          jnp.clip((w_idx << pel_log) + ox, 0,
                                   plane_fine.shape[1] - 1)].astype(I32)
    target = jnp.where(valid, href * w + wref, h * w)  # h*w = dump slot
    order = (h_idx * w + w_idx).reshape(-1)
    tgt_flat = target.reshape(-1)
    val_flat = src_vals.reshape(-1)
    # last raster write wins: keep the source with max order per target
    best = jnp.full((h * w + 1,), -1, I32).at[tgt_flat].max(order)
    win = best[tgt_flat] == order
    out_flat = jnp.full((h * w + 1,), pixel_max, I32)
    out_flat = out_flat.at[jnp.where(win, tgt_flat, h * w)].set(
        jnp.where(win, val_flat, pixel_max))
    return out_flat[:h * w].reshape(h, w)


def flow(clip_planes, ref_super: Super, mv: MVField, meta: AnalysisMeta,
         cfg: FlowConfig, field_shift=0) -> List[jnp.ndarray]:
    """Warp the reference toward the current frame.

    clip_planes: the fallback frame (returned on scene change).
    ref_super: super of the reference frame (provides the Finest planes).
    """
    nscd1, nscd2 = scale_thscd(cfg.thscd1, cfg.thscd2, meta, "Flow")
    usable = is_usable(mv, nscd1, nscd2)
    geo = FlowGeometry.from_meta(meta)
    time256 = cfg.time256
    pel = meta.pel
    bits = meta.bits_per_sample
    pixel_max = (1 << bits) - 1

    vx_small, vy_small = small_vector_fields(mv, meta, geo, field_shift)
    fine_planes = make_finest(ref_super)

    out = []
    for p, fine in enumerate(fine_planes):
        chroma = p > 0
        vx_full, vy_full = upsize_vectors(vx_small, vy_small, meta, geo,
                                          chroma)
        if chroma:
            w = meta.width // meta.x_ratio_uv
            h = meta.height // meta.y_ratio_uv
            oy = (meta.vpadding // meta.y_ratio_uv) * pel
            ox = (meta.hpadding // meta.x_ratio_uv) * pel
        else:
            w, h = meta.width, meta.height
            oy = meta.vpadding * pel
            ox = meta.hpadding * pel
        vx_full = vx_full[:h, :w]
        vy_full = vy_full[:h, :w]
        fine32 = fine.astype(I32)
        if cfg.mode == FLOW_FETCH:
            res = _fetch(fine32, oy, ox, vx_full, vy_full, time256, pel)
        else:
            res = _shift(fine32, oy, ox, vx_full, vy_full, time256, pel,
                         pixel_max)
        fallback = clip_planes[p].astype(I32)
        out.append(jnp.where(usable, res, fallback
                             ).astype(clip_planes[p].dtype))
    return out
