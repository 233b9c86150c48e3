"""mv.Super equivalent: build the hierarchical sub-pel pyramid.

The reference packs all pyramid levels and sub-pel planes into one tall
video frame (MVSuper.c:43-126, PlaneSuperOffset MVFrame.cpp:1229-1247) — a
VapourSynth transport hack.  Here a super frame is a structured pytree:
for each color plane, a tuple of levels, where level 0 carries its pel*pel
sub-pel planes as a leading axis [pel^2, PH, PW] and coarser levels are
single padded planes [PH_k, PW_k].

Pipeline per plane (mvsuperGetFrame MVSuper.c:78-103):
  1. level 0 = source plane surrounded by zeros (frame memset),
  2. reduce level k -> k+1 with the rfilter (level 0 source has zero
     context; deeper levels replicate-padded context), pad each level,
  3. replicate-pad level 0,
  4. sub-pel refine level 0 (or import from an external pel clip).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .core import geometry
from .core.config import SuperConfig, SuperSpec
from .core.types import VideoFormat
from .ops import interp, reduce as reduce_ops
from .ops.pad import pad_replicate


@jax.tree_util.register_pytree_node_class
class Super:
    """Super pyramid of one frame.

    planes: tuple (one entry per color plane) of tuples of per-level arrays.
    Level 0 arrays have shape [pel*pel, PH, PW]; level k>0 arrays [PH, PW].
    dtype matches the clip (uint8/uint16).
    """

    def __init__(self, planes: Tuple[Tuple[jnp.ndarray, ...], ...], spec: SuperSpec):
        self.planes = tuple(tuple(lv for lv in p) for p in planes)
        self.spec = spec

    def tree_flatten(self):
        return (self.planes,), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(children[0], spec)

    def level_plane(self, plane: int, level: int) -> jnp.ndarray:
        return self.planes[plane][level]

    @property
    def num_planes(self) -> int:
        return len(self.planes)

    def __repr__(self):
        return (f"Super(levels={self.spec.levels}, pel={self.spec.pel}, "
                f"planes={self.num_planes})")


# A clip of super frames: same pytree with a leading frame axis on every leaf.
SuperClip = Super


def _plane_geometries(spec: SuperSpec, plane: int) -> List[geometry.LevelGeometry]:
    geos = geometry.level_geometries(
        spec.width, spec.height, spec.hpad, spec.vpad, spec.pel,
        spec.levels, spec.x_ratio_uv, spec.y_ratio_uv)
    if plane == 0:
        return geos
    return [geometry.chroma_geometry(g, spec.x_ratio_uv, spec.y_ratio_uv)
            for g in geos]


def build_super_plane(plane: jnp.ndarray, spec: SuperSpec, plane_idx: int,
                      pel_plane: Optional[jnp.ndarray] = None,
                      pel_plane_padded: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Build all pyramid levels for one color plane.

    plane: [H, W] source plane (uint8/uint16).
    pel_plane: optional externally upsampled plane (mv.Super pelclip).
    """
    geos = _plane_geometries(spec, plane_idx)
    dtype = plane.dtype
    out: List[jnp.ndarray] = []

    # Level 0: replicate-padded source.
    lv0 = plane.astype(jnp.int32)
    lv0_padded = pad_replicate(lv0, geos[0].hpad, geos[0].vpad)

    # Reduce chain.  The source region for level0->1 is the unpadded plane
    # with zero context (the frame memset); for deeper levels the previously
    # padded plane supplies replicate context (MVFrame.cpp:1928-1933).
    unpadded = [lv0]
    padded = [lv0_padded]
    for lv in range(1, spec.levels):
        src_geo, dst_geo = geos[lv - 1], geos[lv]
        if lv == 1:
            src_region = unpadded[0]
            zero_context = True
        else:
            # take the unpadded region plus the replicate padding below/right
            ppad = padded[lv - 1]
            src_region = ppad[src_geo.vpad:, src_geo.hpad:]
            zero_context = False
        red = reduce_ops.rb2(src_region[:src_geo.height + 4, :src_geo.width + 4]
                             if zero_context else src_region,
                             dst_geo.height, dst_geo.width, spec.rfilter,
                             zero_context)
        unpadded.append(red)
        padded.append(pad_replicate(red, dst_geo.hpad, dst_geo.vpad))

    # Level 0 sub-pel planes.
    if spec.pel == 1:
        out.append(lv0_padded.astype(dtype)[None])
    else:
        if pel_plane is not None:
            subplanes = interp.import_pel_subplanes(
                pel_plane.astype(jnp.int32), spec.pel, geos[0].hpad,
                geos[0].vpad, pel_plane_padded)
            subplanes[0] = lv0_padded
        else:
            subplanes = interp.refine_subplanes(
                lv0_padded, spec.pel, spec.sharp, spec.bits)
        out.append(jnp.stack([p.astype(dtype) for p in subplanes], axis=0))

    for lv in range(1, spec.levels):
        out.append(padded[lv].astype(dtype))
    return tuple(out)


def build_super(frame_planes: Sequence[jnp.ndarray], cfg_or_spec,
                fmt: Optional[VideoFormat] = None,
                pel_planes: Optional[Sequence[jnp.ndarray]] = None,
                pel_planes_padded: bool = False) -> Super:
    """Build a Super pyramid from a frame's planes.

    frame_planes: [Y] or [Y, U, V] arrays ([H, W], uint8/uint16).
    cfg_or_spec: a SuperConfig (resolved against `fmt`) or a SuperSpec.
    """
    if isinstance(cfg_or_spec, SuperConfig):
        if fmt is None:
            h, w = frame_planes[0].shape
            bits = 8 if frame_planes[0].dtype == jnp.uint8 else 16
            from .core.types import ColorFamily
            if len(frame_planes) == 1:
                family = ColorFamily.GRAY
            else:
                ch, cw = frame_planes[1].shape
                family = {(2, 2): ColorFamily.YUV420,
                          (2, 1): ColorFamily.YUV422,
                          (1, 2): ColorFamily.YUV440,
                          (1, 1): ColorFamily.YUV444}[(w // cw, h // ch)]
            fmt = VideoFormat(w, h, bits, family)
        spec = cfg_or_spec.validate(fmt)
    else:
        spec = cfg_or_spec

    nplanes = spec.num_planes
    planes = []
    for p in range(nplanes):
        pel_p = pel_planes[p] if pel_planes is not None else None
        planes.append(build_super_plane(frame_planes[p], spec, p, pel_p,
                                        pel_planes_padded))
    return Super(tuple(planes), spec)
