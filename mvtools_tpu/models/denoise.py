"""Flagship pipeline: motion-compensated temporal denoising of a clip.

The canonical mvtools graph Super -> Analyse(backward+forward) -> Degrain1
(BASELINE.json config 4), expressed as one pure jittable function over a
clip with a leading frame axis.  Throughput comes from vmapping the
per-frame computation across the batch; scale-out from sharding the frame
axis over a mesh (parallel.mesh) — the jnp.roll neighbour access becomes an
ICI collective permute.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..analyse import analyse
from ..core.config import AnalyseConfig, SuperConfig
from ..core.types import VideoFormat
from ..degrain import DegrainConfig, degrain
from ..super import build_super


def degrain1_frame(cur_planes, prev_planes, next_planes, sspec, aspec_b,
                   aspec_f, dcfg, engine: str = "lockstep"):
    """Denoise one frame given its neighbours (pure, jittable).

    The production path uses the lock-step whole-plane search engine
    (analyse.search_level_lockstep) — pass engine="exact" for the
    reference-parity sequential engine.
    """
    return degrain_n_frame(cur_planes, [prev_planes], [next_planes],
                           sspec, aspec_b, aspec_f, dcfg, engine=engine)


def degrain_n_frame(cur_planes, prev_list, next_list, sspec, aspec_b,
                    aspec_f, dcfg, engine: str = "lockstep"):
    """MDegrainN: denoise one frame from `radius = len(prev_list)`
    backward and forward neighbours (MVDegrains.cpp Degrain1-6,
    ref order per radius: bwd r, fwd r — requests :90-109).

    prev_list[i] / next_list[i] = planes of frames n-(i+1) / n+(i+1).
    """
    sup_cur = build_super(cur_planes, sspec)
    sups = []
    mvs = []
    for prev_planes, next_planes in zip(prev_list, next_list):
        sup_prev = build_super(prev_planes, sspec)
        sup_next = build_super(next_planes, sspec)
        mv_b = analyse(sup_cur, sup_next, aspec_b, engine=engine)
        mv_f = analyse(sup_cur, sup_prev, aspec_f, engine=engine)
        sups += [sup_next, sup_prev]
        mvs += [mv_b, mv_f]
    return degrain(cur_planes, sups, mvs, aspec_b.meta, dcfg)


def degrain1_clip(clip_planes: Sequence[jnp.ndarray], fmt: VideoFormat,
                  scfg: SuperConfig = SuperConfig(),
                  acfg: AnalyseConfig = AnalyseConfig(),
                  dcfg: DegrainConfig = DegrainConfig(),
                  engine: str = "exact"):
    """Denoise a whole clip.  clip_planes: [T, H, W] per color plane.

    Frame t uses neighbours t-1 / t+1 (wrapped at the clip edges via roll —
    the reference instead emits a default field there; the wrap keeps the
    computation shape-uniform and collective-friendly, and the first/last
    frame differ only in their reference choice).
    """
    import dataclasses
    sspec = scfg.validate(fmt)
    aspec_b = acfg.validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)

    prevs = [jnp.roll(p, 1, axis=0) for p in clip_planes]
    nexts = [jnp.roll(p, -1, axis=0) for p in clip_planes]

    def per_frame(cur, prev, nxt):
        # the clip path vmaps frames over the search; the exact engine
        # default keeps that composition light (the lockstep engine is a
        # per-frame production path — loop frames instead of vmapping)
        return degrain1_frame(list(cur), list(prev), list(nxt), sspec,
                              aspec_b, aspec_f, dcfg, engine=engine)

    out = jax.vmap(per_frame)(tuple(clip_planes), tuple(prevs), tuple(nexts))
    return list(out)
