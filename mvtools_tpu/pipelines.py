"""Staged jitted pipelines: compile each stage once, reuse across calls.

A monolithic jit of an MDegrainN frame traces N*2 copies of the search
engine and compile time explodes with the radius; here Super, Analyse
(bwd/fwd) and Degrain are separate jitted stages, so the engine compiles
exactly twice (is_backward is static metadata) no matter the radius, and
each stage's executable is shared by every frame and reference.  XLA
loses only elementwise fusion across stage boundaries — negligible next
to the search.

This mirrors the reference's graph shape: VapourSynth also caches each
filter node's output per frame and reuses Super/Analyse results across
the consumers that reference them (e.g. MVDegrains.cpp arInitial
requests, MVFlowFPS.c helper nodes).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax

from .analyse import analyse
from .core.config import AnalyseConfig, SuperConfig
from .core.types import VideoFormat
from .degrain import DegrainConfig, degrain
from .super import build_super


class DegrainPipeline:
    """Super -> Analyse xN -> DegrainN with per-stage jit."""

    def __init__(self, fmt: VideoFormat, scfg: SuperConfig,
                 acfg: AnalyseConfig, dcfg: DegrainConfig,
                 radius: int = 1, engine: str = "lockstep"):
        self.radius = radius
        self.sspec = scfg.validate(fmt)
        self.aspec_b = dataclasses.replace(acfg, isb=True).validate(
            self.sspec)
        self.aspec_f = dataclasses.replace(acfg, isb=False).validate(
            self.sspec)
        self.dcfg = dcfg
        self._super = jax.jit(
            lambda planes: build_super(list(planes), self.sspec))
        self._an_b = jax.jit(lambda a, b: analyse(
            a, b, self.aspec_b, engine=engine))
        self._an_f = jax.jit(lambda a, b: analyse(
            a, b, self.aspec_f, engine=engine))
        self._degrain = jax.jit(lambda cur, sups, mvs: degrain(
            list(cur), list(sups), list(mvs), self.aspec_b.meta, self.dcfg))

    def super(self, planes):
        return self._super(tuple(planes))

    def frame(self, cur_planes, cur_super, ref_supers_prev,
              ref_supers_next):
        """Denoise one frame.  ref_supers_prev/next[i] = super of frame
        n-(i+1) / n+(i+1) (precomputed, typically cached across frames)."""
        sups = []
        mvs = []
        for sp, sn in zip(ref_supers_prev, ref_supers_next):
            mvs.append(self._an_b(cur_super, sn))
            mvs.append(self._an_f(cur_super, sp))
            sups += [sn, sp]
        return self._degrain(tuple(cur_planes), tuple(sups), tuple(mvs))

    def run_clip(self, frames: Sequence[Sequence]) -> List[List]:
        """Denoise a whole clip with a rolling super cache (each frame's
        pyramid is built once and reused by up to 2*radius consumers)."""
        t = len(frames)
        cache = {}

        def sup(n):
            n = min(max(n, 0), t - 1)
            if n not in cache:
                cache[n] = self.super(frames[n])
            return cache[n]

        out = []
        for n in range(t):
            prevs = [sup(n - (i + 1)) for i in range(self.radius)]
            nxts = [sup(n + (i + 1)) for i in range(self.radius)]
            out.append(self.frame(frames[n], sup(n), prevs, nxts))
            for k in [k for k in cache if k < n - self.radius]:
                del cache[k]
        return out
