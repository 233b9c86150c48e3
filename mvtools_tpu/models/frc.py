"""Frame-rate conversion model: the canonical FlowFPS graph over a clip.

The reference's QTGMC/SVP-style usage — Super, four Analyse passes
(backward/forward at both endpoints for maskmode 2), FlowFPS per output
frame (MVFlowFPS.c graph construction :693-908) — expressed as a pure
per-output-frame function plus a host loop that reuses each input
frame's pyramid and MV fields across the output frames that fall in the
same interval.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..analyse import analyse
from ..core.config import AnalyseConfig, SuperConfig
from ..core.types import VideoFormat
from ..flowfps import FlowFPSConfig, flowfps_frame, output_frame_mapping
from ..super import build_super


def flowfps_clip(clip_planes: Sequence[np.ndarray], fmt: VideoFormat,
                 in_fps: Fraction, out_fps: Fraction,
                 scfg: SuperConfig = SuperConfig(),
                 acfg: AnalyseConfig = AnalyseConfig(),
                 fcfg: FlowFPSConfig = FlowFPSConfig(),
                 engine: str = "lockstep",
                 num_out: Optional[int] = None) -> List[List[np.ndarray]]:
    """Retime a clip from in_fps to out_fps.

    clip_planes: per-plane [T, H, W] arrays.  Returns a list of output
    frames (each a list of planes).  Pyramids and the four MV fields per
    source interval are computed once and reused for every output frame
    inside that interval (the role of the reference's helper-filter
    caching, MVFlowFPSHelper.c).
    """
    sspec = scfg.validate(fmt)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    t_in = clip_planes[0].shape[0]
    fa = Fraction(in_fps) / Fraction(out_fps)
    if num_out is None:
        num_out = int(np.floor(t_in / float(fa))) - 1
        num_out = max(num_out, 0)

    sup = jax.jit(lambda planes: build_super(list(planes), scfg, fmt))

    @jax.jit
    def analyse_pair(s_cur, s_ref):
        mv_b = analyse(s_cur, s_ref, aspec_b, engine=engine)
        mv_f = analyse(s_ref, s_cur, aspec_f, engine=engine)
        return mv_b, mv_f

    frame_cache = {}

    def frame(n):
        return [jnp.asarray(p[n]) for p in clip_planes]

    def supers(n):
        if n not in frame_cache:
            frame_cache[n] = sup(tuple(frame(n)))
        return frame_cache[n]

    mv_cache = {}

    def fields(nleft, nright):
        if nleft not in mv_cache:
            mv_cache[nleft] = analyse_pair(supers(nleft), supers(nright))
        return mv_cache[nleft]

    synth = jax.jit(flowfps_frame, static_argnames=("meta", "cfg",
                                                    "time256"))

    out = []
    for n in range(num_out):
        nleft, nright, time256 = output_frame_mapping(n, fa, 1)
        nleft = min(nleft, t_in - 1)
        nright = min(nright, t_in - 1)
        if time256 == 0 or nleft == nright:
            out.append([np.asarray(p) for p in frame(nleft)])
            continue
        mv_b, mv_f = fields(nleft, nright)
        extra = {}
        if fcfg.maskmode == 2 and nleft > 0 and nright + 1 < t_in:
            # mvbw at nright / mvfw at nleft (MVFlowFPS.c:333-397)
            mv_bb, _ = fields(nright, min(nright + 1, t_in - 1))
            _, mv_ff = fields(max(nleft - 1, 0), nleft)
            extra = dict(mv_bb=mv_bb, mv_ff=mv_ff)
        planes = synth(tuple(frame(nleft)), tuple(frame(nright)),
                       supers(nleft), supers(nright), mv_b, mv_f,
                       meta=aspec_b.meta, cfg=fcfg, time256=time256,
                       **extra)
        out.append([np.asarray(p) for p in planes])
        # drop cache entries that can no longer be referenced
        for k in [k for k in frame_cache if k < nleft - 1]:
            del frame_cache[k]
        for k in [k for k in mv_cache if k < nleft - 1]:
            del mv_cache[k]
    return out
