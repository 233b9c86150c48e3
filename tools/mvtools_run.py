#!/usr/bin/env python
"""mvtools_tpu CLI: run a motion-compensated pipeline over a y4m stream.

The standalone equivalent of loading the reference plugin into a
VapourSynth script: frames stream through the native prefetching reader
(native/y4m.cc), the TPU computes the requested pipeline per frame, and
results stream out as y4m.

Examples:
  python tools/mvtools_run.py degrain1 in.y4m out.y4m --blksize 16
  python tools/mvtools_run.py compensate in.y4m out.y4m --thsad 400
  python tools/mvtools_run.py stabilise in.y4m out.y4m --method 0
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pipeline",
                    choices=["degrain1", "compensate", "stabilise"])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--blksize", type=int, default=16)
    ap.add_argument("--pel", type=int, default=2)
    ap.add_argument("--levels", type=int, default=0)
    ap.add_argument("--thsad", type=int, default=400)
    ap.add_argument("--search", type=int, default=4)
    ap.add_argument("--method", type=int, default=0)
    ap.add_argument("--engine", default="lockstep",
                    choices=["lockstep", "exact"])
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mvtools_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
    from mvtools_tpu.compensate import CompensateConfig, compensate
    from mvtools_tpu.core.types import ColorFamily, VideoFormat
    from mvtools_tpu.degrain import DegrainConfig
    from mvtools_tpu.io import Y4MReader, Y4MWriter
    from mvtools_tpu.models.denoise import degrain1_frame

    r = Y4MReader(args.input)
    fam = {(1, 1): ColorFamily.YUV444 if r.planes == 3 else ColorFamily.GRAY,
           (2, 2): ColorFamily.YUV420,
           (2, 1): ColorFamily.YUV422}[(r.sub_w, r.sub_h)]
    fmt = VideoFormat(r.width, r.height, r.bits, fam)
    chroma = r.planes == 3

    scfg = SuperConfig(pel=args.pel, levels=args.levels, chroma=chroma)
    sspec = scfg.validate(fmt)
    acfg = AnalyseConfig(blksize=args.blksize, levels=args.levels,
                         truemotion=True, chroma=chroma)
    w = Y4MWriter(args.output, r.width, r.height,
                  (r.fps_num, r.fps_den), r.sub_w, r.sub_h, r.bits,
                  r.planes)

    t0 = time.perf_counter()
    n = 0

    if args.pipeline == "degrain1":
        aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
        aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
        dcfg = DegrainConfig(thsad=args.thsad)

        step = jax.jit(lambda c, p, nx: degrain1_frame(
            c, p, nx, sspec, aspec_b, aspec_f, dcfg, engine=args.engine))

        prev = cur = None
        for f in r:
            f = [jnp.asarray(p) for p in f]
            if cur is not None:
                p = prev if prev is not None else cur
                out = step(cur, p, f)
                w.write([np.asarray(o) for o in out])
                n += 1
                if args.max_frames and n >= args.max_frames:
                    break
            prev, cur = cur, f
        if cur is not None and not (args.max_frames and n >= args.max_frames):
            p = prev if prev is not None else cur
            out = step(cur, p, cur)
            w.write([np.asarray(o) for o in out])
            n += 1
    elif args.pipeline == "compensate":
        aspec = dataclasses.replace(acfg, isb=False).validate(sspec)
        ccfg = CompensateConfig(thsad=args.thsad * 25)

        def comp(cur, prv):
            s_cur = build_super(cur, scfg, fmt)
            s_prev = build_super(prv, scfg, fmt)
            mv = analyse(s_cur, s_prev, aspec, engine=args.engine)
            return compensate(s_cur, s_prev, mv, aspec.meta, ccfg)

        step = jax.jit(comp)
        prev = None
        for f in r:
            f = [jnp.asarray(p) for p in f]
            out = step(f, prev if prev is not None else f)
            w.write([np.asarray(o) for o in out])
            prev = f
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    else:  # stabilise
        from mvtools_tpu.depan import (DepanEstimateConfig,
                                       DepanStabiliseConfig,
                                       depan_estimate, depan_stabilise)
        frames = []
        for f in r:
            frames.append([jnp.asarray(p) for p in f])
            if args.max_frames and len(frames) >= args.max_frames:
                break
        luma = jnp.stack([f[0] for f in frames]).astype(jnp.float32)
        dx, dy, zoom, _ = depan_estimate(luma, DepanEstimateConfig())
        motions = np.stack([np.asarray(dx), np.asarray(dy),
                            np.asarray(zoom),
                            np.zeros(len(frames), np.float32)], axis=1)
        cfg = DepanStabiliseConfig(
            method=args.method, fps=r.fps_num / max(r.fps_den, 1))
        outs = depan_stabilise(frames, motions.astype(np.float32), cfg,
                               sub_w=r.sub_w - 1, sub_h=r.sub_h - 1,
                               bits=r.bits)
        for out in outs:
            w.write([np.asarray(o) for o in out])
            n += 1

    w.close()
    r.close()
    dt = time.perf_counter() - t0
    print(f"{args.pipeline}: {n} frames in {dt:.2f}s "
          f"({n / dt:.2f} fps)", file=sys.stderr)


if __name__ == "__main__":
    main()
