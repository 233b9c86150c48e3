"""Headline benchmark: MAnalyse + MDegrain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": R}

The pipeline is the flagship denoise graph (Super -> Analyse bwd/fwd ->
Degrain1) on 1080p, batched over frames with vmap — BASELINE.json config 4
modulo radius.  vs_baseline compares against a stored single-CPU-thread
measurement of the same pipeline (the reference publishes no numbers,
BASELINE.md; the C reference could not be run in this environment — the
stored value is this framework's own single-thread CPU throughput, the
closest available stand-in for the reference's single-thread design).

Env knobs: MVT_BENCH_W/H/B/FRAMES/BLKSIZE, MVT_BENCH_CPU=1 to (re)measure
the CPU baseline instead of the TPU number.
"""

import dataclasses
import json
import os
import time

import numpy as np

# Stored CPU throughput of this pipeline (frames/s), measured with
# MVT_BENCH_CPU=1 on the build machine (exact sequential engine, XLA CPU
# backend — the faithful stand-in for the reference's single-threaded
# raster scan; the reference itself publishes no numbers, BASELINE.md).
# Updated when the pipeline changes.
CPU_BASELINE_FPS = 0.636  # measured 2026-08-16, 1080p gray blk16


def main():
    import jax
    if os.environ.get("MVT_BENCH_CPU"):
        # env var alone is ignored when a site customization pre-imports
        # jax with another platform; the config override works until the
        # first backend initialization
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
    from mvtools_tpu.core.types import ColorFamily, VideoFormat
    from mvtools_tpu.degrain import DegrainConfig
    
    w = int(os.environ.get("MVT_BENCH_W", 1920))
    h = int(os.environ.get("MVT_BENCH_H", 1080))
    batch = int(os.environ.get("MVT_BENCH_B", 4))
    iters = int(os.environ.get("MVT_BENCH_ITERS", 3))
    blksize = int(os.environ.get("MVT_BENCH_BLKSIZE", 16))
    levels = int(os.environ.get("MVT_BENCH_LEVELS", 3))
    radius = int(os.environ.get("MVT_BENCH_RADIUS", 1))

    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=2, levels=levels, chroma=False)
    sspec = scfg.validate(fmt)
    acfg = AnalyseConfig(blksize=blksize, levels=levels, truemotion=True,
                         chroma=False)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
    dcfg = DegrainConfig(thsad=400)

    rng = np.random.default_rng(0)

    def make_clip(t):
        base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)
        frames = []
        for i in range(t):
            dy, dx = (i * 2) % 16, (i * 3) % 16
            frames.append(base[dy:dy + h, dx:dx + w])
        return jnp.asarray(np.stack(frames))

    # every timed call gets DISTINCT frames: the device runtime may
    # memoize executions with identical input buffers
    total = batch * iters
    clip = make_clip(total + 2)
    cur = clip[1:total + 1]
    prev = clip[0:total]
    nxt = clip[2:total + 2]

    # One frame of the lock-step engine already saturates the chip (every
    # block searches in parallel), so frames are looped, not vmapped —
    # vmapping frames over the block-parallel search multiplies the gather
    # working set without adding utilization.  The CPU baseline runs the
    # exact sequential engine (the faithful stand-in for the reference's
    # single-threaded raster scan).
    engine = "exact" if os.environ.get("MVT_BENCH_CPU") else "lockstep"
    # one monolithic jit per frame: the axon runtime intermittently fails
    # (INVALID_ARGUMENT) when several large search executables coexist in
    # one process, so the whole graph compiles as a single program
    from mvtools_tpu.models.denoise import degrain_n_frame

    def frame_fn(c, prevs, nxts):
        return degrain_n_frame([c], [[p] for p in prevs],
                               [[n] for n in nxts], sspec, aspec_b,
                               aspec_f, dcfg, engine=engine)[0]

    step = jax.jit(frame_fn)

    def args_for(b):
        prevs = tuple(prev[max(b - r, 0)] for r in range(radius))
        nxts = tuple(nxt[min(b + r, total - 1)] for r in range(radius))
        return cur[b], prevs, nxts

    out = step(*args_for(0))
    out.block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for b in range(total):
        out = step(*args_for(b))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = total / dt

    vs_baseline = fps / CPU_BASELINE_FPS if CPU_BASELINE_FPS else 0.0
    backend = jax.default_backend()
    print(json.dumps({
        "metric": f"MAnalyse+MDegrain{radius} {w}x{h} gray blk{blksize} "
                  f"frames/s ({backend})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
