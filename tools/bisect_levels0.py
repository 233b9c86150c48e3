"""Bisect the 1080p YUV420 levels=0 TPU kernel fault.

bench config 4 at levels=0 faulted ("TPU device error: kernel fault")
while levels=3 and small levels=0 runs are clean; the window-DMA
overshoot theory is ruled out analytically (tests/test_dma_audit.py).
This walks the pyramid depth one level at a time on real hardware to
find the first faulting stage, then splits analyse vs degrain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_levels0.py
"""

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mvtools_tpu import analyse, build_super
    from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
    from mvtools_tpu.core.types import ColorFamily, VideoFormat

    w, h = 1920, 1080
    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    rng = np.random.default_rng(int(time.time()))

    def yuv(seed_shift):
        return [jnp.asarray(rng.integers(0, 256, (h, w), np.uint8)),
                jnp.asarray(rng.integers(0, 256, (h // 2, w // 2),
                                         np.uint8)),
                jnp.asarray(rng.integers(0, 256, (h // 2, w // 2),
                                         np.uint8))]

    for levels in (3, 4, 5, 6, 7, 0):
        scfg = SuperConfig(pel=2, levels=levels, chroma=True)
        acfg = AnalyseConfig(blksize=16, levels=levels, overlap=8,
                             truemotion=True, chroma=True)
        sspec = scfg.validate(fmt)
        aspec = dataclasses.replace(acfg, isb=True).validate(sspec)
        t0 = time.time()
        try:
            sa = build_super(yuv(0), sspec)
            sb = build_super(yuv(1), sspec)
            mv = analyse(sa, sb, aspec, engine="lockstep")
            jax.block_until_ready(mv.levels[0].sad)
            print(f"levels={levels} (lv_count={aspec.meta.lv_count}): "
                  f"ANALYSE OK {time.time()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"levels={levels}: ANALYSE FAULT after "
                  f"{time.time()-t0:.1f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            sys.exit(1)

    # analyse clean at full depth -> degrain leg
    from mvtools_tpu.degrain import DegrainConfig
    from mvtools_tpu.models.denoise import degrain_clip
    scfg = SuperConfig(pel=2, levels=0, chroma=True)
    acfg = AnalyseConfig(blksize=16, levels=0, overlap=8,
                         truemotion=True, chroma=True)
    t0 = time.time()
    clip = [jnp.asarray(rng.integers(0, 256, (8, h, w), np.uint8)),
            jnp.asarray(rng.integers(0, 256, (8, h // 2, w // 2),
                                     np.uint8)),
            jnp.asarray(rng.integers(0, 256, (8, h // 2, w // 2),
                                     np.uint8))]
    outs = degrain_clip(clip, fmt, scfg, acfg, DegrainConfig(thsad=400),
                        radius=3, engine="lockstep")
    jax.block_until_ready(outs[0])
    print(f"degrain_clip levels=0 radius=3: OK {time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
