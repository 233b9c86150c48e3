"""Bisect the levels=0 1080p YUV TPU kernel fault (BASELINE.md).

Runs Super+Analyse (chroma, overlap 8 — the config-4 shape) at 1080p
for an increasing pyramid depth, one jit execution per depth, printing
a line per depth so the faulting level is the last line +1.

Usage: python tools/bisect_levels.py [max_levels]
Env: MVT_BISECT_W/H (default 1920x1080).
"""

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mvtools_tpu import analyse, build_super
    from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
    from mvtools_tpu.core.types import ColorFamily, VideoFormat

    w = int(os.environ.get("MVT_BISECT_W", 1920))
    h = int(os.environ.get("MVT_BISECT_H", 1080))
    max_levels = int(sys.argv[1]) if len(sys.argv) > 1 else 0

    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    rng = np.random.default_rng(0)

    def plane(w_, h_):
        return jnp.asarray(rng.integers(0, 256, (h_, w_), np.uint8))

    frames = [[plane(w, h), plane(w // 2, h // 2), plane(w // 2, h // 2)]
              for _ in range(2)]

    # full-pyramid depth for this geometry
    probe = SuperConfig(pel=2, levels=0, chroma=True).validate(fmt)
    full = probe.levels
    depths = [d for d in range(1, full + 1)
              if max_levels == 0 or d <= max_levels]
    print(f"# full pyramid depth at {w}x{h}: {full}", flush=True)

    for lv in depths:
        scfg = SuperConfig(pel=2, levels=lv, chroma=True)
        sspec = scfg.validate(fmt)
        acfg = AnalyseConfig(blksize=16, levels=lv, overlap=8,
                             truemotion=True, chroma=True)
        aspec = acfg.validate(sspec)

        def step(fr_a, fr_b):
            sa = build_super(fr_a, sspec)
            sb = build_super(fr_b, sspec)
            mv = analyse(sa, sb, aspec, engine="lockstep")
            return mv.finest.sad.sum()

        try:
            out = jax.jit(step)(frames[0], frames[1])
            jax.block_until_ready(out)
            print(f"levels={lv}: OK sad={int(out)}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and stop
            print(f"levels={lv}: FAULT {type(e).__name__}: {e}",
                  flush=True)
            break


if __name__ == "__main__":
    main()
