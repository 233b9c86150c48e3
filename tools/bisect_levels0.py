"""Bisect the 1080p YUV levels=0 TPU kernel fault (BASELINE.md known
issue): run Super+Analyse at increasing pyramid depths and with each
probe-path toggle, reporting the first failing configuration.

Usage: python tools/bisect_levels0.py [maxlevels]
Each configuration runs in a SUBPROCESS so a TPU kernel fault doesn't
kill the sweep.
"""

import os
import subprocess
import sys

CASE = r"""
import os
import numpy as np, jax, jax.numpy as jnp
import mvtools_tpu as mvt
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat

levels = int(os.environ["CASE_LEVELS"])
w, h = 1920, 1080
fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
rng = np.random.default_rng(0)
planes = [jnp.asarray(rng.integers(0, 256, (h, w), np.uint8)),
          jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8)),
          jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8))]
planes2 = [jnp.asarray(np.roll(np.asarray(p), (2, 3), (0, 1)))
           for p in planes]
sspec = SuperConfig(pel=2, levels=levels, chroma=True).validate(fmt)
aspec = AnalyseConfig(blksize=16, levels=levels, overlap=8,
                      search=SearchType.HEX2, searchparam=2,
                      truemotion=True, chroma=True).validate(sspec)
s1 = mvt.build_super(planes, sspec)
s2 = mvt.build_super(planes2, sspec)
mv = mvt.analyse(s1, s2, aspec, engine="lockstep")
print("OK sad_sum", int(np.asarray(mv.finest.sad, np.int64).sum()))
"""


def run(levels, env_extra):
    env = dict(os.environ, CASE_LEVELS=str(levels), **env_extra)
    r = subprocess.run([sys.executable, "-c", CASE], env=env,
                       capture_output=True, text=True, timeout=2400)
    tag = " ".join(f"{k}={v}" for k, v in env_extra.items()) or "default"
    status = "ok" if r.returncode == 0 else f"FAIL rc={r.returncode}"
    print(f"levels={levels:2d} [{tag}]: {status}", flush=True)
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()[-12:]
        print("    " + "\n    ".join(tail), flush=True)
    return r.returncode == 0


def main():
    maxl = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sspec_levels = 8  # 1080p full pyramid depth
    depths = list(range(3, (maxl or sspec_levels) + 1))
    first_bad = None
    for lv in depths:
        if not run(lv, {}):
            first_bad = lv
            break
    if first_bad is None:
        print("all depths pass with current defaults")
        return
    # isolate which probe path faults at the first bad depth
    for toggles in ({"MVT_SADMAP": "0"}, {"MVT_TILED": "0"},
                    {"MVT_SADMAP": "0", "MVT_TILED": "0"}):
        run(first_bad, toggles)


if __name__ == "__main__":
    main()
