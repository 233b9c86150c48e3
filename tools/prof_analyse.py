"""Analyse-internals timing grid on TPU: where does the analyse
ms/frame go?  Each case times a Super+Analyse pipeline variant on
distinct input data (the device runtime memoizes executions with
identical input buffers — seeds are salted per case)."""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from mvtools_tpu import analyse, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat

w, h, B, iters = 1920, 1080, 4, 3
fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)


def mkclip(t, seed):
    r2 = np.random.default_rng(seed)
    b2 = r2.integers(0, 256, (h + 32, w + 32), np.uint8)
    return jnp.asarray(np.stack([b2[(i*2) % 16:(i*2) % 16+h,
                                    (i*3) % 16:(i*3) % 16+w]
                                 for i in range(t)]))


def pick(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def run_case(name, levels, env=None):
    """env: dict of env-var overrides, restored on exit even when the
    timed run raises (a leaked override would poison later cases)."""
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        salt = abs(hash(name)) % 100000
        sspec = SuperConfig(pel=2, levels=levels,
                            chroma=False).validate(fmt)
        aspec = dataclasses.replace(
            AnalyseConfig(blksize=16, levels=levels, truemotion=True,
                          chroma=False), isb=True).validate(sspec)

        def sa_step(winw):
            sups = jax.lax.map(lambda f: build_super([f], sspec), winw)

            def one(i):
                mv = analyse(pick(sups, i), pick(sups, i+1), aspec,
                             engine="lockstep")
                return mv.finest.sad.sum()
            return jax.lax.map(one, jnp.arange(B))

        saj = jax.jit(sa_step)
        clips = [mkclip(B+1, salt + i) for i in range(iters+1)]
        out = jax.block_until_ready(saj(clips[-1]))
        t0 = time.perf_counter()
        for c in clips[:iters]:
            out = saj(c)
        jax.block_until_ready(out)
        ms = (time.perf_counter()-t0)/(B*iters)*1e3
        print(f"{name}: {ms:.2f} ms/frame", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


case = sys.argv[1] if len(sys.argv) > 1 else "all"
if case in ("all", "base"):
    run_case("levels=3 (base)", 3)
if case in ("all", "l1"):
    run_case("levels=1 (finest only)", 1)
if case in ("all", "l2"):
    run_case("levels=2", 2)
if case in ("all", "r4"):
    run_case("levels=3 MVT_MAP_R=4", 3, env={"MVT_MAP_R": "4"})
if case in ("all", "probes"):
    run_case("levels=3 MVT_SADMAP=0 (probes)", 3,
             env={"MVT_SADMAP": "0"})
