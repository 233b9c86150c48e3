"""Per-component TPU timing for the headline pipeline shape."""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from mvtools_tpu import analyse, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain

w, h, B, iters = 1920, 1080, 8, 3
fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
sspec = SuperConfig(pel=2, levels=3, chroma=False).validate(fmt)
acfg = AnalyseConfig(blksize=16, levels=3, truemotion=True, chroma=False)
aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
dcfg = DegrainConfig(thsad=400)

rng = np.random.default_rng(0)
base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)
def mkclip(t, seed):
    r2 = np.random.default_rng(seed)
    b2 = r2.integers(0, 256, (h + 32, w + 32), np.uint8)
    return jnp.asarray(np.stack([b2[(i*2) % 16:(i*2) % 16+h,
                                    (i*3) % 16:(i*3) % 16+w]
                                 for i in range(t)]))

def pick(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)

# --- super only ---
def super_step(winw):
    sups = jax.lax.map(lambda f: build_super([f], sspec), winw)
    return jax.tree_util.tree_map(lambda a: a.sum(), sups)
sj = jax.jit(super_step)
clips = [mkclip(B, 100+i) for i in range(iters+1)]
out = jax.block_until_ready(sj(clips[-1]))
t0 = time.perf_counter()
for c in clips[:iters]:
    out = sj(c)
jax.block_until_ready(out)
print(f"super: {(time.perf_counter()-t0)/(B*iters)*1e3:.2f} ms/frame", flush=True)

# --- super+analyse ---
def sa_step(winw):
    sups = jax.lax.map(lambda f: build_super([f], sspec), winw)
    def one(i):
        mv = analyse(pick(sups, i), pick(sups, i+1), aspec_b,
                     engine="lockstep")
        return mv.finest.sad.sum()
    return jax.lax.map(one, jnp.arange(B))
saj = jax.jit(sa_step)
clips = [mkclip(B+1, 200+i) for i in range(iters+1)]
out = jax.block_until_ready(saj(clips[-1]))
t0 = time.perf_counter()
for c in clips[:iters]:
    out = saj(c)
jax.block_until_ready(out)
sa_ms = (time.perf_counter()-t0)/(B*iters)*1e3
print(f"super+1analyse: {sa_ms:.2f} ms/frame", flush=True)

# --- super + 2 analyse ---
def sa2_step(winw):
    sups = jax.lax.map(lambda f: build_super([f], sspec), winw)
    def one(i):
        mv1 = analyse(pick(sups, i+1), pick(sups, i+2), aspec_b,
                      engine="lockstep")
        mv2 = analyse(pick(sups, i+1), pick(sups, i), aspec_b,
                      engine="lockstep")
        return mv1.finest.sad.sum() + mv2.finest.sad.sum()
    return jax.lax.map(one, jnp.arange(B))
sa2j = jax.jit(sa2_step)
clips = [mkclip(B+2, 300+i) for i in range(iters+1)]
out = jax.block_until_ready(sa2j(clips[-1]))
t0 = time.perf_counter()
for c in clips[:iters]:
    out = sa2j(c)
jax.block_until_ready(out)
sa2_ms = (time.perf_counter()-t0)/(B*iters)*1e3
print(f"super+2analyse: {sa2_ms:.2f} ms/frame", flush=True)
