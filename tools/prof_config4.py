"""Per-component TPU timing for BASELINE.json config 4 (MDegrain3,
6 refs, overlap 8, 1080p YUV420) — VERDICT r4 #5.  Sections run in
subprocesses (same hazards as prof_components.py: program-family
interference + the fresh-compile retry)."""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mvtools_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from mvtools_tpu import analyse_batch, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain

w, h = 1920, 1080
B = int(os.environ.get("MVT_PROF_B", 4))
iters = int(os.environ.get("MVT_PROF_ITERS", 3))
levels = int(os.environ.get("MVT_PROF_LEVELS", 3))
RADIUS = 3
fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
sspec = SuperConfig(pel=2, levels=levels, chroma=True).validate(fmt)
acfg = AnalyseConfig(blksize=16, levels=levels, overlap=8,
                     truemotion=True, chroma=True)
aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
dcfg = DegrainConfig(thsad=400)
tm = jax.tree_util.tree_map


def mkclip(t, seed):
    r2 = np.random.default_rng(seed)

    def plane(ww, hh):
        b2 = r2.integers(0, 256, (hh + 32, ww + 32), np.uint8)
        return jnp.asarray(np.stack(
            [b2[(i * 2) % 16:(i * 2) % 16 + hh,
                (i * 3) % 16:(i * 3) % 16 + ww] for i in range(t)]))

    return [plane(w, h), plane(w // 2, h // 2), plane(w // 2, h // 2)]


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timed(step, nframes, seed0, extra=0):
    stepj = jax.jit(step)
    clips = [mkclip(nframes + extra, seed0 + i) for i in range(iters + 1)]
    _materialize(stepj(clips[-1]))
    t0 = time.perf_counter()
    for c in clips[:iters]:
        _materialize(stepj(c))
    return (time.perf_counter() - t0) / (nframes * iters) * 1e3


def vsuper_step(planes):
    sups = jax.vmap(lambda y, u, v: build_super([y, u, v], sspec))(*planes)
    return tm(lambda a: a.sum(), sups)


def an1_step(planes):
    """vmapped super + ONE batched (B-job) analyse."""
    sups = jax.vmap(lambda y, u, v: build_super([y, u, v], sspec))(*planes)
    idx = np.arange(B)
    mvb = analyse_batch(tm(lambda a: a[idx], sups),
                        tm(lambda a: a[idx + 1], sups), aspec_b)
    return mvb.levels[0].sad.sum()


def _degrain_idx():
    src_idx, ref_idx = [], []
    for i in range(B):
        c = i + RADIUS
        for k in range(1, RADIUS + 1):
            src_idx += [c, c]
            ref_idx += [c + k, c - k]
    return np.asarray(src_idx), np.asarray(ref_idx)


def an6_step(planes):
    """all 6*B analyses of the config-4 graph as one batch."""
    sups = jax.vmap(lambda y, u, v: build_super([y, u, v], sspec))(*planes)
    src_idx, ref_idx = _degrain_idx()
    mvb = analyse_batch(tm(lambda a: a[src_idx], sups),
                        tm(lambda a: a[ref_idx], sups), aspec_b)
    return mvb.levels[0].sad.sum()


def full_step(planes):
    """the full config-4 graph: super + 6 analyses + MDegrain3."""
    sups = jax.vmap(lambda y, u, v: build_super([y, u, v], sspec))(*planes)
    src_idx, ref_idx = _degrain_idx()
    mvb = analyse_batch(tm(lambda a: a[src_idx], sups),
                        tm(lambda a: a[ref_idx], sups), aspec_b)
    j_per = 2 * RADIUS
    mv_f = tm(lambda a: a.reshape((B, j_per) + a.shape[1:]), mvb)
    sup_f = tm(lambda a: a[ref_idx].reshape((B, j_per) + a.shape[1:]),
               sups)

    def one(y, u, v, mvs_b, sups_b):
        mvs = [tm(lambda a: a[j], mvs_b) for j in range(j_per)]
        sups_r = [tm(lambda a: a[j], sups_b) for j in range(j_per)]
        return degrain([y, u, v], sups_r, mvs, aspec_b.meta, dcfg)[0]

    sl = slice(RADIUS, RADIUS + B)
    return jax.vmap(one)(planes[0][sl], planes[1][sl], planes[2][sl],
                         mv_f, sup_f)


SECTIONS = [
    ("super yuv (vmap)", vsuper_step, B, 100, 1),
    ("1x analyse_batch ov8 yuv", an1_step, B, 200, 1),
    ("6x analyse_batch ov8 yuv", an6_step, B, 300, 2 * RADIUS),
    ("full config4 graph", full_step, B, 400, 2 * RADIUS),
]

only = os.environ.get("MVT_PROF_ONLY")
if only:
    for name, fn, nf, seed, extra in SECTIONS:
        if only not in name:
            continue
        for attempt in range(3):
            try:
                ms = timed(fn, nf, seed, extra=extra)
                print(f"{name}: {ms:.2f} ms/frame", flush=True)
                break
            except Exception as e:
                print(f"{name}: attempt {attempt} failed: "
                      f"{type(e).__name__} {str(e)[:160]}", flush=True)
else:
    import subprocess
    for name, _fn, _nf, _seed, _extra in SECTIONS:
        for attempt in range(2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "MVT_PROF_ONLY": name},
                capture_output=True, text=True)
            out = [ln for ln in r.stdout.splitlines()
                   if ln.startswith(name) and "ms/frame" in ln]
            if out:
                print(out[0], flush=True)
                break
        else:
            print(f"{name}: FAILED after 2 subprocess attempts",
                  flush=True)
