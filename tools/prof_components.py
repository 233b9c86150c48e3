"""Per-component TPU timing for the headline pipeline shape
(Super -> Analyse bwd/fwd -> Degrain1, bench.py's pipeline).  Each
section times distinct input data (the device runtime memoizes
executions with identical input buffers)."""
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
from mvtools_tpu import analyse, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain

w, h, B, iters = 1920, 1080, int(os.environ.get("MVT_PROF_B", 8)), 3
fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
sspec = SuperConfig(pel=2, levels=3, chroma=False).validate(fmt)
acfg = AnalyseConfig(blksize=16, levels=3, truemotion=True, chroma=False)
aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
dcfg = DegrainConfig(thsad=400)


def mkclip(t, seed):
    r2 = np.random.default_rng(seed)
    b2 = r2.integers(0, 256, (h + 32, w + 32), np.uint8)
    return jnp.asarray(np.stack([b2[(i*2) % 16:(i*2) % 16+h,
                                    (i*3) % 16:(i*3) % 16+w]
                                 for i in range(t)]))


def pick(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def _materialize(out):
    # block_until_ready is NOT sufficient on the axon runtime: remote
    # executions resolve lazily and a pytree of scalars can "complete"
    # without the work having run — a host-side read forces it.  Index
    # on DEVICE first: np.asarray(leaf) would drag the whole output
    # (e.g. a 33MB frame batch) through the tunnel and dominate the
    # measurement
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


def super_step(winw):
    sups = jax.lax.map(lambda f: build_super([f], sspec), winw)
    return jax.tree_util.tree_map(lambda a: a.sum(), sups)


def sa_step(winw):
    sups = jax.lax.map(lambda f: build_super([f], sspec), winw)

    def one(i):
        mv = analyse(pick(sups, i), pick(sups, i+1), aspec_b,
                     engine="lockstep")
        return mv.finest.sad.sum()
    return jax.lax.map(one, jnp.arange(B))


def sa2_step(winw):
    """super + both analyses per frame, the batched (vmapped) engine —
    the bench pipeline minus degrain."""
    from mvtools_tpu import analyse_batch
    tm = jax.tree_util.tree_map
    sups = jax.vmap(lambda f: build_super([f], sspec))(winw)
    src_idx, ref_idx = [], []
    for i in range(B):
        src_idx += [i + 1, i + 1]
        ref_idx += [i + 2, i]
    mvb = analyse_batch(tm(lambda a: a[np.asarray(src_idx)], sups),
                        tm(lambda a: a[np.asarray(ref_idx)], sups),
                        aspec_b)
    return mvb.levels[0].sad.sum()


def full_step(winw):
    """bench.py's vmapped pipeline shape: super + 2 analyse + degrain1."""
    from mvtools_tpu import analyse_batch
    tm = jax.tree_util.tree_map
    sups = jax.vmap(lambda f: build_super([f], sspec))(winw)
    src_idx, ref_idx = [], []
    for i in range(B):
        src_idx += [i + 1, i + 1]
        ref_idx += [i + 2, i]
    src_idx, ref_idx = np.asarray(src_idx), np.asarray(ref_idx)
    mvb = analyse_batch(tm(lambda a: a[src_idx], sups),
                        tm(lambda a: a[ref_idx], sups), aspec_b)
    mv_f = tm(lambda a: a.reshape((B, 2) + a.shape[1:]), mvb)
    sup_f = tm(lambda a: a[ref_idx].reshape((B, 2) + a.shape[1:]), sups)

    def one(frame, mvs_b, sups_b):
        mvs = [tm(lambda a: a[j], mvs_b) for j in range(2)]
        sups_r = [tm(lambda a: a[j], sups_b) for j in range(2)]
        return degrain([frame], sups_r, mvs, aspec_b.meta, dcfg)[0]

    return jax.vmap(one)(winw[1:1 + B], mv_f, sup_f)


def vsuper_step(winw):
    """bench shape: vmapped super over the window."""
    sups = jax.vmap(lambda f: build_super([f], sspec))(winw)
    return jax.tree_util.tree_map(lambda a: a.sum(), sups)


def sa1_step(winw):
    """vmapped super + ONE batched analyse per frame."""
    from mvtools_tpu import analyse_batch
    tm = jax.tree_util.tree_map
    sups = jax.vmap(lambda f: build_super([f], sspec))(winw)
    idx = np.arange(B)
    mvb = analyse_batch(tm(lambda a: a[idx], sups),
                        tm(lambda a: a[idx + 1], sups), aspec_b)
    return mvb.levels[0].sad.sum()


SECTIONS = [
    ("super (lax.map)", super_step, B, 100, 0),
    ("super (vmap, bench shape)", vsuper_step, B, 150, 0),
    ("super+1analyse (lax.map engine)", sa_step, B, 200, 1),
    ("super+1analyse_batch", sa1_step, B, 250, 1),
    ("super+2analyse_batch", sa2_step, B, 300, 2),
    ("full bench pipeline", full_step, B, 400, 2),
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
                # in-process retries rarely recover; the real fix is a
                # fresh process (remote compile cache hit) -- see below
                print(f"{name}: attempt {attempt} failed: "
                      f"{type(e).__name__} {str(e)[:120]}", flush=True)
else:
    # one subprocess per section: the device runtime intermittently
    # fails later executables with INVALID_ARGUMENT after a different
    # program family ran in the same process (measured: the batched
    # engine fails after the lax.map engine ran; solo it is fine), and
    # a fresh process also retries past the fresh-compile hazard
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
