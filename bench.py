"""Headline benchmark: MAnalyse + MDegrain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": R}

The pipeline is the flagship denoise graph (Super -> Analyse bwd/fwd ->
DegrainN) on 1080p — BASELINE.json config 4 modulo radius.  Frames are
processed in batches of MVT_BENCH_B per executable execution (lax.map):
each frame's super is built once and shared by the analyses that
reference it, and the device runtime's fixed per-execution cost is
amortised over the batch.  vs_baseline compares against the REAL
reference C code: the same pipeline timed single-thread through the
compiled scalar-tier harness (tests/golden_harness; the reference
publishes no numbers of its own, BASELINE.md).

Env knobs: MVT_BENCH_W/H/B/ITERS/BLKSIZE/LEVELS/RADIUS,
MVT_BENCH_CPU=1 to (re)measure the CPU baseline instead.
"""

import dataclasses
import json
import os
import time

import numpy as np

# Single-CPU-thread throughput of the REFERENCE C code for this
# pipeline, measured with timed loops in the compiled scalar-tier
# harness (tests/golden_harness, 2026-08-17, this machine's CPU):
# 1080p super build 17.4ms, analyse hex2 7.8ms each, degrain1
# overlap-0 1.33ms -> 1/(0.0174 + 2*0.0078 + 0.0013) ~= 29 frames/s.
# The reference's SIMD tiers would be faster still; the scalar tier is
# what the harness can build (BASELINE.md).  This replaces round 1's
# stand-in (our own exact engine on XLA CPU, 0.44 fps for this
# pipeline shape; it overstated the speedup ~50x).
REF_SCALAR_BASELINE_FPS = 29.0
CPU_BASELINE_FPS = REF_SCALAR_BASELINE_FPS


def _psnr(a, b, peak=255.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(peak * peak / mse)


def bench_config(cfg_id: int):
    """BASELINE.json configs 1-5, one JSON line each
    (MVT_BENCH_CONFIG=N).  PSNR-vs-exact parity for configs 4/5 with
    MVT_BENCH_PSNR=1 (measured at 512x288 where the exact engine is
    affordable)."""
    import jax
    import jax.numpy as jnp

    from mvtools_tpu import analyse, build_super
    from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
    from mvtools_tpu.core.types import ColorFamily, SearchType, VideoFormat
    from mvtools_tpu.degrain import DegrainConfig

    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    want_psnr = bool(os.environ.get("MVT_BENCH_PSNR"))

    def gray_clip(t, w, h):
        base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)
        return jnp.asarray(np.stack(
            [base[(i * 2) % 16:(i * 2) % 16 + h,
                  (i * 3) % 16:(i * 3) % 16 + w] for i in range(t)]))

    def timed(step, windows, frames_per_call):
        out = step(windows[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for wdw in windows:
            out = step(wdw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return len(windows) * frames_per_call / dt

    def emit(metric, fps, extra=None):
        rec = {"metric": metric, "value": round(fps, 3),
               "unit": "frames/s", "vs_baseline": 0.0}
        if extra:
            rec.update(extra)
        print(json.dumps(rec))

    B, iters = 8, 3

    if cfg_id == 1:
        w, h = 1280, 720
        fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
        sspec = SuperConfig(pel=1, levels=1, chroma=False).validate(fmt)
        aspec = AnalyseConfig(blksize=16, levels=1,
                              search=SearchType.EXHAUSTIVE, searchparam=4,
                              truemotion=True, chroma=False).validate(sspec)

        def step(wdw):
            sups = jax.lax.map(lambda f: build_super([f], sspec), wdw)
            def one(i):
                mv = analyse(
                    jax.tree_util.tree_map(lambda a: a[i], sups),
                    jax.tree_util.tree_map(lambda a: a[i + 1], sups),
                    aspec, engine="lockstep")
                return mv.finest.sad.sum()
            return jax.lax.map(one, jnp.arange(B))

        clip = gray_clip(B * iters + 1, w, h)
        windows = [clip[b * B:b * B + B + 1] for b in range(iters)]
        fps = timed(jax.jit(step), windows, B)
        emit("config1 MSuper+MAnalyse 720p blk16 single-level full-pel "
             f"exhaustive frames/s ({backend})", fps)

    elif cfg_id == 2:
        w, h = 1920, 1080
        fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
        sspec = SuperConfig(pel=4, levels=0, chroma=False).validate(fmt)
        aspec = AnalyseConfig(blksize=16, levels=0, search=SearchType.HEX2,
                              searchparam=2, truemotion=True,
                              chroma=False).validate(sspec)

        def step(wdw):
            sups = jax.lax.map(lambda f: build_super([f], sspec), wdw)
            def one(i):
                mv = analyse(
                    jax.tree_util.tree_map(lambda a: a[i], sups),
                    jax.tree_util.tree_map(lambda a: a[i + 1], sups),
                    aspec, engine="lockstep")
                return mv.finest.sad.sum()
            return jax.lax.map(one, jnp.arange(B))

        clip = gray_clip(B * iters + 1, w, h)
        windows = [clip[b * B:b * B + B + 1] for b in range(iters)]
        fps = timed(jax.jit(step), windows, B)
        emit("config2 hierarchical MAnalyse hex2 qpel (pel=4) 1080p "
             f"frames/s ({backend})", fps)

    elif cfg_id == 3:
        from mvtools_tpu.recalculate import RecalculateConfig, recalculate
        w, h = 1920, 1080
        fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
        sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
        aspec = AnalyseConfig(blksize=16, levels=0, truemotion=True,
                              chroma=False).validate(sspec)
        rcfg = RecalculateConfig(blksize=16, overlap=8, thsad=200,
                                 chroma=False, truemotion=True, dct=5)
        rspec = rcfg.to_analyse_config().validate(sspec)

        def step(wdw):
            sups = jax.lax.map(lambda f: build_super([f], sspec), wdw)
            def one(i):
                sa = jax.tree_util.tree_map(lambda a: a[i], sups)
                sb = jax.tree_util.tree_map(lambda a: a[i + 1], sups)
                mv = analyse(sa, sb, aspec, engine="lockstep")
                mv2 = recalculate(sa, sb, mv, rspec, rcfg)
                return mv2.levels[0].sad.sum()
            return jax.lax.map(one, jnp.arange(B))

        clip = gray_clip(B * iters + 1, w, h)
        windows = [clip[b * B:b * B + B + 1] for b in range(iters)]
        fps = timed(jax.jit(step), windows, B)
        emit("config3 MRecalculate overlap=8 SATD(dct=5) 1080p frames/s "
             f"({backend})", fps)

    elif cfg_id == 4:
        from mvtools_tpu.models.denoise import degrain_clip
        w, h = 1920, 1080
        fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
        # levels=3 (the headline pyramid depth): levels=0 runs clean on
        # hardware since the lane-roll fix (BASELINE.md round 5) but its
        # ~10 per-level programs take ~an hour of fresh compile — kept
        # at 3 as a compile-budget choice
        scfg = SuperConfig(pel=2, levels=3, chroma=True)
        acfg = AnalyseConfig(blksize=16, levels=3, overlap=8,
                             truemotion=True, chroma=True)
        dcfg = DegrainConfig(thsad=400)

        def yuv_clip(t, w_, h_):
            y = gray_clip(t, w_, h_)
            u = gray_clip(t, w_ // 2, h_ // 2)
            v = gray_clip(t, w_ // 2, h_ // 2)
            return [y, u, v]

        def step(planes):
            return degrain_clip(planes, fmt, scfg, acfg, dcfg, radius=3,
                                engine="lockstep")[0]

        T = B + 6
        clips = [yuv_clip(T, w, h) for _ in range(iters + 1)]
        step_j = jax.jit(step)
        out = step_j(clips[-1])
        jax.block_until_ready(out)
        # materialize a pixel per call: the device runtime memoizes
        # repeated executions and resolves async futures lazily — a
        # host-side read forces real completion
        ts = []
        for c in clips[:iters]:
            t0 = time.perf_counter()
            out = step_j(c)
            float(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
            print(f"# config4 batch: {ts[-1]:.2f}s for {T} frames",
                  flush=True)
        fps = T / min(ts)
        extra = None
        if want_psnr:
            sw, sh = 512, 288
            sfmt = VideoFormat(sw, sh, 8, ColorFamily.YUV420)
            small = yuv_clip(6, sw, sh)
            lock = degrain_clip(small, sfmt, scfg, acfg, dcfg, radius=3,
                                engine="lockstep")
            exact = degrain_clip(small, sfmt, scfg, acfg, dcfg, radius=3,
                                 engine="exact")
            extra = {"psnr_vs_exact_512x288":
                     round(_psnr(lock[0], exact[0]), 2)}
        emit("config4 MDegrain3 6 refs overlap=8 1080p YUV420 frames/s "
             f"({backend})", fps, extra)

    elif cfg_id == 5:
        from mvtools_tpu.flowfps import FlowFPSConfig, flowfps_frame
        w, h = 1920, 1080
        fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
        sspec = SuperConfig(pel=2, levels=0, chroma=False).validate(fmt)
        acfg = AnalyseConfig(blksize=16, levels=0, truemotion=True,
                             chroma=False)
        aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
        aspec_f = dataclasses.replace(acfg, isb=False).validate(sspec)
        fcfg = FlowFPSConfig(maskmode=2)

        def step(wdw):
            sups = jax.lax.map(lambda f: build_super([f], sspec), wdw)
            def one(i):
                sa = jax.tree_util.tree_map(lambda a: a[i], sups)
                sb = jax.tree_util.tree_map(lambda a: a[i + 1], sups)
                mv_b = analyse(sa, sb, aspec_b, engine="lockstep")
                mv_f = analyse(sb, sa, aspec_f, engine="lockstep")
                return flowfps_frame([wdw[i]], [wdw[i + 1]], sa, sb,
                                     mv_b, mv_f, aspec_b.meta, fcfg,
                                     128)[0]
            return jax.lax.map(one, jnp.arange(B))

        clip = gray_clip(B * iters + 1, w, h)
        windows = [clip[b * B:b * B + B + 1] for b in range(iters)]
        # each input pair yields one interpolated frame; 30->60 doubling
        # emits 2 output frames per input frame (source + synthesized)
        fps = timed(jax.jit(step), windows, B) * 2
        extra = None
        if want_psnr:
            sw, sh = 512, 288
            sclip = gray_clip(3, sw, sh)
            ssspec = SuperConfig(pel=2, levels=0, chroma=False).validate(
                VideoFormat(sw, sh, 8, ColorFamily.GRAY))
            saspec_b = dataclasses.replace(acfg, isb=True).validate(ssspec)
            saspec_f = dataclasses.replace(acfg, isb=False).validate(ssspec)
            sa = build_super([sclip[0]], ssspec)
            sb = build_super([sclip[1]], ssspec)
            outs = {}
            for eng in ("lockstep", "exact"):
                mv_b = analyse(sa, sb, saspec_b, engine=eng)
                mv_f = analyse(sb, sa, saspec_f, engine=eng)
                outs[eng] = flowfps_frame(
                    [sclip[0]], [sclip[1]], sa, sb, mv_b, mv_f,
                    saspec_b.meta, fcfg, 128)[0]
            extra = {"psnr_vs_exact_512x288":
                     round(_psnr(outs["lockstep"], outs["exact"]), 2)}
        emit("config5 MFlowFPS 30->60 maskmode=2 1080p output-frames/s "
             f"({backend})", fps, extra)

    else:
        raise SystemExit(f"unknown MVT_BENCH_CONFIG {cfg_id}")


def _enable_jax_cache():
    """Persistent compile cache for TPU runs (the XLA:CPU serializer
    segfaults — CLAUDE.md — so CPU baselines skip it)."""
    import jax
    if not os.environ.get("MVT_BENCH_CPU"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/mvtools_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)


def build_headline(w=1920, h=1080, batch=16, blksize=16, levels=3,
                   radius=1, engine="lockstep", laxmap=False):
    """The headline pipeline as a (batch_fn, make_clip) pair.

    batch_fn maps a [batch + 2*radius, H, W] u8 window to [batch, H, W]
    denoised frames; make_clip(t) builds a t-frame shifting test clip.
    Shared by main() and tools/preflight.py so the pre-flight gate
    compiles EXACTLY the graph the driver benches."""
    import jax
    import jax.numpy as jnp

    from mvtools_tpu import analyse, analyse_batch, build_super
    from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
    from mvtools_tpu.core.types import ColorFamily, VideoFormat
    from mvtools_tpu.degrain import DegrainConfig, degrain

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

    def pick(tree, i):
        return jax.tree_util.tree_map(lambda a: a[i], tree)

    def batch_fn_laxmap(window):
        """window: [batch + 2*radius, H, W] frames -> [batch, H, W]
        denoised.  Supers are built once per frame and shared."""
        sups = jax.lax.map(lambda f: build_super([f], sspec), window)

        def one(i):
            c = i + radius
            sup_c = pick(sups, c)
            sups_r = []
            mvs = []
            for k in range(1, radius + 1):
                sup_n = pick(sups, c + k)
                sup_p = pick(sups, c - k)
                mvs.append(analyse(sup_c, sup_n, aspec_b, engine=engine))
                mvs.append(analyse(sup_c, sup_p, aspec_f, engine=engine))
                sups_r += [sup_n, sup_p]
            return degrain([window[c]], sups_r, mvs, aspec_b.meta,
                           dcfg)[0]

        if engine == "lockstep":
            return jax.lax.map(one, jnp.arange(batch))
        return jax.vmap(one)(jnp.arange(batch))

    def batch_fn_vmap(window):
        """Frame-batched pipeline: ONE vmapped program serves the whole
        window — supers vmapped, all 2*radius*batch analyses as one
        analyse_batch call (kernel launches fold the job axis into the
        Pallas grid), degrain vmapped over output frames."""
        tm = jax.tree_util.tree_map
        sups = jax.vmap(lambda f: build_super([f], sspec))(window)
        src_idx, ref_idx = [], []
        for i in range(batch):
            c = i + radius
            for k in range(1, radius + 1):
                src_idx += [c, c]
                ref_idx += [c + k, c - k]
        src_idx = np.asarray(src_idx)
        ref_idx = np.asarray(ref_idx)
        sup_src = tm(lambda a: a[src_idx], sups)
        sup_ref = tm(lambda a: a[ref_idx], sups)
        mvb = analyse_batch(sup_src, sup_ref, aspec_b)      # [J]-batched
        j_per = 2 * radius
        mv_f = tm(lambda a: a.reshape((batch, j_per) + a.shape[1:]),
                  mvb)
        sup_f = tm(lambda a: a[ref_idx].reshape((batch, j_per)
                                                + a.shape[1:]), sups)

        def one(frame, mvs_b, sups_b):
            mvs = [tm(lambda a: a[j], mvs_b) for j in range(j_per)]
            sups_r = [tm(lambda a: a[j], sups_b) for j in range(j_per)]
            return degrain([frame], sups_r, mvs, aspec_b.meta, dcfg)[0]

        return jax.vmap(one)(window[radius:radius + batch], mv_f, sup_f)

    batch_fn = (batch_fn_laxmap if laxmap or engine == "exact"
                else batch_fn_vmap)
    return batch_fn, make_clip


def main():
    import jax
    _enable_jax_cache()
    cfg_id = os.environ.get("MVT_BENCH_CONFIG")
    if cfg_id:
        bench_config(int(cfg_id))
        return
    if os.environ.get("MVT_BENCH_CPU"):
        # env var alone is ignored when a site customization pre-imports
        # jax with another platform; the config override works until the
        # first backend initialization
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    w = int(os.environ.get("MVT_BENCH_W", 1920))
    h = int(os.environ.get("MVT_BENCH_H", 1080))
    # B=48 amortises the fixed per-execution Pallas cost further than
    # 16/32 (62.5 / 65.4 / 66.8 fps measured round 5); B=64's ~13.7 GB
    # temp footprint would crowd the 14 GB preflight budget
    batch = int(os.environ.get("MVT_BENCH_B", 48))
    iters = int(os.environ.get("MVT_BENCH_ITERS", 3))
    blksize = int(os.environ.get("MVT_BENCH_BLKSIZE", 16))
    levels = int(os.environ.get("MVT_BENCH_LEVELS", 3))
    radius = int(os.environ.get("MVT_BENCH_RADIUS", 1))
    # MVT_BENCH_LAXMAP=1 restores the per-frame lax.map pipeline (the
    # pre-batched-engine shape, for A/B timing)
    laxmap = bool(os.environ.get("MVT_BENCH_LAXMAP"))
    engine = "exact" if os.environ.get("MVT_BENCH_CPU") else "lockstep"

    batch_fn, make_clip = build_headline(
        w=w, h=h, batch=batch, blksize=blksize, levels=levels,
        radius=radius, engine=engine, laxmap=laxmap)

    step = jax.jit(batch_fn)

    total = batch * iters
    clip = make_clip(total + 2 * radius)
    windows = [clip[b * batch:b * batch + batch + 2 * radius]
               for b in range(iters)]

    out = step(windows[0])
    out.block_until_ready()  # compile + warmup

    # every timed call gets DISTINCT frames: the device runtime may
    # memoize executions with identical input buffers
    t0 = time.perf_counter()
    for win in windows:
        out = step(win)
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
    try:
        main()
    except Exception:
        # a FRESH remote TPU compile often fails at its first execution
        # (INVALID_ARGUMENT) but lands in the persistent cache; a new
        # process then runs clean (CLAUDE.md).  The driver invokes this
        # script exactly once, so retry by re-exec'ing ourselves.
        import sys
        import traceback
        attempts = int(os.environ.get("MVT_BENCH_ATTEMPT", "0"))
        if attempts >= 2:
            raise
        traceback.print_exc()
        print(f"# bench attempt {attempts} failed; re-exec retry",
              flush=True)
        os.environ["MVT_BENCH_ATTEMPT"] = str(attempts + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
