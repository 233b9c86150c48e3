"""Frame-batched engine: analyse_batch / vmapped degrain parity with
the per-frame lockstep path, and interpret-mode twins for the
frame-folded Pallas kernels (the grid gains a frame-major tile axis;
each tile's subplane base is its frame id times pel^2)."""
import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import mvtools_tpu as mvt
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain
from mvtools_tpu.ops import probe, sadmap

tm = jax.tree_util.tree_map


def _gray_clip(rng, w, h, t):
    base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)
    return jnp.asarray(np.stack([base[i * 2:i * 2 + h, i * 3:i * 3 + w]
                                 for i in range(t)]))


def test_analyse_batch_matches_per_frame():
    """analyse_batch == per-frame analyse(engine="lockstep"), every
    level, bit-exact (the vmapped search + deferred rescue must not
    change a single vector)."""
    rng = np.random.default_rng(0)
    w, h, nf = 128, 96, 3
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=2, chroma=False).validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=False), isb=True).validate(sspec)
    frames = _gray_clip(rng, w, h, nf + 1)
    sups = [mvt.build_super([f], sspec) for f in frames]
    mvs = [mvt.analyse(sups[i], sups[i + 1], aspec, engine="lockstep")
           for i in range(nf)]
    ss = tm(lambda *a: jnp.stack(a), *sups[:nf])
    rs = tm(lambda *a: jnp.stack(a), *sups[1:nf + 1])
    mb = mvt.analyse_batch(ss, rs, aspec)
    for i in range(nf):
        for lv in range(len(mvs[i].levels)):
            for k in ("x", "y", "sad"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(mvs[i].levels[lv], k)),
                    np.asarray(getattr(mb.levels[lv], k))[i],
                    err_msg=f"frame {i} level {lv} {k}")


def test_analyse_batch_chroma_matches_per_frame():
    """YUV420 + chroma SAD: the batched chroma maps must agree too."""
    rng = np.random.default_rng(1)
    w, h, nf = 128, 96, 2
    fmt = VideoFormat(w, h, 8, ColorFamily.YUV420)
    sspec = SuperConfig(pel=2, levels=2, chroma=True).validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=True), isb=True).validate(sspec)
    ys = _gray_clip(rng, w, h, nf + 1)
    us = _gray_clip(rng, w // 2, h // 2, nf + 1)
    vs = _gray_clip(rng, w // 2, h // 2, nf + 1)
    sups = [mvt.build_super([ys[i], us[i], vs[i]], sspec)
            for i in range(nf + 1)]
    mvs = [mvt.analyse(sups[i], sups[i + 1], aspec, engine="lockstep")
           for i in range(nf)]
    ss = tm(lambda *a: jnp.stack(a), *sups[:nf])
    rs = tm(lambda *a: jnp.stack(a), *sups[1:nf + 1])
    mb = mvt.analyse_batch(ss, rs, aspec)
    for i in range(nf):
        for k in ("x", "y", "sad"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mvs[i].levels[0], k)),
                np.asarray(getattr(mb.levels[0], k))[i],
                err_msg=f"frame {i} {k}")


def test_analyse_batch_dct_matches_per_frame():
    """dct=2 now rides the mixed-cost dct map (batch_supported), so
    analyse_batch must equal per-frame analyse bit-exactly (VERDICT r4
    next-step #6)."""
    rng = np.random.default_rng(6)
    w, h, nf = 128, 96, 2
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=2, chroma=False).validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=False, dct=2), isb=True).validate(sspec)
    from mvtools_tpu.analyse import batch_supported
    assert batch_supported(aspec, sspec)
    frames = _gray_clip(rng, w, h, nf + 1)
    sups = [mvt.build_super([f], sspec) for f in frames]
    mvs = [mvt.analyse(sups[i], sups[i + 1], aspec, engine="lockstep")
           for i in range(nf)]
    ss = tm(lambda *a: jnp.stack(a), *sups[:nf])
    rs = tm(lambda *a: jnp.stack(a), *sups[1:nf + 1])
    mb = mvt.analyse_batch(ss, rs, aspec)
    for i in range(nf):
        for lv in range(len(mvs[i].levels)):
            for k in ("x", "y", "sad"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(mvs[i].levels[lv], k)),
                    np.asarray(getattr(mb.levels[lv], k))[i],
                    err_msg=f"frame {i} level {lv} {k}")


def test_analyse_batch_field_shift_matches_per_frame():
    """Per-job field_shift ([J]-array, nonzero, mixed signs) through
    BOTH analyse_batch paths — the batched map engine and the lax.map
    fallback (pel 4) — must equal per-frame analyse with the scalar
    shift (ADVICE r4 #2)."""
    rng = np.random.default_rng(5)
    w, h, nf = 128, 96, 3
    shifts = np.asarray([2, -2, 0], np.int32)
    for pel in (2, 4):   # 2: batch-supported map path; 4: fallback
        fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
        sspec = SuperConfig(pel=pel, levels=2, chroma=False).validate(fmt)
        aspec = dataclasses.replace(
            AnalyseConfig(blksize=16, levels=2, truemotion=True,
                          chroma=False), isb=True).validate(sspec)
        frames = _gray_clip(rng, w, h, nf + 1)
        sups = [mvt.build_super([f], sspec) for f in frames]
        mvs = [mvt.analyse(sups[i], sups[i + 1], aspec,
                           engine="lockstep",
                           field_shift=jnp.asarray(shifts[i]))
               for i in range(nf)]
        ss = tm(lambda *a: jnp.stack(a), *sups[:nf])
        rs = tm(lambda *a: jnp.stack(a), *sups[1:nf + 1])
        mb = mvt.analyse_batch(ss, rs, aspec,
                               field_shift=jnp.asarray(shifts))
        for i in range(nf):
            for lv in range(len(mvs[i].levels)):
                for k in ("x", "y", "sad"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(mvs[i].levels[lv], k)),
                        np.asarray(getattr(mb.levels[lv], k))[i],
                        err_msg=f"pel {pel} frame {i} level {lv} {k}")


def test_vmapped_degrain_matches_per_frame():
    """jax.vmap(degrain) over frames == per-frame degrain (the batched
    fetch path included)."""
    rng = np.random.default_rng(2)
    w, h, batch, radius = 128, 96, 2, 1
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    sspec = SuperConfig(pel=2, levels=2, chroma=False).validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=2, truemotion=True,
                         chroma=False)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    dcfg = DegrainConfig(thsad=400)
    window = _gray_clip(rng, w, h, batch + 2 * radius)
    sups_l = [mvt.build_super([f], sspec) for f in window]
    outs_ref = []
    for i in range(batch):
        c = i + radius
        mvs, sups_r = [], []
        for k in range(1, radius + 1):
            mvs += [mvt.analyse(sups_l[c], sups_l[c + k], aspec_b,
                                engine="lockstep"),
                    mvt.analyse(sups_l[c], sups_l[c - k], aspec_b,
                                engine="lockstep")]
            sups_r += [sups_l[c + k], sups_l[c - k]]
        outs_ref.append(degrain([window[c]], sups_r, mvs, aspec_b.meta,
                                dcfg)[0])
    sups = jax.vmap(lambda f: mvt.build_super([f], sspec))(window)
    src_idx, ref_idx = [], []
    for i in range(batch):
        c = i + radius
        for k in range(1, radius + 1):
            src_idx += [c, c]
            ref_idx += [c + k, c - k]
    src_idx, ref_idx = np.asarray(src_idx), np.asarray(ref_idx)
    mvb = mvt.analyse_batch(tm(lambda a: a[src_idx], sups),
                            tm(lambda a: a[ref_idx], sups), aspec_b)
    j_per = 2 * radius
    mv_f = tm(lambda a: a.reshape((batch, j_per) + a.shape[1:]), mvb)
    sup_f = tm(lambda a: a[ref_idx].reshape((batch, j_per)
                                            + a.shape[1:]), sups)

    def one(frame, mvs_b, sups_b):
        mvs = [tm(lambda a: a[j], mvs_b) for j in range(j_per)]
        sups_r = [tm(lambda a: a[j], sups_b) for j in range(j_per)]
        return degrain([frame], sups_r, mvs, aspec_b.meta, dcfg)[0]

    outs_v = jax.vmap(one)(window[radius:radius + batch], mv_f, sup_f)
    np.testing.assert_array_equal(np.asarray(jnp.stack(outs_ref)),
                                  np.asarray(outs_v))


def _interp(monkeypatch, mod):
    orig = jax.experimental.pallas.pallas_call
    monkeypatch.setattr(
        mod.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def test_batched_sad_map_kernel_interpret(monkeypatch):
    """Frame-batched sad_map_pallas (interpret mode: real kernel body,
    emulated DMAs) == per-frame sad_map_pallas, including the fid ->
    subplane-base arithmetic at frame boundaries."""
    _interp(monkeypatch, sadmap)
    rng = np.random.default_rng(3)
    pel, bs, r, tile, nf = 2, 16, 4, 4, 3
    pitch = bs
    hp, wp = 160, 640
    ntile = 5     # odd so chunk padding hits frame boundaries
    stacks = rng.integers(0, 256, (nf, pel * pel, hp, wp), np.uint8)
    span_pad = sadmap.map_geom(r, r, bs, bs, pel, tile, pitch)[3]
    (lo_y, hi_y), (lo_x, hi_x) = sadmap.anchor_bounds(
        r, r, bs, bs, pel, tile, pitch, hp, wp)
    afy = rng.integers(lo_y, hi_y + 1, (nf, ntile)).astype(np.int32)
    afx = rng.integers(lo_x, hi_x + 1, (nf, ntile)).astype(np.int32)
    spans = rng.integers(0, 256, (nf, ntile, bs, span_pad), np.uint8)
    got = np.asarray(sadmap.sad_map_pallas(
        jnp.asarray(stacks), jnp.asarray(afy), jnp.asarray(afx),
        jnp.asarray(spans), r, r, bs, bs, pel, tile, pitch))
    for f in range(nf):
        want = np.asarray(sadmap.sad_map_pallas(
            jnp.asarray(stacks[f]), jnp.asarray(afy[f]),
            jnp.asarray(afx[f]), jnp.asarray(spans[f]), r, r, bs, bs,
            pel, tile, pitch))
        np.testing.assert_array_equal(got[f], want, err_msg=f"frame {f}")


def test_batched_fetch_kernels_interpret(monkeypatch):
    """Frame-batched fetch kernels (tiled + plain) == per-frame."""
    _interp(monkeypatch, probe)
    rng = np.random.default_rng(4)
    pel, bs, nf, nblk, kk = 2, 16, 3, 24, 2
    hp, wp = 160, 1280
    stacks = rng.integers(0, 256, (nf, pel * pel, hp, wp), np.uint8)
    tile = 8
    wy_total, wx_total, cy0, cx0 = probe.tile_params(
        ((0, 0),), bs, bs, pel, tile, bs)
    cy = rng.integers(0, (hp - wy_total - 8) * pel,
                      (nf, nblk, kk)).astype(np.int32)
    cx = rng.integers(0, (wp - wx_total - 128) * pel,
                      (nf, nblk, kk)).astype(np.int32)
    got = np.asarray(probe.fetch_blocks_tiled_pallas(
        jnp.asarray(stacks), jnp.asarray(cy), jnp.asarray(cx), bs, bs,
        pel, tile, wy_total, wx_total, cy0, cx0))
    for f in range(nf):
        want = np.asarray(probe.fetch_blocks_tiled_pallas(
            jnp.asarray(stacks[f]), jnp.asarray(cy[f]),
            jnp.asarray(cx[f]), bs, bs, pel, tile, wy_total, wx_total,
            cy0, cx0))
        np.testing.assert_array_equal(got[f], want,
                                      err_msg=f"tiled frame {f}")
    got = np.asarray(probe.fetch_blocks_pallas(
        jnp.asarray(stacks), jnp.asarray(cy), jnp.asarray(cx), bs, bs,
        pel))
    for f in range(nf):
        want = np.asarray(probe.fetch_blocks_pallas(
            jnp.asarray(stacks[f]), jnp.asarray(cy[f]),
            jnp.asarray(cx[f]), bs, bs, pel))
        np.testing.assert_array_equal(got[f], want,
                                      err_msg=f"plain frame {f}")
