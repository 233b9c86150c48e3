"""Tests for the window-probe SAD primitive and the lockstep field engine.

The Pallas kernel itself only runs on TPU (its XLA fallback is the CPU
oracle here); these tests validate the fallback's semantics against a
direct numpy evaluation, and the lockstep engine end-to-end against known
motion.  On real TPU hardware (MVT_TEST_TPU=1) the same tests exercise
the Pallas path through the backend dispatch.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.ops import probe


def _numpy_probe(stack, cand_y, cand_x, src_blocks, offsets, bs, pel):
    """Direct per-candidate evaluation of the probe semantics
    (pobGetRefBlock subplane addressing, MVFrame.cpp:1717-1754)."""
    pelm = pel - 1
    logp = pel.bit_length() - 1
    nblk, kk = cand_y.shape
    out = np.zeros((nblk, kk, len(offsets)), np.int64)
    for b in range(nblk):
        for k in range(kk):
            for d, (dx, dy) in enumerate(offsets):
                ay = cand_y[b, k] + dy
                ax = cand_x[b, k] + dx
                sub = (ax & pelm) | ((ay & pelm) << logp)
                yf, xf = ay >> logp, ax >> logp
                ref = stack[sub, yf:yf + bs, xf:xf + bs].astype(np.int64)
                out[b, k, d] = np.abs(ref - src_blocks[b]).sum()
    return out


@pytest.mark.parametrize("pel", [1, 2])
def test_probe_sads_matches_numpy(pel):
    rng = np.random.default_rng(3)
    ph, pw = 64, 80
    stack = rng.integers(0, 256, (pel * pel, ph, pw), np.uint8)
    padded = probe.pad_stack(jnp.asarray(stack), 8)
    nblk, kk = 12, 2
    bs = 8
    offsets = ((0, 0), (-2, 1), (1, -1), (2, 2))
    y0 = rng.integers(8, ph - 24, nblk)
    x0 = rng.integers(8, pw - 24, nblk)
    vy = rng.integers(-4, 5, (nblk, kk))
    vx = rng.integers(-4, 5, (nblk, kk))
    cy = ((y0 + 8)[:, None] * pel + vy).astype(np.int32)
    cx = ((x0 + 8)[:, None] * pel + vx).astype(np.int32)
    src = rng.integers(0, 256, (nblk, bs, bs), np.int64)

    got = probe.probe_sads(padded, jnp.asarray(cy), jnp.asarray(cx),
                           jnp.asarray(src.astype(np.int32)), offsets,
                           bs, bs, pel)
    # numpy oracle works on the same padded stack / padded coordinates
    want = _numpy_probe(np.asarray(padded), cy, cx, src, offsets, bs, pel)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_lockstep_translation_recovery():
    """A pure translation is recovered exactly by every block (SURVEY §4
    property test) with the lockstep engine."""
    rng = np.random.default_rng(0)
    w, h = 160, 128
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=2, levels=2, chroma=False)
    sspec = scfg.validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True, chroma=False),
        isb=True).validate(sspec)
    base = rng.integers(0, 230, (h + 16, w + 16), np.uint8)
    f0 = jnp.asarray(base[4:4 + h, 6:6 + w])
    f1 = jnp.asarray(base[2:2 + h, 3:3 + w])
    s0 = build_super([f0], scfg, fmt)
    s1 = build_super([f1], scfg, fmt)
    mv = analyse(s0, s1, aspec, engine="lockstep")
    x = np.asarray(mv.levels[0].x)
    y = np.asarray(mv.levels[0].y)
    # interior blocks must recover the translation exactly; edge blocks
    # see content that shifted out of frame, so their true match is
    # undefined and they may settle elsewhere with residual SAD
    assert ((x == 6) & (y == 4))[1:-1, 1:-1].mean() == 1.0
    sad = np.asarray(mv.levels[0].sad)
    assert int(sad[1:-1, 1:-1].max()) == 0


def test_lockstep_zero_motion():
    """Identical frames -> all-zero field with zero SAD."""
    rng = np.random.default_rng(5)
    w, h = 96, 64
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=1, levels=1, chroma=False)
    sspec = scfg.validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=8, levels=1, truemotion=True, chroma=False),
        isb=True).validate(sspec)
    f0 = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    s0 = build_super([f0], scfg, fmt)
    mv = analyse(s0, s0, aspec, engine="lockstep")
    assert int(np.abs(np.asarray(mv.levels[0].x)).max()) == 0
    assert int(np.abs(np.asarray(mv.levels[0].y)).max()) == 0
    assert int(np.asarray(mv.levels[0].sad).max()) == 0


def test_lockstep_matches_exact_sads():
    """Lockstep is not bit-exact vs the sequential engine, but on easy
    content the final SADs must be as good (<=) on nearly every block."""
    rng = np.random.default_rng(1)
    w, h = 128, 96
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=1, levels=2, chroma=False)
    sspec = scfg.validate(fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True, chroma=False),
        isb=True).validate(sspec)
    base = rng.integers(0, 256, (h + 8, w + 8), np.uint8)
    f0 = jnp.asarray(base[2:2 + h, 1:1 + w])
    f1 = jnp.asarray(base[0:h, 3:3 + w])
    s0 = build_super([f0], scfg, fmt)
    s1 = build_super([f1], scfg, fmt)
    mv_e = analyse(s0, s1, aspec, engine="exact")
    mv_l = analyse(s0, s1, aspec, engine="lockstep")
    se = np.asarray(mv_e.levels[0].sad)
    sl = np.asarray(mv_l.levels[0].sad)
    assert (sl <= se).mean() > 0.9
    assert sl.mean() <= se.mean() * 1.05


def test_probe_stats_satd_luma():
    """The stats probe (sad, satd, ref-luma) matches the cost kernels
    (on TPU via the in-kernel Hadamard matmuls, on CPU via the XLA
    fallback)."""
    from mvtools_tpu.ops import sad as sad_ops
    rng = np.random.default_rng(9)
    pel = 2
    ph, pw = 80, 96
    stack = rng.integers(0, 256, (pel * pel, ph, pw), np.uint8)
    padded = probe.pad_stack(jnp.asarray(stack), 8)
    nblk, bs = 40, 16
    y0 = rng.integers(8, ph - 40, nblk)
    x0 = rng.integers(8, pw - 40, nblk)
    cy = ((y0 + 8) * pel + rng.integers(-3, 4, nblk)).astype(np.int32)
    cx = ((x0 + 8) * pel + rng.integers(-3, 4, nblk)).astype(np.int32)
    src = rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32)
    offsets = ((0, 0), (1, -2))
    out = probe.probe_sads(padded, jnp.asarray(cy)[:, None],
                           jnp.asarray(cx)[:, None], jnp.asarray(src),
                           offsets, bs, bs, pel, stats="sad_satd_luma")
    assert out.shape == (nblk, 1, 2, 3)
    pelm = pel - 1
    logp = 1
    for b in range(0, nblk, 7):
        for d, (dx, dy) in enumerate(offsets):
            ay, ax = cy[b] + dy, cx[b] + dx
            sub = (ax & pelm) | ((ay & pelm) << logp)
            ref = np.asarray(padded)[sub, ay >> logp:(ay >> logp) + bs,
                                     ax >> logp:(ax >> logp) + bs]
            ref = ref.astype(np.int32)
            want_sad = int(np.abs(ref - src[b]).sum())
            want_satd = int(np.asarray(sad_ops.satd(
                jnp.asarray(src[b]), jnp.asarray(ref))))
            want_luma = int(ref.sum())
            got = [int(v) for v in np.asarray(out[b, 0, d])]
            assert got == [want_sad, want_satd, want_luma], (b, d)


def test_lockstep_satd_mode_agrees_with_exact():
    """dct=5 (pure SATD cost) through the field-level path: vector
    agreement with the exact engine on translation content must match
    the dct=0 level (the differences are engine sweep order, not the
    cost kernel)."""
    rng = np.random.default_rng(4)
    w, h = 96, 64
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=2, levels=2, chroma=False)
    sspec = scfg.validate(fmt)
    base = rng.integers(0, 256, (h + 8, w + 8), np.uint8)
    f0 = jnp.asarray(np.ascontiguousarray(base[:h, :w]))
    f1 = jnp.asarray(np.ascontiguousarray(base[2:h + 2, 3:w + 3]))
    s0 = build_super([f0], scfg, fmt)
    s1 = build_super([f1], scfg, fmt)
    for dct in (5, 6):
        aspec = dataclasses.replace(
            AnalyseConfig(blksize=16, levels=2, truemotion=True,
                          chroma=False, dct=dct), isb=True).validate(sspec)
        mv_l = analyse(s1, s0, aspec, engine="lockstep", lockstep_iters=2)
        mv_e = analyse(s1, s0, aspec, engine="exact")
        same = ((np.asarray(mv_l.finest.x) == np.asarray(mv_e.finest.x))
                & (np.asarray(mv_l.finest.y) == np.asarray(mv_e.finest.y)))
        # identical vectors must carry identical (mixed) costs
        ls = np.asarray(mv_l.finest.sad)
        es = np.asarray(mv_e.finest.sad)
        np.testing.assert_array_equal(ls[same], es[same])
        assert same.mean() > 0.8, f"dct={dct}: {same.mean()}"


@pytest.mark.parametrize("stats", ["sad", "sad_satd_luma"])
def test_probe_kernels_interpret_match_xla(monkeypatch, stats):
    """The real Pallas probe kernels (per-block, tiled, fetch) executed
    in interpret mode vs the XLA fallback — hardware-free coverage of
    the kernel bodies (DMA addressing, alignment rolls, parity-class
    handling, in-kernel SATD matmuls)."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        probe.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.default_rng(13)
    pel, bs = 2, 16
    ph, pw = 96, 160
    stack = probe.pad_stack(
        jnp.asarray(rng.integers(0, 256, (pel * pel, ph, pw), np.uint8)),
        16)
    nblk = 24
    cy = jnp.asarray(((16 + rng.integers(8, 40, nblk)) * pel
                      + rng.integers(-3, 4, nblk)).astype(np.int32))
    cx = jnp.asarray(((16 + rng.integers(8, 96, nblk)) * pel
                      + rng.integers(-3, 4, nblk)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (1, -2), (-2, 3))

    got = probe.probe_sads_pallas(stack, cy[:, None], cx[:, None], src,
                                  offsets, bs, bs, pel, stats=stats)
    want = probe.probe_sads_xla(stack, cy[:, None], cx[:, None], src,
                                offsets, bs, bs, pel, stats=stats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    if stats == "sad":
        # tiled fetch kernel (exact for every block incl. fallbacks)
        got_f = probe.fetch_blocks_pallas(stack, cy[:, None],
                                          cx[:, None], bs, bs, pel)
        pelm, logp = pel - 1, 1
        for b in range(nblk):
            ay, ax = int(cy[b]), int(cx[b])
            sub = (ax & pelm) | ((ay & pelm) << logp)
            ref = np.asarray(stack)[sub, ay >> logp:(ay >> logp) + bs,
                                    ax >> logp:(ax >> logp) + bs]
            np.testing.assert_array_equal(np.asarray(got_f[b, 0]), ref,
                                          err_msg=f"fetch block {b}")
