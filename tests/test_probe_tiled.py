"""Tiled window-probe path (ops/probe.probe_sads_tiled).

The tiled probe amortises one [pel^2, WY, WX] window DMA over a tile of
consecutive blocks; candidates whose window falls outside the static
tile extent report INVALID_SAD and lose every cost comparison.  These
tests pin the XLA reference semantics (the Pallas kernel is checked
against it on hardware via MVT_TEST_TPU=1 in test_probe.py) and the
engine-level integration.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvtools_tpu import analyse, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.ops import probe


def _mk_stack(rng, pel, ph, pw):
    return probe.pad_stack(
        jnp.asarray(rng.integers(0, 256, (pel * pel, ph, pw), np.uint8)),
        16)


def _clustered_cands(rng, nblk, k, pel, pitch, base_y=200, base_x=400,
                     spread=6):
    """Candidates shaped like the engine's: block-position ramp plus a
    small MV wiggle."""
    bx = base_x + pitch * pel * (np.arange(nblk) % 32)
    cx = bx[:, None] + rng.integers(-spread, spread + 1, (nblk, k))
    cy = base_y + rng.integers(-spread, spread + 1, (nblk, 1))
    cy = np.broadcast_to(cy, (nblk, k)) + rng.integers(
        -spread, spread + 1, (nblk, k))
    return cy.astype(np.int32), cx.astype(np.int32)


@pytest.mark.parametrize("pel,offsets,k", [
    (1, ((0, 0),), 6),
    (2, ((0, 0), (1, -2), (-1, 1), (2, 2)), 1),
    (2, ((0, 0),), 6),
])
def test_tiled_xla_matches_perblock_when_valid(pel, offsets, k):
    rng = np.random.default_rng(11)
    ph, pw = 400, 1200
    stack = _mk_stack(rng, pel, ph, pw)
    nblk, bs = 64, 16
    tile = 8 if k <= 2 else 4
    pitch = 16
    cy, cx = _clustered_cands(rng, nblk, k, pel, pitch)
    src = jnp.asarray(
        rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    wy_t, wx_t, c_y, c_x = probe.tile_params(offsets, bs, bs, pel, tile,
                                             pitch)
    ref = probe.probe_sads_xla(stack, jnp.asarray(cy), jnp.asarray(cx),
                               src, offsets, bs, bs, pel)
    out = probe.probe_sads_tiled_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x)
    out = np.asarray(out)
    ref = np.asarray(ref)
    valid = out != probe.INVALID_SAD
    assert valid.all(), "clustered candidates must all fit the tile"
    np.testing.assert_array_equal(out, ref)


def test_tiled_xla_flags_outliers_invalid():
    rng = np.random.default_rng(3)
    pel, bs, tile, pitch, k = 2, 16, 8, 16, 1
    stack = _mk_stack(rng, pel, 400, 1200)
    nblk = 32
    cy, cx = _clustered_cands(rng, nblk, k, pel, pitch)
    # one wild candidate per tile, far beyond the +-margin budget
    cx[5, 0] += 2000
    cy[13, 0] += 900
    src = jnp.asarray(
        rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (1, 1))
    wy_t, wx_t, c_y, c_x = probe.tile_params(offsets, bs, bs, pel, tile,
                                             pitch)
    out = np.asarray(probe.probe_sads_tiled_xla(
        stack, jnp.asarray(np.clip(cy, 0, 700)),
        jnp.asarray(np.clip(cx, 0, 2100)), src, offsets, bs, bs, pel,
        tile, wy_t, wx_t, c_y, c_x))
    assert (out[5] == probe.INVALID_SAD).all()
    assert (out[13] == probe.INVALID_SAD).all()
    ref = np.asarray(probe.probe_sads_xla(
        stack, jnp.asarray(np.clip(cy, 0, 700)),
        jnp.asarray(np.clip(cx, 0, 2100)), src, offsets, bs, bs, pel))
    mask = out != probe.INVALID_SAD
    np.testing.assert_array_equal(out[mask], ref[mask])
    # the outlier must not poison its tile: every other block stays valid
    other = np.ones(nblk, bool)
    other[[5, 13]] = False
    assert mask[other].all()


def test_tiled_wrapper_row_padding():
    """row_len not a multiple of tile: the wrapper pads each block row
    and unpads the result; values match the per-block probe."""
    rng = np.random.default_rng(7)
    pel, bs, pitch = 1, 16, 16
    stack = _mk_stack(rng, pel, 300, 900)
    row_len, nrows = 13, 4          # 13 % 8 != 0
    nblk = row_len * nrows
    cy, cx = _clustered_cands(rng, nblk, 1, pel, pitch, base_y=150, base_x=200)
    src = jnp.asarray(
        rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (0, 1), (1, 0))
    out = np.asarray(probe.probe_sads_tiled(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, row_len=row_len, pitch_x=pitch))
    ref = np.asarray(probe.probe_sads_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel))
    mask = out != probe.INVALID_SAD
    np.testing.assert_array_equal(out[mask], ref[mask])
    assert mask.mean() > 0.95


def test_tiled_stats_path():
    rng = np.random.default_rng(5)
    pel, bs, tile, pitch = 2, 16, 8, 16
    stack = _mk_stack(rng, pel, 300, 900)
    nblk = 16
    cy, cx = _clustered_cands(rng, nblk, 1, pel, pitch, base_y=150, base_x=300)
    src = jnp.asarray(
        rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (1, -2))
    wy_t, wx_t, c_y, c_x = probe.tile_params(offsets, bs, bs, pel, tile,
                                             pitch)
    out = np.asarray(probe.probe_sads_tiled_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x, stats="sad_satd_luma"))
    ref = np.asarray(probe.probe_sads_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, stats="sad_satd_luma"))
    mask = out != probe.INVALID_SAD
    np.testing.assert_array_equal(out[mask], ref[mask])
    assert mask.all()


def test_small_plane_falls_back_to_per_block():
    rng = np.random.default_rng(2)
    pel, bs = 1, 8
    stack = probe.pad_stack(
        jnp.asarray(rng.integers(0, 256, (1, 40, 56), np.uint8)), 16)
    nblk = 12
    cy = jnp.asarray(np.full((nblk, 1), 20, np.int32))
    cx = jnp.asarray(np.full((nblk, 1), 30, np.int32))
    src = jnp.asarray(rng.integers(0, 256, (nblk, bs, bs), np.int64)
                      .astype(np.int32))
    out = np.asarray(probe.probe_sads_tiled(
        stack, cy, cx, src, ((0, 0),), bs, bs, pel, row_len=4,
        pitch_x=8))
    ref = np.asarray(probe.probe_sads_xla(
        stack, cy, cx, src, ((0, 0),), bs, bs, pel))
    np.testing.assert_array_equal(out, ref)


def test_lockstep_tiled_matches_untiled_translation(monkeypatch):
    """On translation content the tile windows always fit, so the tiled
    engine must produce the identical MV field."""
    rng = np.random.default_rng(4)
    w, h = 192, 128
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=2, levels=2, chroma=False)
    sspec = scfg.validate(fmt)
    base = rng.integers(0, 256, (h + 8, w + 8), np.uint8)
    f0 = jnp.asarray(np.ascontiguousarray(base[:h, :w]))
    f1 = jnp.asarray(np.ascontiguousarray(base[2:h + 2, 3:w + 3]))
    s0 = build_super([f0], scfg, fmt)
    s1 = build_super([f1], scfg, fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=False), isb=True).validate(sspec)
    fields = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("MVT_TILED", flag)
        mv = analyse(s1, s0, aspec, engine="lockstep")
        fields[flag] = (np.asarray(mv.finest.x), np.asarray(mv.finest.y),
                        np.asarray(mv.finest.sad))
    for a, b in zip(fields["0"], fields["1"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif("not __import__('os').environ.get('MVT_TEST_TPU')")
def test_tiled_pallas_matches_xla_on_hardware():
    """Real-TPU check: the Pallas tiled kernels agree with the XLA
    reference bit-for-bit, including INVALID_SAD flagging and the fetch
    kernel's private-DMA fallback path."""
    rng = np.random.default_rng(21)
    pel, bs, tile, pitch, k = 2, 16, 4, 16, 6
    stack = _mk_stack(rng, pel, 400, 1200)
    nblk = 64
    cy, cx = _clustered_cands(rng, nblk, k, pel, pitch)
    cy[9] += 600          # whole-block outlier -> INVALID (probe) /
    cx[33] += 1400        # fallback DMA (fetch)
    cy = np.clip(cy, 0, 700)
    cx = np.clip(cx, 0, 2100)
    src = jnp.asarray(
        rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (1, -2), (-1, 1))
    wy_t, wx_t, c_y, c_x = probe.tile_params(offsets, bs, bs, pel, tile,
                                             pitch)
    want = np.asarray(probe.probe_sads_tiled_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x))
    got = np.asarray(probe.probe_sads_tiled_pallas(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x))
    np.testing.assert_array_equal(got, want)
    # stats (SATD) variant
    want = np.asarray(probe.probe_sads_tiled_xla(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x, stats="sad_satd_luma"))
    got = np.asarray(probe.probe_sads_tiled_pallas(
        stack, jnp.asarray(cy), jnp.asarray(cx), src, offsets, bs, bs,
        pel, tile, wy_t, wx_t, c_y, c_x, stats="sad_satd_luma"))
    np.testing.assert_array_equal(got, want)
    # tiled fetch must be EXACT everywhere (fallback DMA for outliers)
    wy_t, wx_t, c_y, c_x = probe.tile_params(((0, 0),), bs, bs, pel, 8,
                                             pitch)
    got = np.asarray(probe.fetch_blocks_tiled_pallas(
        stack, jnp.asarray(cy[:, :1]), jnp.asarray(cx[:, :1]), bs, bs,
        pel, 8, wy_t, wx_t, c_y, c_x))
    logp = 1
    for b in range(nblk):
        y, x = int(cy[b, 0]), int(cx[b, 0])
        sub = (x & 1) | ((y & 1) << logp)
        want_b = np.asarray(stack)[sub, y >> 1:(y >> 1) + bs,
                                   x >> 1:(x >> 1) + bs]
        np.testing.assert_array_equal(got[b, 0], want_b.astype(np.int32),
                                      err_msg=str(b))


def test_tiled_fetch_pallas_traces():
    """Abstract trace of the tiled fetch kernel (exact per-block
    fallback DMA path included)."""
    pel, bs, tile, pitch = 2, 16, 8, 16
    stack = jnp.zeros((pel * pel, 400, 1200), jnp.uint8)
    nblk = 64
    cy = jnp.zeros((nblk, 1), jnp.int32) + 200
    cx = jnp.zeros((nblk, 1), jnp.int32) + 200
    wy_t, wx_t, c_y, c_x = probe.tile_params(((0, 0),), bs, bs, pel,
                                             tile, pitch)
    r = jax.eval_shape(
        lambda s, a, b: probe.fetch_blocks_tiled_pallas(
            s, a, b, bs, bs, pel, tile, wy_t, wx_t, c_y, c_x),
        stack, cy, cx)
    assert r.shape == (nblk, 1, bs, bs)


def test_tiled_pallas_traces():
    """Abstract trace of the Pallas tiled kernel (catches captured
    constants / spec mismatches without TPU hardware)."""
    pel, bs, tile, pitch = 2, 16, 8, 16
    stack = jnp.zeros((pel * pel, 400, 1200), jnp.uint8)
    nblk = 64
    cy = jnp.zeros((nblk, 1), jnp.int32) + 200
    cx = jnp.zeros((nblk, 1), jnp.int32) + 200
    src = jnp.zeros((nblk, bs, bs), jnp.int32)
    offsets = ((0, 0), (1, -2), (-1, 1))
    wy_t, wx_t, c_y, c_x = probe.tile_params(offsets, bs, bs, pel, tile,
                                             pitch)
    for stats in ("sad", "sad_satd_luma"):
        r = jax.eval_shape(
            lambda s, a, b, c: probe.probe_sads_tiled_pallas(
                s, a, b, c, offsets, bs, bs, pel, tile, wy_t, wx_t,
                c_y, c_x, stats=stats), stack, cy, cx, src)
        want = ((nblk, 1, 3, 3) if stats == "sad_satd_luma"
                else (nblk, 1, 3))
        assert r.shape == want


@pytest.mark.parametrize("stats", ["sad", "sad_satd_luma"])
def test_tiled_kernels_interpret_match_xla(monkeypatch, stats):
    """The real tiled Pallas kernels (probe + fetch) executed in
    interpret mode vs their XLA references — covers the tile-window
    DMA addressing, med3 anchoring, in-extent validity masks, and the
    per-block fallback DMA of the tiled fetch, without hardware."""
    import jax
    from jax.experimental import pallas as pl
    from mvtools_tpu.ops import probe
    orig = pl.pallas_call
    monkeypatch.setattr(
        probe.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(17)
    pel, bs, tile = 2, 16, 4
    ph, pw = 128, 256
    stack = probe.pad_stack(
        jnp.asarray(rng.integers(0, 256, (pel * pel, ph, pw),
                                 np.uint8)), 16)
    row_len, nrows = 8, 3
    nblk = row_len * nrows
    base_y = (16 + 16 * (np.arange(nblk) // row_len)).astype(np.int32)
    base_x = (16 + 16 * (np.arange(nblk) % row_len)).astype(np.int32)
    # smooth candidates with a couple of outliers (fallback coverage)
    cy = ((base_y + rng.integers(-4, 5, nblk)) * pel).astype(np.int32)
    cx = ((base_x + rng.integers(-4, 5, nblk)) * pel).astype(np.int32)
    cy[5] = (base_y[5] + 40) * pel      # far off the tile anchor
    cx[11] = (base_x[11] - 14) * pel
    src = jnp.asarray(rng.integers(0, 256, (nblk, bs, bs)).astype(np.int32))
    offsets = ((0, 0), (1, -2), (-1, 2))
    cyj, cxj = jnp.asarray(cy)[:, None], jnp.asarray(cx)[:, None]

    wy_total, wx_total, center_y, center_x = probe.tile_params(
        offsets, bs, bs, pel, tile, 16)
    got = probe.probe_sads_tiled_pallas(
        stack, cyj, cxj, src, offsets, bs, bs, pel, tile, wy_total,
        wx_total, center_y, center_x, stats=stats)
    want = probe.probe_sads_tiled_xla(
        stack, cyj, cxj, src, offsets, bs, bs, pel, tile, wy_total,
        wx_total, center_y, center_x, stats=stats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    if stats == "sad":
        # tiled fetch: EXACT everywhere incl. the out-of-extent
        # fallback blocks
        got_f = probe.fetch_blocks_tiled(
            stack, cyj, cxj, bs, bs, pel, row_len=row_len, pitch_x=16,
            tile=tile)
        pelm, logp = pel - 1, 1
        st = np.asarray(stack)
        for b in range(nblk):
            ay, ax = int(cy[b]), int(cx[b])
            sub = (ax & pelm) | ((ay & pelm) << logp)
            ref = st[sub, ay >> logp:(ay >> logp) + bs,
                     ax >> logp:(ax >> logp) + bs]
            np.testing.assert_array_equal(
                np.asarray(got_f[b, 0]), ref, err_msg=f"block {b}")
