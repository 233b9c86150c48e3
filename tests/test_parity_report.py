"""Lockstep-vs-exact quality report (VERDICT r1 weak #4).

The production lockstep engine is by design not bit-exact (Jacobi
predictors, per-block badcount); these tests QUANTIFY the gap on
synthetic and structured content — translation, rotation, zoom,
occlusion — across pel 1/2/4, overlap, and chroma, asserting SAD-ratio
and post-Degrain PSNR bounds that fail on regression.  The measured
numbers are recorded in BASELINE.md."""

import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

import mvtools_tpu as mvt
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain


def _psnr(a, b, peak=255.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def _textured(rng, h, w):
    base = rng.normal(size=(h, w)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(base, 1, mode="wrap")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (3, 3)), k)
    return (base - base.min()) / np.ptp(base) * 255


def _warp(img, kind, t):
    """Structured motion: translation / rotation / zoom / occlusion."""
    h, w = img.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    if kind == "translation":
        sy, sx = 2.0 * t, 3.0 * t
        ys, xs = yy + sy, xx + sx
    elif kind == "rotation":
        a = 0.01 * t
        cy, cx = h / 2, w / 2
        ys = cy + (yy - cy) * np.cos(a) - (xx - cx) * np.sin(a)
        xs = cx + (yy - cy) * np.sin(a) + (xx - cx) * np.cos(a)
    elif kind == "zoom":
        z = 1.0 + 0.02 * t
        cy, cx = h / 2, w / 2
        ys = cy + (yy - cy) / z
        xs = cx + (xx - cx) / z
    else:                        # occlusion: moving box over still bg
        out = img.copy()
        x0 = (10 + 7 * t) % (w - 24)
        out[20:44, x0:x0 + 24] = 64
        return out
    y0 = np.clip(ys.astype(np.int32), 0, h - 1)
    x0 = np.clip(xs.astype(np.int32), 0, w - 1)
    return img[y0, x0]


CASES = [
    # (name, pel, overlap, chroma, levels, lockstep_iters)
    # pel4 needs a second Jacobi sweep: one sweep measures a 14% SAD gap
    # on rotation (predictor lag at qpel granularity); two sweeps restore
    # ratio 1.0000 (see BASELINE.md parity table)
    ("pel1", 1, 0, False, 2, 1),
    ("pel2_overlap", 2, 4, False, 2, 1),
    ("pel4", 4, 0, False, 2, 2),
    ("pel2_chroma", 2, 4, True, 2, 1),
]

MOTIONS = ["translation", "rotation", "zoom", "occlusion"]


_FAST_PARITY_CASES = {"pel1", "pel2_chroma"}


@pytest.mark.parametrize(
    "case", [pytest.param(c[0], marks=()
                          if c[0] in _FAST_PARITY_CASES
                          else pytest.mark.slow)
             for c in CASES])
def test_lockstep_parity_report(case):
    """Each case runs in a fresh interpreter: inside a long pytest
    process, XLA:CPU's AOT executable loader intermittently segfaults
    deserializing this test's compilation-cache entries (the
    machine-feature-mismatch warning path); standalone it is stable."""
    if os.environ.get("MVT_PARITY_INNER"):
        pytest.skip("outer wrapper only")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.abspath(__file__), "-q",
         "-k", f"inner and {case}"],
        env={**os.environ, "MVT_PARITY_INNER": "1"},
        capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]


@pytest.mark.parametrize("name,pel,overlap,chroma,levels,iters", CASES)
def test_lockstep_parity_report_inner(name, pel, overlap, chroma, levels,
                                      iters):
    if not os.environ.get("MVT_PARITY_INNER"):
        pytest.skip("run via the subprocess wrapper")
    rng = np.random.default_rng(11)
    w, h = 128, 96
    img = _textured(rng, h, w)
    fam = ColorFamily.YUV420 if chroma else ColorFamily.GRAY
    fmt = VideoFormat(w, h, 8, fam)
    scfg = SuperConfig(pel=pel, levels=levels, chroma=chroma)
    sspec = scfg.validate(fmt)
    acfg = AnalyseConfig(blksize=16, levels=levels, overlap=overlap,
                         truemotion=True, chroma=chroma)
    aspec_b = dataclasses.replace(acfg, isb=True).validate(sspec)
    dcfg = DegrainConfig(thsad=500)

    sad_ratios = []
    degrain_psnrs = []
    for kind in MOTIONS:
        f0 = np.clip(_warp(img, kind, 0)
                     + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
        f1 = np.clip(_warp(img, kind, 1)
                     + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)

        def planes(y):
            if not chroma:
                return [jnp.asarray(y)]
            c = np.clip(_textured(rng, h // 2, w // 2)
                        + rng.normal(0, 4, (h // 2, w // 2)),
                        0, 255).astype(np.uint8)
            return [jnp.asarray(y), jnp.asarray(c), jnp.asarray(c)]

        p0, p1 = planes(f0), planes(f1)
        s0 = mvt.build_super(p0, sspec)
        s1 = mvt.build_super(p1, sspec)

        mvs = {}
        for eng in ("exact", "lockstep"):
            mvs[eng] = mvt.analyse(s1, s0, aspec_b, engine=eng,
                                   lockstep_iters=iters)
        sad_l = float(np.asarray(mvs["lockstep"].finest.sad).sum())
        sad_e = float(np.asarray(mvs["exact"].finest.sad).sum())
        sad_ratios.append(sad_l / max(sad_e, 1.0))

        outs = {}
        for eng in ("exact", "lockstep"):
            outs[eng] = degrain(p1, [s0, s0], [mvs[eng], mvs[eng]],
                                aspec_b.meta, dcfg)
        degrain_psnrs.append(_psnr(outs["lockstep"][0], outs["exact"][0]))

    worst_ratio = max(sad_ratios)
    worst_psnr = min(degrain_psnrs)
    print(f"\nparity[{name}]: sad_ratio per motion "
          f"{[round(r, 4) for r in sad_ratios]}, "
          f"degrain psnr {[round(p, 1) for p in degrain_psnrs]}")
    # lockstep must find fields at most 2% worse in total SAD, and the
    # degrained frames must be visually identical (>= 45 dB) on every
    # motion type
    assert worst_ratio <= 1.02, f"SAD ratio regressed: {sad_ratios}"
    assert worst_psnr >= 45.0, f"degrain PSNR regressed: {degrain_psnrs}"
