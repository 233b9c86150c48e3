"""Tests for the staged-jit DegrainPipeline."""

import numpy as np

import jax.numpy as jnp

from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig
from mvtools_tpu.pipelines import DegrainPipeline


def test_degrain_pipeline_radius2_runs_and_denoises():
    rng = np.random.default_rng(0)
    h, w = 48, 64
    base = rng.integers(40, 200, (h, w), np.int32)
    clip = np.clip(base[None] + rng.normal(0, 8, (7, h, w)), 0,
                   255).astype(np.uint8)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    pipe = DegrainPipeline(
        fmt, SuperConfig(pel=1, levels=2, chroma=False),
        AnalyseConfig(blksize=8, levels=2, truemotion=True, chroma=False),
        DegrainConfig(thsad=2000, thscd1=3000), radius=2, engine="exact")
    out = pipe.run_clip([[jnp.asarray(clip[i])] for i in range(7)])
    assert len(out) == 7
    mid = np.asarray(out[3][0])
    noise_in = np.abs(clip[3].astype(int) - base).mean()
    noise_out = np.abs(mid.astype(int) - base).mean()
    # radius-2 degrain averages 5 frames: strong noise reduction
    assert noise_out < noise_in * 0.7


def test_degrain_pipeline_matches_model_helper():
    """Pipeline result == the monolithic model helper (same stages)."""
    from mvtools_tpu.models.denoise import degrain_n_frame
    import dataclasses
    rng = np.random.default_rng(2)
    h, w = 32, 48
    frames = [jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
              for _ in range(3)]
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=1, levels=1, chroma=False)
    acfg = AnalyseConfig(blksize=8, levels=1, truemotion=True,
                         chroma=False)
    dcfg = DegrainConfig(thsad=400)
    pipe = DegrainPipeline(fmt, scfg, acfg, dcfg, radius=1,
                           engine="exact")
    sups = [pipe.super([f]) for f in frames]
    got = pipe.frame([frames[1]], sups[1], [sups[0]], [sups[2]])

    sspec = scfg.validate(fmt)
    ab = dataclasses.replace(acfg, isb=True).validate(sspec)
    af = dataclasses.replace(acfg, isb=False).validate(sspec)
    want = degrain_n_frame([frames[1]], [[frames[0]]], [[frames[2]]],
                           sspec, ab, af, dcfg, engine="exact")
    np.testing.assert_array_equal(np.asarray(got[0]),
                                  np.asarray(want[0]))
