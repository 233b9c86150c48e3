"""Tests for the model-level pipelines (denoise, FRC, stabilize)."""

from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig
from mvtools_tpu.flowfps import FlowFPSConfig
from mvtools_tpu.models.denoise import degrain1_clip, degrain1_frame
from mvtools_tpu.models.frc import flowfps_clip
from mvtools_tpu.models.stabilize import stabilize_clip


def _shifting_clip(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (h + 32, w + 32), np.uint8)
    return np.stack([base[2 * i:2 * i + h, 3 * i:3 * i + w]
                     for i in range(t)])


def test_degrain1_clip_denoises():
    """Degraining a noisy static clip must reduce noise energy."""
    rng = np.random.default_rng(1)
    h, w = 64, 96
    base = rng.integers(40, 200, (h, w), np.int32)
    clip = np.clip(base[None] + rng.normal(0, 8, (5, h, w)), 0,
                   255).astype(np.uint8)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    out = degrain1_clip([jnp.asarray(clip)], fmt,
                        SuperConfig(pel=1, levels=2, chroma=False),
                        AnalyseConfig(blksize=8, levels=2,
                                      truemotion=True, chroma=False),
                        # thsad must exceed the pure-noise block SAD
                        # (~sigma*1.13*64) for the refs to get weight, and
                        # thscd1 must not read the noise as a scene change
                        DegrainConfig(thsad=2000, thscd1=3000))[0]
    noise_in = np.abs(clip[2].astype(int) - base).mean()
    noise_out = np.abs(np.asarray(out)[2].astype(int) - base).mean()
    assert noise_out < noise_in * 0.8


def test_flowfps_clip_doubles_rate():
    h, w = 64, 96
    clip = _shifting_clip(5, h, w)
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    out = flowfps_clip([clip], fmt, Fraction(25), Fraction(50),
                       SuperConfig(pel=1, levels=2, chroma=False),
                       AnalyseConfig(blksize=8, levels=2,
                                     truemotion=True, chroma=False),
                       FlowFPSConfig(maskmode=0),
                       engine="exact", num_out=6)
    assert len(out) == 6
    # even output frames coincide with the sources
    np.testing.assert_array_equal(out[0][0], clip[0])
    np.testing.assert_array_equal(out[2][0], clip[1])
    # odd frames are interpolations: for a pure translation the midpoint
    # frame should be close to the truth (base shifted by half the step,
    # here a 1px/1.5px shift — compare against both endpoints)
    mid = out[1][0].astype(int)
    err_static = np.abs(clip[0][8:-8, 8:-8].astype(int)
                        - clip[1][8:-8, 8:-8]).mean()
    err_mid = min(np.abs(mid[8:-8, 8:-8] - clip[0][8:-8, 8:-8]).mean(),
                  np.abs(mid[8:-8, 8:-8] - clip[1][8:-8, 8:-8]).mean())
    assert err_mid < err_static


def test_stabilize_clip_smooths_pan():
    rng = np.random.default_rng(3)
    h, w = 64, 96
    base = rng.integers(0, 255, (h + 64, w + 64)).astype(np.float32)
    # jittery pan: cumulative positions with shake
    xs = (np.cumsum(np.full(6, 2.0) + rng.normal(0, 1.5, 6))
          .astype(int) + 16)
    frames = [[jnp.asarray(base[20:20 + h, x:x + w].astype(np.uint8))]
              for x in xs]
    out = stabilize_clip(frames)
    assert len(out) == len(frames)
    for f in out:
        a = np.asarray(f[0])
        assert a.shape == (h, w) and a.dtype == np.uint8
