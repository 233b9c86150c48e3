"""Field-level DCT cost modes 1-4 (the last engine that used the
vmapped per-block fallback): candidate blocks are fetched with the
window-DMA kernel and DCT'd as batched MXU matmuls
(FieldProber._dct_cost), mixing per pobLumaSAD PlaneOfBlocks.cpp:123-163.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import analyse, build_super
from mvtools_tpu.core.config import AnalyseConfig, SuperConfig
from mvtools_tpu.core.types import ColorFamily, VideoFormat


@pytest.mark.parametrize("dct", [1, 2, 3, 4])
def test_lockstep_dct_mode_agrees_with_exact(dct):
    """Vector agreement with the exact engine on translation content
    must match the dct=0 level (differences are Jacobi-vs-Gauss-Seidel
    sweep order, not the cost kernel); identical vectors must carry
    identical mixed costs."""
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
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=False, dct=dct), isb=True).validate(sspec)
    mv_l = analyse(s1, s0, aspec, engine="lockstep", lockstep_iters=2)
    mv_e = analyse(s1, s0, aspec, engine="exact")
    same = ((np.asarray(mv_l.finest.x) == np.asarray(mv_e.finest.x))
            & (np.asarray(mv_l.finest.y) == np.asarray(mv_e.finest.y)))
    ls = np.asarray(mv_l.finest.sad)
    es = np.asarray(mv_e.finest.sad)
    np.testing.assert_array_equal(ls[same], es[same])
    assert same.mean() > 0.8, f"dct={dct}: {same.mean()}"


def test_recalculate_dct_field_path():
    """Recalculate with dct 1-4 runs the field path and refines bad
    blocks to the exact engine's cost level."""
    from mvtools_tpu.recalculate import RecalculateConfig, recalculate
    rng = np.random.default_rng(9)
    w, h = 96, 64
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    scfg = SuperConfig(pel=2, levels=2, chroma=False)
    sspec = scfg.validate(fmt)
    base = rng.integers(0, 256, (h + 8, w + 8), np.uint8)
    f0 = jnp.asarray(np.ascontiguousarray(base[:h, :w]))
    f1 = jnp.asarray(np.ascontiguousarray(base[1:h + 1, 2:w + 2]))
    s0 = build_super([f0], scfg, fmt)
    s1 = build_super([f1], scfg, fmt)
    aspec = dataclasses.replace(
        AnalyseConfig(blksize=16, levels=2, truemotion=True,
                      chroma=False), isb=True).validate(sspec)
    mv = analyse(s1, s0, aspec, engine="lockstep")
    rcfg = RecalculateConfig(blksize=8, thsad=100, chroma=False,
                             truemotion=True, dct=2)
    rspec = rcfg.to_analyse_config().validate(sspec)
    mv2 = recalculate(s1, s0, mv, rspec, rcfg, engine="lockstep")
    # the refined field recovers the translation for most blocks
    vx = np.asarray(mv2.levels[0].x)
    vy = np.asarray(mv2.levels[0].y)
    inner = (slice(1, -1), slice(1, -1))
    agree = ((vx[inner] == 4) & (vy[inner] == 2)).mean()
    assert agree > 0.6, agree
