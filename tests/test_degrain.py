import numpy as np
import pytest

import jax.numpy as jnp

from mvtools_tpu import AnalyseConfig, SuperConfig, analyse, build_super
from mvtools_tpu.core.thscd import scale_thscd
from mvtools_tpu.core.types import ColorFamily, VideoFormat
from mvtools_tpu.degrain import DegrainConfig, degrain

from oracle import oracle_degrain as od
from oracle import oracle_frame as of
from test_analyse import make_clip


def _oracle_stacks(planes, sspec, fmt, plane_idx):
    """Padded pel-subplane stacks for one plane (oracle side)."""
    if plane_idx == 0:
        subs, _ = of.build_super_plane(planes[plane_idx], sspec.hpad,
                                       sspec.vpad, sspec.pel, sspec.levels,
                                       sspec.sharp, sspec.rfilter,
                                       fmt.x_ratio_uv, fmt.y_ratio_uv,
                                       fmt.bits)
    else:
        subs, _ = of.build_super_plane(planes[plane_idx],
                                       sspec.hpad // fmt.x_ratio_uv,
                                       sspec.vpad // fmt.y_ratio_uv,
                                       sspec.pel, sspec.levels, sspec.sharp,
                                       sspec.rfilter, fmt.x_ratio_uv,
                                       fmt.y_ratio_uv, fmt.bits,
                                       is_luma=False)
    return subs


@pytest.mark.parametrize("overlap,chroma,pel", [
    (0, False, 1), (4, False, 1), (0, True, 2), (4, True, 2)])
def test_degrain1_matches_oracle(overlap, chroma, pel):
    rng = np.random.default_rng(42)
    w, h = 64, 48
    family = ColorFamily.YUV420 if chroma else ColorFamily.GRAY
    fmt = VideoFormat(w, h, 8, family)
    cur, prev = make_clip(rng, w, h, chroma=chroma)
    # next frame = cur shifted the other way (same scene)
    nxt = [np.roll(p, (-2, -3), axis=(0, 1)) for p in cur]

    scfg = SuperConfig(pel=pel, chroma=chroma)
    sspec = scfg.validate(fmt)
    acfg = AnalyseConfig(blksize=8, overlap=overlap, truemotion=True,
                         chroma=chroma)

    sup_cur = build_super([jnp.asarray(p) for p in cur], sspec)
    sup_prev = build_super([jnp.asarray(p) for p in prev], sspec)
    sup_next = build_super([jnp.asarray(p) for p in nxt], sspec)

    aspec_b = acfg.validate(sspec)          # backward: ref = next
    import dataclasses
    acfg_f = dataclasses.replace(acfg, isb=False)
    aspec_f = acfg_f.validate(sspec)
    import dataclasses as dc
    acfg_b = dc.replace(acfg, isb=True)
    aspec_b = acfg_b.validate(sspec)

    mv_b = analyse(sup_cur, sup_next, aspec_b)
    mv_f = analyse(sup_cur, sup_prev, aspec_f)

    dcfg = DegrainConfig(thsad=300, thscd1=1000, thscd2=255)
    got = degrain([jnp.asarray(p) for p in cur], [sup_next, sup_prev],
                  [mv_b, mv_f], aspec_b.meta, dcfg)

    # oracle
    meta = aspec_b.meta
    nscd1, nscd2 = scale_thscd(dcfg.thscd1, dcfg.thscd2, meta, "Degrain")
    thsad_l = dcfg.thsad * nscd1 // dcfg.thscd1
    log_pel = pel.bit_length() - 1

    def mv_blocks(mv):
        f = mv.levels[0]
        x = np.asarray(f.x).reshape(-1)
        y = np.asarray(f.y).reshape(-1)
        s = np.asarray(f.sad).reshape(-1)
        return list(zip(x.tolist(), y.tolist(), s.tolist()))

    mvs = [mv_blocks(mv_b), mv_blocks(mv_f)]
    usable = []
    for mv in (mv_b, mv_f):
        s = np.asarray(mv.levels[0].sad).reshape(-1)
        usable.append(not (np.sum(s > nscd1) > nscd2))
    assert all(usable)  # sanity for this synthetic clip

    nplanes = 3 if chroma else 1
    for p in range(nplanes):
        stacks = [
            _oracle_stacks(nxt, sspec, fmt, p),
            _oracle_stacks(prev, sspec, fmt, p),
        ]
        sub = 1 if (p and chroma) else 0
        want = od.degrain_plane(
            cur[p], stacks, mvs, usable, thsad_l, meta.blk_x, meta.blk_y,
            meta.blk_size_x, meta.blk_size_y, meta.overlap_x, meta.overlap_y,
            log_pel, sub, sub,
            sspec.hpad >> sub, sspec.vpad >> sub, 8, 255)
        np.testing.assert_array_equal(
            np.asarray(got[p]), want.astype(np.uint8),
            err_msg=f"plane {p} overlap={overlap} pel={pel}")


def test_degrain_unusable_refs_noop_weights():
    """Scene change: weights go to zero and output ~= src (still rounded
    through the >>8 path)."""
    rng = np.random.default_rng(0)
    w, h = 48, 32
    fmt = VideoFormat(w, h, 8, ColorFamily.GRAY)
    cur, _ = make_clip(rng, w, h)
    other = [rng.integers(0, 256, (h, w), np.uint8)]  # unrelated frame

    sspec = SuperConfig(pel=1, chroma=False).validate(fmt)
    aspec = AnalyseConfig(blksize=8, truemotion=True).validate(sspec)
    sup_cur = build_super([jnp.asarray(cur[0])], sspec)
    sup_other = build_super([jnp.asarray(other[0])], sspec)
    mv = analyse(sup_cur, sup_other, aspec)

    got = degrain([jnp.asarray(cur[0])], [sup_other, sup_other], [mv, mv],
                  aspec.meta, DegrainConfig(thsad=300, thscd1=100, thscd2=10))
    # With both refs unusable, WSrc=256 => dst == src exactly
    np.testing.assert_array_equal(np.asarray(got[0]), cur[0])
