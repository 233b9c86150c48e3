"""Pyramid downscale (RB2) filters.

TPU-native equivalents of the reference's five reduce filters
(MVFrame.cpp:575-1014, selected by `rfilter` in mvpReduceTo
MVFrame.cpp:1634-1683).  All are 2x decimators; the filtered variants run a
vertical pass producing an intermediate of width 2*w_dst followed by a
horizontal pass.  Arithmetic is integer and matches the C code bit for bit
(all intermediate values are non-negative, so C's `/2`, `/4`, `/8` and `>>`
agree with floor division).

Boundary semantics: the reference reads up to two rows/columns beyond the
unpadded source region.  When reducing level 0 the surrounding bytes are the
zero-initialised super frame (MVSuper.c:75 memset happens before any
padding); when reducing level k>=1 the source was already replicate-padded
(mvgofReduce pads each level right after filling it, MVFrame.cpp:1928-1933).
Callers express this via `zero_context`.
"""

from __future__ import annotations

import jax.numpy as jnp

RFILTER_SIMPLE = 0
RFILTER_TRIANGLE = 1
RFILTER_BILINEAR = 2
RFILTER_QUADRATIC = 3
RFILTER_CUBIC = 4

_CONTEXT = 4  # rows/cols of context appended beyond the unpadded region


def _extend(src: jnp.ndarray, zero_context: bool) -> jnp.ndarray:
    """Append bottom/right context the reference would read past the region."""
    if zero_context:
        return jnp.pad(src, ((0, _CONTEXT), (0, _CONTEXT)), mode="constant")
    return jnp.pad(src, ((0, _CONTEXT), (0, _CONTEXT)), mode="edge")


def _avg2_rows(s: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(row(2y) + row(2y+1) + 1) / 2 for y in [0, h)."""
    a = s[0:2 * h:2, :w]
    b = s[1:2 * h:2, :w]
    return (a + b + 1) // 2


def _rb2_simple(s: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """RB2F_C: plain 2x2 mean (MVFrame.cpp:575-594)."""
    a = s[0:2 * h:2, 0:2 * w:2]
    b = s[0:2 * h:2, 1:2 * w:2]
    c = s[1:2 * h:2, 0:2 * w:2]
    d = s[1:2 * h:2, 1:2 * w:2]
    return (a + b + c + d + 2) // 4


def _vertical_taps(s: jnp.ndarray, h: int, w2: int, taps, rnd: int, shift: int,
                   first_avg_rows: int, last_avg_rows: int) -> jnp.ndarray:
    """Shared vertical-pass shape: `first_avg_rows` top rows and
    `last_avg_rows` bottom rows are 2-tap averages, the middle rows use the
    symmetric filter `taps` whose first tap reads source row 2y - off
    (off = 1 for the 3/4-tap filters, 2 for the 6-tap filters)."""
    rows = []
    ntaps = len(taps)
    off = 1 if ntaps <= 4 else 2  # first tap reads row 2y - off
    # top special rows
    for y in range(min(first_avg_rows, h)):
        rows.append((s[2 * y, :w2] + s[2 * y + 1, :w2] + 1) // 2)
    y_mid_end = max(h - last_avg_rows, first_avg_rows)
    if h > first_avg_rows:
        ys = jnp.arange(first_avg_rows, y_mid_end)
        if ys.size > 0:
            acc = jnp.zeros((ys.size, w2), s.dtype)
            for t, coef in enumerate(taps):
                acc = acc + coef * s[2 * ys - off + t, :w2]
            mid = (acc + rnd) >> shift
            rows.append(mid)
        for y in range(y_mid_end, h):
            rows.append((s[2 * y, :w2] + s[2 * y + 1, :w2] + 1) // 2)
    parts = [r if r.ndim == 2 else r[None, :] for r in rows]
    return jnp.concatenate(parts, axis=0) if parts else jnp.zeros((0, w2), s.dtype)


def _horizontal_taps(v: jnp.ndarray, w: int, taps, rnd: int, shift: int,
                     last_avg_cols: int) -> jnp.ndarray:
    """Shared horizontal-pass shape over the vertical intermediate `v`
    (shape [h, 2*w]): column 0 is always the 2-tap average of cols 0..1,
    `last_avg_cols` final columns are 2-tap averages, the middle uses
    `taps` centred on source cols 2x..2x+1."""
    h = v.shape[0]
    ntaps = len(taps)
    off = 1 if ntaps <= 4 else 2
    cols = [((v[:, 0] + v[:, 1] + 1) // 2)[:, None]]
    x_mid_end = max(w - last_avg_cols, 1)
    if w > 1:
        xs = jnp.arange(1, x_mid_end)
        if xs.size > 0:
            acc = jnp.zeros((h, xs.size), v.dtype)
            for t, coef in enumerate(taps):
                acc = acc + coef * v[:, 2 * xs - off + t]
            cols.append((acc + rnd) >> shift)
        for x in range(x_mid_end, w):
            cols.append(((v[:, 2 * x] + v[:, 2 * x + 1] + 1) // 2)[:, None])
    return jnp.concatenate(cols, axis=1)


def rb2(src: jnp.ndarray, h_dst: int, w_dst: int, rfilter: int,
        zero_context: bool) -> jnp.ndarray:
    """Reduce the unpadded [H, W] source region to [h_dst, w_dst].

    src must be int32 (or wider); returns int32.
    """
    s = _extend(src.astype(jnp.int32), zero_context)
    h, w = h_dst, w_dst
    if rfilter == RFILTER_SIMPLE:
        return _rb2_simple(s, h, w)
    if rfilter == RFILTER_TRIANGLE:
        # vertical: (s[2y-1] + 2*s[2y] + s[2y+1] + 2)/4, row 0 is avg; the
        # horizontal middle loop runs over ALL x in [1, w) (no trailing avg
        # columns, unlike the other filters) — MVFrame.cpp:599-690.
        v = _vertical_taps(s, h, 2 * w, (1, 2, 1), 2, 2,
                           first_avg_rows=1, last_avg_rows=0)
        return _horizontal_taps(v, w, (1, 2, 1), 2, 2, last_avg_cols=0)
    if rfilter == RFILTER_BILINEAR:
        v = _vertical_taps(s, h, 2 * w, (1, 3, 3, 1), 4, 3,
                           first_avg_rows=1, last_avg_rows=1)
        return _horizontal_taps(v, w, (1, 3, 3, 1), 4, 3, last_avg_cols=1)
    if rfilter == RFILTER_QUADRATIC:
        v = _vertical_taps(s, h, 2 * w, (1, 9, 22, 22, 9, 1), 32, 6,
                           first_avg_rows=1, last_avg_rows=1)
        return _horizontal_taps(v, w, (1, 9, 22, 22, 9, 1), 32, 6, last_avg_cols=1)
    if rfilter == RFILTER_CUBIC:
        v = _vertical_taps(s, h, 2 * w, (1, 5, 10, 10, 5, 1), 16, 5,
                           first_avg_rows=1, last_avg_rows=1)
        return _horizontal_taps(v, w, (1, 5, 10, 10, 5, 1), 16, 5, last_avg_cols=1)
    raise ValueError(f"rfilter must be 0..4, got {rfilter}")
