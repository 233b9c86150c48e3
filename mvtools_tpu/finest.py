"""mv.Finest equivalent: interleave pel subplanes into one fine grid.

Equivalent of MVFinest.c + Merge4/16PlanesToBig (MaskFun.cpp:207-336).
Output planes have padded dimensions times pel — the per-pixel "finest"
image the Flow family samples from.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .super import Super


def interleave_stack(stack: jnp.ndarray) -> jnp.ndarray:
    """[pel^2, ph, pw] -> [ph*pel, pw*pel] with out[y, x] =
    stack[(x & m) | ((y & m) << log_pel)][y >> log_pel, x >> log_pel]."""
    pel2, ph, pw = stack.shape
    pel = int(round(pel2 ** 0.5))
    if pel == 1:
        return stack[0]
    # stack index = xfrac | (yfrac << log_pel): reshape to [yfrac, xfrac, ...]
    s = stack.reshape(pel, pel, ph, pw)
    # out[yb*pel + yf, xb*pel + xf] = s[yf, xf, yb, xb]
    out = s.transpose(2, 0, 3, 1).reshape(ph * pel, pw * pel)
    return out


def finest(sup: Super) -> List[jnp.ndarray]:
    """Return the pel-interleaved full planes of a super frame
    (dims = padded * pel, MVFinest.c:198-199)."""
    out = []
    for p in range(sup.num_planes):
        arr = sup.planes[p][0]
        if arr.ndim == 2:
            arr = arr[None]
        out.append(interleave_stack(arr))
    return out
