"""Replicate padding of frame planes.

Equivalent of the reference's PadReferenceFrame (MVFrame.cpp:1264-1318):
corners take the nearest corner pixel, edges replicate the nearest edge
pixel.  jnp.pad(mode="edge") has exactly these semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_replicate(plane: jnp.ndarray, hpad: int, vpad: int) -> jnp.ndarray:
    """Pad a [H, W] plane to [H + 2*vpad, W + 2*hpad] by edge replication."""
    return jnp.pad(plane, ((vpad, vpad), (hpad, hpad)), mode="edge")


def pad_zero(plane: jnp.ndarray, hpad: int, vpad: int) -> jnp.ndarray:
    """Zero padding (the state of an un-padded region of the super frame,
    which the reference memsets to 0: MVSuper.c:75)."""
    return jnp.pad(plane, ((vpad, vpad), (hpad, hpad)), mode="constant")
