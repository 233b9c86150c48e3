"""Device mesh and clip sharding.

The reference's only parallelism is the host thread pool running
fmParallel getFrame calls concurrently (SURVEY.md §2.2).  The TPU-native
equivalent: a clip is an array with a leading frame axis, per-frame
computation is vmapped, and the frame axis is sharded over a
jax.sharding.Mesh.  Temporal dependencies (frame n needs super of n±delta)
are expressed with jnp.roll on the sharded frame axis — XLA lowers those to
collective permutes over ICI, the moral equivalent of the reference's
boundary-frame requests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frames"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the frame axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (FRAME_AXIS,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame) axis of a clip array."""
    return NamedSharding(mesh, P(FRAME_AXIS))


def shard_clip(frames, mesh: Mesh):
    """Place a [T, ...] clip array (or pytree of them) onto the mesh,
    sharded by frame."""
    sh = frame_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(*([FRAME_AXIS] + [None] * (a.ndim - 1))))),
        frames)


def neighbours(frames, delta: int = 1):
    """(prev, next) frames along the clip axis with edge replication
    semantics resolved by the caller; on a sharded clip the rolls become
    ppermute halo exchanges over ICI."""
    prev = jnp.roll(frames, delta, axis=0)
    next_ = jnp.roll(frames, -delta, axis=0)
    return prev, next_
