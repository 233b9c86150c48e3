"""Device mesh, clip sharding, and frame-axis halo exchange.

The reference's only parallelism is the host thread pool running
fmParallel getFrame calls concurrently (MVDegrains.cpp:808; SURVEY.md
§2.2).  The TPU-native equivalent: a clip is an array with a leading
frame axis, per-frame computation is vmapped, the frame axis is sharded
over a jax.sharding.Mesh, and the temporal dependency (frame n needs the
supers of n±k) becomes an explicit `lax.ppermute` halo exchange over ICI
inside `shard_map` — each device ships its `radius` boundary frames to
its neighbours, once, before the embarrassingly-frame-parallel body runs.

Clip-edge semantics match the reference: neighbours beyond the clip are
edge-replicated for shape uniformity, and `edge_validity` marks them
invalid so consumers take the degraded path (the reference emits a
default all-invalid MV field there: GroupOfPlanes.c:150-164,
MVAnalyse.c:219-222).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

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
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*([FRAME_AXIS]
                                       + [None] * (a.ndim - 1))))),
        frames)


def halo_exchange(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Pad the LOCAL frame axis with `radius` neighbour frames per side.

    Must run inside `shard_map` over a 1-D mesh axis named FRAME_AXIS.
    x: [T_local, ...].  Returns [T_local + 2*radius, ...].  Halos travel
    over ICI via `lax.ppermute`: `ceil(radius / T_local)` hops, so a
    radius larger than the shard is served by further-away devices.
    Beyond the global clip edges, the first/last frame is replicated
    (consumers mark those neighbours invalid via `edge_validity`).
    """
    n = jax.lax.axis_size(FRAME_AXIS)
    t_local = x.shape[0]

    if n == 1:
        left = jnp.broadcast_to(x[:1], (radius,) + x.shape[1:])
        right = jnp.broadcast_to(x[-1:], (radius,) + x.shape[1:])
        return jnp.concatenate([left, x, right], axis=0)

    hops = -(-radius // t_local)   # ceil
    idx = jax.lax.axis_index(FRAME_AXIS)
    total = n * t_local

    # candidate stacks covering global frames
    # [(idx-hops)*Tl, (idx+1)*Tl) for the left halo and
    # [idx*Tl, (idx+1+hops)*Tl) for the right; non-receiving devices get
    # zeros from ppermute, but a clamped edge index never lands there
    from_h = [jax.lax.ppermute(x, FRAME_AXIS,
                               [(i, i + h) for i in range(n - h)])
              for h in range(1, hops + 1)]
    to_h = [jax.lax.ppermute(x, FRAME_AXIS,
                             [(i + h, i) for i in range(n - h)])
            for h in range(1, hops + 1)]
    left_cand = jnp.concatenate(list(reversed(from_h)) + [x], axis=0)
    right_cand = jnp.concatenate([x] + to_h, axis=0)

    j = jnp.arange(radius, dtype=jnp.int32)
    g_left = jnp.clip(idx * t_local - radius + j, 0, total - 1)
    g_right = jnp.clip((idx + 1) * t_local + j, 0, total - 1)
    left = jnp.take(left_cand, g_left - (idx - hops) * t_local, axis=0)
    right = jnp.take(right_cand, g_right - idx * t_local, axis=0)
    return jnp.concatenate([left, x, right], axis=0)


def local_frame_index(t_local: int) -> jnp.ndarray:
    """Global frame indices of the local shard (inside shard_map)."""
    idx = jax.lax.axis_index(FRAME_AXIS)
    return idx * t_local + jnp.arange(t_local, dtype=jnp.int32)


def edge_validity(t_local: int, total: int, radius: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-local-frame validity of the k-th backward/forward neighbour.

    Returns (prev_ok, next_ok), each [T_local, radius] bool:
    prev_ok[t, k-1] iff global_t - k >= 0, next_ok[t, k-1] iff
    global_t + k <= total - 1.  Where False, the reference produces a
    default all-invalid MV field (MVAnalyse.c:219-222) and consumers take
    the degraded path (weight 0 / source passthrough).
    """
    g = local_frame_index(t_local)[:, None]
    k = jnp.arange(1, radius + 1, dtype=jnp.int32)[None, :]
    return g - k >= 0, g + k <= total - 1


def neighbour_views(padded: jnp.ndarray, t_local: int, radius: int):
    """Slice a halo-padded [T_local+2r, ...] stack into per-offset views:
    (prevs, nexts) with prevs[k-1][t] = frame t-k (edge-replicated)."""
    prevs = [padded[radius - k:radius - k + t_local]
             for k in range(1, radius + 1)]
    nexts = [padded[radius + k:radius + k + t_local]
             for k in range(1, radius + 1)]
    return prevs, nexts


def clip_map(fn, mesh: Optional[Mesh], radius: int, total: int,
             spatial: Optional[str] = None):
    """Wrap `fn(cur, prevs, nexts, prev_ok, next_ok, g_idx)` — all with a
    leading local-frame axis (g_idx = global frame indices, [T_local]) —
    into a whole-clip function of [T, ...] plane stacks.

    With a mesh: shard_map over FRAME_AXIS; neighbour frames arrive via
    `halo_exchange` (ppermute over ICI), then the body runs
    frame-parallel with no further communication.  Without a mesh: the
    same code on a single implicit device.

    spatial: name of a SECOND mesh axis (2-D mesh (frames, space)) to
    additionally shard each frame's per-block probe work over — see
    parallel.spatial; clip planes are replicated over that axis.
    """
    def whole_clip(*clip_planes):
        def body(*local_planes):
            tl = local_planes[0].shape[0]
            padded = [halo_exchange(p, radius) for p in local_planes]
            views = [neighbour_views(p, tl, radius) for p in padded]
            prevs = [tuple(v[0][k] for v in views) for k in range(radius)]
            nexts = [tuple(v[1][k] for v in views) for k in range(radius)]
            prev_ok, next_ok = edge_validity(tl, total, radius)
            if spatial is not None:
                from ..ops import probe as probe_ops
                with probe_ops.spatial_axis(spatial):
                    return fn(tuple(local_planes), prevs, nexts,
                              prev_ok, next_ok, local_frame_index(tl))
            return fn(tuple(local_planes), prevs, nexts, prev_ok, next_ok,
                      local_frame_index(tl))

        m = _dummy_mesh() if mesh is None else mesh
        spec = P(FRAME_AXIS)
        # check_vma=False: the search engines mix mesh-varying data with
        # replicated constants inside lax.cond/scan; the body is
        # frame-parallel after the halo exchange, so replication tracking
        # adds no safety here.  jit wraps the shard_map: eager shard_map
        # mis-tracks closure tracers across multiple inner lax.maps
        return jax.jit(jax.shard_map(
            body, mesh=m, in_specs=spec, out_specs=spec,
            check_vma=False))(*clip_planes)

    return whole_clip


@functools.lru_cache(maxsize=None)
def _dummy_mesh() -> Mesh:
    """Single-device mesh so the unsharded path runs the same shard_map
    body (axis_index/ppermute well-defined)."""
    return Mesh(np.array(jax.devices()[:1]), (FRAME_AXIS,))
