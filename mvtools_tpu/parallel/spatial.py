"""Spatial (within-frame) sharding of motion search and compensation.

The reference parallelises WITHIN a frame only via SIMD lanes; SURVEY
§2.2 maps its missing "spatial axis" to tensor-parallel-style sharding.
A literal C-cluster port would slice the plane into bands and exchange
pixel halos of width (search range + padding).  On TPU that design is
backwards: a whole 1080p super pyramid is a few MB (HBM is GBs), while
the dominant analyse cost is the per-block window-DMA probe work
(ops/probe.py).  So the TPU-native layout is:

* pixel planes REPLICATED on every device of the spatial axis (free),
* the BLOCK axis of every probe/fetch call sharded across the axis
  (`ops.probe.spatial_shard`), each device DMA-probing only its band,
* the resulting SAD columns (~100KB) all_gathered over ICI,
* the cheap whole-field state updates computed replicated.

Outputs are bit-identical to the unsharded run by construction (the
gathered SAD columns are the same values), so the mode composes freely
with the frame-axis sharding in parallel.mesh — a 2-D mesh
(frames, space) shards the clip over one axis and each frame's block
work over the other.

Reference parity anchor: fmParallel frame-level pool (MVDegrains.cpp:808)
has no intra-frame equivalent; this mode is the re-design SURVEY §2.2
row "spatial sharding with halos" calls for, with the halo replaced by
replication (documented divergence: no pixel halos are exchanged
because no device ever lacks pixels).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import probe as probe_ops

SPACE_AXIS = "space"


def spatial_map(fn: Callable, mesh: Mesh, axis: str = SPACE_AXIS):
    """Wrap a pure mvtools_tpu pipeline function so its probe/fetch
    block work is sharded over `mesh`'s `axis`.

    All array arguments are replicated to every device (in_specs=P());
    within the body, every `ops.probe.probe_sads` / degrain
    `gather_blocks` call slices its own band of blocks and all_gathers
    the result, so the returned value equals the unsharded `fn(*args)`
    bit for bit.
    """
    def wrapped(*args):
        def body(*a):
            with probe_ops.spatial_axis(axis):
                return fn(*a)

        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False))(*args)

    return wrapped


def analyse_spatial(src_super, ref_super, spec, mesh: Mesh,
                    engine: str = "lockstep", axis: str = SPACE_AXIS,
                    field_shift=0):
    """`analyse` with the block axis of all probe work sharded over
    `mesh`'s `axis`; bit-identical to the unsharded call."""
    from ..analyse import analyse

    def fn(sa, sb):
        return analyse(sa, sb, spec, engine=engine,
                       field_shift=field_shift)

    return spatial_map(fn, mesh, axis)(src_super, ref_super)
