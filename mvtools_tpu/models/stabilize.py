"""Global-motion stabilization model: DepanEstimate -> DepanStabilise.

The canonical Depan chain (readme.rst Depan* usage): estimate per-frame
global translation/zoom by FFT phase correlation over the whole clip in
one batched pass, then apply the inertial or windowed-average stabilizer
with border filling.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..depan import (
    DepanEstimateConfig,
    DepanStabiliseConfig,
    depan_estimate,
    depan_stabilise,
)


def stabilize_clip(frames: Sequence[Sequence[jnp.ndarray]],
                   ecfg: DepanEstimateConfig = DepanEstimateConfig(),
                   scfg: DepanStabiliseConfig = DepanStabiliseConfig(),
                   sub_w: int = 0, sub_h: int = 0,
                   bits: int = 8) -> List[List[jnp.ndarray]]:
    """frames: list of per-frame plane lists.  Returns stabilized frames."""
    luma = jnp.stack([f[0] for f in frames]).astype(jnp.float32)
    dx, dy, zoom, _trust = depan_estimate(luma, ecfg)
    motions = np.stack(
        [np.asarray(dx, np.float32), np.asarray(dy, np.float32),
         np.asarray(zoom, np.float32),
         np.zeros(len(frames), np.float32)], axis=1)
    return depan_stabilise(frames, motions, scfg, sub_w=sub_w,
                           sub_h=sub_h, bits=bits)
