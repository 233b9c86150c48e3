"""mvtools_tpu — a TPU-native motion estimation / compensation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
vapoursynth-mvtools (block-based hierarchical motion search plus its
motion-compensated consumers: denoise, frame interpolation, masks, global
motion).  Not a port: frames, pyramids and motion-vector fields are JAX
arrays, per-frame computation is pure and jittable, throughput comes from
vmapping whole batches of frames, and scale-out comes from sharding the frame
axis of a clip across a TPU mesh.

Precision note: the reference implementation is integer C code with a couple
of float64 islands (lambda adaptation, hierarchical prediction scaling).  For
bit-exact parity we enable jax_enable_x64; all pixel kernels run in int32.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .core.types import (  # noqa: E402
    AnalysisMeta,
    MVField,
    MVPlaneField,
    SearchType,
)
from .core.config import SuperConfig, AnalyseConfig  # noqa: E402
from .super import Super, build_super, SuperClip  # noqa: E402
from .analyse import analyse, analyse_batch  # noqa: E402
from .depan import (  # noqa: E402
    DepanAnalyseConfig,
    DepanCompensateConfig,
    DepanEstimateConfig,
    DepanStabiliseConfig,
    depan_analyse,
    depan_compensate,
    depan_estimate,
    depan_stabilise,
)

__all__ = [
    "AnalysisMeta",
    "MVField",
    "MVPlaneField",
    "SearchType",
    "SuperConfig",
    "AnalyseConfig",
    "Super",
    "SuperClip",
    "build_super",
    "analyse",
    "analyse_batch",
    "DepanAnalyseConfig",
    "DepanCompensateConfig",
    "DepanEstimateConfig",
    "DepanStabiliseConfig",
    "depan_analyse",
    "depan_compensate",
    "depan_estimate",
    "depan_stabilise",
]

__version__ = "0.1.0"
