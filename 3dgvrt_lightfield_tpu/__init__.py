"""3dgvrt_lightfield_tpu — TPU-native differentiable 3D Gaussian ray tracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
Vulkan viewer `wlckslxh/3DGVRT_lightfield` (forward Gaussian ray tracing of
SH-colored anisotropic Gaussians, light-field precompute, quality/benchmark
harnesses) plus what the reference lacks natively on TPU: differentiability,
multi-chip/multi-host sharding, and a fine-tuning loop.

The directory name is not a valid Python identifier; import via the repo-root
shim ``import gvrt_tpu`` or ``importlib.import_module("3dgvrt_lightfield_tpu")``.
Submodules are imported eagerly so attribute access works either way.
"""

# NOTE on matmul precision: TPU matmul default is bfloat16 inputs, which
# quantizes camera-space depths (binning sort order), SH radiance, and the
# gradient reductions — measured on v5e as depth-order inversions of ~3e-3
# and 97%-mismatched cumsums vs f32 (on-chip suite, round 3).  Every
# device-side matmul in this package therefore passes an EXPLICIT
# `precision=` (HIGHEST everywhere except the opted-out SH radiance dots,
# tile_math._SH_PRECISION), instead of mutating the process-global
# `jax_default_matmul_precision` at import time — the r2 advisor flagged
# the global as silently overriding embedding applications' settings.

from . import config
from .config import RenderConfig, DEFAULT_CONFIG

from . import ops
from . import io
from . import models
from . import render
from . import parallel
from . import train
from . import utils
from . import native
from . import hybrid

from .models.gaussians import GaussianModel, random_gaussians
from .io.cameras import Camera, load_nerf_cameras, perspective_vulkan
from .io.ply import SplatSet, load_splats, save_splats

__version__ = "0.1.0"
