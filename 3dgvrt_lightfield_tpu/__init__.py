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
