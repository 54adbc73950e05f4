"""High-level tiled renderer: binning + fused kernel + image assembly.

The production render path (SURVEY.md section 7 step 3).  `render_image_tiled`
is the TPU analog of the reference's per-frame draw: update camera, dispatch
the particle-rendering pipeline, read back the image
(VulkanFullRT.cpp:2115-2162) — except binning replaces the (startup) AS build,
which makes the whole path differentiable and camera-batchable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import GaussianModel
from .binning import bin_gaussians, plan_capacity, tile_rays, untile
from .pallas_forward import forward_tiles, forward_tiles_reference
from .tile_math import ACC_DEPTH, ACC_HITS, ACC_T


def _camera_mats(camera):
    w2c = jnp.asarray(np.linalg.inv(camera.view_inverse), jnp.float32)
    proj = jnp.asarray(np.linalg.inv(camera.proj_inverse), jnp.float32)
    return w2c, proj


def render_image_tiled(model: GaussianModel, camera,
                       cfg: RenderConfig = DEFAULT_CONFIG,
                       impl: str = "auto",
                       capacity: Optional[tuple] = None):
    """Render a full image through the tiled path.

    Args:
      impl: 'pallas' (compiled kernel), 'interpret' (Pallas interpreter),
        'scan' (lax.scan reference), or 'auto' (pallas on TPU, scan elsewhere).
      capacity: optional (capacity, capacity_padded) override; measured from
        the scene when omitted.

    Returns dict with rgb (H, W, 3), depth, transmittance, hit_count, and
    binning stats (num_pairs, overflow).
    """
    act = model.activate()
    w2c, proj = _camera_mats(camera)
    w, h = camera.width, camera.height
    if capacity is None:
        capacity = plan_capacity(act, w2c, proj, w, h, cfg)
    cap, cap_pad = capacity

    binned = bin_gaussians(act, w2c, proj, w, h, cfg, cap, cap_pad)
    rays = tile_rays(camera, cfg)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl == "pallas":
        acc = forward_tiles(binned, rays, cfg, interpret=False)
    elif impl == "interpret":
        acc = forward_tiles(binned, rays, cfg, interpret=True)
    elif impl == "scan":
        acc = forward_tiles_reference(binned, rays, cfg)
    else:
        raise ValueError(f"unknown impl {impl!r}")

    img = untile(acc, w, h, cfg.tile_size)
    return {
        "rgb": img[..., 0:3],
        "depth": img[..., ACC_DEPTH],
        "transmittance": img[..., ACC_T],
        "hit_count": img[..., ACC_HITS],
        "num_pairs": binned.num_pairs,
        "overflow": binned.overflow,
    }
