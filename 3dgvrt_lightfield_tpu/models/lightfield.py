"""Gaussian Light Field precompute.

The reference repo's namesake feature (GAUSSIAN_LIGHT_FIELD, base/Define.h:67):
at startup it renders the Gaussian scene from sampling cameras placed on the
object's bounding volume into a 180x180 image array plus a per-ray direction
buffer, and dumps PNGs (projects/VulkanFullRT/VulkanFullRT.cpp:1516-1988,
shaders/glsl/VulkanFullRT/raygenGaussianLightField.rgen:114-202).

Reference protocol, reproduced here:
  * object AABB from Gaussian centers only (VulkanFullRT.cpp:1533-1545);
    center = AABB midpoint, maxR = half the longest extent (:1549-1551);
  * 4 cameras at center +- maxR on the X and Y axes, glm::lookAt toward the
    center with up = +Z, viewInverse = inverse(lookAt) (:1558-1562);
  * one shared 135-degree perspective (aspect 1, near/far from Define.h)
    through the Vulkan-patched projection (:1596);
  * rays generated exactly like the main raygen and every ray's world
    direction recorded (raygenGaussianLightField.rgen:123-129);
  * images written out as sampling_cam%04d.png (:1950-1975).

On TPU this is simply a batch-of-cameras render: the same fused forward
kernel, vmappable/shardable over the camera axis (parallel.render_batch_sharded).

Note: the reference shader indexes the output image as
image[x=launchID.y, y=launchID.z] (raygenGaussianLightField.rgen:193), i.e.
its PNG is the transpose of the conventional row-major image; we store
conventional (H, W) images and document the difference.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..io.cameras import Camera, look_at_inverse, perspective_vulkan
from .gaussians import GaussianModel


@dataclasses.dataclass(frozen=True)
class LightFieldConfig:
    """VulkanFullRT.cpp:167-172 (GaussianLightField struct defaults)."""
    num_cameras: int = 4
    width: int = 180
    height: int = 180
    fov_deg: float = 135.0
    #: tile size for the render (180 = 9 * 20; the main default 16 does not
    #: divide 180)
    tile_size: int = 20


def sampling_cameras(model: GaussianModel,
                     lf: LightFieldConfig = LightFieldConfig(),
                     cfg: RenderConfig = DEFAULT_CONFIG) -> List[Camera]:
    """Cameras on the bounding volume (VulkanFullRT.cpp:1527-1562)."""
    pos = np.asarray(model.means)
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    center = (lo + hi) / 2.0
    max_r = float((hi - lo).max() / 2.0)
    up = np.asarray([0.0, 0.0, 1.0])
    positions = [
        center + np.asarray([max_r, 0.0, 0.0]),
        center + np.asarray([0.0, max_r, 0.0]),
        center - np.asarray([max_r, 0.0, 0.0]),
        center - np.asarray([0.0, max_r, 0.0]),
    ][: lf.num_cameras]

    proj = perspective_vulkan(np.radians(lf.fov_deg), lf.width / lf.height,
                              cfg.near, cfg.far)
    proj_inv = np.linalg.inv(proj)
    cams = []
    for i, eye in enumerate(positions):
        c2w = look_at_inverse(eye, center, up)
        cams.append(Camera(width=lf.width, height=lf.height,
                           view_inverse=c2w, proj_inverse=proj_inv,
                           name=f"sampling_cam{i:04d}"))
    return cams


def compute_light_field(model: GaussianModel,
                        lf: LightFieldConfig = LightFieldConfig(),
                        cfg: RenderConfig = DEFAULT_CONFIG,
                        impl: str = "auto",
                        mesh=None):
    """Render the light-field sample set.

    Returns dict with images (C, H, W, 3) float [0,1], ray_dirs (C, H, W, 3)
    (the rayDirBuffer of raygenGaussianLightField.rgen:129), and the cameras.
    When `mesh` is given the camera batch is sharded across it.
    """
    import jax.numpy as jnp
    cams = sampling_cameras(model, lf, cfg)
    render_cfg = cfg.replace(tile_size=lf.tile_size)

    ray_dirs = np.stack([cam.rays()[1] for cam in cams])

    if mesh is not None:
        from ..parallel.sharding import camera_batch, render_batch_sharded
        from ..render.binning import plan_capacity
        from ..render.tiled import _camera_mats
        act = model.activate()
        cap = 0
        for cam in cams:
            w2c, proj = _camera_mats(cam)
            c, _ = plan_capacity(act, w2c, proj, lf.width, lf.height,
                                 render_cfg)
            cap = max(cap, c)
        nt = (lf.width // lf.tile_size) * (lf.height // lf.tile_size)
        cap_pad = cap + (nt + 1) * render_cfg.chunk_size
        batch = camera_batch(cams, render_cfg)
        import jax
        impl_r = ("pallas" if jax.default_backend() == "tpu" else "scan") \
            if impl == "auto" else impl
        imgs = render_batch_sharded(model, batch, mesh, lf.width, lf.height,
                                    render_cfg, cap, cap_pad, impl=impl_r)
        images = np.asarray(imgs[..., 0:3])
    else:
        from ..render.tiled import TiledRenderer
        r = TiledRenderer(lf.width, lf.height, render_cfg, impl=impl)
        r.plan(model, cams)
        images = np.stack(
            [np.asarray(r.render(model, cam)["rgb"]) for cam in cams])

    return {"images": images, "ray_dirs": ray_dirs, "cameras": cams}


def save_light_field(out_dir: str, result) -> List[str]:
    """Write sampling_cam%04d.png + ray_dirs.npy (VulkanFullRT.cpp:1950-1975)."""
    from ..io.image import save_png
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, img in enumerate(result["images"]):
        path = os.path.join(out_dir, f"sampling_cam{i:04d}.png")
        save_png(path, img)
        paths.append(path)
    np.save(os.path.join(out_dir, "ray_dirs.npy"), result["ray_dirs"])
    return paths
