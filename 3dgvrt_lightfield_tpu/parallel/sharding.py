"""Multi-chip / multi-host sharding of the renderer and trainer.

New capability relative to the reference, which is single-GPU single-process
with no collectives of any kind (SURVEY.md section 2.5; GPU *selection* only,
base/VulkanRTBase.cpp:1399-1440).  The TPU design per BASELINE.json:

  * a 1-axis device mesh ("cam"): the camera/ray batch is sharded across
    chips, Gaussian parameters are replicated,
  * each device runs the full binning + fused-kernel pipeline on its local
    cameras (pure SPMD, zero cross-chip traffic in forward),
  * parameter gradients are all-reduced with `jax.lax.pmean` over ICI inside
    the shard_mapped step, which XLA overlaps with the remaining backward.

Multi-host extends the same mesh over jax.distributed-initialized processes;
nothing here is host-count-specific.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import GaussianModel
from ..render.binning import (band_rays, bin_gaussians, plan_capacity,
                              tile_rays, unband_image, untile)
from ..render.pallas_forward import forward_dispatch
from ..render.tile_math import ACC_T
from ..render.tiled import _camera_mats, _resolve_impl


def make_mesh(n_devices: Optional[int] = None, axis: str = "cam") -> Mesh:
    """1D device mesh over the first n (default: all) local+global devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


class CameraBatch(NamedTuple):
    """Stacked per-camera render inputs; leading axis = camera (shardable)."""
    w2c: jnp.ndarray    # (B, 4, 4)
    proj: jnp.ndarray   # (B, 4, 4)
    rays: jnp.ndarray   # (B, num_tiles, 24, R) — binning.tile_rays layout


def camera_batch(cameras: Sequence, cfg: RenderConfig) -> CameraBatch:
    w2cs, projs, rays = [], [], []
    for cam in cameras:
        w2c, proj = _camera_mats(cam)
        w2cs.append(w2c)
        projs.append(proj)
        rays.append(tile_rays(cam, cfg))
    return CameraBatch(jnp.stack(w2cs), jnp.stack(projs), jnp.stack(rays))


def _render_one(act, w2c, proj, rays, width, height, cfg, cap, cap_pad, impl):
    binned = bin_gaussians(act, w2c, proj, width, height, cfg, cap, cap_pad)
    acc = forward_dispatch(binned, rays, cfg, impl)
    return untile(acc, width, height, cfg.tile_size)


@partial(jax.jit,
         static_argnames=("mesh", "width", "height", "cfg", "cap", "cap_pad",
                          "impl", "axis"))
def render_batch_sharded(model: GaussianModel, cams: CameraBatch, mesh: Mesh,
                         width: int, height: int,
                         cfg: RenderConfig = DEFAULT_CONFIG,
                         cap: int = 0, cap_pad: int = 0, impl: str = "pallas",
                         axis: str = "cam"):
    """Render a batch of cameras sharded across the mesh; params replicated.

    Returns (B, H, W, 8) accumulator images (rgb, depth, T, hits).
    """
    act = model.activate()

    def device_fn(act, cams: CameraBatch):
        def one(args):
            w2c, proj, rays = args
            return _render_one(act, w2c, proj, rays, width, height, cfg,
                               cap, cap_pad, impl)
        return jax.lax.map(one, (cams.w2c, cams.proj, cams.rays))

    fn = jax.shard_map(device_fn, mesh=mesh,
                       in_specs=(P(), P(axis)), out_specs=P(axis))
    return fn(act, cams)


def replicate_model(model: GaussianModel, mesh: Mesh) -> GaussianModel:
    """Place the parameter pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), model)


def plan_capacity_sharded(model: GaussianModel, camera, n_devices: int,
                          cfg: RenderConfig = DEFAULT_CONFIG):
    """Static (capacity, capacity_padded) for tile-row-sharded rendering:
    the max over the per-band plans (SPMD shapes must agree).  Call OUTSIDE
    any jit/grad trace (host planning needs concrete arrays)."""
    act = model.activate()
    w2c, proj = _camera_mats(camera)
    cap = cap_pad = 0
    for off in range(n_devices):
        c, cp = plan_capacity(act, w2c, proj, camera.width, camera.height,
                              cfg, band=(off, n_devices))
        cap, cap_pad = max(cap, c), max(cap_pad, cp)
    return cap, cap_pad


def render_image_tile_sharded(model: GaussianModel, camera, mesh: Mesh,
                              cfg: RenderConfig = DEFAULT_CONFIG,
                              impl: str = "auto", capacity=None,
                              axis: str = "cam"):
    """Render ONE camera with its tile rows sharded across the mesh.

    BASELINE config[2] (big scene, one frame, one host, tile-sharded): every
    device bins + renders every `D`-th tile ROW (round-robin for load
    balance — contiguous bands would concentrate the object's tiles on the
    middle devices), with the Gaussian parameters replicated.  Forward is
    pure SPMD: zero cross-chip traffic; a `jax.grad` over this function
    all-reduces parameter gradients, which XLA lowers onto ICI.

    Returns the assembled (H, W, 8) accumulator image.
    """
    impl = _resolve_impl(impl)
    d = int(mesh.devices.size)
    width, height = camera.width, camera.height
    act = model.activate()
    w2c, proj = _camera_mats(camera)
    if capacity is None:
        capacity = plan_capacity_sharded(model, camera, d, cfg)
    cap, cap_pad = capacity

    rays = band_rays(camera, cfg, d)                  # (D, lt, 24, R)
    offsets = jnp.arange(d, dtype=jnp.int32)
    lh = height // d

    def device_fn(act, w2c, proj, rays_l, off):
        binned = bin_gaussians(act, w2c, proj, width, height, cfg, cap,
                               cap_pad, row_offset=off[0], row_stride=d)
        acc = forward_dispatch(binned, rays_l[0], cfg, impl)
        return untile(acc, width, lh, cfg.tile_size)[None]

    fn = jax.shard_map(device_fn, mesh=mesh,
                       in_specs=(P(), P(), P(), P(axis), P(axis)),
                       out_specs=P(axis), check_vma=False)
    bands = fn(act, w2c, proj, rays, offsets)         # (D, lh, W, 8)
    return unband_image(bands, width, height, cfg.tile_size)
