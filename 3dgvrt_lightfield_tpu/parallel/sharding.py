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
from ..render.binning import bin_gaussians, tile_rays, untile
from ..render.pallas_forward import forward_tiles, forward_tiles_reference
from ..render.tile_math import ACC_T
from ..render.tiled import _camera_mats


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
    rays: jnp.ndarray   # (B, num_tiles, 8, R)


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
    if impl == "pallas":
        acc = forward_tiles(binned, rays, cfg, interpret=False)
    elif impl == "interpret":
        acc = forward_tiles(binned, rays, cfg, interpret=True)
    else:
        acc = forward_tiles_reference(binned, rays, cfg)
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
