"""High-level tiled renderer: binning + fused kernel + image assembly.

The production render path (SURVEY.md section 7 step 3).  `TiledRenderer`
is the TPU analog of the reference's prepared per-frame draw: the capacity
plan and ray tiling play the role of the startup AS build + pipeline prepare
(VulkanFullRT.cpp:1990-2110), and `render` is the per-frame dispatch
(VulkanFullRT.cpp:2115-2162) — except the whole path is differentiable and
camera-batchable, with binning re-run per frame (cheap, XLA) instead of a
frozen BVH.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import GaussianModel
from .binning import (bin_gaussians, bin_topology, binned_scene,
                      frame_cull_table, gather_chunks, gather_from_rows,
                      plan_capacity, plan_capacity_from_table,
                      plan_reduce_capacity_from_table, tile_rays, untile)
from .pallas_forward import forward_dispatch
from .tile_math import ACC_DEPTH, ACC_HITS, ACC_T


def _camera_mats(camera):
    w2c = jnp.asarray(np.linalg.inv(camera.view_inverse), jnp.float32)
    proj = jnp.asarray(np.linalg.inv(camera.proj_inverse), jnp.float32)
    return w2c, proj


@partial(jax.jit, static_argnames=("width", "height", "cfg", "cap", "cap_pad",
                                   "impl", "cap_r"))
def _render_pipeline(act, w2c, proj, rays, width, height, cfg, cap, cap_pad,
                     impl, cap_r=0):
    topo = bin_topology(act, w2c, proj, width, height, cfg, cap, cap_pad,
                        capacity_reduce=cap_r)
    acc = forward_dispatch(binned_scene(gather_chunks(act, topo, cfg), topo),
                           rays, cfg, impl)
    return _acc_outputs(acc, width, height, cfg, topo)


def _acc_outputs(acc, width, height, cfg, topo):
    img = untile(acc, width, height, cfg.tile_size)
    return {
        "rgb": img[..., 0:3],
        "depth": img[..., ACC_DEPTH],
        "transmittance": img[..., ACC_T],
        "hit_count": img[..., ACC_HITS],
        "num_pairs": topo.num_pairs,
        "overflow": topo.overflow,
    }


@partial(jax.jit, static_argnames=("width", "height", "cfg", "impl"))
def _render_from_topology(model, topo, rays, width, height, cfg, impl):
    """Render with a HELD pair-list topology: per-frame work is only the
    parameter gather + fused kernel (the reference's AS-build-once shape,
    VulkanFullRT.cpp:575-787 vs per-frame :1185-1244).  Gradients are exact
    for this forward (no gradient flows through the topology); forward
    values use the topology's culling/depth order, which goes stale as the
    params move — callers refresh on their own cadence.

    Takes the RAW model: the parameter table + its gradients go through the
    hand-derived 1D-column VJP (render/rows_vjp.py), not autodiff of the
    activation chain — the trace-measured ~50 ms/frame of lane-padded
    (N, small) cotangent fusions (PROFILE section 3b)."""
    from .rows_vjp import rows64_from_model
    chunks = gather_from_rows(rows64_from_model(model, cfg), topo, cfg)
    acc = forward_dispatch(binned_scene(chunks, topo), rays, cfg, impl)
    return _acc_outputs(acc, width, height, cfg, topo)


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "scan"
    return impl


class TiledRenderer:
    """Reusable tiled render pipeline with cached capacity plan and rays.

    One instance serves any camera of the same (width, height); the pair
    capacity is planned from representative (model, cameras) and padded with
    slack, so the compiled pipeline is reused across frames/poses.
    """

    def __init__(self, width: int, height: int,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 capacity: Optional[tuple] = None,
                 impl: str = "auto"):
        assert width % cfg.tile_size == 0 and height % cfg.tile_size == 0
        self.width, self.height, self.cfg = width, height, cfg
        self.impl = _resolve_impl(impl)
        self.capacity = capacity
        #: static row count of the live-compacted grad-reduce layout
        #: (0 = conservative derivation from `capacity`; set by plan())
        self.capacity_reduce = 0
        self._ray_cache = {}
        self._bound = None  # (topology, rays) from bind()

    def plan(self, model: GaussianModel, cameras: Sequence,
             slack: float = 1.3, bucket_ratio: float = None) -> tuple:
        """Measure pair counts over representative cameras -> static capacity.

        `slack` multiplies the measured counts (headroom for camera/parameter
        drift; overflow triggers an eager re-plan either way).  Static
        scene+camera workloads (benchmarks, datasets planned over all their
        cameras) can run ~1.05: every pipeline stage's cost is proportional
        to the planned capacity, and 1.3 was measured as ~20% of the
        round-3 frame time spent on slack slots.  `bucket_ratio` overrides
        the compile-shape grid (default 1.25x pipeline / 1.1x reduce rows);
        FROZEN scene+camera workloads should pass 1.0 — exact chunk-aligned
        capacities, since every grid-padded row still pays the ~11.6 ns/row
        gather toll (up to 25% of both hot gathers for pure headroom)."""
        act = model.activate()
        cap = cap_pad = cap_r = 0
        ratios = {} if bucket_ratio is None else \
            {"bucket_ratio": bucket_ratio}
        for cam in cameras:
            w2c, proj = _camera_mats(cam)
            tab = jax.tree.map(np.asarray, frame_cull_table(
                act, jnp.asarray(w2c), jnp.asarray(proj), self.width,
                self.height, self.cfg))
            c, cp = plan_capacity_from_table(tab, proj, self.width,
                                             self.height, self.cfg,
                                             slack=slack, **ratios)
            cr = plan_reduce_capacity_from_table(
                tab, proj, self.width, self.height, self.cfg,
                act.means.shape[0] + 1, slack=max(slack, 1.05), **ratios)
            cap, cap_pad, cap_r = max(cap, c), max(cap_pad, cp), max(cap_r, cr)
        self.capacity = (cap, cap_pad)
        self.capacity_reduce = cap_r
        return self.capacity

    def _rays(self, camera):
        # value-based key: id() of a collected camera can be reused and would
        # silently serve another camera's rays
        key = camera.content_key() if hasattr(camera, "content_key") else (
            id(camera), camera.width, camera.height)
        if key not in self._ray_cache:
            if len(self._ray_cache) > 64:
                self._ray_cache.clear()
            rays = tile_rays(camera, self.cfg)
            if isinstance(rays, jax.core.Tracer):
                return rays  # traced call: don't cache trace-local values
            self._ray_cache[key] = jax.device_put(rays)
        return self._ray_cache[key]

    def render(self, model: GaussianModel, camera):
        if self.capacity is None:
            self.plan(model, [camera])
        w2c, proj = _camera_mats(camera)
        out = _render_pipeline(model.activate(), w2c, proj,
                               self._rays(camera), self.width, self.height,
                               self.cfg, *self.capacity, self.impl,
                               self.capacity_reduce)
        # capacity overflow truncates pairs (dropped, never corrupt); when
        # called eagerly, re-plan for this camera and re-render once
        if (not isinstance(out["overflow"], jax.core.Tracer)
                and int(out["overflow"]) > 0):
            cap0, cap_r0 = self.capacity, self.capacity_reduce
            self.plan(model, [camera])
            self.capacity = (max(cap0[0], self.capacity[0]),
                             max(cap0[1], self.capacity[1]))
            # max-merge like the pair capacities: a single-camera re-plan
            # must not shrink a multi-camera-planned reduce-row budget (other
            # cameras would overflow it and re-plan/recompile in a loop)
            self.capacity_reduce = max(cap_r0, self.capacity_reduce)
            out = _render_pipeline(model.activate(), w2c, proj,
                                   self._rays(camera), self.width,
                                   self.height, self.cfg, *self.capacity,
                                   self.impl, self.capacity_reduce)
        return out

    def bind(self, model: GaussianModel, camera):
        """Build and hold this (model, camera)'s pair-list topology — the
        analog of the reference's startup AS build (VulkanFullRT.cpp:575-787).
        Subsequent `render_bound` calls skip the whole binning pass."""
        if self.capacity is None:
            self.plan(model, [camera])
        w2c, proj = _camera_mats(camera)
        topo = bin_topology(model.activate(), w2c, proj, self.width,
                            self.height, self.cfg, *self.capacity,
                            capacity_reduce=self.capacity_reduce)
        if (not isinstance(topo.overflow, jax.core.Tracer)
                and int(topo.overflow) > 0):
            cap0, cap_r0 = self.capacity, self.capacity_reduce
            self.plan(model, [camera])
            self.capacity = (max(cap0[0], self.capacity[0]),
                             max(cap0[1], self.capacity[1]))
            self.capacity_reduce = max(cap_r0, self.capacity_reduce)
            topo = bin_topology(model.activate(), w2c, proj, self.width,
                                self.height, self.cfg, *self.capacity,
                                capacity_reduce=self.capacity_reduce)
        self._bound = (topo, self._rays(camera))
        return topo

    def render_bound(self, model: GaussianModel):
        """Render against the topology held by `bind` (per-frame work: one
        parameter gather + the fused kernel).  Exact for the bound model;
        for a model whose parameters have since moved, culling and depth
        order are stale while gradients stay exact — re-`bind` on the
        caller's staleness cadence (e.g. every K training steps)."""
        assert self._bound is not None, "call bind(model, camera) first"
        topo, rays = self._bound
        return _render_from_topology(model, topo, rays,
                                     self.width, self.height, self.cfg,
                                     self.impl)


def render_image_tiled(model: GaussianModel, camera,
                       cfg: RenderConfig = DEFAULT_CONFIG,
                       impl: str = "auto",
                       capacity: Optional[tuple] = None):
    """One-shot tiled render (convenience wrapper over TiledRenderer)."""
    r = TiledRenderer(camera.width, camera.height, cfg, capacity=capacity,
                      impl=impl)
    return r.render(model, camera)
