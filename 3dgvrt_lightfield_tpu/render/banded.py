"""Banded (bounded-memory) rendering: sequential tile-row bands on ONE chip.

BASELINE config[2] (garden-scale: ~5M Gaussians at 1080p) cannot materialize
the full per-pair chunk array: pairs scale with scene size and the fused
pipeline's working set is O(pairs) (~256 B/pair forward + the same again for
backward cotangents — multi-GB at that scale).  The TPU-idiomatic answer is
streaming over a bounded working set, not per-pair in-kernel DMA (~1M tiny
DMAs/frame would be latency-bound):

  * the image's tile rows are split into `n_bands` round-robin bands (the
    same banding the multi-chip tile-sharding path uses,
    parallel/sharding.py — there sharded over devices, here SCANNED over
    sequentially on one device),
  * `lax.scan` + `jax.checkpoint` over bands: forward holds ONE band's
    binning (O(pairs/n_bands)), backward rematerializes each band's binning
    + kernel forward instead of storing residuals — peak HBM becomes
    O(N + pairs/n_bands) for forward AND backward,
  * gradients accumulate across bands through the scan's linearization —
    images match the unbanded render exactly (band binning is full binning
    restricted to the band's tile rows); gradients match up to float
    summation order for gaussians that straddle band boundaries.

Reference analog: SplitBLAS partitions the acceleration structure into grid
cells for the same at-scale motivation (SplitBLAS.cpp:678-752).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import GaussianModel
from .binning import (band_rays, bin_topology_from_table, binned_scene,
                      frame_cull_table, gather_from_rows,
                      plan_capacity_from_table, unband_image, untile)
from .pallas_forward import forward_dispatch
from .tiled import _camera_mats, _resolve_impl


def resolve_bands(height: int, requested: int,
                  cfg: RenderConfig = DEFAULT_CONFIG) -> int:
    """Largest band count <= `requested` that divides the tile-row count.

    Round-robin banding needs n_bands | (height/tile_size); e.g. 1088 px at
    16-px tiles has 68 rows, so a requested 8 resolves to 4.  Callers use
    this instead of asserting so 1080p-class heights just work.
    """
    ny = height // cfg.tile_size
    for b in range(min(requested, ny), 0, -1):
        if ny % b == 0:
            return b
    return 1


def resolve_bands_common(heights, requested: int,
                         cfg: RenderConfig = DEFAULT_CONFIG) -> int:
    """Largest band count <= `requested` dividing EVERY camera's tile-row
    count.  Pose files may carry heights different from the CLI --height;
    resolving from one height and asserting on another was the r2 advisor's
    app.py finding — resolve from the actual cameras instead."""
    import math as _math
    g = 0
    for h in heights:
        g = _math.gcd(g, h // cfg.tile_size)
    for b in range(min(requested, g), 0, -1):
        if g % b == 0:
            return b
    return 1


def _band_spec(b: int, n_bands: int, height: int, cfg: RenderConfig,
               mode: str):
    """(offset, stride, count) of band b — round-robin or contiguous."""
    if mode == "contig":
        lny = (height // cfg.tile_size) // n_bands
        return (b * lny, 1, lny)
    assert mode == "stride", mode
    return (b, n_bands, 0)


def plan_capacity_banded(model: GaussianModel, camera, n_bands: int,
                         cfg: RenderConfig = DEFAULT_CONFIG,
                         slack: float = 1.3, with_reduce: bool = False,
                         mode: str = "stride"):
    """Static (capacity, capacity_padded) = max over the bands' plans.

    The device frame table is computed ONCE; each band's plan is pure host
    NumPy on it (was one full device pass per band — 17x slower at 5M).
    `with_reduce=True` additionally plans the COMPACT grad-reduce layout
    (segreduce.CompactReducePlan) and returns (capacity, capacity_padded,
    capacity_live, capacity_reduce, capacity_range).  mode="contig" plans
    CONTIGUOUS tile-row bands (span banding) — with a y-sorted model each
    band's live-id window capacity_range shrinks to ~N/n_bands."""
    import numpy as np
    from .binning import plan_compact_reduce_from_table
    act = model.activate()
    w2c, proj = _camera_mats(camera)
    tab = jax.tree.map(np.asarray, frame_cull_table(
        act, jnp.asarray(w2c), jnp.asarray(proj), camera.width,
        camera.height, cfg))
    cap = cap_pad = cap_live = cap_r = cap_range = 0
    for off in range(n_bands):
        band = _band_spec(off, n_bands, camera.height, cfg, mode)
        c, cp = plan_capacity_from_table(tab, proj, camera.width,
                                         camera.height, cfg, slack=slack,
                                         band=band)
        cap, cap_pad = max(cap, c), max(cap_pad, cp)
        if with_reduce:
            cl, cr, crg = plan_compact_reduce_from_table(
                tab, proj, camera.width, camera.height, cfg,
                slack=max(slack, 1.05), band=band)
            cap_live, cap_r = max(cap_live, cl), max(cap_r, cr)
            cap_range = max(cap_range, crg)
    if with_reduce:
        return cap, cap_pad, cap_live, cap_r, cap_range
    return cap, cap_pad


@partial(jax.jit, static_argnames=("width", "height", "n_bands", "cfg",
                                   "cap", "cap_pad", "impl", "cap_live",
                                   "cap_r", "cap_range", "mode"))
def _render_banded(model, w2c, proj, rays_bands, width, height, n_bands, cfg,
                   cap, cap_pad, impl, cap_live=0, cap_r=0, cap_range=0,
                   mode: str = "stride"):
    from .rows_vjp import rows64_from_model
    contig = mode == "contig"
    lny = (height // cfg.tile_size) // n_bands
    offsets = jnp.arange(n_bands, dtype=jnp.int32) * (lny if contig else 1)
    lh = height // n_bands
    # both frame-level tables are band-independent: build them ONCE per
    # frame instead of rematerializing inside every band's checkpointed
    # body.  rows64 is the only gaussian-count-sized 2D array alive across
    # the scan; the cull table is all-1D (FrameCullTable) — at 5M gaussians
    # the per-band rebuilds' (N, C) temps were a 27 GB compile (SCALE_r03.md)
    #
    # Gradients route through the hand-VJP parameter layer (rows_vjp), the
    # SAME path the bound/training renderer uses — autodiffing activate()
    # here cost the ~50 ms/frame lane-padded backward class the r4 trace
    # eliminated elsewhere (PROFILE section 3b) and made the public banded
    # API exercise a different grad path than training (r4 verdict weak 5).
    # The cull table feeds only integer topology (pair lists/permutations),
    # so its gradient is identically zero: stop_gradient prunes that dead
    # backward graph without changing any value.
    rows64 = rows64_from_model(model, cfg)
    act = jax.lax.stop_gradient(model).activate()
    tab = frame_cull_table(act, w2c, proj, width, height, cfg)

    def body(overflow, inp):
        rays_b, off = inp
        topo = bin_topology_from_table(tab, proj, width, height, cfg, cap,
                                       cap_pad, row_offset=off,
                                       row_stride=1 if contig else n_bands,
                                       capacity_reduce=cap_r,
                                       capacity_live=cap_live,
                                       row_count=lny if contig else 0,
                                       capacity_range=cap_range)
        binned = binned_scene(gather_from_rows(rows64, topo, cfg), topo)
        acc = forward_dispatch(binned, rays_b, cfg, impl)
        img = untile(acc, width, lh, cfg.tile_size)
        return overflow + binned.overflow, img

    # checkpoint: backward re-bins + re-runs the band forward instead of
    # storing each band's O(pairs/n_bands) residuals
    overflow, bands = jax.lax.scan(jax.checkpoint(body),
                                   jnp.zeros((), jnp.int32),
                                   (rays_bands, offsets))
    img = unband_image(bands, width, height, cfg.tile_size, mode=mode)
    return img, overflow


@partial(jax.jit, static_argnames=("width", "height", "cfg", "impl",
                                   "remat", "mode"))
def _render_banded_bound(model, topos, rays_bands, width, height, cfg, impl,
                         remat: str = "full", mode: str = "stride"):
    """Render against HELD per-band topologies (leading axis = band).

    The banded analog of tiled._render_from_topology: per-frame work is one
    rows64 build + per band a parameter gather + the fused kernel — the
    whole binning pass (the dominant cost at 5M gaussians, SCALE_r03.md) is
    skipped.  Gradients are exact for this forward; culling/depth order is
    as stale as the topologies (refresh on the caller's K-step cadence —
    the reference's AS-build-once shape, SplitBLAS.cpp:706-752 rebuilds
    cells only on demand)."""
    from .rows_vjp import rows64_from_model
    if isinstance(rays_bands, (tuple, list)):
        # VARIABLE (pair-balanced) bands: per-band shapes differ, so the
        # bands are an UNROLLED python loop instead of a lax.scan — each
        # band gets its OWN static capacities (no max-merge padding on the
        # two ~11.6 ns/row gathers) and its own row count (~equal pairs per
        # band, binning.plan_row_split).  n_bands is small (1-4 at 5M), so
        # the unroll costs one extra kernel instantiation per band.
        #
        # Degenerate-split fast path: on y-symmetric scenes the quantile
        # split lands on EQUAL rows and capacities (session G measured
        # exactly this at 5M: split (0,34)/(34,34), identical caps).  Stack
        # and take the scan path — the unrolled variant's duplicated band
        # bodies make XLA materialize the 64-column rows64 build as padded
        # (N+1, 1) temps (128x expansion each; a 151 GB compile-time HBM
        # request at 5M, artifacts/session_g), which the single-body scan
        # never does.  Unequal bands keep the unroll (its capacity win only
        # exists when the split is unequal, i.e. exactly when it compiles
        # as intended at <= ~2M-per-band shapes).
        shapes = [jax.tree.map(jnp.shape, t) for t in topos]
        if (all(s == shapes[0] for s in shapes[1:])
                and all(r.shape == rays_bands[0].shape
                        for r in rays_bands[1:])):
            topos = jax.tree.map(lambda *xs: jnp.stack(xs), *topos)
            rays_bands = jnp.stack(rays_bands)
        else:
            return _render_bound_unrolled(model, topos, rays_bands, width,
                                          height, cfg, impl, remat)
    n_bands, _, _, _ = rays_bands.shape
    lh = height // n_bands
    # raw model in, hand-derived 1D-column VJP for the parameter table
    # (rows_vjp.py) — the autodiff activation backward was ~50 ms/frame of
    # lane-padded (N, small) fusions at bench scale (PROFILE section 3b)
    rows64 = rows64_from_model(model, cfg)

    def body(overflow, inp):
        rays_b, topo = inp
        chunks = gather_from_rows(rows64, topo, cfg)
        if remat == "gather":
            # name the gathered parameter rows so the "gather" checkpoint
            # policy saves THEM (the band's ~11.6 ns/row permutation gather,
            # ~200 ms/frame at 5M) while the cheap-to-recompute kernel
            # intermediates are still rematerialized
            chunks = jax.ad_checkpoint.checkpoint_name(chunks, "band_chunks")
        binned = binned_scene(chunks, topo)
        acc = forward_dispatch(binned, rays_b, cfg, impl)
        img = untile(acc, width, lh, cfg.tile_size)
        return overflow + binned.overflow, img

    # Memory/recompute ladder over the band scan (5M measurements in
    # SCALE_r04b.md):
    #   "full"   jax.checkpoint: backward re-runs each band's parameter
    #            gather + forward kernel — O(pairs/n_bands) residual memory;
    #   "gather" checkpoint with save_only_these_names("band_chunks"):
    #            holds each band's gathered (chunks) rows (~0.73 GB/band at
    #            5M/4 bands) so the backward skips the gather re-pay but
    #            still recomputes the kernel forward;
    #   "none"   no checkpoint: all residuals held (did NOT fit HBM at
    #            5M/4 bands — kept for smaller scenes).
    if remat == "full":
        body_fn = jax.checkpoint(body)
    elif remat == "gather":
        body_fn = jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_only_these_names(
                "band_chunks"))
    else:
        assert remat == "none", remat
        body_fn = body
    overflow, bands = jax.lax.scan(body_fn,
                                   jnp.zeros((), jnp.int32),
                                   (rays_bands, topos))
    img = unband_image(bands, width, height, cfg.tile_size, mode=mode)
    return img, overflow


def _render_bound_unrolled(model, topos, rays_bands, width, height, cfg,
                           impl, remat: str):
    """Variable-band (pair-balanced) bound render: unrolled band loop.

    Bands are CONTIGUOUS tile-row blocks of unequal row counts (chosen at
    the pair-count quantiles, binning.plan_row_split); `topos` and
    `rays_bands` are tuples with per-band shapes.  Same per-band body and
    remat ladder as the scan path; the final image is a plain row-block
    concatenation.  Called from inside _render_banded_bound's jit."""
    from .rows_vjp import rows64_from_model
    ts = cfg.tile_size
    nx = width // ts
    rows64 = rows64_from_model(model, cfg)

    def body(rays_b, topo):
        chunks = gather_from_rows(rows64, topo, cfg)
        if remat == "gather":
            chunks = jax.ad_checkpoint.checkpoint_name(chunks, "band_chunks")
        binned = binned_scene(chunks, topo)
        acc = forward_dispatch(binned, rays_b, cfg, impl)
        return binned.overflow, acc

    if remat == "full":
        body_fn = jax.checkpoint(body)
    elif remat == "gather":
        body_fn = jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_only_these_names(
                "band_chunks"))
    else:
        assert remat == "none", remat
        body_fn = body

    overflow = jnp.zeros((), jnp.int32)
    imgs = []
    for rays_b, topo in zip(rays_bands, topos):
        ovf, acc = body_fn(rays_b, topo)
        overflow = overflow + ovf
        lh = (rays_b.shape[0] // nx) * ts
        imgs.append(untile(acc, width, lh, ts))
    img = jnp.concatenate(imgs, axis=0)
    assert img.shape[0] == height, (img.shape, height)
    return img, overflow


def plan_capacity_balanced(model: GaussianModel, camera, n_bands: int,
                           cfg: RenderConfig = DEFAULT_CONFIG,
                           slack: float = 1.3):
    """Pair-balanced contiguous plan: (specs, per-band capacity tuples).

    specs = ((row_offset, row_count), ...) at the survivor-pair quantiles;
    caps[b] = (capacity, capacity_padded, capacity_live, capacity_reduce,
    capacity_range) planned for band b ALONE — the variable-band renderer
    compiles each band at its own shapes, so no max-merge is applied."""
    import numpy as np
    from .binning import plan_compact_reduce_from_table, plan_row_split
    act = model.activate()
    w2c, proj = _camera_mats(camera)
    tab = jax.tree.map(np.asarray, frame_cull_table(
        act, jnp.asarray(w2c), jnp.asarray(proj), camera.width,
        camera.height, cfg))
    specs = plan_row_split(tab, proj, camera.width, camera.height, cfg,
                           n_bands)
    caps = []
    for off, count in specs:
        band = (off, 1, count)
        c, cp = plan_capacity_from_table(tab, proj, camera.width,
                                         camera.height, cfg, slack=slack,
                                         band=band)
        cl, cr, crg = plan_compact_reduce_from_table(
            tab, proj, camera.width, camera.height, cfg,
            slack=max(slack, 1.05), band=band)
        caps.append((c, cp, cl, cr, crg))
    return specs, tuple(caps)


class BandedRenderer:
    """Bounded-memory banded pipeline with bind-once topology reuse.

    The banded counterpart of TiledRenderer: `plan` picks static per-band
    capacities, `bind` builds and holds every band's pair-list topology
    (refresh on the caller's cadence), `render_bound` renders frames
    against them — per-frame work is parameter gather + kernel only.
    """

    def __init__(self, width: int, height: int, n_bands: int,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 capacity: Optional[tuple] = None, impl: str = "auto",
                 remat: str = "full", span: bool = False,
                 balance: bool = False):
        # balanced bands have VARIABLE row counts — no divisibility needed
        assert balance or (height // cfg.tile_size) % n_bands == 0, \
            (height, n_bands)
        assert not balance or span, "balance requires span (contig) banding"
        self.width, self.height, self.n_bands = width, height, n_bands
        self.cfg, self.capacity = cfg, capacity
        self.impl = _resolve_impl(impl)
        #: band-scan recompute/memory ladder: "full" | "gather" | "none"
        #: (see _render_banded_bound)
        self.remat = remat
        #: span banding: CONTIGUOUS tile-row bands + per-band live-id
        #: windows — pair a y-sorted model (GaussianModel.sorted_by_depth/
        #: sorted_for_camera) with span=True so each band's gaussians form
        #: a narrow contiguous id range (SplitBLAS's spatial partition,
        #: SplitBLAS.cpp:678-752, done on ids instead of a BVH)
        self.mode = "contig" if span else "stride"
        #: PAIR-BALANCED variable bands (requires span): band row counts
        #: come from binning.plan_row_split and every band compiles at its
        #: OWN capacities — topologies/rays are tuples, the bound render
        #: unrolls (see _render_bound_unrolled).  plan() fills band_specs /
        #: band_caps instead of the uniform capacity fields.
        self.balance = balance
        self.band_specs = None  # ((row_offset, row_count), ...) when balance
        self.band_caps = None   # per-band (cap, cap_pad, cl, cr, crg)
        #: compact grad-reduce budgets (0 = XLA prefix fallback at scale);
        #: set by plan() so bound topologies carry a CompactReducePlan
        self.capacity_live = 0
        self.capacity_reduce = 0
        self.capacity_range = 0
        self._bound = None      # (topos, rays_bands)

    def plan(self, model: GaussianModel, camera, slack: float = 1.3):
        if self.balance:
            specs, caps = plan_capacity_balanced(model, camera, self.n_bands,
                                                 self.cfg, slack=slack)
            if self.band_caps is not None and specs == self.band_specs:
                # same split: max-merge per band so a drift re-plan cannot
                # shrink compiled shapes (bucket-oscillation guard, mirrors
                # the uniform paths)
                caps = tuple(tuple(max(a, b) for a, b in zip(old, new))
                             for old, new in zip(self.band_caps, caps))
            self.band_specs, self.band_caps = specs, caps
            # bookkeeping mirror for callers that read .capacity
            self.capacity = (max(c[0] for c in caps),
                             max(c[1] for c in caps))
            return self.capacity
        cap, cap_pad, cap_live, cap_r, cap_range = plan_capacity_banded(
            model, camera, self.n_bands, self.cfg, slack=slack,
            with_reduce=True, mode=self.mode)
        self.capacity = (cap, cap_pad)
        self.capacity_live = max(self.capacity_live, cap_live)
        self.capacity_reduce = max(self.capacity_reduce, cap_r)
        self.capacity_range = max(self.capacity_range, cap_range)
        return self.capacity

    def _build_topos(self, model: GaussianModel, camera):
        act = model.activate()
        w2c, proj = _camera_mats(camera)
        tab = frame_cull_table(act, jnp.asarray(w2c), jnp.asarray(proj),
                               self.width, self.height, self.cfg)
        if self.balance:
            assert self.band_specs is not None, "plan() before bind()"
            return tuple(
                bin_topology_from_table(
                    tab, proj, self.width, self.height, self.cfg, c, cp,
                    row_offset=off, row_stride=1, row_count=count,
                    capacity_live=cl, capacity_reduce=cr, capacity_range=crg)
                for (off, count), (c, cp, cl, cr, crg)
                in zip(self.band_specs, self.band_caps))
        cap, cap_pad = self.capacity
        topos = []
        for off in range(self.n_bands):
            b_off, b_stride, b_count = _band_spec(
                off, self.n_bands, self.height, self.cfg, self.mode)
            topos.append(bin_topology_from_table(
                tab, proj, self.width, self.height,
                self.cfg, cap, cap_pad,
                row_offset=b_off, row_stride=b_stride,
                capacity_reduce=self.capacity_reduce,
                capacity_live=self.capacity_live,
                row_count=b_count,
                capacity_range=self.capacity_range))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *topos)

    def bind(self, model: GaussianModel, camera):
        """Build + hold all bands' topologies for this (model, camera).

        Overflow in ANY band (capacity outgrown by parameter drift over a
        long run) triggers an eager re-plan + rebuild, mirroring
        TiledRenderer.bind — a truncated pair list would otherwise silently
        degrade every gradient until the next plan."""
        if self.capacity is None or (self.balance and self.band_caps is None):
            self.plan(model, camera)
        topos = self._build_topos(model, camera)
        ovf_leaves = [t.overflow for t in topos] if self.balance \
            else [topos.overflow]
        total_overflow = sum(jnp.sum(o) for o in ovf_leaves)
        if (not isinstance(total_overflow, jax.core.Tracer)
                and int(total_overflow) > 0):
            cap0 = self.capacity
            # balance: plan() max-merges band_caps itself when the split is
            # unchanged; a changed split re-shapes every band anyway
            self.plan(model, camera)
            self.capacity = (max(cap0[0], self.capacity[0]),
                             max(cap0[1], self.capacity[1]))
            topos = self._build_topos(model, camera)
        if self.balance:
            from .binning import band_rays_split
            rays = band_rays_split(camera, self.cfg, self.band_specs)
        else:
            rays = band_rays(camera, self.cfg, self.n_bands, mode=self.mode)
        self._bound = (topos, rays)
        return topos

    def render_bound(self, model: GaussianModel):
        assert self._bound is not None, "call bind(model, camera) first"
        topos, rays_bands = self._bound
        img, overflow = _render_banded_bound(
            model, topos, rays_bands, self.width, self.height,
            self.cfg, self.impl, remat=self.remat, mode=self.mode)
        return {
            "rgb": img[..., 0:3],
            "depth": img[..., 3],
            "transmittance": img[..., 4],
            "hit_count": img[..., 5],
            "overflow": overflow,
        }


def render_image_banded(model: GaussianModel, camera, n_bands: int,
                        cfg: RenderConfig = DEFAULT_CONFIG,
                        capacity: Optional[tuple] = None, impl: str = "auto",
                        span: bool = False):
    """Render one camera in `n_bands` sequential tile-row bands.

    Differentiable end-to-end; equals the unbanded `render_image_tiled`
    exactly (same binning restricted per band).  Peak per-pair memory is
    1/n_bands of the unbanded pipeline for both forward and backward.
    `span=True` uses CONTIGUOUS row bands + live-id windows (pair with a
    y-sorted model, see BandedRenderer).
    """
    impl = _resolve_impl(impl)
    mode = "contig" if span else "stride"
    width, height = camera.width, camera.height
    ts = cfg.tile_size
    assert (height // ts) % n_bands == 0, (height, ts, n_bands)
    cap_live = cap_r = cap_range = 0
    if capacity is None:
        capacity = plan_capacity_banded(model, camera, n_bands, cfg,
                                        with_reduce=True, mode=mode)
    if len(capacity) >= 4:  # (cap, cap_pad, cap_live, cap_r[, cap_range])
        cap_live, cap_r = capacity[2], capacity[3]
        cap_range = capacity[4] if len(capacity) > 4 else 0
        capacity = capacity[:2]
    w2c, proj = _camera_mats(camera)
    rays_bands = band_rays(camera, cfg, n_bands, mode=mode)
    img, overflow = _render_banded(model, w2c, proj, rays_bands, width,
                                   height, n_bands, cfg, *capacity, impl,
                                   cap_live=cap_live, cap_r=cap_r,
                                   cap_range=cap_range, mode=mode)
    return {
        "rgb": img[..., 0:3],
        "depth": img[..., 3],
        "transmittance": img[..., 4],
        "hit_count": img[..., 5],
        "overflow": overflow,
    }
