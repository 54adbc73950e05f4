"""Fine-tuning loop: Adam on all Gaussian parameter groups.

New capability — the reference is forward/inference-only (SURVEY.md section 0:
"no training loop, no backward pass, no gradients, no optimizer").  BASELINE
config[4]: end-to-end Adam fine-tune on means/covs/SH/opacity with a
densify-free schedule, PSNR tracked against reference renders.

Per-group learning rates follow the standard 3DGS recipe (position lr scaled
by scene extent with exponential decay; SH rest at dc/20).  The train step is
shard_mapped over the camera batch: parameters replicated, gradients pmean'd
over ICI (overlapped with backward by XLA), update applied identically on
every device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import GaussianModel
from ..parallel.sharding import CameraBatch, _render_one


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_means: float = 1.6e-4          # x scene_extent, exp-decayed
    lr_means_final_scale: float = 0.01
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 0.05
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 2.5e-3 / 20.0
    total_steps: int = 1000
    l1_weight: float = 1.0
    l2_weight: float = 0.0
    scene_extent: float = 1.0
    #: banded (n_bands > 1) training: rebuild the held per-band topologies
    #: every N steps (the bench's K-step staleness contract)
    refresh_every: int = 10
    #: band-scan recompute policy for banded training: "full" | "gather" |
    #: "none" (render/banded._render_banded_bound).  "gather" measured
    #: -44 ms/frame at config[2] scale (SCALE_r04b.md) at +0.73 GB/band
    #: of held residuals
    banded_remat: str = "full"
    #: "adam" | "adafactor".  Adafactor factors the second moment, cutting
    #: optimizer state from 2x to ~1x+eps of the parameter bytes — at
    #: config[2] scale (5M gaussians) Adam's moments alone are ~2.7 GB and
    #: pushed the banded train step past HBM (spool jobs 052/061)
    optimizer: str = "adam"
    #: span banding for n_bands > 1: contiguous tile-row bands + per-band
    #: live-id windows.  Pair with a model pre-sorted by image row
    #: (GaussianModel.sorted_for_camera) — the sort is scene prep, done
    #: once; an unsorted model still trains correctly, the windows just
    #: degrade to full-table width
    span_bands: bool = False
    #: PAIR-BALANCED span bands: band row counts sit at the survivor-pair
    #: quantiles and each band compiles at its own capacities (unrolled,
    #: render/banded._render_bound_unrolled) — removes span banding's
    #: load-balance penalty (SCALE_r05.md).  Requires span_bands.
    balance_bands: bool = False


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """Per-parameter-group Adam (or Adafactor at scale) via multi_transform."""
    means_sched = optax.exponential_decay(
        tc.lr_means * tc.scene_extent, tc.total_steps,
        tc.lr_means_final_scale)
    if tc.optimizer == "adafactor":
        def opt(lr):
            return optax.adafactor(learning_rate=lr,
                                   multiply_by_parameter_scale=False)
    else:
        def opt(lr):
            return optax.adam(lr, eps=1e-15)
    txs = {
        "means": opt(means_sched),
        "scales_log": opt(tc.lr_scales),
        "quats": opt(tc.lr_quats),
        "opacity_logit": opt(tc.lr_opacity),
        "sh_dc": opt(tc.lr_sh_dc),
        "sh_rest": opt(tc.lr_sh_rest),
    }
    labels = GaussianModel(
        means="means", scales_log="scales_log", quats="quats",
        opacity_logit="opacity_logit", sh_dc="sh_dc", sh_rest="sh_rest")
    return optax.multi_transform(txs, labels)


def _batch_loss(act, cams: CameraBatch, targets, width, height, cfg, cap,
                cap_pad, impl, tc: TrainConfig):
    def one(args):
        w2c, proj, rays, target = args
        img = _render_one(act, w2c, proj, rays, width, height, cfg, cap,
                          cap_pad, impl)
        rgb = img[..., 0:3]
        l1 = jnp.mean(jnp.abs(rgb - target))
        l2 = jnp.mean((rgb - target) ** 2)
        return tc.l1_weight * l1 + tc.l2_weight * l2
    losses = jax.lax.map(one, (cams.w2c, cams.proj, cams.rays, targets))
    return jnp.mean(losses)


class Trainer:
    """Adam fine-tuner over a (possibly sharded) camera batch.

    Usage:
        t = Trainer(width, height, cfg, tc, capacity, mesh=mesh)
        state = t.init(model)
        state, loss = t.step(state, camera_batch, targets)

    Garden-scale scenes (BASELINE config[2]: ~5M gaussians at 1080p) train
    through the banded bounded-memory pipeline instead: pass `n_bands > 1`
    and call `step(state, camera, target)` with a Camera — the trainer
    holds the per-band topologies and refreshes them every
    `tc.refresh_every` steps (gradients stay exact per step; only culling /
    depth order go stale, the same K-step contract as the flagship bench).
    """

    def __init__(self, width: int, height: int,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 tc: TrainConfig = TrainConfig(),
                 capacity: tuple = (0, 0),
                 mesh: Optional[Mesh] = None,
                 impl: str = "auto", axis: str = "cam",
                 n_bands: int = 1):
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        self.width, self.height, self.cfg, self.tc = width, height, cfg, tc
        self.cap, self.cap_pad = capacity
        self.impl, self.mesh, self.axis = impl, mesh, axis
        self.n_bands = n_bands
        self.optimizer = make_optimizer(tc)
        if n_bands > 1:
            assert mesh is None, "banded training is single-chip (config[2])"
            from ..render.banded import BandedRenderer
            self._banded = BandedRenderer(
                width, height, n_bands, cfg,
                capacity=None if capacity == (0, 0) else capacity,
                impl=impl, remat=tc.banded_remat, span=tc.span_bands,
                balance=tc.balance_bands)
            self._bind_age = None
            self._bind_key = None
            self.last_overflow = None
            self._step = self._build_banded_step()
        else:
            self._step = self._build_step()

    def init(self, model: GaussianModel):
        return (model, self.optimizer.init(model))

    def _build_step(self):
        width, height, cfg = self.width, self.height, self.cfg
        cap, cap_pad, impl, tc = self.cap, self.cap_pad, self.impl, self.tc
        optimizer, mesh, axis = self.optimizer, self.mesh, self.axis

        def loss_and_grads(model, cams, targets):
            def loss_fn(m):
                return _batch_loss(m.activate(), cams, targets, width,
                                   height, cfg, cap, cap_pad, impl, tc)
            return jax.value_and_grad(loss_fn)(model)

        if mesh is None:
            def step(state, cams, targets):
                model, opt_state = state
                loss, grads = loss_and_grads(model, cams, targets)
                updates, opt_state = optimizer.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                return (model, opt_state), loss
        else:
            def device_fn(model, cams, targets):
                loss, grads = loss_and_grads(model, cams, targets)
                # grad all-reduce over ICI, overlapped with backward by XLA
                grads = jax.lax.pmean(grads, axis)
                loss = jax.lax.pmean(loss, axis)
                return loss, grads

            # check_vma=False: the custom VJP of the binning gather
            # (param_grads.chunked_gather) yields device-varying cotangents
            # for the replicated params, which the VMA checker cannot track
            # through the camera lax.map carry; the explicit pmean above is
            # the correct reduction.
            sharded = jax.shard_map(
                device_fn, mesh=mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=(P(), P()), check_vma=False)

            def step(state, cams, targets):
                model, opt_state = state
                loss, grads = sharded(model, cams, targets)
                updates, opt_state = optimizer.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                return (model, opt_state), loss

        return jax.jit(step)

    def _build_banded_step(self):
        width, height, cfg = self.width, self.height, self.cfg
        impl, tc, optimizer = self.impl, self.tc, self.optimizer
        remat, mode = self._banded.remat, self._banded.mode
        from ..render.banded import _render_banded_bound

        def step(state, topos, rays_bands, target):
            model, opt_state = state

            def loss_fn(m):
                img, ovf = _render_banded_bound(m, topos,
                                                rays_bands, width, height,
                                                cfg, impl, remat=remat,
                                                mode=mode)
                rgb = img[..., 0:3]
                l1 = jnp.mean(jnp.abs(rgb - target))
                l2 = jnp.mean((rgb - target) ** 2)
                return tc.l1_weight * l1 + tc.l2_weight * l2, ovf

            (loss, ovf), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(model)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), (loss, ovf)

        # donate the (params, moments) buffers: XLA reuses them for the
        # outputs, halving the step's parameter-side peak — decisive at
        # config[2] scale where params+moments are ~4 GB
        return jax.jit(step, donate_argnums=(0,))

    def step(self, state, cams, targets):
        if self.n_bands > 1:
            camera, target = cams, targets  # (state, Camera, (H, W, 3))
            # VALUE key, never id(): a GC-recycled id could silently reuse
            # another camera's held topologies/rays (wrong gradients), and a
            # fresh equal-valued Camera per step would rebind every step
            key = camera.content_key() if hasattr(camera, "content_key") \
                else (np.asarray(camera.view_inverse).tobytes(),
                      np.asarray(camera.proj_inverse).tobytes(),
                      camera.width, camera.height)
            stale = (self._bind_age is None or key != self._bind_key
                     or self._bind_age >= self.tc.refresh_every)
            if stale:
                # rebind is already a host sync point: check the held
                # window's overflow (surfaced by the banded step) and force
                # a re-plan if pairs were truncated — bind() re-plans
                # eagerly on its own bind-time overflow either way
                if (getattr(self, "last_overflow", None) is not None
                        and int(self.last_overflow) > 0):
                    # force a fresh plan but MAX-MERGE it with the held
                    # capacity: accepting a smaller fresh bucket verbatim
                    # would shrink the jitted shapes (recompile) and can
                    # oscillate across refresh windows — mirror the
                    # tiled.py and BandedRenderer.bind overflow paths
                    cap0 = self._banded.capacity
                    fresh = self._banded.plan(state[0], camera)
                    if cap0 is not None:
                        self._banded.capacity = (max(cap0[0], fresh[0]),
                                                 max(cap0[1], fresh[1]))
                self._banded.bind(state[0], camera)
                self._bind_age, self._bind_key = 0, key
            self._bind_age += 1
            topos, rays_bands = self._banded._bound
            state, (loss, ovf) = self._step(state, topos, rays_bands,
                                            jnp.asarray(target))
            #: device scalar, no sync: pairs truncated by the held window
            #: (re-checked at the next rebind; callers may int() it anytime)
            self.last_overflow = ovf
            return state, loss
        return self._step(state, cams, targets)
