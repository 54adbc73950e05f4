"""Camera-pose optimization through ray gradients (app-level).

The reference's only interactive degree of freedom is the camera
(base/camera.hpp, hotkeys at base/VulkanRTBase.cpp:1702-1838); it has no
gradients at all.  Here the pose is an optimizable 6-DOF leaf: per-pixel
rays are generated IN-GRAPH from (translation, axis-angle rotation) deltas
against a base camera, `cfg.ray_gradients=True` routes the backward
kernel's ray cotangents (opt-in cost: +7.2 ms/frame backward at bench
scale, PROFILE.md section 7a) into the pose chain, and Adam descends to
the pose that explains the target image — the productized form of the
tests/test_ray_grads.py pose-recovery machinery (r4 verdict item 7).

CLI: ``python -m 3dgvrt_lightfield_tpu train --optimize-poses N
[--perturb-poses SIGMA]`` refines every dataset camera against its target
image before the parameter fine-tune starts.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RenderConfig, DEFAULT_CONFIG
from ..io.cameras import Camera
from ..ops.aabb import intersect_aabb
from ..ops.sh import sh_basis_components
from ..render.tile_math import RAY_ROWS


def rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3, 3), small-angle safe.

    Uses the sinc/versine form: R = I + A sin(t)/t + A^2 (1-cos t)/t^2 with
    A = skew(r); both coefficient series are finite at t -> 0, evaluated
    with a clamped angle so gradients at the identity stay exact.
    """
    t2 = jnp.sum(r * r)
    # double-where: the unsafe branch must see a SAFE argument, or its NaN
    # cotangent poisons the gradient even when the series branch is taken
    safe_t2 = jnp.where(t2 > 1e-12, t2, 1.0)
    t = jnp.sqrt(safe_t2)
    a = jnp.where(t2 > 1e-12, jnp.sin(t) / t, 1.0 - t2 / 6.0)
    b = jnp.where(t2 > 1e-12, (1.0 - jnp.cos(t)) / safe_t2,
                  0.5 - t2 / 24.0)
    skew = jnp.array([[0.0, -r[2], r[1]],
                      [r[2], 0.0, -r[0]],
                      [-r[1], r[0], 0.0]])
    skew2 = jnp.matmul(skew, skew, precision=jax.lax.Precision.HIGHEST)
    return jnp.eye(3) + a * skew + b * skew2


def tile_rays_pose(camera: Camera, cfg: RenderConfig, delta_t, delta_r,
                   aabb=None) -> jnp.ndarray:
    """Differentiable `binning.tile_rays`: pose deltas as traced leaves.

    Replicates raygen.rgen:116-121 ray generation (same pixel-center NDC
    sampling as Camera.rays) with view_inverse perturbed by
    (rodrigues(delta_r), delta_t); the constant per-pixel NDC targets are
    precomputed host-side so the traced graph is two small matmuls + the
    standard clip/basis columns.
    """
    ts = cfg.tile_size
    h, w = camera.height, camera.width
    assert h % ts == 0 and w % ts == 0, (h, w, ts)
    xs = (np.arange(w, dtype=np.float64) + 0.5) / w * 2.0 - 1.0
    ys = (np.arange(h, dtype=np.float64) + 0.5) / h * 2.0 - 1.0
    dx, dy = np.meshgrid(xs, ys)
    ndc = np.stack([dx, dy, np.ones_like(dx), np.ones_like(dx)], axis=-1)
    target3 = jnp.asarray((ndc @ camera.proj_inverse.T)[..., :3],
                          jnp.float32)                       # (H, W, 3)

    # explicit HIGHEST precision: TPU matmuls default to bf16 inputs, and a
    # bf16-rounded direction perturbs tmin/tmax (values up to the scene
    # AABB scale) by ~1e-1 absolute — measured in the r5 on-chip run
    rot = jnp.matmul(rodrigues(jnp.asarray(delta_r, jnp.float32)),
                     jnp.asarray(camera.view_inverse[:3, :3], jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    d = jnp.matmul(target3, rot.T, precision=jax.lax.Precision.HIGHEST)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(
        jnp.asarray(camera.view_inverse[:3, 3], jnp.float32)
        + jnp.asarray(delta_t, jnp.float32), d.shape)

    tmin, tmax = intersect_aabb(aabb or cfg.aabb, o, d)
    basis = sh_basis_components(d[..., 0], d[..., 1], d[..., 2],
                                cfg.sh_degree)
    basis += [jnp.zeros_like(d[..., 0])] * (16 - len(basis))
    rays = jnp.concatenate([o, d, tmin[..., None], tmax[..., None],
                            jnp.stack(basis, axis=-1)], axis=-1)
    tiled = rays.reshape(h // ts, ts, w // ts, ts, RAY_ROWS)
    return tiled.transpose(0, 2, 4, 1, 3).reshape(-1, RAY_ROWS, ts * ts)


def apply_pose_delta(camera: Camera, delta_t, delta_r) -> Camera:
    """Bake a recovered 6-DOF delta into a new Camera (host-side)."""
    rot = np.asarray(rodrigues(jnp.asarray(delta_r, jnp.float32)))
    vi = np.array(camera.view_inverse, np.float64)
    vi[:3, :3] = rot @ vi[:3, :3]
    vi[:3, 3] = vi[:3, 3] + np.asarray(delta_t, np.float64)
    return dataclasses.replace(camera, view_inverse=vi)


def optimize_camera_poses(model, cameras: Sequence[Camera],
                          targets: Sequence[np.ndarray],
                          cfg: RenderConfig = DEFAULT_CONFIG,
                          steps: int = 100, lr: float = 3e-3,
                          impl: str = "auto", verbose: bool = True
                          ) -> Tuple[List[Camera], List[dict]]:
    """Refine each camera's pose against its target image.

    Per camera: bind the scene topology ONCE at the base pose (pose deltas
    are small, culling is conservative), then Adam on (delta_t, delta_r)
    through the in-graph ray generation + the fused kernel's ray
    cotangents.  Returns (corrected cameras, per-camera reports
    {loss0, loss1, dt_norm, dr_norm}).
    """
    from ..render import binning
    from ..render.pallas_forward import forward_dispatch
    from ..render.tiled import _camera_mats, _resolve_impl
    impl = _resolve_impl(impl)
    cfg = cfg.replace(ray_gradients=True)
    act = model.activate()
    out_cams, reports = [], []
    opt = optax.adam(lr)

    for cam, target in zip(cameras, targets):
        w2c, proj = _camera_mats(cam)
        cap, cap_pad = binning.plan_capacity(act, w2c, proj, cam.width,
                                             cam.height, cfg)
        binned = binning.bin_gaussians(act, w2c, proj, cam.width, cam.height,
                                       cfg, cap, cap_pad)
        tgt = jnp.asarray(np.asarray(target), jnp.float32)
        ts = cfg.tile_size
        tgt_tiled = jnp.asarray(
            np.asarray(tgt).reshape(cam.height // ts, ts, cam.width // ts,
                                    ts, 3)
            .transpose(0, 2, 4, 1, 3).reshape(-1, 3, ts * ts))

        def loss_fn(params, _binned=binned, _cam=cam, _tgt=tgt_tiled):
            rays = tile_rays_pose(_cam, cfg, params["t"], params["r"])
            acc = forward_dispatch(_binned, rays, cfg, impl)
            return jnp.mean((acc[:, 0:3, :] - _tgt) ** 2)

        @jax.jit
        def step(params, opt_state):
            val, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, val

        params = {"t": jnp.zeros(3), "r": jnp.zeros(3)}
        opt_state = opt.init(params)
        loss0 = float(loss_fn(params))
        val = loss0
        for _ in range(steps):
            params, opt_state, v = step(params, opt_state)
            val = float(v)
        dt = np.asarray(params["t"])
        dr = np.asarray(params["r"])
        out_cams.append(apply_pose_delta(cam, dt, dr))
        rep = {"loss0": loss0, "loss1": val,
               "dt_norm": float(np.linalg.norm(dt)),
               "dr_norm": float(np.linalg.norm(dr))}
        reports.append(rep)
        if verbose:
            print(f"pose-opt {cam.name or len(out_cams) - 1}: "
                  f"loss {loss0:.3e} -> {val:.3e}  |dt| {rep['dt_norm']:.4f} "
                  f"|dr| {rep['dr_norm']:.4f}")
    return out_cams, reports


def perturb_cameras(cameras: Sequence[Camera], sigma_t: float,
                    sigma_r: float = None, seed: int = 0) -> List[Camera]:
    """Demo helper: jitter every pose (translation sigma_t, rotation
    sigma_r radians, default sigma_t/3) — recovery target for the CLI."""
    rng = np.random.default_rng(seed)
    sigma_r = sigma_t / 3.0 if sigma_r is None else sigma_r
    return [apply_pose_delta(c, rng.normal(0, sigma_t, 3),
                             rng.normal(0, sigma_r, 3)) for c in cameras]
