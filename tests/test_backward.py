"""Hand-written Pallas backward vs scan-autodiff vs brute-force autodiff."""

import os
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.tiled import TiledRenderer, _camera_mats

# compiled Mosaic kernels on the real chip, interpreter elsewhere
IMPL_PL = "pallas" if os.environ.get("GVRT_TEST_TPU") else "interpret"

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)


def _scene(n=48, seed=7):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def _loss_fn(renderer, cam, target):
    def loss(m):
        out = renderer.render(m, cam)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 1e-2 * jnp.mean(out["depth"]))
    return loss


@pytest.mark.parametrize("res", [16, 24])
def test_pallas_backward_matches_scan_autodiff(res):
    model = _scene(64)
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    target = jnp.zeros((res, res, 3)) + 0.25

    r_scan = TiledRenderer(res, res, CFG, impl="scan")
    r_pl = TiledRenderer(res, res, CFG, impl=IMPL_PL)
    cap = r_scan.plan(model, [cam])
    r_pl.capacity = cap

    g_scan = jax.grad(_loss_fn(r_scan, cam, target))(model)
    g_pl = jax.grad(_loss_fn(r_pl, cam, target))(model)

    for field in ("means", "scales_log", "quats", "opacity_logit", "sh_dc",
                  "sh_rest"):
        a = np.asarray(getattr(g_scan, field))
        b = np.asarray(getattr(g_pl, field))
        # atol floor 1e-7: near-zero grad elements carry raw f32 reduction
        # noise between the hand-VJP and autodiff summation orders (measured
        # 7.9e-8 abs on-chip quat grads whose max is ~4e-4)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=max(2e-5 * scale, 1e-7),
                                   rtol=2e-4,
                                   err_msg=field)
        assert np.abs(a).max() > 0, f"degenerate test: zero grads for {field}"


def test_pallas_backward_matches_brute_force_autodiff():
    """End-to-end: tiled custom-VJP grads vs brute-force renderer autodiff.

    Orderings differ (center-depth vs exact hit depth), so compare loosely
    but require strong correlation.
    """
    model = _scene(32, seed=9)
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    target = jnp.zeros((res, res, 3)) + 0.25

    r_pl = TiledRenderer(res, res, CFG, impl=IMPL_PL)
    r_pl.plan(model, [cam])
    g_tiled = jax.grad(_loss_fn(r_pl, cam, target))(model)

    from gvrt_tpu.render.reference import render_image

    def brute_loss(m):
        out = render_image(m, cam, CFG)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 1e-2 * jnp.mean(out["depth"]))

    g_brute = jax.grad(brute_loss)(model)

    for field in ("means", "sh_dc", "opacity_logit"):
        a = np.asarray(getattr(g_brute, field)).ravel()
        b = np.asarray(getattr(g_tiled, field)).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, f"{field} grad correlation {corr:.4f}"


@pytest.mark.parametrize("saturated", [True, False])
def test_backward_with_deep_ray_stacks(saturated):
    """Deep per-ray Gaussian stacks: finite grads, zero tails, scan parity.

    The saturated variant (opacity high enough that rays hit the
    transmittance floor) exercises early termination but amplifies float
    summation-order differences near the floor, so its tolerance is loose
    (2e-2 rtol).  The non-saturated variant of the SAME geometry must match
    scan autodiff at tight tolerance — the regression guard the saturated
    tolerance alone would miss.
    """
    n = 192
    model = g3.GaussianModel(
        means=jnp.concatenate(
            [0.1 * jax.random.normal(jax.random.key(1), (n, 2)),
             -2.0 - 0.01 * jnp.arange(n, dtype=jnp.float32)[:, None]], axis=1),
        scales_log=jnp.full((n, 3), -0.7),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        opacity_logit=jnp.full((n,), 6.0 if saturated else -4.2),
        sh_dc=jnp.tile(jnp.asarray([[0.5, 0.2, 0.1]]), (n, 1)),
        sh_rest=jnp.zeros((n, 15, 3)),
    )
    res = 8
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    r_pl = TiledRenderer(res, res, CFG, impl=IMPL_PL)
    r_scan = TiledRenderer(res, res, CFG, impl="scan")
    cap = r_scan.plan(model, [cam])
    r_pl.capacity = cap

    out = r_pl.render(model, cam)
    t_min = np.asarray(out["transmittance"]).min()
    if saturated:
        assert t_min < 1e-3       # rays actually early-terminate
    else:
        assert t_min > 1e-2       # nobody near the floor: tight compare

    def loss(renderer):
        return lambda m: jnp.mean(renderer.render(m, cam)["rgb"])

    g_pl = jax.grad(loss(r_pl))(model)
    g_scan = jax.grad(loss(r_scan))(model)
    rtol, atol_scale = (2e-2, 2e-4) if saturated else (5e-4, 5e-5)
    for field in ("means", "opacity_logit", "sh_dc"):
        a = np.asarray(getattr(g_scan, field))
        b = np.asarray(getattr(g_pl, field))
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=atol_scale * scale, rtol=rtol,
                                   err_msg=field)
    if saturated:
        # gaussians far behind the opaque wall get (near-)zero gradients
        gm = np.abs(np.asarray(g_pl.means)).sum(1)
        assert gm[-20:].max() <= 1e-6 + 1e-3 * gm.max()


#: implementation-variant configs the hand VJP must stay exact under:
#: the default cumprod transmittance and the log-space reference
#: formulation (with both of its prefix implementations)
_VARIANTS = [
    {},
    {"transmittance_prod": False},
    {"transmittance_prod": False, "prefix_matmul": True},
]


@pytest.mark.parametrize("variant", _VARIANTS)
def test_chunk_core_bwd_matches_jax_vjp(variant):
    """The hand-derived per-chunk VJP must equal jax.vjp of chunk_core."""
    from gvrt_tpu.render.tile_math import (RAY_ROWS, chunk_core,
                                           chunk_core_bwd)
    from gvrt_tpu.render import binning
    from gvrt_tpu.render.tiled import _camera_mats
    cfg = g3.DEFAULT_CONFIG.replace(**variant)
    # real binned chunks + rays (exercises padding rows and accept branches)
    model = _scene(200, seed=11)
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    w2c, proj = _camera_mats(cam)
    cap = binning.plan_capacity(model.activate(), w2c, proj, 16, 16, cfg)
    b = binning.bin_gaussians(model.activate(), w2c, proj, 16, 16, cfg, *cap)
    rays = binning.tile_rays(cam, cfg)
    key = jax.random.key(3)
    for ci in range(min(3, b.chunks.shape[0])):
        chunk = b.chunks[ci]
        tile = int(b.chunk_tile[ci])
        if tile >= rays.shape[0]:
            continue
        r = rays.shape[2]
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        t_in = jax.random.uniform(k1, (1, r), minval=0.05, maxval=1.0)
        bar_tout = jax.random.normal(k2, (1, r))
        bar_rgb = jax.random.normal(k3, (3, r))
        bar_dep = jax.random.normal(k4, (1, r))

        def f(ch, ti):
            return chunk_core(rays[tile], ch, ti, cfg)

        _, vjp = jax.vjp(f, chunk, t_in)
        bc_ref, bt_ref = vjp((bar_tout, bar_rgb, bar_dep,
                              jnp.zeros((1, r))))
        bc, bt = chunk_core_bwd(rays[tile], chunk, t_in, bar_tout, bar_rgb,
                                bar_dep, cfg)
        scale = float(jnp.abs(bc_ref).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(bc) / scale,
                                   np.asarray(bc_ref) / scale, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bt), np.asarray(bt_ref),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("degree", [0, 1, 3, 5, 8])
def test_chunk_core_bwd_degrees(degree):
    """Hand VJP vs autodiff for every kernel-degree branch
    (gaussianfunctions.glsl:18-57 <-> ops/kernels.py:27-108).

    Degrees 0/1 divide by sqrt(gray_dist) in their grad: padding rows have
    gray_dist == 0 exactly, where AUTODIFF produces 0 * inf = NaN while the
    hand branch clamps.  So: (a) compare hand vs autodiff on live rows only,
    (b) require the hand cotangents FINITE everywhere — including the
    singular padded rows the clamp exists for.
    """
    from gvrt_tpu.render.tile_math import chunk_core, chunk_core_bwd
    from gvrt_tpu.render import binning
    from gvrt_tpu.render.tiled import _camera_mats
    from gvrt_tpu.render.tile_math import CH_DENSITY
    cfg = g3.DEFAULT_CONFIG.replace(kernel_degree=degree)
    model = _scene(200, seed=11)
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    w2c, proj = _camera_mats(cam)
    cap = binning.plan_capacity(model.activate(), w2c, proj, 16, 16, cfg)
    b = binning.bin_gaussians(model.activate(), w2c, proj, 16, 16, cfg, *cap)
    rays = binning.tile_rays(cam, cfg)
    key = jax.random.key(degree)
    checked = 0
    for ci in range(min(3, b.chunks.shape[0])):
        chunk = b.chunks[ci]
        tile = int(b.chunk_tile[ci])
        if tile >= rays.shape[0]:
            continue
        r = rays.shape[2]
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        t_in = jax.random.uniform(k1, (1, r), minval=0.05, maxval=1.0)
        bar_tout = jax.random.normal(k2, (1, r))
        bar_rgb = jax.random.normal(k3, (3, r))
        bar_dep = jax.random.normal(k4, (1, r))

        def f(ch, ti):
            return chunk_core(rays[tile], ch, ti, cfg)

        _, vjp = jax.vjp(f, chunk, t_in)
        bc_ref, bt_ref = vjp((bar_tout, bar_rgb, bar_dep, jnp.zeros((1, r))))
        bc, bt = chunk_core_bwd(rays[tile], chunk, t_in, bar_tout, bar_rgb,
                                bar_dep, cfg)
        assert np.isfinite(np.asarray(bc)).all(), "hand VJP not finite"
        assert np.isfinite(np.asarray(bt)).all()
        live = np.asarray(chunk[:, CH_DENSITY]) > 0
        a = np.asarray(bc_ref)[live]
        h = np.asarray(bc)[live]
        finite = np.isfinite(a)
        assert finite.all(), "autodiff NaN on a LIVE row (not just padding)"
        scale = float(np.abs(a).max()) + 1e-8
        np.testing.assert_allclose(h / scale, a / scale, atol=2e-5)
        checked += 1
    assert checked >= 1


@pytest.mark.parametrize("degree", [1, 3, 5, 8])
def test_render_grads_all_degrees(degree):
    """Non-default kernel degrees through the FULL (compiled on-chip)
    render path: pallas forward == scan forward, gradients finite and
    matching scan autodiff."""
    cfg = CFG.replace(kernel_degree=degree)
    model = _scene(48)
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    target = jnp.zeros((res, res, 3)) + 0.25
    r_scan = TiledRenderer(res, res, cfg, impl="scan")
    r_pl = TiledRenderer(res, res, cfg, impl=IMPL_PL)
    cap = r_scan.plan(model, [cam])
    r_pl.capacity = cap
    out_s = r_scan.render(model, cam)
    out_p = r_pl.render(model, cam)
    np.testing.assert_allclose(np.asarray(out_p["rgb"]),
                               np.asarray(out_s["rgb"]), atol=2e-5)
    g_scan = jax.grad(_loss_fn(r_scan, cam, target))(model)
    g_pl = jax.grad(_loss_fn(r_pl, cam, target))(model)
    for field in ("means", "scales_log", "opacity_logit", "sh_dc"):
        a = np.asarray(getattr(g_scan, field))
        b = np.asarray(getattr(g_pl, field))
        assert np.isfinite(b).all(), (degree, field)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=max(2e-5 * scale, 1e-7),
                                   rtol=2e-4, err_msg=f"deg{degree}:{field}")


def test_variant_flags_preserve_forward():
    """transmittance_prod (default) vs the log-space reference formulation:
    pure implementation choices — same images, same gradients (to f32
    assoc / transcendental approximation)."""
    model = _scene(64)
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    target = jnp.zeros((res, res, 3)) + 0.25
    base = TiledRenderer(res, res, CFG, impl=IMPL_PL)
    cap = base.plan(model, [cam])
    out0 = base.render(model, cam)
    g0 = jax.grad(_loss_fn(base, cam, target))(model)
    cfg_v = CFG.replace(transmittance_prod=not CFG.transmittance_prod)
    rv = TiledRenderer(res, res, cfg_v, impl=IMPL_PL)
    rv.capacity = cap
    rv.capacity_reduce = base.capacity_reduce
    out1 = rv.render(model, cam)
    # on-chip the log-space path goes through the TPU's APPROXIMATED
    # exp/log1p while cumprod is exact multiplies: measured 7.7e-5 abs
    # drift between the formulations (spool 012) — numerics, not math
    atol = 2e-4 if os.environ.get("GVRT_TEST_TPU") else 1e-5
    np.testing.assert_allclose(np.asarray(out1["rgb"]),
                               np.asarray(out0["rgb"]), atol=atol)
    np.testing.assert_allclose(np.asarray(out1["transmittance"]),
                               np.asarray(out0["transmittance"]), atol=atol)
    g1 = jax.grad(_loss_fn(rv, cam, target))(model)
    for field in ("means", "scales_log", "quats", "opacity_logit", "sh_dc"):
        a = np.asarray(getattr(g0, field))
        b = np.asarray(getattr(g1, field))
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=max(3e-5 * scale, 1e-7),
                                   rtol=3e-4, err_msg=field)
