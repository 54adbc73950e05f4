"""Pair-balanced variable bands: image + gradient equality vs unbanded.

Balanced span banding (render/banded.py `balance=True`) cuts the tile rows
at the survivor-pair quantiles (binning.plan_row_split) so each band holds
~equal pairs — unequal row counts, per-band static capacities, unrolled
band loop.  Band binning is still full binning restricted to the band's
rows, so outputs must match the unbanded pipeline to float-summation
order, exactly like the uniform banded paths (test_banded.py).
"""
import os
import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.render.banded import (BandedRenderer, _render_banded_bound,
                                    plan_capacity_balanced)
from gvrt_tpu.render.tiled import TiledRenderer, render_image_tiled

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=32)


def _scene(n=150, seed=3):
    """Row-imbalanced scene: most gaussians in the image's upper rows so
    the pair-quantile split is visibly unequal."""
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.8,
                                scale_range=(-4.0, -2.5))
    model.means = model.means.at[:, 2].add(-3.0)
    # push 80% of the gaussians up (image rows are top-heavy)
    sel = (jnp.arange(n) % 5) != 0
    model.means = model.means.at[:, 1].add(jnp.where(sel, 0.45, 0.0))
    return model


def test_row_split_balances_pairs():
    model = _scene()
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    specs, caps = plan_capacity_balanced(model, cam, 2, CFG)
    (o0, c0), (o1, c1) = specs
    assert o0 == 0 and o1 == c0 and c0 + c1 == 32 // CFG.tile_size
    assert c0 >= 1 and c1 >= 1
    # the top-heavy scene must produce an unequal split (the balanced
    # planner's whole point); uniform halves would be (2, 2)
    assert (c0, c1) != (2, 2), specs
    assert len(caps) == 2 and all(len(c) == 5 for c in caps)


def test_balanced_matches_unbanded_image():
    model = _scene()
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    full = render_image_tiled(model, cam, CFG, impl="scan")
    for n_bands in (2, 3):
        r = BandedRenderer(32, 32, n_bands, CFG, impl="scan",
                           span=True, balance=True)
        r.bind(model, cam)
        out = r.render_bound(model)
        assert int(out["overflow"]) == 0
        np.testing.assert_allclose(np.asarray(out["rgb"]),
                                   np.asarray(full["rgb"]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["hit_count"]),
                                      np.asarray(full["hit_count"]))


def test_balanced_grads_match_unbanded():
    model = _scene(100, seed=4)
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    target = jnp.zeros((32, 32, 3)) + 0.3

    r = BandedRenderer(32, 32, 2, CFG, impl="scan", remat="gather",
                       span=True, balance=True)
    r.bind(model, cam)
    topos, rays_bands = r._bound

    def loss_balanced(m):
        img, _ = _render_banded_bound(m, topos, rays_bands, 32, 32, CFG,
                                      "scan", remat="gather", mode="contig")
        return jnp.mean((img[..., 0:3] - target) ** 2)

    rt = TiledRenderer(32, 32, CFG, impl="scan")
    rt.plan(model, [cam])

    def loss_full(m):
        out = rt.render(m, cam)
        return jnp.mean((out["rgb"] - target) ** 2)

    gb = jax.grad(loss_balanced)(model)
    gf = jax.grad(loss_full)(model)
    assert float(jnp.linalg.norm(gb.means)) > 0
    for name in ("means", "scales_log", "quats", "opacity_logit", "sh_dc",
                 "sh_rest"):
        a, b = np.asarray(getattr(gb, name)), np.asarray(getattr(gf, name))
        scale = np.abs(b).max() + 1e-10
        atol = 5e-4 if os.environ.get("GVRT_TEST_TPU") else 2e-4
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)


def test_trainer_balanced_step():
    from gvrt_tpu.train import TrainConfig, Trainer
    model = _scene(80, seed=5)
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    target = jnp.zeros((32, 32, 3)) + 0.3
    tc = TrainConfig(total_steps=4, refresh_every=2, span_bands=True,
                     balance_bands=True)
    tr = Trainer(32, 32, CFG, tc, capacity=(0, 0), n_bands=2, impl="scan")
    state = tr.init(model)
    losses = []
    for _ in range(3):     # crosses one refresh boundary (refresh_every=2)
        state, loss = tr.step(state, cam, target)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] <= losses[0]
