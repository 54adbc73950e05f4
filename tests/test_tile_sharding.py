"""Tile-row sharding of a single frame across the virtual device mesh.

BASELINE config[2]: big scene, one camera, tiles sharded over chips.  These
run on the 8-device CPU mesh (conftest) and validate that the sharded image
and its parameter gradients match the unsharded tiled renderer exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

import gvrt_tpu as g3
from gvrt_tpu.parallel import (make_mesh, plan_capacity_sharded,
                               render_image_tile_sharded)
from gvrt_tpu.render.binning import band_rays, unband_image, tile_rays, untile
from gvrt_tpu.render.tiled import render_image_tiled

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=64)


#: these tests NEED the multi-device CPU mesh (conftest); on the real
#: chip there is one device and shard_map over a size-1 mesh would
#: silently render band 0 only (zero grads elsewhere) — skip, the
#: 8-device virtual mesh + driver dryrun cover this logic
pytestmark = pytest.mark.skipif(
    jax.device_count() < 4,
    reason="needs a >=4-device mesh (virtual CPU devices)")


def _scene(n=160, seed=11):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.8)
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def test_band_rays_roundtrip():
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    full = tile_rays(cam, CFG)
    bands = band_rays(cam, CFG, 4)
    assert bands.shape[0] == 4
    # reassembling the band images of an identity function = untile(full)
    img_full = untile(full, 32, 32, CFG.tile_size)
    per_band = jnp.stack([untile(bands[d], 32, 32 // 4, CFG.tile_size)
                          for d in range(4)])
    img_re = unband_image(per_band, 32, 32, CFG.tile_size)
    np.testing.assert_array_equal(np.asarray(img_re), np.asarray(img_full))


def test_tile_sharded_matches_unsharded():
    model = _scene()
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    mesh = make_mesh(4)
    out_sharded = render_image_tile_sharded(model, cam, mesh, CFG,
                                            impl="scan")
    out_ref = render_image_tiled(model, cam, CFG, impl="scan")
    np.testing.assert_allclose(np.asarray(out_sharded[..., 0:3]),
                               np.asarray(out_ref["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded[..., 4]),
                               np.asarray(out_ref["transmittance"]),
                               atol=1e-5)


def test_tile_sharded_gradients_match():
    model = _scene(96, seed=3)
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    mesh = make_mesh(4)
    target = jnp.zeros((32, 32, 3)) + 0.3
    capacity = plan_capacity_sharded(model, cam, 4, CFG)

    def loss_sharded(m):
        img = render_image_tile_sharded(m, cam, mesh, CFG, impl="scan",
                                        capacity=capacity)
        return jnp.mean((img[..., 0:3] - target) ** 2)

    from gvrt_tpu.render.tiled import TiledRenderer
    ref = TiledRenderer(32, 32, CFG, impl="scan")
    ref.plan(model, [cam])

    def loss_ref(m):
        out = ref.render(m, cam)
        return jnp.mean((out["rgb"] - target) ** 2)

    gs = jax.grad(loss_sharded)(model)
    gr = jax.grad(loss_ref)(model)
    for name in ("means", "scales_log", "quats", "opacity_logit", "sh_dc"):
        a, b = np.asarray(getattr(gs, name)), np.asarray(getattr(gr, name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=name)
