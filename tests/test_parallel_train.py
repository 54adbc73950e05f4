"""Sharded rendering + training on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.parallel import camera_batch, make_mesh, render_batch_sharded
from gvrt_tpu.render.tiled import TiledRenderer
from gvrt_tpu.train import TrainConfig, Trainer

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)


#: these tests NEED the multi-device CPU mesh (conftest); on the real
#: chip there is one device and shard_map over a size-1 mesh would
#: silently render band 0 only (zero grads elsewhere) — skip, the
#: 8-device virtual mesh + driver dryrun cover this logic
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs a >=8-device mesh (virtual CPU devices)")
RES = 16


def _scene(n=64, seed=0):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def _cameras(b):
    cams = []
    for i in range(b):
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        cams.append(g3.Camera.from_fovy(RES, RES, 60.0, c2w))
    return cams


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_render_matches_single_device():
    model = _scene()
    cams = _cameras(8)
    mesh = make_mesh(8)
    r = TiledRenderer(RES, RES, CFG, impl="scan")
    cap, cap_pad = r.plan(model, cams)

    batch = camera_batch(cams, CFG)
    out = render_batch_sharded(model, batch, mesh, RES, RES, CFG,
                               cap, cap_pad, impl="scan")
    out = np.asarray(out)
    assert out.shape == (8, RES, RES, 8)
    for i, cam in enumerate(cams):
        single = r.render(model, cam)
        np.testing.assert_allclose(out[i, ..., 0:3],
                                   np.asarray(single["rgb"]), atol=1e-5,
                                   err_msg=f"camera {i}")


def test_trainer_reduces_loss_single_device():
    model = _scene(48, seed=3)
    cams = _cameras(2)
    r = TiledRenderer(RES, RES, CFG, impl="scan")
    capacity = r.plan(model, cams)

    # target: renders of a perturbed model (self-supervised recovery setup)
    target_model = _scene(48, seed=3)
    target_model.sh_dc = target_model.sh_dc + 0.3
    targets = jnp.stack([r.render(target_model, c)["rgb"] for c in cams])

    batch = camera_batch(cams, CFG)
    tr = Trainer(RES, RES, CFG, TrainConfig(total_steps=30), capacity,
                 mesh=None, impl="scan")
    state = tr.init(model)
    state, l0 = tr.step(state, batch, targets)
    losses = [float(l0)]
    for _ in range(25):
        state, loss = tr.step(state, batch, targets)
        losses.append(float(loss))
    assert losses[-1] < 0.7 * losses[0], losses
    assert np.isfinite(losses).all()


def test_trainer_sharded_matches_unsharded_step():
    model = _scene(48, seed=4)
    cams = _cameras(8)
    r = TiledRenderer(RES, RES, CFG, impl="scan")
    capacity = r.plan(model, cams)
    targets = jnp.stack([r.render(model, c)["rgb"] + 0.1 for c in cams])
    batch = camera_batch(cams, CFG)

    mesh = make_mesh(8)
    tr_sh = Trainer(RES, RES, CFG, TrainConfig(), capacity, mesh=mesh,
                    impl="scan")
    tr_un = Trainer(RES, RES, CFG, TrainConfig(), capacity, mesh=None,
                    impl="scan")

    st_sh, loss_sh = tr_sh.step(tr_sh.init(model), batch, targets)
    st_un, loss_un = tr_un.step(tr_un.init(model), batch, targets)

    np.testing.assert_allclose(float(loss_sh), float(loss_un), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_sh[0].means),
                               np.asarray(st_un[0].means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sh[0].sh_dc),
                               np.asarray(st_un[0].sh_dc), atol=1e-6)
