"""Checkpoint/resume roundtrip for the trainer state (train/checkpoint.py)."""

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.parallel import camera_batch
from gvrt_tpu.render.tiled import TiledRenderer
from gvrt_tpu.train import (TrainConfig, Trainer, latest_step,
                            restore_checkpoint, save_checkpoint)

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)


def _setup(res=16, n=64):
    model = g3.random_gaussians(jax.random.key(0), n, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    planner = TiledRenderer(res, res, CFG, impl="scan")
    capacity = planner.plan(model, [cam])
    trainer = Trainer(res, res, CFG, TrainConfig(total_steps=10), capacity,
                      impl="scan")
    batch = camera_batch([cam], CFG)
    targets = jnp.zeros((1, res, res, 3)) + 0.3
    return model, trainer, batch, targets


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    model, trainer, batch, targets = _setup()
    ckpt = str(tmp_path / "ckpt")

    state = trainer.init(model)
    for step in range(3):
        state, _ = trainer.step(state, batch, targets)
    save_checkpoint(ckpt, state, 2)
    assert latest_step(ckpt) == 2

    # continue two more steps -> reference trajectory
    ref = state
    for _ in range(2):
        ref, _ = trainer.step(ref, batch, targets)

    # resume from disk with a FRESH template and replay the same two steps
    template = trainer.init(model)
    restored, step = restore_checkpoint(ckpt, template)
    assert step == 2
    for _ in range(2):
        restored, _ = trainer.step(restored, batch, targets)

    for name in ("means", "scales_log", "quats", "opacity_logit", "sh_dc",
                 "sh_rest"):
        np.testing.assert_array_equal(np.asarray(getattr(ref[0], name)),
                                      np.asarray(getattr(restored[0], name)),
                                      err_msg=name)


def test_restore_missing_dir_returns_none(tmp_path):
    model, trainer, _, _ = _setup()
    state = trainer.init(model)
    out, step = restore_checkpoint(str(tmp_path / "nope"), state)
    assert step is None
    assert out is state
