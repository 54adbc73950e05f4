"""Deterministic golden scenes shared by the on-chip golden renderer
(scripts spool job) and the regression test (tests/test_goldens.py).

The reference ships checked-in eval render sets
(`results/evaluations/{3DGVRT,vk3dgs,3dgrt}/`); no real `.ply` asset exists
in this environment, so committed synthetic views rendered by the COMPILED
Pallas kernel are the strongest available analog — they pin the kernel's
numeric output across refactors (r2 verdict item 6).
"""
import math

import numpy as np

SIZE = 128
N_GAUSS = 3000
VIEWS = 3


def golden_model():
    import jax
    import gvrt_tpu as g3
    model = g3.random_gaussians(jax.random.key(42), N_GAUSS, extent=0.9,
                                scale_range=(-4.5, -2.8))
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def golden_cameras():
    import gvrt_tpu as g3
    from gvrt_tpu.io.cameras import look_at_inverse
    cams = []
    center = np.asarray([0.0, 0.0, -3.0])
    for i in range(VIEWS):
        theta = 2 * math.pi * i / VIEWS
        eye = center + 2.5 * np.asarray(
            [math.cos(theta), math.sin(theta), 0.35])
        c2w = look_at_inverse(eye, center, np.asarray([0.0, 0.0, 1.0]))
        cams.append(g3.Camera.from_fovy(SIZE, SIZE, 55.0, c2w,
                                        name=f"golden_{i}"))
    return cams


def render_goldens(impl: str):
    """Render all golden views with the given kernel impl -> list of
    (name, rgb float32 (H, W, 3)) in [0, 1]."""
    import gvrt_tpu as g3
    from gvrt_tpu.render.tiled import TiledRenderer
    model = golden_model()
    cams = golden_cameras()
    r = TiledRenderer(SIZE, SIZE, g3.DEFAULT_CONFIG, impl=impl)
    r.plan(model, cams)
    out = []
    for cam in cams:
        rgb = np.asarray(r.render(model, cam)["rgb"], np.float32)
        out.append((cam.name, rgb))
    return out
