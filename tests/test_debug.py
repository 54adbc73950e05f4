"""NaN guards (utils/debug.py): checkify wrapping + host finite assertion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.utils import assert_finite, checked


def test_checked_passes_clean_function():
    f = checked(lambda x: jnp.sqrt(x) * 2.0)
    out = f(jnp.asarray([1.0, 4.0]))
    np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])


def test_checked_raises_on_nan():
    from jax.experimental import checkify
    f = checked(lambda x: jnp.log(x))          # log(-1) -> nan
    with pytest.raises(checkify.JaxRuntimeError):
        f(jnp.asarray([-1.0]))


def test_checked_render_is_clean():
    model = g3.random_gaussians(jax.random.key(0), 32, extent=0.6)
    model.means = model.means.at[:, 2].add(-3.0)
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    cfg = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=64)
    from gvrt_tpu.render.tiled import TiledRenderer
    r = TiledRenderer(16, 16, cfg, impl="scan")
    r.plan(model, [cam])
    safe = checked(lambda m: r.render(m, cam)["rgb"])
    img = safe(model)
    assert np.isfinite(np.asarray(img)).all()


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite({"a": jnp.asarray([1.0, float("nan")])}, "bad")
