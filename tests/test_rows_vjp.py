"""Hand-derived parameter-layer VJP (render/rows_vjp.py) vs plain autodiff.

rows64_from_model's backward must reproduce jax.vjp of the unfused
activate() + param_rows chain on every parameter group — including the
quaternion normalization chain and the SH reorder.

Tolerances: CPU 2e-6 (max-normalized).  On the chip the quaternion
chain's +/- term cancellation is ordering-sensitive (XLA CPU fuses FMAs,
the TPU VPU evaluates the two implementations' orders differently):
measured ~5e-4 RELATIVE on ~2% of near-cancelling elements, tiny
absolute — bounded at 1e-4 max-normalized (same class as the documented
on-chip bound in test_param_grads.test_binning_grads_match_brute_force)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.render.binning import param_rows
from gvrt_tpu.render.rows_vjp import rows64_from_model

CFG = g3.DEFAULT_CONFIG


def _model(n=700, seed=0):
    m = g3.random_gaussians(jax.random.key(seed), n, extent=0.8)
    m.means = m.means.at[:, 2].add(-3.0)
    return m


def test_rows_vjp_matches_autodiff():
    model = _model()
    g = jax.random.normal(jax.random.key(1),
                          (model.num_gaussians + 1, 64), jnp.float32)

    def plain(m):
        return jnp.sum(param_rows(m.activate(), CFG) * g)

    def fused(m):
        return jnp.sum(rows64_from_model(m, CFG) * g)

    np.testing.assert_allclose(float(plain(model)), float(fused(model)),
                               rtol=1e-6)
    gp = jax.grad(plain)(model)
    gf = jax.grad(fused)(model)
    atol = 1e-4 if os.environ.get("GVRT_TEST_TPU") else 2e-6
    for name in ("means", "scales_log", "quats", "opacity_logit", "sh_dc",
                 "sh_rest"):
        a, b = np.asarray(getattr(gf, name)), np.asarray(getattr(gp, name))
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)


def test_rows_vjp_dummy_row_cotangent_ignored():
    """The dummy row N is a constant: its cotangent must not leak into any
    parameter gradient."""
    model = _model(64, seed=2)
    base = jnp.zeros((65, 64), jnp.float32)
    g_dummy = base.at[64, :].set(1e6)

    def fused(m, g):
        return jnp.sum(rows64_from_model(m, CFG) * g)

    grads = jax.grad(fused)(model, g_dummy)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert total == 0.0
