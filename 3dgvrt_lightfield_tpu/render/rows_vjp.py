"""Hand-derived VJP for the parameter layer: GaussianModel -> rows64.

The round-4 profiler trace (artifacts/trace_r04, PROFILE section 3b) showed
~50 ms/frame of XLA-autodiff backward through `activate()` + `param_rows`:
dozens of (N, 1)/(N, 3)/(N, 9) fusions, each tiled (8, 128) with only a
few live lanes — the same lane-padding law that caused the 5M OOMs
(SCALE_r03.md), here as a 42x VPU-issue/bandwidth tax on every small-minor
temp.  The forward is cheap 1D column math; only autodiff's cotangent
shapes are the problem.

This module registers a custom VJP over the WHOLE chain

    rows64_from_model(model, cfg) == param_rows(model.activate(), cfg)

whose backward is hand-derived in flat (N,) column arithmetic:

  * the incoming (N+1, 64) cotangent is transposed ONCE to (64, N+1) so
    each column extraction is a contiguous 1D row (lane-dense),
  * all chain-rule math (prefolded affine frame M = diag(1/s) R^T,
    b = M mean, quaternion rotation, normalization, exp/sigmoid
    activations) runs on (N,) columns,
  * the final parameter cotangents are assembled with one small stack per
    parameter group (the only small-minor materializations left).

Validated against jax.vjp of the unfused chain in
tests/test_rows_vjp.py (CPU) and on-chip (spool verify job).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from .binning import param_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def rows64_from_model(model, cfg: RenderConfig) -> jnp.ndarray:
    """Fused (N+1, 64) parameter table straight from the raw model.

    Forward is exactly `param_rows(model.activate(), cfg)`; backward is the
    hand-derived 1D-column chain described in the module doc.  Use this in
    every differentiated render path (held-topology tiled, banded, bench);
    `param_rows` remains for callers that already hold an activation.
    """
    return param_rows(model.activate(), cfg)


def _fwd(model, cfg):
    return rows64_from_model(model, cfg), model


def _bwd(cfg, model, g):
    n = model.means.shape[0]
    # ONE transpose: columns of the cotangent become contiguous 1D rows
    gt = jnp.transpose(g[:n])                    # (64, N) lane-dense
    col = lambda j: gt[j]                        # (N,) 1D

    # --- recompute the (cheap, 1D) forward intermediates ---
    mt = jnp.transpose(model.means)              # (3, N)
    slt = jnp.transpose(model.scales_log)        # (3, N)
    qt = jnp.transpose(model.quats)              # (4, N)
    u = [jnp.exp(-slt[i]) for i in range(3)]     # inv_scales columns
    qw, qx, qy, qz = qt[0], qt[1], qt[2], qt[3]
    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    # 1/sqrt, NOT lax.rsqrt: TPU rsqrt is an approximation (~2^-14), and
    # normalize_quat's forward uses exact division — the mismatch showed as
    # ~5e-4-relative quat/means grad deviations in the on-chip suite
    qinv = 1.0 / jnp.sqrt(qn2)
    w, x, y, z = qw * qinv, qx * qinv, qy * qinv, qz * qinv
    rot = [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z),
           2.0 * (x * z + w * y),
           2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z),
           2.0 * (y * z - w * x),
           2.0 * (x * z - w * y), 2.0 * (y * z + w * x),
           1.0 - 2.0 * (x * x + y * y)]          # rot9 columns, row-major
    t = [rot[i] * mt[0] + rot[3 + i] * mt[1] + rot[6 + i] * mt[2]
         for i in range(3)]                      # t_i = (R^T mean)_i

    # --- chain rule, all (N,) columns ---
    gm = [[col(i * 3 + k) for k in range(3)] for i in range(3)]
    gb = [col(9 + i) for i in range(3)]
    # d inv_s_i = sum_k gm[i][k] R[k,i] + gb[i] t_i ;  d sl_i = -u_i d u_i
    d_sl = [-u[i] * (sum(gm[i][k] * rot[3 * k + i] for k in range(3))
                     + gb[i] * t[i]) for i in range(3)]
    # d R[k,i] = gm[i][k] u_i + gb[i] u_i m_k
    dR = [None] * 9
    for i in range(3):
        for k in range(3):
            dR[3 * k + i] = gm[i][k] * u[i] + gb[i] * u[i] * mt[k]
    # d m_k = sum_i gb[i] u_i R[k,i]
    d_m = [sum(gb[i] * u[i] * rot[3 * k + i] for i in range(3))
           for k in range(3)]

    # quaternion backward: dR -> d(normalized quat), then normalization
    dR00, dR01, dR02, dR10, dR11, dR12, dR20, dR21, dR22 = dR
    dw = 2.0 * (-dR01 * z + dR02 * y + dR10 * z - dR12 * x
                - dR20 * y + dR21 * x)
    dx = 2.0 * (dR01 * y + dR02 * z + dR10 * y - 2.0 * dR11 * x
                - dR12 * w + dR20 * z + dR21 * w - 2.0 * dR22 * x)
    dy = 2.0 * (-2.0 * dR00 * y + dR01 * x + dR02 * w + dR10 * x
                + dR12 * z - dR20 * w + dR21 * z - 2.0 * dR22 * y)
    dz = 2.0 * (-2.0 * dR00 * z - dR01 * w + dR02 * x + dR10 * w
                - 2.0 * dR11 * z + dR12 * y + dR20 * x + dR21 * y)
    # qn = q / |q|:  dq = (dqn - qn (qn . dqn)) / |q|
    dot = w * dw + x * dx + y * dy + z * dz
    d_q = [(dw - w * dot) * qinv, (dx - x * dot) * qinv,
           (dy - y * dot) * qinv, (dz - z * dot) * qinv]

    # opacity: d = sigmoid(ol); col 12 is the only density consumer
    d_sig = jax.nn.sigmoid(model.opacity_logit)
    d_ol = col(12) * d_sig * (1.0 - d_sig)

    # SH: rows64 cols 16+16c+j are channel-major [dc_c | rest[:, :, c]]
    d_shdc = jnp.stack([col(16), col(32), col(48)], axis=1)
    rest_rows = jnp.asarray([16 + 16 * c + 1 + r
                             for r in range(15) for c in range(3)],
                            jnp.int32)
    d_shrest = jnp.transpose(gt[rest_rows]).reshape(n, 15, 3)

    grad = type(model)(
        means=jnp.stack(d_m, axis=1),
        scales_log=jnp.stack(d_sl, axis=1),
        quats=jnp.stack(d_q, axis=1),
        opacity_logit=d_ol,
        sh_dc=d_shdc,
        sh_rest=d_shrest,
    )
    return (grad,)


rows64_from_model.defvjp(_fwd, _bwd)
