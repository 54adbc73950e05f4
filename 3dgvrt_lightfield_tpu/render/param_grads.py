"""Parameter-gradient accumulation without scatter-add.

The transpose of the binning gather (`rows[pair_gauss]`) is a scatter-add of
~millions of 64-float rows into the per-Gaussian parameter table.  XLA lowers
scatter-add on TPU to a serialized loop — measured ~0.8 s/frame at 1080p,
dwarfing the render kernels.  This module replaces it with a closed-form
segmented reduction that exploits how binning built the pair list:

  * in PRE-SORT pair order, every Gaussian's pairs are contiguous
    (`offsets`/`counts` from the tile-rectangle expansion), so
  * gathering the per-pair cotangents back into pre-sort order
    (`pair_pos`: pre-sort pair -> padded chunk slot) turns the scatter into
    contiguous segment sums, computed as differences of an inclusive prefix
    sum — two gathers and a cumsum, no scatter anywhere.

The prefix sum itself is an MXU-blocked cumsum (lower-triangular matmul per
block + tiny cross-block offset), not `lax.associative_scan`, to keep it one
pass over HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def blocked_cumsum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 of (P, C) via per-block matmuls."""
    p, c = x.shape
    pad = (-p) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xb = xp.reshape(-1, block, c)                       # (B, block, C)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    # full-f32 MXU passes (the package default): prefix sums amplify input
    # rounding with segment length — bf16_3x measured 1.4e-4 abs error on
    # 1000-long prefixes (on-chip), 1-pass bf16 measured 97% mismatch
    # (TPU_TESTS_r03.md).  Costs ~2-3 ms per backward at bench scale;
    # gradient exactness is the contract here.
    incl = jnp.einsum("ij,bjc->bic", tri, xb,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    totals = xb.sum(axis=1)                             # (B, C)
    off = jnp.cumsum(totals, axis=0) - totals
    return (incl + off[:, None, :]).reshape(-1, c)[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_gather(chunk_size: int, rows: jnp.ndarray, pair_gauss: jnp.ndarray,
                   pair_pos: jnp.ndarray,
                   offsets: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """rows (N+1, C) -> (num_chunks, G, C) per-chunk parameter blocks.

    Forward is exactly `rows[pair_gauss]` reshaped for the kernel — the
    gaussian-major layout means no transpose anywhere; backward is the
    scatter-free segmented reduction described in the module doc.
    `pair_gauss` maps padded slot -> row id (N = dummy); `pair_pos` maps
    PRE-SORT pair -> padded slot (P_pad = culled/dropped), computed once in
    bin_topology so no per-backward sort; `offsets`/`counts` give each
    Gaussian's contiguous pre-sort pair range.
    """
    return _gather_impl(chunk_size, rows, pair_gauss)


def _gather_impl(chunk_size, rows, pair_gauss):
    p_pad = pair_gauss.shape[0]
    c = rows.shape[1]
    return rows[pair_gauss].reshape(p_pad // chunk_size, chunk_size, c)


def _gather_fwd(chunk_size, rows, pair_gauss, pair_pos, offsets, counts):
    out = _gather_impl(chunk_size, rows, pair_gauss)
    return out, (rows.shape[0], pair_gauss, pair_pos, offsets, counts)


def _gather_bwd(chunk_size, res, bar):
    n_rows, pair_gauss, pair_pos, offsets, counts = res
    num_chunks, g, c = bar.shape
    p_pad = num_chunks * g
    capacity = pair_pos.shape[0]

    bar_flat = bar.reshape(p_pad, c)
    # dropped pairs carry pair_pos == P_pad: clamp + mask instead of
    # appending a zero row — the concat was a full-array copy (470 MB at
    # bench scale, measured in the r3 reduce sub-profile)
    live = (pair_pos < p_pad)[:, None]
    bar_pre = jnp.where(live, bar_flat[jnp.minimum(pair_pos, p_pad - 1)],
                        0.0)                            # (capacity, C)

    cum = blocked_cumsum(bar_pre)
    # segment sum via cum[hi-1] - cum[lo-1] with clamped indices and
    # zero-masks — again no prepended zero-row copy
    lo = jnp.clip(offsets, 0, capacity)
    hi = jnp.clip(offsets + counts, 0, capacity)
    g_hi = jnp.where((hi > 0)[:, None],
                     cum[jnp.maximum(hi - 1, 0)], 0.0)
    g_lo = jnp.where((lo > 0)[:, None],
                     cum[jnp.maximum(lo - 1, 0)], 0.0)
    grad_rows = g_hi - g_lo                             # (N, C)
    grad_rows = jnp.concatenate(
        [grad_rows, jnp.zeros((n_rows - grad_rows.shape[0], c),
                              grad_rows.dtype)])        # dummy row(s)

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (grad_rows, int_zero(pair_gauss), int_zero(pair_pos),
            int_zero(offsets), int_zero(counts))


chunked_gather.defvjp(_gather_fwd, _gather_bwd)
