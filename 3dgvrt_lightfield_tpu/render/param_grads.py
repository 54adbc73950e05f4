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
    # bf16_3x, not the package-wide f32: the 0/1 triangular operand is exact
    # in bf16 and 3-pass splitting of the data operand is f32-quality for
    # gradient accumulation, at half the MXU passes (this einsum is
    # O(pairs x block x cols) — ~60 GFLOP per backward at bench scale).
    # 1-pass bf16 here was a measured on-chip test failure (TPU_TESTS_r03.md).
    incl = jnp.einsum("ij,bjc->bic", tri, xb,
                      precision=jax.lax.Precision.HIGH,
                      preferred_element_type=jnp.float32)
    totals = xb.sum(axis=1)                             # (B, C)
    off = jnp.cumsum(totals, axis=0) - totals
    return (incl + off[:, None, :]).reshape(-1, c)[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_gather(chunk_size: int, rows: jnp.ndarray, pair_gauss: jnp.ndarray,
                   pair_sorted: jnp.ndarray, pair_dest: jnp.ndarray,
                   offsets: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """rows (N+1, C) -> (num_chunks, G, C) per-chunk parameter blocks.

    Forward is exactly `rows[pair_gauss]` reshaped for the kernel — the
    gaussian-major layout means no transpose anywhere; backward is the
    scatter-free segmented reduction described in the module doc.
    `pair_gauss` maps padded slot -> row id (N = dummy); `pair_sorted` /
    `pair_dest` give, per SORTED pair, its pre-sort pair id and padded slot
    (P_pad = dropped) — the backward inverts that permutation lazily (one
    sort), so forward-only renders never pay for it; `offsets`/`counts` give
    each Gaussian's contiguous pre-sort pair range.
    """
    return _gather_impl(chunk_size, rows, pair_gauss)


def _gather_impl(chunk_size, rows, pair_gauss):
    p_pad = pair_gauss.shape[0]
    c = rows.shape[1]
    return rows[pair_gauss].reshape(p_pad // chunk_size, chunk_size, c)


def _gather_fwd(chunk_size, rows, pair_gauss, pair_sorted, pair_dest,
                offsets, counts):
    out = _gather_impl(chunk_size, rows, pair_gauss)
    return out, (rows.shape[0], pair_gauss, pair_sorted, pair_dest, offsets,
                 counts)


def _gather_bwd(chunk_size, res, bar):
    n_rows, pair_gauss, pair_sorted, pair_dest, offsets, counts = res
    num_chunks, g, c = bar.shape
    capacity = pair_sorted.shape[0]
    # invert the sort permutation lazily: pre-sort pair p -> padded slot
    _, pair_pos = jax.lax.sort_key_val(pair_sorted, pair_dest)

    bar_flat = bar.reshape(num_chunks * g, c)
    # one trailing zero row: dropped pairs carry pair_pos == P_pad
    bar_flat = jnp.concatenate([bar_flat, jnp.zeros((1, c), bar.dtype)])
    bar_pre = bar_flat[pair_pos]                        # (capacity, C)

    cum = blocked_cumsum(bar_pre)
    cum0 = jnp.concatenate([jnp.zeros((1, c), cum.dtype), cum])
    lo = jnp.clip(offsets, 0, capacity)
    hi = jnp.clip(offsets + counts, 0, capacity)
    grad_rows = cum0[hi] - cum0[lo]                     # (N, C)
    grad_rows = jnp.concatenate(
        [grad_rows, jnp.zeros((n_rows - grad_rows.shape[0], c),
                              grad_rows.dtype)])        # dummy row(s)

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (grad_rows, int_zero(pair_gauss), int_zero(pair_sorted),
            int_zero(pair_dest), int_zero(offsets), int_zero(counts))


chunked_gather.defvjp(_gather_fwd, _gather_bwd)
