"""Parameter-gradient accumulation without scatter-add.

The transpose of the binning gather (`rows[pair_gauss]`) is a scatter-add of
~millions of 64-float rows into the per-Gaussian parameter table.  XLA lowers
scatter-add on TPU to a serialized loop — measured ~0.8 s/frame at 1080p,
dwarfing the render kernels.  This module replaces it with a segmented
reduction that exploits how binning built the pair list:

  * in PRE-SORT pair order, every Gaussian's pairs are contiguous
    (`offsets`/`counts` from the tile-rectangle expansion), so
  * gathering the per-pair cotangents back into pre-sort order turns the
    scatter into contiguous segment sums.

Two segment-sum backends:

  * **Pallas group-block kernel** (render/segreduce.py, the default): the
    cotangents are gathered straight into the topology's grouped reduction
    layout and summed per Gaussian with one 0/1-selection MXU matmul per
    256-row block — a DIRECT sum, no prefix, no N-row boundary gathers.
  * **XLA prefix fallback** (no ReducePlan in the topology — the >1.5M
    at-scale gate, see binning.bin_topology_from_table): MXU-blocked
    inclusive cumsum + segment differences.  Kept because the grouped
    layout's static padding is O(N) rows, which at 5M Gaussians would more
    than double the permutation gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .segreduce import (GROUP, CompactReducePlan, segment_reduce,
                        segment_reduce_compact)


def blocked_cumsum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 of (P, C) via per-block matmuls."""
    p, c = x.shape
    pad = (-p) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xb = xp.reshape(-1, block, c)                       # (B, block, C)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    # full-f32 MXU passes: prefix sums amplify input rounding with segment
    # length — bf16_3x measured 1.4e-4 abs error on 1000-long prefixes
    # (on-chip), 1-pass bf16 measured 97% mismatch (TPU_TESTS_r03.md).
    incl = jnp.einsum("ij,bjc->bic", tri, xb,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    totals = xb.sum(axis=1)                             # (B, C)
    off = jnp.cumsum(totals, axis=0) - totals
    return (incl + off[:, None, :]).reshape(-1, c)[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_gather(chunk_size: int, rows: jnp.ndarray, pair_gauss: jnp.ndarray,
                   pair_pos: jnp.ndarray,
                   offsets: jnp.ndarray, counts: jnp.ndarray,
                   red=None) -> jnp.ndarray:
    """rows (N+1, C) -> (num_chunks, G, C) per-chunk parameter blocks.

    Forward is exactly `rows[pair_gauss]` reshaped for the kernel — the
    gaussian-major layout means no transpose anywhere; backward is the
    scatter-free segmented reduction described in the module doc.
    `pair_gauss` maps padded slot -> row id (N = dummy); `pair_pos` maps
    PRE-SORT pair -> padded slot (P_pad = culled/dropped), computed once in
    bin_topology so no per-backward sort; `offsets`/`counts` give each
    Gaussian's contiguous pre-sort pair range; `red` is the optional
    grouped-layout ReducePlan (segreduce.py) selecting the Pallas backend.
    """
    return _gather_impl(chunk_size, rows, pair_gauss)


def _gather_impl(chunk_size, rows, pair_gauss):
    p_pad = pair_gauss.shape[0]
    c = rows.shape[1]
    return rows[pair_gauss].reshape(p_pad // chunk_size, chunk_size, c)


def _gather_fwd(chunk_size, rows, pair_gauss, pair_pos, offsets, counts,
                red=None):
    out = _gather_impl(chunk_size, rows, pair_gauss)
    return out, (rows.shape[0], pair_gauss, pair_pos, offsets, counts, red)


def _bwd_xla_prefix(n_rows, pair_pos, offsets, counts, bar_flat):
    """Prefix-difference fallback (the at-scale path; pre-round-4 default)."""
    p_pad = bar_flat.shape[0]
    c = bar_flat.shape[1]
    capacity = pair_pos.shape[0]
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
    return jnp.concatenate(
        [grad_rows, jnp.zeros((n_rows - grad_rows.shape[0], c),
                              grad_rows.dtype)])        # dummy row(s)


def _bwd_segreduce(n_rows, red, bar_flat):
    """Grouped-layout Pallas direct segment sum (round-4 default).

    No dead-row select: dead rows carry an out-of-range g_loc (see
    build_reduce_plan), so the kernel's 0/1 selection weights their
    (clamped, finite) gathered values by exactly zero."""
    p_pad = bar_flat.shape[0]
    bar_pre = bar_flat[jnp.minimum(red.slot, p_pad - 1)]
    n_groups = -(-n_rows // GROUP)
    interpret = jax.default_backend() != "tpu"
    out = segment_reduce(bar_pre, red, n_groups, interpret=interpret)
    return out[:n_rows]


def _bwd_segreduce_compact(n_rows, red: CompactReducePlan, bar_flat):
    """Alignment-free compact Pallas segreduce + windowed expansion gather.

    The at-scale (banded) default: the permutation gather pays exactly the
    SURVIVOR row count (no group-alignment padding — worth ~40% of the rows
    at config[2]'s ~1.2 pairs/gaussian density), and the expansion back to
    the full parameter table gathers only the plan's live-id WINDOW
    (src_range, == N without span banding; the band's narrow contiguous
    range with it) followed by one dynamic-slice write at `base`
    (segreduce.CompactReducePlan)."""
    p_pad = bar_flat.shape[0]
    c = bar_flat.shape[1]
    bar_pre = bar_flat[jnp.minimum(red.slot, p_pad - 1)]
    n_groups_c = red.out_shape.shape[0]
    cap_live = n_groups_c * GROUP
    interpret = jax.default_backend() != "tpu"
    out = segment_reduce_compact(bar_pre, red, n_groups_c,
                                 interpret=interpret)
    src = red.src_range                                     # (W,)
    sub = jnp.where((src < cap_live)[:, None],
                    out[jnp.minimum(src, cap_live - 1)], 0.0)
    full = jnp.zeros((n_rows, c), sub.dtype)
    return jax.lax.dynamic_update_slice(full, sub, (red.base[0], 0))


def _gather_bwd(chunk_size, res, bar):
    n_rows, pair_gauss, pair_pos, offsets, counts, red = res
    num_chunks, g, c = bar.shape
    bar_flat = bar.reshape(num_chunks * g, c)
    if red is None:
        grad_rows = _bwd_xla_prefix(n_rows, pair_pos, offsets, counts,
                                    bar_flat)
    elif isinstance(red, CompactReducePlan):
        grad_rows = _bwd_segreduce_compact(n_rows, red, bar_flat)
    else:
        grad_rows = _bwd_segreduce(n_rows, red, bar_flat)

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    red_zero = None if red is None else jax.tree.map(int_zero, red)
    return (grad_rows, int_zero(pair_gauss), int_zero(pair_pos),
            int_zero(offsets), int_zero(counts), red_zero)


chunked_gather.defvjp(_gather_fwd, _gather_bwd)
