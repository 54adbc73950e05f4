"""Pallas segmented reduction for per-Gaussian parameter gradients.

Replaces the XLA blocked-cumsum + prefix-difference half of the gather VJP
(param_grads._gather_bwd): the (capacity, 64) per-pair cotangents, permuted
to pre-sort order, reduce to (N+1, 64) per-Gaussian rows in ONE kernel pass
instead of an MXU prefix matmul (measured 14.9 ms at bench scale) plus two
N-row boundary gathers (14.2 ms) — the round-2 verdict's top perf item.

Design (measured on v5e, scripts spool jobs 021-025):
  * the permutation gather itself has a hard ~11.6 ns/row floor in XLA
    (source-size- and width-independent; take() hints don't move it), so the
    win must come from the reduction side;
  * reduction layout: pre-sort pairs of each GROUP of 256 consecutive
    Gaussians are padded to whole 256-row blocks, so each input block maps
    to exactly one (256, 64) output group block — the output stays
    VMEM-resident across its blocks (the fused-kernel accumulator pattern);
  * per block, the segment sum is one 0/1-selection matmul
    S[i, j] = (i == g_loc[j]) on the MXU at HIGHEST precision (bf16-split
    variants miscompile in Mosaic and round the cotangents; measured
    10.5 ms/backward at bench scale for the whole kernel);
  * numerically this is a DIRECT sum per Gaussian — strictly better than
    the prefix-difference it replaces, whose long-prefix cancellation was
    the round-3 precision hazard (param_grads.blocked_cumsum note).

The group layout (ReducePlan) is pure topology: built once per
`bin_topology` refresh (amortized over the K-step reuse window), never per
backward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Gaussians per output group == rows per input block (one MXU matmul).
#: Rejected alternative: GROUP = 128 would halve the partially-filled-group
#: padding rows of the FULL-space plan at identical MXU selection flops,
#: but the compact plan (the at-scale path since round 4) has no alignment
#: padding at all, and halving GROUP doubles the grid steps and the
#: scalar-prefetch map rows — 256 is kept.  Must be a power of two <= 256
#: (the packed scatter keeps the local index in 8 bits).
GROUP = 256
GROUP_SHIFT = GROUP.bit_length() - 1
#: reduction row count is padded to GROUP * 8 so the (8, GROUP) g_loc
#: blocks tile evenly (Mosaic block shapes need sublanes % 8 == 0).
_ROW_QUANT = GROUP * 8

#: dead-row sentinel in ReducePlan.slot (> any real padded slot; real
#: capacities are asserted < 2^24 by the packed scatter in binning)
DEAD_SLOT = 0x00FFFFFF


class ReducePlan(NamedTuple):
    """Static-shape reduction layout carried in BinTopology.

    Rows are pre-sort pairs placed so each group of 256 consecutive
    Gaussians owns a whole number of 256-row blocks (>= 1, so every output
    block is written).  Dead rows (padding, culled pairs, dropped pairs)
    carry slot == DEAD_SLOT and contribute exact zeros.
    """
    slot: jnp.ndarray     # (cap_r,) int32: padded chunk slot per row
    gloc: jnp.ndarray     # (cap_r // 256, 256) int32: Gaussian id - 256*group
    out_idx: jnp.ndarray  # (cap_r // 256,) int32: output group per block
    first: jnp.ndarray    # (cap_r // 256,) int32: 1 = first block of group


class CompactReducePlan(NamedTuple):
    """ALIGNMENT-FREE grouped reduction over live-gaussian compact ids.

    The full-space ReducePlan pads >= 1 block per group of GROUP
    consecutive gaussian IDS — O(N) rows regardless of how many gaussians a
    band touches (the r3 >1.5M gate), and even a compacted group-aligned
    layout wastes ~40% of its rows at config[2] pair densities
    (~1.2 live pairs/gaussian: a 256-gaussian group holds ~307 pairs and
    must round to 512).  This plan removes ALIGNMENT PADDING ENTIRELY:

      * live gaussians are renumbered 0..n_live-1 (order-preserving), and
        live pairs are laid out DENSELY in rank order — rows == survivors,
        nothing else;
      * because every compact id owns >= 1 pair, a GROUP-row input block
        spans at most GROUP+1 consecutive compact ids, i.e. it touches at
        most TWO output group blocks (k0 = first cid >> shift, and k0+1) —
        and k0 is nondecreasing by steps of <= 1 across blocks, so both
        output streams revisit consecutively (VMEM-resident accumulators);
      * the kernel runs TWO 0/1-selection matmuls per block into dual
        accumulators `out_a[k0]` (rows of group k0) and `out_b[k0]` (rows
        of group k0+1); the final per-gaussian table is
        out_a + shift_one_block(out_b) — one contiguous pass;
      * one windowed expansion gather (`src_range`, width cap_range <= N)
        plus a dynamic-slice write at `base` lifts the compact sums back to
        the full parameter table (the prefix fallback paid two boundary
        gathers plus a capacity-length blocked cumsum; span banding shrinks
        the window to the band's contiguous live-id range).
    """
    slot: jnp.ndarray     # (cap_r,) int32: padded chunk slot per live rank
    cloc: jnp.ndarray     # (cap_r // G, G) int32: compact id of each row
                          #    MINUS G * k0 of its block (in [0, 2G); pad
                          #    rows carry an out-of-range sentinel)
    k0: jnp.ndarray       # (cap_r // G,) int32: first output group of block
    first: jnp.ndarray    # (cap_r // G,) int32: 1 = k0 changed (zero both
                          #    accumulators)
    src_range: jnp.ndarray  # (cap_range,) int32: gaussian id (base+r) ->
                            #    compact id (cap_live = dead/outside -> zero
                            #    row).  cap_range == N when no id window is
                            #    planned; with a y-sorted model + contiguous
                            #    bands (span banding) it is the band's narrow
                            #    live-id window and the expansion back to the
                            #    (N+1, 64) table becomes cap_range gathered
                            #    rows + ONE dynamic-slice write instead of N
                            #    rows + full-table masks
    base: jnp.ndarray       # (1,) int32: first gaussian id of the window
    out_shape: jnp.ndarray  # (cap_live // G,) int32 marker; its STATIC
                            #    shape carries cap_live


def plan_rows(capacity: int, n_rows: int) -> int:
    """Static reduction row count for `capacity` pre-sort pairs and
    `n_rows` = N+1 parameter-table rows (worst-case group padding)."""
    n_groups = -(-n_rows // GROUP)
    raw = capacity + GROUP * n_groups
    return -(-raw // _ROW_QUANT) * _ROW_QUANT


def _kernel(oi_ref, fi_ref, gl_ref, bar_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(fi_ref[b] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gl = gl_ref[b % 8, :]                                  # (GROUP,) int32
    i = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
    s = (i == gl[None, :]).astype(jnp.float32)
    out_ref[...] += jnp.dot(s, bar_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("n_groups", "interpret"))
def segment_reduce(bar_pre: jnp.ndarray, red: ReducePlan, n_groups: int,
                   interpret: bool = False) -> jnp.ndarray:
    """(cap_r, C) pre-sort cotangent rows -> (n_groups * GROUP, C) sums.

    Output row g is the exact f32 sum of the rows of Gaussian g (group
    k = g // GROUP occupying output rows [256k, 256k+256)).  Dead rows need
    no masking: their g_loc is the out-of-range sentinel GROUP (see
    build_reduce_plan), so the 0/1 selection weights them by exactly zero
    — as long as their values are FINITE (the clamped gather guarantees a
    real cotangent row, never uninitialized memory).

    DEFINEDNESS CONTRACT: the output is fully defined only when the plan's
    rows all fit (red_overflow == 0 from build_reduce_plan).  When a
    caller-tightened cap_r overflowed, groups whose blocks fall entirely
    past the grid are never written and their output rows are UNINITIALIZED
    device memory — not merely truncated sums.  Every consumer must honor
    the eager overflow>0 re-plan contract (binning folds red_overflow into
    topology overflow; TiledRenderer/BandedRenderer/bench re-plan before
    using gradients).  A jitted caller that ignores overflow consumes
    garbage silently — check it.
    """
    cap_r, c = bar_pre.shape
    nb = cap_r // GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, GROUP), lambda b, oi, fi: (b // 8, 0)),
            pl.BlockSpec((GROUP, c), lambda b, oi, fi: (b, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP, c), lambda b, oi, fi: (oi[b], 0)),
    )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * GROUP, c), jnp.float32),
        interpret=interpret,
    )(red.out_idx, red.first, red.gloc, bar_pre)


def build_reduce_plan(pair_g: jnp.ndarray, pair_pos: jnp.ndarray,
                      offsets: jnp.ndarray, counts: jnp.ndarray,
                      n: int, capacity: int,
                      capacity_padded: int, cap_r: int = 0):
    """Group-block reduction layout from the pre-sort pair structure.

    All inputs are the arrays bin_topology already has in hand:
    `pair_g` (capacity,) pre-sort pair -> Gaussian id (cummax fill),
    `pair_pos` (capacity,) pre-sort pair -> padded slot (cap_pad = dead),
    `offsets`/`counts` (N,) each Gaussian's contiguous pre-sort range.
    Cost is one narrow int32 capacity-row scatter + a capacity-length
    int cumsum + O(N) column math — topology-time only (amortized over the
    K-step topology reuse window).

    The layout is LIVE-COMPACTED: pairs killed by the fine cull (and
    capacity-dropped pairs) are excluded from the row count, not just
    zero-masked — each gathered row costs a hard ~11.6 ns on v5e
    regardless of content (E4 spool measurement), and typically only
    ~2/3 of the pre-cull capacity survives.
    """
    assert capacity_padded < DEAD_SLOT, capacity_padded
    n_rows = n + 1
    n_groups = -(-n_rows // GROUP)
    # cap_r == 0: conservative static sizing (every pre-cull pair live).
    # A caller whose plan measured the live count passes a tighter cap_r
    # (TiledRenderer.plan / bench); rows that do not fit are counted in the
    # returned overflow so the standard re-plan contract applies.
    if cap_r <= 0:
        cap_r = plan_rows(capacity, n_rows)
    nb = cap_r // GROUP
    pad_n = n_groups * GROUP - n

    # live-pair rank in pre-sort order (fine-culled/dropped pairs excluded)
    live = pair_pos < capacity_padded                       # (capacity,)
    lrank = jnp.cumsum(live.astype(jnp.int32)) - 1          # rank of live p

    # per-group LIVE totals via the rank cumsum at group boundaries
    offs_p = jnp.concatenate(
        [offsets, jnp.full((pad_n,), offsets[-1] + counts[-1],
                           offsets.dtype)]).reshape(n_groups, GROUP)
    gp_start = offs_p[:, 0]                                 # first pair of k
    live_cum0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), lrank + 1])            # live before p
    g_live_start = live_cum0[jnp.minimum(gp_start, capacity)]
    g_live_end = jnp.concatenate(
        [g_live_start[1:], live_cum0[-1:]])
    gt = g_live_end - g_live_start                          # (n_groups,)

    # blocks per group (>= 1 so every output group block is initialized)
    bk = jnp.maximum((gt + GROUP - 1) // GROUP, 1)
    bstart = jnp.cumsum(bk) - bk                            # blocks, excl.

    # live pre-sort pair p of group k lands at reduction row
    #   GROUP * bstart[k] + (lrank[p] - g_live_start[k]) = delta[k] + lrank
    delta = GROUP * bstart - g_live_start
    dest = delta[pair_g >> GROUP_SHIFT] + lrank
    dest = jnp.where(live, dest, cap_r)                     # dead -> drop

    # ONE packed int32 scatter carries both the slot and the local Gaussian
    # index (slot < 2^24 asserted above; wide data always moves by gather)
    packed = ((pair_g & (GROUP - 1)) << 24) | jnp.minimum(pair_pos, DEAD_SLOT)
    table = jnp.full((cap_r,), DEAD_SLOT, jnp.int32)
    table = table.at[dest].set(packed, mode="drop")
    slot = table & DEAD_SLOT
    gloc = (table >> 24) & 0xFF
    # dead rows get an out-of-range local index: the kernel's
    # (iota == gloc) selection then contributes exactly zero for them, so
    # the backward can gather WITHOUT a dead-row select pass (the XLA
    # where() was a measured 2.8 ms/frame full-array pass at bench scale;
    # the clamped gather row is a real finite cotangent, so 0-weight in
    # the matmul is exact)
    gloc = jnp.where(slot >= capacity_padded, GROUP, gloc).reshape(nb, GROUP)

    arr = jnp.zeros((nb,), jnp.int32)
    arr = arr.at[bstart].max(jnp.arange(n_groups, dtype=jnp.int32),
                             mode="drop")
    out_idx = jax.lax.cummax(arr)
    first = jnp.zeros((nb,), jnp.int32).at[bstart].set(1, mode="drop")
    # live rows that did not fit a caller-tightened cap_r (re-plan signal)
    red_overflow = jnp.sum((live & (dest >= cap_r)).astype(jnp.int32))
    return ReducePlan(slot=slot, gloc=gloc, out_idx=out_idx,
                      first=first), red_overflow


def plan_rows_compact(survivors: int) -> int:
    """Static reduction rows for `survivors` live pairs: DENSE rank layout
    (alignment-free), quantized for the (8, GROUP) cloc blocks.  One extra
    GROUP is budgeted because build_reduce_plan_compact RESERVES the last
    block as all-pad — it claims the spill output group so its `first` flag
    zero-initializes the accumulators there (see the k0 note in the
    builder)."""
    return -(-(max(survivors, 1) + GROUP) // _ROW_QUANT) * _ROW_QUANT


def _kernel_compact(k0_ref, fi_ref, cl_ref, bar_ref, outa_ref, outb_ref):
    b = pl.program_id(0)

    @pl.when(fi_ref[b] == 1)
    def _():
        outa_ref[...] = jnp.zeros_like(outa_ref)
        outb_ref[...] = jnp.zeros_like(outb_ref)

    cl = cl_ref[b % 8, :]                                  # (GROUP,) int32
    i = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
    sa = (i == cl[None, :]).astype(jnp.float32)
    sb = (i == (cl[None, :] - GROUP)).astype(jnp.float32)
    outa_ref[...] += jnp.dot(sa, bar_ref[...],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    outb_ref[...] += jnp.dot(sb, bar_ref[...],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("n_groups", "interpret"))
def segment_reduce_compact(bar_pre: jnp.ndarray, red: "CompactReducePlan",
                           n_groups: int, interpret: bool = False):
    """(cap_r, C) dense live-rank rows -> (n_groups * GROUP, C) compact sums.

    Dual-accumulator kernel (see CompactReducePlan): rows defined for every
    compact id with >= 1 live pair; trailing rows beyond the last live
    gaussian are undefined and must be masked by the caller's expansion
    (full_src sentinel) — same overflow/definedness contract as
    segment_reduce.
    """
    cap_r, c = bar_pre.shape
    nb = cap_r // GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, GROUP), lambda b, k0, fi: (b // 8, 0)),
            pl.BlockSpec((GROUP, c), lambda b, k0, fi: (b, 0)),
        ],
        out_specs=(
            pl.BlockSpec((GROUP, c), lambda b, k0, fi: (k0[b], 0)),
            pl.BlockSpec((GROUP, c), lambda b, k0, fi: (k0[b], 0)),
        ),
    )
    out_a, out_b = pl.pallas_call(
        _kernel_compact, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_groups * GROUP, c), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * GROUP, c), jnp.float32),
        ),
        interpret=interpret,
    )(red.k0, red.first, red.cloc, bar_pre)
    # group k's rows = out_a[k] + out_b[k-1] (out_b[k] holds group k+1)
    shifted = jnp.concatenate(
        [jnp.zeros((GROUP, c), jnp.float32), out_b[:-GROUP]])
    return out_a + shifted


#: out-of-range sentinel for pad rows' compact ids (cloc stays > 2*GROUP
#: after subtracting any real G*k0; >> GROUP_SHIFT stays clampable)
_CID_PAD = 0x3FFFFFFF


def build_reduce_plan_compact(pair_g: jnp.ndarray, pair_pos: jnp.ndarray,
                              offsets: jnp.ndarray, counts: jnp.ndarray,
                              n: int, capacity: int, capacity_padded: int,
                              cap_live: int, cap_r: int, cap_range: int = 0):
    """Alignment-free compact reduction layout (see CompactReducePlan).

    `cap_live` (multiple of GROUP) is the planned live-gaussian capacity,
    `cap_r` the planned DENSE row count (plan_rows_compact(survivors)).
    Live gaussians beyond cap_live and live rows beyond cap_r are counted
    into the returned overflow — the standard eager re-plan contract.  All
    index math is topology-time; the per-backward costs are the cap_r-row
    permutation gather (== survivors, no alignment padding), the
    dual-accumulator kernel, one contiguous shift-add pass, and ONE
    cap_range-row expansion gather.

    `cap_range` (0 or >= n disables the window) is the planned live-id
    WINDOW width for span banding: with a y-sorted model and contiguous
    tile-row bands, a band's live gaussians occupy a narrow contiguous id
    range [base, base+cap_range), so the expansion gather pays that window
    instead of all N rows (the r4 ~178 ms/frame expansion+mask bill at 5M,
    SCALE_r04b).  Live ids falling outside the planned window count into
    the returned overflow (re-plan contract).
    """
    assert capacity_padded < DEAD_SLOT, capacity_padded
    assert cap_live % GROUP == 0 and cap_r % GROUP == 0, (cap_live, cap_r)
    n_groups_c = cap_live // GROUP
    nb = cap_r // GROUP

    # live pair rank (pre-sort order) and per-gaussian live ranges
    live = pair_pos < capacity_padded                       # (capacity,)
    lrank = jnp.cumsum(live.astype(jnp.int32)) - 1
    live_cum0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), lrank + 1])            # live before p
    g_pair_start = live_cum0[jnp.minimum(offsets, capacity)]          # (N,)
    g_pair_end = live_cum0[jnp.minimum(offsets + counts, capacity)]   # (N,)

    # order-preserving compact renumbering of live gaussians
    assert n > 0, n
    lv = g_pair_end > g_pair_start                          # (N,) bool
    cid_raw = jnp.cumsum(lv.astype(jnp.int32)) - 1
    n_live = cid_raw[-1] + 1
    overflow = jnp.maximum(n_live - cap_live, 0)
    in_cap = lv & (cid_raw < cap_live)
    #: gaussian -> compact id; dead or live-overflowed -> cap_live sentinel
    full_src = jnp.where(in_cap, cid_raw, cap_live)

    # live-id window (span banding): src_range is the [base, base+cap_range)
    # slice of the full map; live ids past the window are overflow
    if cap_range <= 0 or cap_range >= n:
        cap_range = n
        base = jnp.zeros((1,), jnp.int32)
    else:
        any_live = jnp.any(lv)
        lo = jnp.where(any_live, jnp.argmax(lv).astype(jnp.int32), 0)
        hi = jnp.where(any_live,
                       n - jnp.argmax(lv[::-1]).astype(jnp.int32), 0)
        overflow = overflow + jnp.maximum(hi - lo - cap_range, 0)
        base = jnp.clip(lo, 0, n - cap_range)[None]
    src_range = jax.lax.dynamic_slice(full_src, (base[0],), (cap_range,))

    # dense layout: live pair of rank r lands at row r — TWO narrow int32
    # scatters (slot + compact id), nothing else.  The last GROUP rows are
    # RESERVED all-pad (plan_rows_compact budgets for them; rows that would
    # land there count into overflow below): this guarantees >= 1 trailing
    # all-pad block whenever overflow == 0, which the spill-group claim
    # below needs.
    rows_cap = cap_r - GROUP
    cid_pair = full_src[pair_g]                             # (capacity,)
    ok = live & (cid_pair < cap_live)
    dest = jnp.where(ok & (lrank < rows_cap), lrank, cap_r)
    slot = jnp.full((cap_r,), DEAD_SLOT, jnp.int32)
    slot = slot.at[dest].set(jnp.minimum(pair_pos, DEAD_SLOT), mode="drop")
    cid_tbl = jnp.full((cap_r,), _CID_PAD, jnp.int32)
    cid_tbl = cid_tbl.at[dest].set(cid_pair, mode="drop")

    # per-block first output group + local ids; k0 is nondecreasing with
    # steps <= 1 (every compact id owns >= 1 row), so both accumulator
    # streams revisit consecutively.  All-pad trailing blocks claim the
    # SPILL group last_real_k0 + 1: a real block whose first cid is in
    # group K may hold rows of group K+1 (the out_b accumulator), so final
    # output group K+1 = out_a[K+1] + out_b[K] — and out_a[K+1] is defined
    # only if some block visits it with first == 1.  Clamping pad blocks
    # onto the LAST group instead (the pre-r5 bug) left out_a[K_last+1]
    # as uninitialized HBM whenever cap_live exceeded the band's live
    # groups, feeding garbage through the full_src expansion to real live
    # gaussians.  Groups past the spill hold no live cids and stay masked
    # by the expansion's src < cap_live select.
    blk = cid_tbl.reshape(nb, GROUP)
    k0_real = blk[:, 0] >> GROUP_SHIFT                      # pad -> huge
    pad_blk = blk[:, 0] >= _CID_PAD
    last_real_k0 = jnp.max(jnp.where(pad_blk, jnp.int32(-1), k0_real))
    spill = jnp.clip(last_real_k0 + 1, 0, n_groups_c - 1)
    k0 = jnp.where(pad_blk, spill,
                   jnp.minimum(k0_real, n_groups_c - 1))    # (nb,)
    cloc = blk - (k0[:, None] << GROUP_SHIFT)               # (nb, GROUP)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (k0[1:] != k0[:-1]).astype(jnp.int32)])
    red_overflow = jnp.sum((ok & (lrank >= rows_cap)).astype(jnp.int32))
    return CompactReducePlan(
        slot=slot, cloc=cloc, k0=k0, first=first, src_range=src_range,
        base=base, out_shape=jnp.zeros((n_groups_c,), jnp.int32)), \
        overflow + red_overflow
