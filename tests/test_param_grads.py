"""Scatter-free gradient reduction (render/param_grads.py) tests.

The custom VJP of `chunked_gather` must be bit-for-bit the math of XLA's
scatter-add transpose of the plain gather; these tests compare against plain
autodiff on random pair layouts, including padding, dropped pairs and
count-0 (culled) gaussians.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.param_grads import blocked_cumsum, chunked_gather
from gvrt_tpu.render.tiled import _camera_mats


def test_blocked_cumsum_matches_jnp():
    x = jax.random.normal(jax.random.key(0), (1000, 7))
    np.testing.assert_allclose(np.asarray(blocked_cumsum(x, block=64)),
                               np.asarray(jnp.cumsum(x, axis=0)),
                               rtol=2e-5, atol=2e-5)


def _random_layout(key, n, capacity, chunk, c=5):
    """Build a consistent (pair_gauss, pair_pos, offsets, counts) layout:
    pair_pos is the direct pre-sort pair -> padded slot map (P_pad =
    dropped), exactly what bin_topology carries."""
    kc, kp = jax.random.split(key)
    counts = np.asarray(jax.random.randint(kc, (n,), 0, 5), np.int32)
    offsets = np.cumsum(counts) - counts
    total = int(counts.sum())
    assert total <= capacity
    # place the `total` pairs at distinct random slots of the padded array
    p_pad = capacity + chunk
    slots = np.asarray(
        jax.random.permutation(kp, p_pad)[:total], np.int32)
    pair_gauss = np.full((p_pad,), n, np.int32)
    pair_pos = np.full((capacity,), p_pad, np.int32)
    p = 0
    for g in range(n):
        for _ in range(counts[g]):
            pair_gauss[slots[p]] = g
            pair_pos[p] = slots[p]
            p += 1
    return (jnp.asarray(pair_gauss), jnp.asarray(pair_pos),
            jnp.asarray(offsets, jnp.int32), jnp.asarray(counts))


def test_custom_vjp_matches_autodiff_gather():
    n, capacity, chunk, c = 37, 160, 32, 6
    pair_gauss, pair_pos, offsets, counts = _random_layout(
        jax.random.key(1), n, capacity, chunk, c)
    rows = jax.random.normal(jax.random.key(2), (n + 1, c))
    p_pad = pair_gauss.shape[0]
    bar = jax.random.normal(jax.random.key(3), (p_pad // chunk, chunk, c))

    def custom(r):
        out = chunked_gather(chunk, r, pair_gauss, pair_pos,
                             offsets, counts)
        return jnp.sum(out * bar)

    def plain(r):
        out = r[pair_gauss].reshape(p_pad // chunk, chunk, c)
        return jnp.sum(out * bar)

    np.testing.assert_allclose(float(custom(rows)), float(plain(rows)),
                               rtol=1e-5)
    g_custom = jax.grad(custom)(rows)
    g_plain = jax.grad(plain)(rows)
    # dummy row N: the plain gather accumulates padding cotangents there,
    # the custom path leaves it zero by design -- compare real rows only
    np.testing.assert_allclose(np.asarray(g_custom[:n]),
                               np.asarray(g_plain[:n]), rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(g_custom[n]).max()) == 0.0


def test_segreduce_backend_matches_fallback():
    """The grouped Pallas segment-reduce backend (segreduce.py) must produce
    the same per-Gaussian gradients as the XLA prefix fallback and as plain
    autodiff of the gather — including count-0 gaussians, dropped pairs and
    multi-group layouts (n > 256 forces several output groups)."""
    from gvrt_tpu.render.segreduce import build_reduce_plan

    n, capacity, chunk, c = 531, 2112, 32, 6  # (capacity+chunk) % chunk == 0
    pair_gauss, pair_pos, offsets, counts = _random_layout(
        jax.random.key(11), n, capacity, chunk, c)
    # pre-sort pair -> gaussian id with the cummax tail fill bin_topology
    # produces (pairs beyond the total carry the last gaussian-with-pairs)
    counts_np = np.asarray(counts)
    pair_g = np.repeat(np.arange(n, dtype=np.int32), counts_np)
    last = int(np.nonzero(counts_np)[0][-1]) if counts_np.sum() else 0
    pair_g = np.concatenate(
        [pair_g, np.full(capacity - pair_g.shape[0], last, np.int32)])
    red, red_ovf = build_reduce_plan(jnp.asarray(pair_g), pair_pos, offsets,
                                     counts, n, capacity,
                                     int(pair_gauss.shape[0]))
    assert int(red_ovf) == 0

    rows = jax.random.normal(jax.random.key(12), (n + 1, c))
    p_pad = pair_gauss.shape[0]
    bar = jax.random.normal(jax.random.key(13), (p_pad // chunk, chunk, c))

    def loss(r, red_arg):
        out = chunked_gather(chunk, r, pair_gauss, pair_pos, offsets,
                             counts, red_arg)
        return jnp.sum(out * bar)

    def plain(r):
        return jnp.sum(r[pair_gauss].reshape(p_pad // chunk, chunk, c) * bar)

    g_seg = jax.grad(loss)(rows, red)
    g_fall = jax.grad(loss)(rows, None)
    g_plain = jax.grad(plain)(rows)
    np.testing.assert_allclose(np.asarray(g_seg[:n]), np.asarray(g_plain[:n]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_fall),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(g_seg[n]).max()) == 0.0

    # live-compacted tight cap_r: same gradients; an IMPOSSIBLY tight one
    # must report overflow (the re-plan signal), never silently drop
    from gvrt_tpu.render.segreduce import GROUP, plan_rows
    live = int(jnp.sum(pair_pos < pair_gauss.shape[0]))
    tight = plan_rows(live, n + 1)
    red_t, ovf_t = build_reduce_plan(jnp.asarray(pair_g), pair_pos, offsets,
                                     counts, n, capacity,
                                     int(pair_gauss.shape[0]), cap_r=tight)
    assert int(ovf_t) == 0
    g_tight = jax.grad(loss)(rows, red_t)
    np.testing.assert_allclose(np.asarray(g_tight), np.asarray(g_seg),
                               rtol=1e-4, atol=1e-5)
    n_groups = -(-(n + 1) // GROUP)
    too_tight = GROUP * n_groups  # only the min 1 block per group
    _, ovf_bad = build_reduce_plan(jnp.asarray(pair_g), pair_pos, offsets,
                                   counts, n, capacity,
                                   int(pair_gauss.shape[0]),
                                   cap_r=too_tight)
    assert int(ovf_bad) > 0


def test_binning_grads_match_brute_force():
    """End-to-end: tiled-pipeline grads (through the new reduction) vs the
    independent brute-force renderer's autodiff."""
    from gvrt_tpu.render.reference import render_image
    from gvrt_tpu.render.tiled import TiledRenderer

    cfg = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)
    model = g3.random_gaussians(jax.random.key(5), 40, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    target = jnp.zeros((16, 16, 3)) + 0.3

    r = TiledRenderer(16, 16, cfg, impl="scan")
    r.plan(model, [cam])

    def loss_tiled(m):
        return jnp.mean((r.render(m, cam)["rgb"] - target) ** 2)

    def loss_brute(m):
        return jnp.mean((render_image(m, cam, cfg)["rgb"] - target) ** 2)

    gt = jax.grad(loss_tiled)(model)
    gb = jax.grad(loss_brute)(model)
    # This is a CROSS-ALGORITHM comparison (center-depth chunk ordering vs
    # exact per-hit ordering) — the strict per-algorithm invariants live in
    # test_custom_vjp_matches_autodiff_gather / test_backward.  On-chip the
    # tile pipeline adds bf16 SH dots (the deliberate _SH_PRECISION opt-out)
    # and TPU-rounded camera depths whose quantization tie-breaks reorder
    # composites: measured worst normalized grad delta 6.0e-3 (v5e, r3);
    # CPU stays exact to 5e-4.
    atol = 8e-3 if os.environ.get("GVRT_TEST_TPU") else 5e-4
    for name in ("means", "scales_log", "quats", "opacity_logit", "sh_dc"):
        a, b = np.asarray(getattr(gt, name)), np.asarray(getattr(gb, name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)


def test_compact_reduce_spill_group_defined():
    """Regression (r4 advisor, high): when cap_live exceeds the live count
    by >= 2 GROUPs AND the last real reduction block spans a compact-group
    boundary, the spill group's out_a block must still be written.  The
    broken plan clamped all-pad trailing blocks onto the LAST output group,
    leaving out_a[K_last+1] as uninitialized memory that the full_src
    expansion then gathered for real live gaussians (NaN under the Pallas
    interpreter, garbage on-chip)."""
    from gvrt_tpu.render.segreduce import (GROUP, build_reduce_plan_compact,
                                           plan_rows_compact)

    # n gaussians, one pair each except gaussian 0 (two pairs): live rows =
    # n + 1, so the block starting at row GROUP holds cid GROUP - 1 ->
    # k0 = 0 and its rows spill into compact group 1 via out_b.
    n = GROUP + 44
    chunk, c = 32, 6
    counts = np.ones((n,), np.int32)
    counts[0] = 2
    offsets = np.cumsum(counts) - counts
    total = int(counts.sum())
    capacity = total + 19  # some dropped tail pairs
    p_pad = -(-(capacity + 1) // chunk) * chunk
    pair_g = np.repeat(np.arange(n, dtype=np.int32), counts)
    pair_g = np.concatenate(
        [pair_g, np.full(capacity - total, n - 1, np.int32)])
    # identity-ish slot layout: live pairs at slots 0..total-1
    pair_pos = np.concatenate(
        [np.arange(total, dtype=np.int32),
         np.full(capacity - total, p_pad, np.int32)])
    pair_gauss = np.full((p_pad,), n, np.int32)
    pair_gauss[:total] = pair_g[:total]

    cap_live = 3 * GROUP          # live cids end in group 1; group 2 empty
    cap_r = plan_rows_compact(total)
    red, ovf = build_reduce_plan_compact(
        jnp.asarray(pair_g), jnp.asarray(pair_pos), jnp.asarray(offsets),
        jnp.asarray(counts), n, capacity, p_pad, cap_live, cap_r)
    assert int(ovf) == 0

    # plan-level invariant: every output group holding live cids has its
    # out_a block claimed by some input block's k0 -- including the spill
    # group K_last + 1
    k0s = set(np.asarray(red.k0).tolist())
    assert int(red.base[0]) == 0  # no window planned -> full-table src map
    src = np.asarray(red.src_range)
    live_groups = set((src[src < cap_live] // GROUP).tolist())
    assert live_groups <= k0s, (sorted(live_groups), sorted(k0s))

    rows = jax.random.normal(jax.random.key(21), (n + 1, c))
    bar = jax.random.normal(jax.random.key(22), (p_pad // chunk, chunk, c))

    def loss(r, red_arg):
        out = chunked_gather(chunk, r, jnp.asarray(pair_gauss),
                             jnp.asarray(pair_pos), jnp.asarray(offsets),
                             jnp.asarray(counts), red_arg)
        return jnp.sum(out * bar)

    g_cmp = jax.grad(loss)(rows, red)
    g_fall = jax.grad(loss)(rows, None)
    assert np.isfinite(np.asarray(g_cmp)).all()
    np.testing.assert_allclose(np.asarray(g_cmp), np.asarray(g_fall),
                               rtol=1e-4, atol=1e-5)
