"""Benchmark: rays/s/chip, forward+backward, at 1080p (BASELINE.md metric).

Protocol mirrors the reference's benchmark mode (base/benchmark.hpp:37-104):
warmup, then a timed steady-state window.  The score is rays/s of a full
forward+backward (render + L2 loss + gradients w.r.t. every Gaussian
parameter group + SGD update) at 1920x1088 on one chip.

Measurement notes (see PROFILE.md):
  * The axon tunnel costs ~33 ms per host->device round trip, so frames are
    chained on-device with lax.fori_loop (a real SGD step links iterations —
    no CSE) and synced once; per-frame time = window / K.
  * The scene is synthetic but tuned to trained-scene overdraw (mean
    hits/ray ~20+; the reference ships a hit-count dump,
    VulkanFullRT.cpp:2180-2195, precisely because overdraw dominates).
  * vs_baseline is measured rays/s / ROOFLINE_RAYS_PER_S, the speed-of-light
    estimate for this scene derived in PROFILE.md from measured v5e VPU /
    MXU / HBM rates and the kernel's per-pair op counts.  BASELINE.md asks
    for >= 0.8.  Forward-only rays/s (the reference's native fps metric) is
    logged to stderr alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def roofline_rays_per_s(width, height, cap, cap_pad, rays_per_tile):
    """Speed-of-light rays/s for THIS scene on one v5e chip (PROFILE.md §4).

    Measured hardware rates (scripts/tpu_microbench.py): VPU 2.02 Tflop/s
    f32, transcendentals ~0.5 T/s, HBM 587 GB/s, random rows 5.4 ns gather /
    3.2 ns int scatter.  Counted work per (gaussian, ray) pair eval of the
    v2 chunk math: ~88 VPU flops + 4 transcendentals.  Padding slots compute
    too, so pair evals = cap_pad * R.
    """
    vpu, transc, hbm = 2.02e12, 0.5e12, 587e9
    g_row, s_row = 5.4e-9, 3.2e-9
    pair_evals = cap_pad * rays_per_tile
    t_fwd = pair_evals * (88 / vpu + 4 / transc)
    t_bwd = 2.0 * t_fwd + 2 * cap_pad * 64 * 4 / hbm   # recompute + bar HBM
    t_bin = cap * (2 * g_row + s_row) + cap_pad * g_row + 0.002  # rows + sort
    t_red = cap * g_row + 2 * cap * 64 * 4 / hbm
    return width * height / (t_fwd + t_bwd + t_bin + t_red + 0.001)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/repo/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a requirement
        log(f"bench: compilation cache unavailable ({e})")
    import jax.numpy as jnp
    import numpy as np
    import gvrt_tpu as g3
    from gvrt_tpu.render import binning
    from gvrt_tpu.render.tiled import TiledRenderer

    width, height = 1920, 1088  # 1080p rounded to the 16px tile grid
    n_gauss = int(os.environ.get("GVRT_BENCH_GAUSSIANS", 300_000))
    cfg = g3.DEFAULT_CONFIG

    # synthetic scene tuned to trained-scene overdraw: gaussians on a unit
    # object at distance 3, sized so mean hits/ray lands near real 3DGS
    # assets (>= 15 at 1080p) instead of the r1 scene's 5.8
    model = g3.random_gaussians(jax.random.key(0), n_gauss, extent=1.0,
                                scale_range=(-6.3, -4.6))
    model.means = model.means.at[:, 2].add(-3.0)
    cam = g3.Camera.from_fovy(width, height, 50.0, np.eye(4))

    impl = "pallas" if jax.default_backend() == "tpu" else "interpret"
    log(f"bench: backend={jax.default_backend()} impl={impl} "
        f"gaussians={n_gauss} res={width}x{height}")
    renderer = TiledRenderer(width, height, cfg, impl=impl)
    # the capacity plan is deterministic for this fixed synthetic scene:
    # cache it on disk keyed on scene+config+binning version so reruns skip
    # the measurement pass (stale keys die with the fingerprint)
    plan_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_plan.json")
    plan_key = (f"{n_gauss}x{width}x{height}-v{binning.PLAN_VERSION}-"
                f"{abs(hash(cfg)) % 10**10}")
    try:
        with open(plan_cache) as f:
            renderer.capacity = tuple(json.load(f)[plan_key])
        log(f"bench: capacity={renderer.capacity} (cached)")
    except (OSError, KeyError, ValueError):
        renderer.plan(model, [cam])
        log(f"bench: capacity={renderer.capacity}")
        try:
            with open(plan_cache, "w") as f:
                json.dump({plan_key: list(renderer.capacity)}, f)
        except OSError:
            pass

    target = jnp.zeros((height, width, 3)) + 0.3
    lr = 1e-12  # real chained SGD updates, numerically negligible drift

    def loss_fn(m):
        out = renderer.render(m, cam)
        return jnp.mean((out["rgb"] - target) ** 2), (out["hit_count"],
                                                      out["overflow"])

    @jax.jit
    def probe(m):
        (val, (hits, ovf)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(m)
        return val, jnp.mean(hits), ovf, jnp.linalg.norm(grads.means)

    def make_train_k(k):
        @jax.jit
        def train_k(m):
            def body(i, carry):
                m, acc = carry
                (val, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(m)
                m = jax.tree.map(lambda p, g: p - lr * g, m, grads)
                return (m, acc + val)
            return jax.lax.fori_loop(0, k, body, (m, 0.0))
        return train_k

    def make_fwd_k(k):
        @jax.jit
        def fwd_k(m):
            def body(i, carry):
                m, acc = carry
                val, _ = loss_fn(m)
                # chain iterations (no grad): negligible but real dependency
                m = dataclasses.replace(m, means=m.means + 0.0 * val)
                return (m, acc + val)
            return jax.lax.fori_loop(0, k, body, (m, 0.0))
        return fwd_k

    # warmup / compile + sanity probes.  NB: axon's block_until_ready can
    # return before the device finishes; a D2H scalar read is the sync.
    t_c = time.time()
    val, mean_hits, overflow, grad_norm = map(float, probe(model))
    log(f"bench: compile+first step {time.time() - t_c:.1f}s")
    assert np.isfinite(val)
    log(f"bench: mean hits/ray {mean_hits:.2f} grad norm {grad_norm:.2e} "
        f"overflow {overflow:.0f}")
    assert mean_hits > 0.1, f"empty render (mean hits {mean_hits})"
    assert grad_norm > 0, "zero gradients"
    if overflow > 0:  # stale cached capacity would silently truncate pairs
        log("bench: overflow > 0 -> re-planning capacity")
        renderer.plan(model, [cam])
        log(f"bench: capacity={renderer.capacity}")
        val, mean_hits, overflow, grad_norm = map(float, probe(model))
        assert overflow == 0, f"overflow {overflow} after re-plan"
        try:
            with open(plan_cache, "w") as f:
                json.dump({plan_key: list(renderer.capacity)}, f)
        except OSError:
            pass

    # steady-state: K chained on-device frames per sync, best of reps
    k = int(os.environ.get("GVRT_BENCH_CHAIN", 10))
    reps = int(os.environ.get("GVRT_BENCH_REPS", 3))
    train_k = make_train_k(k)
    m2, acc = train_k(model)  # compile
    _ = float(acc)
    best = 1e30
    for _i in range(reps):
        t0 = time.time()
        m2, acc = train_k(model)
        _ = float(acc)  # D2H sync
        best = min(best, (time.time() - t0) / k)
    rays_per_s = width * height / best
    log(f"bench: fwd+bwd {best * 1e3:.2f} ms/frame "
        f"({rays_per_s / 1e6:.1f} Mrays/s)")

    fwd_k = make_fwd_k(k)
    _, acc = fwd_k(model)
    _ = float(acc)
    best_f = 1e30
    for _i in range(reps):
        t0 = time.time()
        _, acc = fwd_k(model)
        _ = float(acc)
        best_f = min(best_f, (time.time() - t0) / k)
    log(f"bench: fwd-only {best_f * 1e3:.2f} ms/frame "
        f"({width * height / best_f / 1e6:.1f} Mrays/s) "
        f"[reference fps protocol analog: base/benchmark.hpp:37-104]")

    roofline = float(os.environ.get("GVRT_ROOFLINE", 0)) or roofline_rays_per_s(
        width, height, *renderer.capacity, cfg.tile_size * cfg.tile_size)
    log(f"bench: derived roofline {roofline / 1e6:.1f} Mrays/s "
        f"(fwd+bwd, this scene; PROFILE.md section 4)")
    print(json.dumps({
        "metric": "rays_per_sec_fwd_bwd_1080p_1chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / roofline,
    }))


if __name__ == "__main__":
    main()
