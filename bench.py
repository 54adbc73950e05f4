"""Benchmark: rays/s/chip, forward+backward, at 1080p (BASELINE.md metric).

Protocol mirrors the reference's benchmark mode (base/benchmark.hpp:37-104):
warmup phase, then a timed steady-state window; the score is rays/s of a full
forward+backward (render + L2 loss + gradients w.r.t. every Gaussian
parameter group) at 1920x1088 on one chip.

The reference publishes no numbers (BASELINE.json.published == {}), so
vs_baseline is reported against this repo's provisional roofline target of
100 Mrays/s fwd+bwd per chip — see BASELINE.md targets ("reference-matching
forward+backward at >=80% of roofline").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_RAYS_PER_S = 100e6  # provisional roofline target (fwd+bwd, 1 chip)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    # persistent compilation cache: the driver re-runs this every round with
    # an identical program; a warm cache turns the ~90s compile into seconds
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
    from gvrt_tpu.render.tiled import TiledRenderer

    width, height = 1920, 1088  # 1080p rounded to the 16px tile grid
    n_gauss = int(os.environ.get("GVRT_BENCH_GAUSSIANS", 300_000))
    cfg = g3.DEFAULT_CONFIG

    # synthetic lego-scale scene: gaussians sized a few pixels at 1080p like
    # a trained 3DGS asset (scale sigma ~0.001-0.007 on a unit object at
    # distance 3), so per-tile occupancy matches real scenes
    model = g3.random_gaussians(jax.random.key(0), n_gauss, extent=1.0,
                                scale_range=(-7.0, -5.0))
    model.means = model.means.at[:, 2].add(-3.0)
    cam = g3.Camera.from_fovy(width, height, 50.0, np.eye(4))

    impl = "pallas" if jax.default_backend() == "tpu" else "interpret"
    log(f"bench: backend={jax.default_backend()} impl={impl} "
        f"gaussians={n_gauss} res={width}x{height}")
    renderer = TiledRenderer(width, height, cfg, impl=impl)
    # the capacity plan is deterministic for this fixed synthetic scene:
    # cache it on disk so reruns skip the measurement pass entirely
    plan_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_plan.json")
    plan_key = f"{n_gauss}x{width}x{height}"
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

    @jax.jit
    def fwd_bwd(m):
        def loss(m):
            out = renderer.render(m, cam)
            return jnp.mean((out["rgb"] - target) ** 2), out["hit_count"]
        (val, hits), grads = jax.value_and_grad(loss, has_aux=True)(m)
        return val, jnp.mean(hits), grads

    # warmup / compile.  NB: axon's block_until_ready can return before the
    # device finishes; a D2H scalar read is the reliable sync.
    t_c = time.time()
    val, mean_hits, grads = fwd_bwd(model)
    assert np.isfinite(float(val))
    log(f"bench: compile+first step {time.time() - t_c:.1f}s")

    # sanity: the scene must actually be hit (guards against culling bugs
    # silently benchmarking an empty render); probe stats ride the same
    # compiled function — no second compile
    mean_hits = float(mean_hits)
    grad_norm = float(jnp.linalg.norm(grads.means))
    log(f"bench: mean hits/ray {mean_hits:.2f} grad norm {grad_norm:.2e}")
    assert mean_hits > 0.1, f"empty render (mean hits {mean_hits})"
    assert grad_norm > 0, "zero gradients"

    # steady-state window (time-based, like USE_TIME_BASED_FPS)
    window = float(os.environ.get("GVRT_BENCH_SECONDS", 8.0))
    t0 = time.time()
    frames = 0
    while time.time() - t0 < window:
        val, _, grads = fwd_bwd(model)
        _ = float(val)  # D2H sync
        frames += 1
    dt = (time.time() - t0) / frames

    rays_per_s = width * height / dt
    print(json.dumps({
        "metric": "rays_per_sec_fwd_bwd_1080p_1chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / TARGET_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
