"""Scaling-efficiency harness: 1 -> N devices, camera-batch data parallel.

BASELINE config[3]: multi-host batch-of-cameras with overlapped grad
all-reduce; target >= 85% weak-scaling efficiency from 1 device to N.

Weak scaling: each device owns ONE camera of the batch (global batch = N),
parameters replicated, gradients pmean'd over the mesh.  Efficiency_N =
T_step(1 device) / T_step(N devices) — perfect overlap and a free all-reduce
give 1.0.

Runs on whatever devices exist:
  * real multi-chip TPU -> the config[3] answer,
  * single TPU chip     -> prints the 1-device baseline only,
  * CPU (tests/driver)  -> set XLA_FLAGS=--xla_force_host_platform_device_count=8
    JAX_PLATFORMS=cpu for an 8-device plumbing run (timings are CPU-bound
    and NOT the config[3] metric, but every collective path executes).

Also exercises parallel.distributed.init_distributed: with
GVRT_FORCE_DIST=1 a real single-process jax.distributed runtime is
initialized (coordinator on localhost), the same code path a pod would take.

Usage: [GVRT_FORCE_DIST=1] python scripts/scaling_bench.py [n_gauss [side]]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    # the container's sitecustomize force-registers the axon TPU platform and
    # overrides JAX_PLATFORMS; config.update after import is what wins
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import gvrt_tpu as g3
    from gvrt_tpu.parallel import distributed as dist
    from gvrt_tpu.parallel.sharding import camera_batch, make_mesh
    from gvrt_tpu.render.binning import plan_capacity
    from gvrt_tpu.render.tiled import _camera_mats
    from gvrt_tpu.train.trainer import Trainer, TrainConfig

    forced = os.environ.get("GVRT_FORCE_DIST") == "1"
    if forced:
        # exercise the real multi-process init path (coordinator handshake,
        # process id assignment) in a 1-process runtime, then stop: mixing a
        # forced jax.distributed runtime with a forced 8-CPU-device mesh
        # routes mesh collectives through Gloo key exchange, which deadlocks
        # in-process — a pod doesn't hit this (one process per host).
        inited = dist.init_distributed(coordinator="localhost:19291",
                                       num_processes=1, process_id=0)
        mesh = dist.data_parallel_mesh()
        print(f"init_distributed -> {inited} "
              f"(process {jax.process_index()}/{jax.process_count()}, "
              f"mesh {mesh.shape})", flush=True)
        assert inited and jax.process_count() == 1
        return {"init_distributed": True}
    inited = dist.init_distributed()
    print(f"init_distributed -> {inited} "
          f"(process {jax.process_index()}/{jax.process_count()})",
          flush=True)

    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(os.environ.get("GVRT_SCALING_STEPS", 10))
    cfg = g3.DEFAULT_CONFIG

    model = g3.random_gaussians(jax.random.key(0), n_gauss, extent=1.0,
                                scale_range=(-6.0, -4.5))
    model.means = model.means.at[:, 2].add(-3.0)

    devices = jax.devices()
    max_d = len(devices)
    # one camera per device, slightly different poses (realistic workload)
    cams = []
    for i in range(max_d):
        c2w = np.eye(4)
        c2w[0, 3] = 0.02 * i
        cams.append(g3.Camera.from_fovy(side, side, 50.0, c2w))
    act = model.activate()
    cap = cap_pad = 0
    for cam in cams:
        w2c, proj = _camera_mats(cam)
        c, cp = plan_capacity(act, w2c, proj, side, side, cfg)
        cap, cap_pad = max(cap, c), max(cap_pad, cp)
    print(f"devices {max_d} ({devices[0].platform}), gaussians {n_gauss}, "
          f"{side}x{side}, capacity {(cap, cap_pad)}", flush=True)

    targets_all = jnp.zeros((max_d, side, side, 3)) + 0.3
    results = {}
    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= max_d]
    if max_d not in sizes:
        sizes.append(max_d)
    for n in sizes:
        mesh = make_mesh(n)
        batch = camera_batch(cams[:n], cfg)
        targets = targets_all[:n]
        tr = Trainer(side, side, cfg, TrainConfig(), (cap, cap_pad),
                     mesh=mesh)
        state = tr.init(model)
        state, loss = tr.step(state, batch, targets)  # compile
        _ = float(loss)
        t0 = time.time()
        for _i in range(steps):
            state, loss = tr.step(state, batch, targets)
        _ = float(loss)  # one sync at the end: amortizes dispatch latency
        dt = (time.time() - t0) / steps
        results[n] = dt
        eff = results[1] / dt if 1 in results else float("nan")
        print(f"N={n:3d}: {dt * 1e3:8.2f} ms/step  "
              f"weak-scaling efficiency {eff:6.3f}  "
              f"(rays/s total {n * side * side / dt / 1e6:.1f}M)", flush=True)

    summary = {
        "platform": devices[0].platform,
        "devices": max_d,
        "ms_per_step": {str(k): v * 1e3 for k, v in results.items()},
        "weak_scaling_efficiency": {
            str(k): results[1] / v for k, v in results.items()},
        "note": ("config[3] metric only on real multi-chip TPU; "
                 "CPU-mesh runs validate plumbing"),
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
