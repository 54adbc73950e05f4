"""Execute the multi-process `jax.distributed` branch: 2 CPU processes.

Real multi-host TPU hardware is unavailable in this environment (axon
exposes one chip), but the distributed layer itself — coordinator handshake,
cross-process mesh construction, process-local global-array assembly, and a
cross-process `pmean` gradient all-reduce inside the sharded train step —
is hardware-agnostic.  This launcher runs it for real across 2 local
processes with 1 CPU device each, closing the r2 verdict's "the
`jax.distributed.initialize` path has literally never run with
num_processes > 1" gap (row 33, PARITY.md section 2.5).

Round-4 extension: GVRT_DIST_LOCAL_DEVICES=D runs each process with D
virtual CPU devices (the actual pod shape — a PROCESS-SPANNING mesh where
positions within a process are the ICI analog and the cross-process hop is
the DCN analog; `data_parallel_mesh` orders devices host-major so the grad
pmean reduces hierarchically, within-process first).

Usage:
  python scripts/distributed_cpu_2proc.py            # launcher
  python scripts/distributed_cpu_2proc.py <pid>      # worker role
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("GVRT_DIST_PORT", 17645))
NPROC = 2
LOCAL_DEVICES = int(os.environ.get("GVRT_DIST_LOCAL_DEVICES", 1))


def worker(process_id: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from gvrt_tpu.parallel.distributed import (data_parallel_mesh,
                                               init_distributed,
                                               local_batch_slice)
    ok = init_distributed(coordinator=f"127.0.0.1:{PORT}",
                          num_processes=NPROC, process_id=process_id)
    print(f"init_distributed -> {ok} "
          f"(process {jax.process_index()}/{jax.process_count()}, "
          f"local {jax.local_device_count()} global {jax.device_count()} "
          f"devices)", flush=True)
    assert ok and jax.process_count() == NPROC
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == NPROC * LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import gvrt_tpu as g3
    from gvrt_tpu.parallel import camera_batch
    from gvrt_tpu.render.tiled import TiledRenderer
    from gvrt_tpu.train import TrainConfig, Trainer

    mesh = data_parallel_mesh()
    n_cams = NPROC * LOCAL_DEVICES   # one camera per global device
    model = g3.random_gaussians(jax.random.key(0), 200, extent=0.8)
    model.means = model.means.at[:, 2].add(-3.0)
    cams = [g3.Camera.from_fovy(64, 64, 60.0, np.eye(4), name=f"c{i}")
            for i in range(n_cams)]
    # identical deterministic plan on every process (SPMD shape agreement)
    planner = TiledRenderer(64, 64, g3.DEFAULT_CONFIG, impl="scan")
    capacity = planner.plan(model, cams)

    # global batch assembled from process-local data: every process holds
    # the full deterministic numpy batch; make_array_from_callback places
    # only this process's shard on its device
    batch = camera_batch(cams, g3.DEFAULT_CONFIG)
    targets = np.stack([np.full((64, 64, 3), 0.2 + 0.1 * i, np.float32)
                        for i in range(n_cams)])
    sl = local_batch_slice(n_cams)
    print(f"process {process_id} owns cameras {sl}", flush=True)

    def to_global(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("cam"))
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    gbatch = jax.tree.map(to_global, batch)
    gtargets = to_global(targets)

    trainer = Trainer(64, 64, g3.DEFAULT_CONFIG, TrainConfig(total_steps=4),
                      capacity, mesh=mesh, impl="scan")
    state = trainer.init(model)
    for step in range(2):
        state, loss = trainer.step(state, gbatch, gtargets)
        print(f"process {process_id} step {step}: "
              f"loss {float(loss):.6f}", flush=True)
    assert np.isfinite(float(loss))
    # cross-process agreement: the pmean'd loss must be identical everywhere
    print(f"process {process_id} FINAL loss {float(loss):.8f}", flush=True)


def launcher() -> None:
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=("--xla_force_host_platform_device_count="
                          f"{LOCAL_DEVICES}"))
    procs = []
    for pid in range(NPROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        rc |= p.returncode
        print(f"--- process {pid} (exit {p.returncode}) ---\n{out}",
              flush=True)
    finals = [l for o in outs for l in o.splitlines() if "FINAL loss" in l]
    losses = {l.split()[-1] for l in finals}
    assert rc == 0, f"worker failed (rc {rc})"
    assert len(finals) == NPROC and len(losses) == 1, \
        f"cross-process loss mismatch: {finals}"
    print(f"OK: {NPROC}-process jax.distributed run, pmean-agreed loss "
          f"{losses.pop()}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        launcher()
