"""Auxiliary subsystems: profiling timer, distributed helpers (SURVEY §5)."""

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.parallel import data_parallel_mesh, init_distributed
from gvrt_tpu.parallel.distributed import local_batch_slice
from gvrt_tpu.utils import FrameTimer, device_sync


def test_frame_timer_reports_stats():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 64))
    timer = FrameTimer(warmup=1)
    for _ in range(4):
        timer.frame(f, x)
    s = timer.summary()
    assert s["frames"] == 3
    assert s["mean_ms"] > 0 and s["fps"] > 0
    assert s["best_ms"] <= s["mean_ms"] <= s["worst_ms"]


def test_device_sync_returns_value():
    out = device_sync(jnp.arange(4.0))
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 2, 3])


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False


def test_data_parallel_mesh_covers_all_devices():
    mesh = data_parallel_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("cam",)


def test_local_batch_slice_partitions():
    sls = [local_batch_slice(8, axis_size=4, index=i) for i in range(4)]
    seen = sorted(sum((list(range(s.start, s.stop)) for s in sls), []))
    assert seen == list(range(8))
