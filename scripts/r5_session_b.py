"""Round-5 on-chip session B (one process, one TPU window):

  1. re-run the 4 tests fixed after session A2 (pose-opt matmul precision,
     banded-grads on-chip tolerance) on the real chip;
  2. clear caches and run the config[2] 5M span-banding measurement
     (scripts/config2_scale.py) inline — span mode by default; set
     GVRT_SPAN=0 for the round-robin control.
"""
import gc
import os
import runpy
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GVRT_TEST_TPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

import pytest
rc = pytest.main(["-q", "tests/test_pose_opt.py",
                  "tests/test_banded.py::test_banded_grads_match_unbanded",
                  "tests/test_banded.py::test_banded_matches_unbanded_image"])
print("pytest rc:", rc, flush=True)
assert rc == 0, "on-chip re-check failed; not proceeding to the 5M run"

jax.clear_caches()
gc.collect()
print("==== config2 span measurement ====", flush=True)
t0 = time.time()
sys.argv = ["config2_scale.py"]
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "config2_scale.py"), run_name="__main__")
print(f"config2 total {time.time()-t0:.0f}s", flush=True)
