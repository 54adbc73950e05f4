"""Round-5 on-chip session A: verify drive + targeted suite on the real TPU.

One process (axon serializes clients): first the end-to-end drive recipe
(scene -> PLY -> camera -> render -> PNG -> grad probe), then the pytest
subset covering this round's kernel-facing changes (scalar-prefetch map
packing in pallas_vjp, segreduce spill fix + windowed expansion, span
banding, pose optimization) compiled by Mosaic instead of the interpreter.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GVRT_TEST_TPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import gvrt_tpu as g3

print("backend:", jax.default_backend(), jax.devices(), flush=True)

# ---- 1. drive recipe ----------------------------------------------------
t0 = time.time()
model = g3.random_gaussians(jax.random.key(0), 2000, extent=0.8)
model.means = model.means.at[:, 2].add(-3.0)
model.to_ply("/tmp/scene_r5.ply")
model = g3.GaussianModel.from_ply("/tmp/scene_r5.ply")
cam = g3.Camera.from_fovy(64, 64, 60.0, np.eye(4))

from gvrt_tpu.render.tiled import TiledRenderer
r = TiledRenderer(64, 64, g3.DEFAULT_CONFIG, impl="pallas")
r.plan(model, [cam])
out = r.render(model, cam)
rgb = np.asarray(out["rgb"])
g3.io.save_png("/tmp/render_r5.png", rgb)
hits = float(np.asarray(out["hit_count"]).mean())
print(f"drive: render ok in {time.time()-t0:.1f}s  mean hits {hits:.2f}  "
      f"rgb[{rgb.min():.3f},{rgb.max():.3f}] center mean "
      f"{rgb[16:48,16:48].mean():.3f}", flush=True)
assert hits > 0 and 0.0 <= rgb.min() and rgb.max() <= 1.0
assert rgb[16:48, 16:48].mean() > 0.01, "blank center"

gfn = jax.jit(jax.grad(lambda m: jnp.mean(r.render(m, cam)["rgb"]
                                          [16:48, 16:48])))
g = gfn(model)
gn = float(jnp.linalg.norm(g.means))
print(f"drive: grad probe |g_means| {gn:.3e}", flush=True)
assert np.isfinite(gn) and gn > 0

# ---- 2. targeted on-chip pytest subset ----------------------------------
import pytest
files = os.environ.get(
    "GVRT_ONCHIP_FILES",
    "tests/test_backward.py tests/test_param_grads.py "
    "tests/test_banded.py tests/test_ray_grads.py "
    "tests/test_pose_opt.py tests/test_tiled.py").split()
rc = pytest.main(["-q", *files])
print("pytest rc:", rc, flush=True)
sys.exit(int(rc))
