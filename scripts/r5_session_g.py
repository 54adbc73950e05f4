"""Round-5 on-chip session G (one process, one TPU window):

  1. verify drive (.claude/skills/verify recipe): scene -> PLY round-trip
     -> tiled render -> PNG on the real chip, plus the NEW pair-balanced
     banded path (bind/render_bound/grad) checked against the tiled
     production path;
  2. pair-balanced config[2]: 5M @ 1080p, bands=2, balanced bound +
     Trainer measurement (GVRT_BALANCE=1, unbound probes skipped — their
     uniform numbers are already on the books, SCALE_r05.md).
"""
import os
import runpy
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

import gvrt_tpu as g3
from gvrt_tpu.render.banded import BandedRenderer, _render_banded_bound
from gvrt_tpu.render.tiled import render_image_tiled

cfg = g3.DEFAULT_CONFIG

# ---- 1. verify drive ----------------------------------------------------
model = g3.random_gaussians(jax.random.key(0), 2000, extent=0.8)
model.means = model.means.at[:, 2].add(-3.0)
model.to_ply("/tmp/scene.ply")
model = g3.GaussianModel.from_ply("/tmp/scene.ply")
cam = g3.Camera.from_fovy(64, 64, 60.0, np.eye(4))
t0 = time.time()
out = render_image_tiled(model, cam, cfg, impl="pallas")
rgb = np.asarray(out["rgb"])
print(f"tiled render: {time.time()-t0:.1f}s  mean hits "
      f"{np.asarray(out['hit_count']).mean():.2f}  rgb range "
      f"[{rgb.min():.3f}, {rgb.max():.3f}]", flush=True)
assert np.asarray(out["hit_count"]).mean() > 1.0
assert 0.0 <= rgb.min() and rgb.max() <= 1.0 and rgb[16:48, 16:48].std() > 0
g3.io.save_png("/tmp/render.png", rgb)

# balanced banded path on chip vs the tiled production path
srt = model.sorted_for_camera(cam, cfg)
full = np.asarray(render_image_tiled(srt, cam, cfg, impl="pallas")["rgb"])
r = BandedRenderer(64, 64, 2, cfg, impl="pallas", remat="gather",
                   span=True, balance=True)
r.bind(srt, cam)
print("balanced split:", r.band_specs, "caps:", r.band_caps, flush=True)
outb = r.render_bound(srt)
assert int(outb["overflow"]) == 0
err = np.abs(np.asarray(outb["rgb"]) - full).max()
print(f"balanced-vs-tiled max |d rgb| = {err:.2e}", flush=True)
assert err < 1e-4, err

topos, rays_bands = r._bound


def loss_b(m):
    img, _ = _render_banded_bound(m, topos, rays_bands, 64, 64, cfg,
                                  "pallas", remat="gather", mode="contig")
    return jnp.mean(img[16:48, 16:48, 0:3])


g = jax.jit(jax.grad(loss_b))(srt)
gn = float(jnp.linalg.norm(g.means))
print(f"balanced grad |g_means| = {gn:.3e}", flush=True)
assert np.isfinite(gn) and gn > 0
print("VERIFY DRIVE PASS", flush=True)

# ---- 2. balanced 5M measurement ----------------------------------------
del model, srt, out, outb, topos, rays_bands, g, full
r._bound = None
import gc
jax.clear_caches()
gc.collect()
os.environ["GVRT_BALANCE"] = "1"
os.environ["GVRT_SKIP_UNBOUND"] = "1"
print("==== config2 balanced span bands=2 ====", flush=True)
sys.argv = ["config2_scale.py", "5000000", "2"]
t0 = time.time()
runpy.run_path(os.path.join(HERE, "config2_scale.py"), run_name="__main__")
print(f"config2 balanced total {time.time()-t0:.0f}s", flush=True)
