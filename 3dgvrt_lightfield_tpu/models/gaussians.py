"""GaussianModel: the trainable 3D Gaussian scene representation.

Holds raw (pre-activation) parameters exactly as stored in INRIA PLY files
(base/Vulkan3DGRTModel.cpp:7-125) and exposes activated views:
scale = exp(scale_log), density = sigmoid(opacity_logit)
(particlePrimitives.comp:149-151), unit WXYZ quaternions, and the (N, 16, 3)
SH coefficient stack [f_dc, f_rest] consumed by radiance evaluation
(gaussianfunctions.glsl:104-115).

Registered as a JAX pytree, so it can be passed through jit/grad/shard_map and
used directly as the optimizer parameter tree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.ply import SplatSet
from ..ops.kernels import scale_activation, sigmoid
from ..ops.quaternion import normalize_quat, quat_to_rot9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianModel:
    means: jnp.ndarray          # (N, 3)
    scales_log: jnp.ndarray     # (N, 3) pre-activation
    quats: jnp.ndarray          # (N, 4) WXYZ, unnormalized
    opacity_logit: jnp.ndarray  # (N,)
    sh_dc: jnp.ndarray          # (N, 3)
    sh_rest: jnp.ndarray        # (N, 15, 3)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_splats(cls, splats: SplatSet, dtype=jnp.float32) -> "GaussianModel":
        return cls(
            means=jnp.asarray(splats.positions, dtype),
            scales_log=jnp.asarray(splats.scale, dtype),
            quats=jnp.asarray(splats.rotation, dtype),
            opacity_logit=jnp.asarray(splats.opacity, dtype),
            sh_dc=jnp.asarray(splats.f_dc, dtype),
            sh_rest=jnp.asarray(splats.f_rest, dtype),
        )

    @classmethod
    def from_ply(cls, path: str, dtype=jnp.float32) -> "GaussianModel":
        from ..io.ply import load_splats
        return cls.from_splats(load_splats(path), dtype)

    def to_splats(self) -> SplatSet:
        return SplatSet(
            positions=np.asarray(self.means, np.float32),
            scale=np.asarray(self.scales_log, np.float32),
            rotation=np.asarray(self.quats, np.float32),
            opacity=np.asarray(self.opacity_logit, np.float32),
            f_dc=np.asarray(self.sh_dc, np.float32),
            f_rest=np.asarray(self.sh_rest, np.float32),
        )

    def to_ply(self, path: str) -> None:
        from ..io.ply import save_splats
        save_splats(path, self.to_splats())

    # ---- activated views ----------------------------------------------
    def activate(self) -> "ActivatedGaussians":
        q = normalize_quat(self.quats)
        scales = scale_activation(self.scales_log)
        # everything stays 2D lane-dense: (N, 3, 3) / (N, 16, 3) arrays force
        # XLA into (8, 128)-tiled layouts whose 3-wide minor dims pad up to
        # 42-113x — a measured OOM at 5M gaussians (SCALE_r03.md)
        sh_flat = jnp.concatenate(
            [jnp.concatenate([self.sh_dc[:, c:c + 1], self.sh_rest[:, :, c]],
                             axis=1) for c in range(3)], axis=1)
        return ActivatedGaussians(
            means=self.means,
            scales=scales,
            inv_scales=1.0 / scales,
            rot9=quat_to_rot9(q),
            densities=sigmoid(self.opacity_logit),
            sh_flat=sh_flat,
        )

    # ---- filtering ----------------------------------------------------
    def abnormal_mask(self) -> jnp.ndarray:
        """Mask of particles the reference's enclosing pass drops.

        particlePrimitives.comp:120-140: drop if |albedo| > 3, or if the
        ratio of the total cumulative specular-norm sum to its first partial
        sum exceeds 150.  (The reference's loop strides 3*i over a 45-float
        channel-major buffer — reading across particle boundaries for i >= 15;
        we evaluate the evident intent on the per-particle coefficient-major
        (15, 3) block instead, keeping indices in-bounds and deterministic.)

        Returns True for particles to KEEP.
        """
        albedo_strength = jnp.linalg.norm(self.sh_dc, axis=-1)
        coeff_norms = jnp.linalg.norm(self.sh_rest[:, 1:, :], axis=-1)  # (N, 14)
        partial = jnp.cumsum(coeff_norms, axis=-1)
        ratio = partial[:, -1] / (partial[:, 0] + 1e-5)
        return (albedo_strength <= 3.0) & (ratio <= 150.0)

    def filtered(self) -> "GaussianModel":
        """Deterministic keep-order compaction of non-abnormal particles.

        Replaces the reference's atomicAdd compaction
        (particlePrimitives.comp:142), which reorders nondeterministically and
        whose count is never read back (SURVEY.md 2.4b).
        """
        keep = np.asarray(self.abnormal_mask())
        idx = np.nonzero(keep)[0]
        return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[idx]), self)

    def scene_aabb(self):
        """(min, max) corners over Gaussian centers (VulkanFullRT.cpp:1527-1545)."""
        lo = jnp.min(self.means, axis=0)
        hi = jnp.max(self.means, axis=0)
        return lo, hi

    # ---- reordering ----------------------------------------------------
    def permute(self, perm) -> "GaussianModel":
        """Reorder all parameter leaves by `perm` (host-side, scene prep).

        Gaussian order is semantically meaningless to the scene — rendering
        sorts per tile by depth regardless — so a physical reorder is free
        to do once.  Span banding (render/banded.py) exploits a y-sorted
        order: contiguous tile-row bands then see contiguous live-id
        windows."""
        idx = np.asarray(perm)
        return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[idx]), self)

    def sorted_for_camera(self, camera, cfg=None) -> "GaussianModel":
        """Reorder gaussians by projected image-row span for `camera`.

        The span-banding preprocessing step: after this, a contiguous band
        of tile rows touches a contiguous range of gaussian ids (up to
        gaussians spanning band boundaries, which widen the planned window
        slightly).  Sort key = center of the projected tile-row span from
        the binning cull table; invalid (off-screen) gaussians sort last so
        they never widen any band's id window."""
        from ..config import DEFAULT_CONFIG
        from ..render.binning import frame_cull_table
        from ..render.tiled import _camera_mats
        cfg = cfg or DEFAULT_CONFIG
        w2c, proj = _camera_mats(camera)
        tab = frame_cull_table(self.activate(), jnp.asarray(w2c),
                               jnp.asarray(proj), camera.width,
                               camera.height, cfg)
        ty0, ty1 = np.asarray(tab.ty0), np.asarray(tab.ty1)
        valid = np.asarray(tab.valid)
        key = np.where(valid, ty0 + ty1, 2 * camera.height)  # 2x row center
        return self.permute(np.argsort(key, kind="stable"))


class ActivatedGaussians(NamedTuple):
    """Activated per-Gaussian quantities fed to the renderer.

    All fields are <= 2D with lane-dense minor dims (see activate()); the
    production binning/gather paths do flat column arithmetic on rot9 and
    sh_flat.  The `rotmats` / `sh_coeffs` properties provide the shaped
    views for the brute-force reference renderer and tests (small scenes
    only — the reshape materializes the padded layouts the flat fields
    exist to avoid)."""
    means: jnp.ndarray       # (N, 3)
    scales: jnp.ndarray      # (N, 3)
    inv_scales: jnp.ndarray  # (N, 3)
    rot9: jnp.ndarray        # (N, 9) row-major local->world rotation
    densities: jnp.ndarray   # (N,)
    sh_flat: jnp.ndarray     # (N, 48) channel-major [R:16 | G:16 | B:16]

    @property
    def rotmats(self) -> jnp.ndarray:  # (N, 3, 3)
        return self.rot9.reshape(self.rot9.shape[0], 3, 3)

    @property
    def sh_coeffs(self) -> jnp.ndarray:  # (N, 16, 3)
        n = self.sh_flat.shape[0]
        return jnp.swapaxes(self.sh_flat.reshape(n, 3, 16), 1, 2)


def random_gaussians(key, n: int, extent: float = 1.0,
                     scale_range=(-4.5, -2.5)) -> GaussianModel:
    """Synthetic scene generator for tests/benchmarks (BASELINE config 0)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return GaussianModel(
        means=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        scales_log=jax.random.uniform(k2, (n, 3), minval=scale_range[0],
                                      maxval=scale_range[1]),
        quats=jax.random.normal(k3, (n, 4)) + jnp.array([2.0, 0, 0, 0]),
        opacity_logit=jax.random.uniform(k4, (n,), minval=-2.0, maxval=3.0),
        sh_dc=jax.random.uniform(k5, (n, 3), minval=-1.0, maxval=1.0),
        sh_rest=0.05 * jax.random.normal(k6, (n, 15, 3)),
    )
