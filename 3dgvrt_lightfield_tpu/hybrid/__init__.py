"""Hybrid mesh renderer: G-buffer + ray-traced lighting for glTF scenes.

TPU rebuild of the reference's second app, VulkanHybrid
(projects/VulkanHybrid/VulkanHybrid.cpp): a deferred G-buffer pass followed by
ray-traced direct lighting with shadow rays and an iterative
reflection/refraction loop (shaders/glsl/VulkanHybrid/raygen.rgen).

TPU-first design notes:
  * The reference's pass 0 is hardware rasterization into MRT attachments
    (mrt.vert/mrt.frag).  On TPU the same G-buffer contents (world position,
    object id, shaded normal, albedo, metallic/roughness, emissive) are
    produced by casting primary pinhole rays against the triangle soup —
    identical output for the pinhole cameras both apps use, and it reuses the
    one batched ray-triangle kernel.
  * Ray traversal has no BVH/RT-cores: `trace.py` intersects ray blocks
    against triangle chunks with a masked argmin reduction (`lax.scan` over
    chunks), which vectorizes on the VPU; hybrid scenes are O(10k) triangles
    so brute force is the right TPU trade.
  * The per-pixel reflection/refraction while-loop of raygen.rgen:147-190
    becomes a fixed-depth `lax.scan` over bounces with per-pixel active
    masks and product weights.
"""

from . import mesh
from . import shade
from . import trace
from .mesh import (Light, Material, MeshScene, SceneObject, cornell_scene,
                   load_gltf)
from .pipeline import HybridConfig, HybridRenderer, render_hybrid
from .trace import closest_hit, occluded
