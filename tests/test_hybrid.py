"""Hybrid (mesh G-buffer + RT lighting) renderer tests.

Covers SURVEY.md section 2.2: ray-triangle intersection, shadow occlusion,
GGX shading behavior, the reflection bounce loop, glTF loading, and scene
animation — the unit-test version of verification the reference only does
by eyeballing VulkanHybrid frames.
"""

import dataclasses
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.hybrid import (HybridConfig, HybridRenderer, Light, Material,
                             MeshScene, cornell_scene, load_gltf)
from gvrt_tpu.hybrid.mesh import rotate_y
from gvrt_tpu.hybrid.trace import closest_hit, occluded, pack_triangles
from gvrt_tpu.hybrid import shade


def _single_tri(v0, v1, v2):
    return pack_triangles(np.asarray([[v0, v1, v2]], np.float32), chunk=8)


class TestTrace:
    def test_hit_straight_on(self):
        tris = _single_tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
        rays = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, -1.0]])
        out = closest_hit(rays, tris, tmin=jnp.asarray([0.0]))
        assert int(out["tri"][0]) == 0
        np.testing.assert_allclose(float(out["t"][0]), 5.0, rtol=1e-5)

    def test_miss_outside_barycentric(self):
        tris = _single_tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
        rays = jnp.asarray([[2.0, 2.0, 0.0, 0.0, 0.0, -1.0]])
        out = closest_hit(rays, tris, tmin=jnp.asarray([0.0]))
        assert int(out["tri"][0]) == -1
        assert float(out["t"][0]) > 1e29

    def test_nearest_of_two(self):
        tri = np.asarray([
            [[-1, -1, -5], [1, -1, -5], [0, 1, -5]],
            [[-1, -1, -3], [1, -1, -3], [0, 1, -3]]], np.float32)
        tris = pack_triangles(tri, chunk=8)
        rays = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, -1.0]])
        out = closest_hit(rays, tris, tmin=jnp.asarray([0.0]))
        assert int(out["tri"][0]) == 1
        np.testing.assert_allclose(float(out["t"][0]), 3.0, rtol=1e-5)

    def test_tmax_window(self):
        tris = _single_tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
        rays = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, -1.0]])
        out = closest_hit(rays, tris, tmin=jnp.asarray([0.0]),
                          tmax=jnp.asarray([4.0]))
        assert int(out["tri"][0]) == -1

    def test_occluded(self):
        tris = _single_tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
        rays = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, -1.0],
                            [0.0, 0.0, 0.0, 0.0, 0.0, 1.0]])
        occ = occluded(rays, tris, jnp.zeros(2), jnp.full((2,), 10.0))
        assert bool(occ[0]) and not bool(occ[1])

    def test_barycentric_interpolation_point(self):
        tris = _single_tri([0, 0, -2], [2, 0, -2], [0, 2, -2])
        rays = jnp.asarray([[0.5, 0.5, 0.0, 0.0, 0.0, -1.0]])
        out = closest_hit(rays, tris, tmin=jnp.asarray([0.0]))
        # u weights v1=(2,0), v2=(0,2): hit point x=2u, y=2v
        np.testing.assert_allclose(float(out["u"][0]), 0.25, atol=1e-5)
        np.testing.assert_allclose(float(out["v"][0]), 0.25, atol=1e-5)

    def test_morton_cull_matches_bruteforce(self):
        """The chunk-AABB cull is conservative: Morton-reordered, culled,
        block-split traversal must match the unordered brute scan exactly
        (same triangles win: unique nearest t per ray by construction)."""
        rng = np.random.default_rng(5)
        # clustered triangles so Morton chunks have distinct AABBs
        centers = rng.uniform(-4, 4, size=(60, 3))
        tri = (centers[:, None, :]
               + 0.3 * rng.standard_normal((60, 3, 3))).astype(np.float32)
        packs = {
            "brute": pack_triangles(tri, chunk=8, reorder=False),
            "culled": pack_triangles(tri, chunk=8, reorder=True),
        }
        n_rays = 37  # not a multiple of any block size
        o = rng.uniform(-6, 6, size=(n_rays, 3))
        d = rng.standard_normal((n_rays, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = jnp.asarray(np.concatenate([o, d], 1), jnp.float32)
        tmin = jnp.zeros((n_rays,))
        tmax = jnp.full((n_rays,), 1e30)
        outs = {k: closest_hit(rays, p, tmin=tmin, block=16)
                for k, p in packs.items()}
        np.testing.assert_allclose(np.asarray(outs["culled"]["t"]),
                                   np.asarray(outs["brute"]["t"]),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(outs["culled"]["tri"]),
                                      np.asarray(outs["brute"]["tri"]))
        occs = {k: occluded(rays, p, tmin, tmax, block=16)
                for k, p in packs.items()}
        np.testing.assert_array_equal(np.asarray(occs["culled"]),
                                      np.asarray(occs["brute"]))


class TestShadeMath:
    def test_fresnel_bounds(self):
        f0 = jnp.asarray([0.04, 0.04, 0.04])
        head_on = shade.fresnel_schlick(jnp.asarray(1.0), f0)
        grazing = shade.fresnel_schlick(jnp.asarray(0.0), f0)
        np.testing.assert_allclose(np.asarray(head_on), 0.04, atol=1e-6)
        np.testing.assert_allclose(np.asarray(grazing), 1.0, atol=1e-6)

    def test_ggx_peak_at_normal(self):
        on = shade.distribution_ggx(jnp.asarray(1.0), 0.3)
        off = shade.distribution_ggx(jnp.asarray(0.7), 0.3)
        assert float(on) > float(off) > 0.0

    def test_attenuation_monotone_near(self):
        att = shade.LightAttenuation()
        color = jnp.ones((3,))
        r = 10.0
        vals = [float(shade.apply_attenuation(
            color, jnp.asarray(d), r, att)[0]) for d in (0.5, 2.0, 5.0)]
        assert vals[0] >= vals[1] >= vals[2]
        assert all(0.001 <= v <= 1.0 for v in vals)

    def test_reflect_refract(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        v = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
        r = shade.reflect(v, n)
        np.testing.assert_allclose(np.asarray(r[0]),
                                   np.asarray([1.0, 1.0, 0.0]) / np.sqrt(2),
                                   atol=1e-6)
        # refraction at eta=1 is the identity
        t = shade.refract(v, n, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(t), np.asarray(v), atol=1e-6)
        # total internal reflection -> zero vector
        tir = shade.refract(v, n, jnp.asarray([10.0]))
        np.testing.assert_allclose(np.asarray(tir), 0.0, atol=1e-6)


class TestPipeline:
    @pytest.fixture(scope="class")
    def frame(self):
        scene = cornell_scene()
        cam = g3.Camera.from_fovy(64, 64, 60.0, _cornell_cam())
        r = HybridRenderer(64, 64, HybridConfig(tri_chunk=256))
        return r.render(scene, cam), scene

    def test_renders_in_range(self, frame):
        out, _ = frame
        rgb = np.asarray(out["rgb"])
        assert rgb.shape == (64, 64, 3)
        assert np.all(rgb >= 0.0) and np.all(rgb <= 1.0)
        assert rgb.mean() > 0.01  # lit scene is not black

    def test_walls_colored(self, frame):
        out, _ = frame
        rgb = np.asarray(out["rgb"])
        h, w = rgb.shape[:2]
        # quarter-width pixels see the side walls from the cornell camera
        left = rgb[h // 2, w // 4 - 6]
        right = rgb[h // 2, w - w // 4 + 6]
        assert left[0] > left[1]   # red wall on the left
        assert right[1] > right[0]  # green wall on the right

    def test_object_ids(self, frame):
        out, scene = frame
        obj = np.asarray(out["object"])
        assert obj.max() < len(scene.materials)
        assert (obj >= 0).any()

    def test_shadow_darkens(self):
        # floating sphere over a floor, oblique light: a clearly visible
        # shadow patch that nothing occludes from the camera
        from gvrt_tpu.hybrid.mesh import Light, Material, _icosphere, _quad
        scene = MeshScene()
        pos, idx = _quad([-3, 0, -3], [-3, 0, 3], [3, 0, 3], [3, 0, -3])
        scene.add_object("floor", pos, idx, Material(
            base_color=(0.7, 0.7, 0.7, 1), metallic=0.0, roughness=0.9))
        v, f, n = _icosphere(0.3, (0.0, 0.9, 0.0), subdiv=2)
        scene.add_object("ball", v, f, Material(
            base_color=(0.8, 0.2, 0.2, 1), metallic=0.0, roughness=0.8),
            normals=n)
        scene.lights.append(Light(position=(0.0, 3.0, 2.0),
                                  color=(1.0, 1.0, 1.0), radius=20.0))
        c2w = np.eye(4)
        c2w[:3, 3] = [0.0, 1.5, 3.0]
        cam = g3.Camera.from_fovy(48, 48, 60.0, c2w)
        lit = HybridRenderer(48, 48, HybridConfig(
            shadow_rays=False, reflection=False, refraction=False,
            tri_chunk=256)).render(scene, cam)
        shad = HybridRenderer(48, 48, HybridConfig(
            shadow_rays=True, reflection=False, refraction=False,
            tri_chunk=256)).render(scene, cam)
        diff = np.asarray(lit["rgb"]) - np.asarray(shad["rgb"])
        assert np.all(diff >= -1e-6)       # shadows only remove light
        assert (diff.sum(-1) > 0.05).sum() > 5  # a visible shadow patch

    def test_mirror_changes_image(self):
        cam = g3.Camera.from_fovy(48, 48, 60.0, _cornell_cam())
        base = HybridRenderer(48, 48, HybridConfig(
            reflection=False, refraction=False, tri_chunk=256)).render(
                cornell_scene(with_mirror=True), cam)
        refl = HybridRenderer(48, 48, HybridConfig(tri_chunk=256)).render(
            cornell_scene(with_mirror=True), cam)
        diff = float(jnp.max(jnp.abs(base["rgb"] - refl["rgb"])))
        assert diff > 0.02  # bounce loop contributes

    def test_animation_moves_geometry(self):
        scene = cornell_scene()
        obj = scene.objects[-1]
        obj.dynamic = True
        obj.update = rotate_y(90.0)
        s0 = scene.animated(0.0)
        s1 = scene.animated(1.0)
        tri = slice(obj.first_tri, obj.first_tri + obj.num_tris)
        assert not np.allclose(s0.tri_pos[tri], s1.tri_pos[tri])
        # static geometry untouched
        assert np.allclose(s0.tri_pos[:obj.first_tri],
                           s1.tri_pos[:obj.first_tri])


def _cornell_cam():
    c2w = np.eye(4)
    c2w[:3, 3] = [0.0, 1.0, 3.2]
    return c2w


class TestGltf:
    def test_load_minimal_gltf(self, tmp_path):
        # one triangle, embedded base64 buffer
        import base64
        pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        idx = np.asarray([0, 1, 2], np.uint16)
        buf = pos.tobytes() + idx.tobytes()
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0, "translation": [0, 0, -2]}],
            "meshes": [{"name": "tri", "primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1,
                "material": 0}]}],
            "materials": [{"name": "m", "pbrMetallicRoughness": {
                "baseColorFactor": [1, 0, 0, 1], "metallicFactor": 0.0,
                "roughnessFactor": 0.5}}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5123, "count": 3,
                 "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            ],
            "buffers": [{
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(buf).decode()}],
        }
        path = tmp_path / "tri.gltf"
        path.write_text(json.dumps(gltf))
        scene = load_gltf(str(path))
        assert scene.num_tris == 1
        np.testing.assert_allclose(scene.tri_pos[0, 0], [0, 0, -2], atol=1e-6)
        assert scene.materials[0].base_color[:3] == (1, 0, 0)
        assert scene.materials[0].roughness == 0.5

    def test_load_glb(self, tmp_path):
        import struct
        pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        binchunk = pos.tobytes()
        gltf = {
            "asset": {"version": "2.0"}, "scene": 0,
            "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{"bufferView": 0, "componentType": 5126,
                           "count": 3, "type": "VEC3"}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0,
                             "byteLength": 36}],
            "buffers": [{"byteLength": 36}],
        }
        js = json.dumps(gltf).encode()
        js += b" " * (-len(js) % 4)
        total = 12 + 8 + len(js) + 8 + len(binchunk)
        glb = (struct.pack("<III", 0x46546C67, 2, total)
               + struct.pack("<II", len(js), 0x4E4F534A) + js
               + struct.pack("<II", len(binchunk), 0x004E4942) + binchunk)
        path = tmp_path / "tri.glb"
        path.write_bytes(glb)
        scene = load_gltf(str(path))
        assert scene.num_tris == 1


def test_instanced_objects_share_geometry_and_material():
    """add_instanced (SceneObjectManager.h:41-49 instanced registration):
    K instances share ONE material entry, each is its own animatable
    SceneObject, and instance triangles land at the given transforms."""
    from gvrt_tpu.hybrid.mesh import MeshScene, _quad, oscillate
    s = MeshScene()
    pos, idx = _quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
    red = Material(base_color=(1.0, 0.0, 0.0, 1.0))
    trs = []
    for i in range(3):
        t = np.eye(4, dtype=np.float32)
        t[0, 3] = 3.0 * i
        trs.append(t)
    objs = s.add_instanced("panel", pos, idx, red, trs, dynamic=True,
                           update=[None, None, oscillate(1, 0.5, 1.0)])
    assert len(objs) == 3
    assert len(s.materials) == 1          # shared material entry
    assert len(np.unique(s.tri_material)) == 1
    assert s.num_tris == 3 * 2
    # instance i's triangles are translated by 3*i in x
    for i, o in enumerate(objs):
        tp = s.tri_pos[o.first_tri:o.first_tri + o.num_tris]
        np.testing.assert_allclose(tp[..., 0].mean(), 3.0 * i, atol=1e-6)
        assert o.name == f"panel.{i}"
    # per-instance animation: only instance 2 moves
    t1 = s.animated(0.25)
    moved = t1.tri_pos[objs[2].first_tri:objs[2].first_tri + 2]
    still = t1.tri_pos[objs[0].first_tri:objs[0].first_tri + 2]
    base2 = s.tri_pos[objs[2].first_tri:objs[2].first_tri + 2]
    assert np.abs(moved[..., 1] - base2[..., 1]).max() > 0.4
    np.testing.assert_array_equal(still,
                                  s.tri_pos[objs[0].first_tri:
                                            objs[0].first_tri + 2])
