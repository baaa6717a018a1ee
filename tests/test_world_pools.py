"""Tests for geometry pools (DynamicBuffer analog), the World entity layer,
and runtime helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.app import world as world_mod
from raytracer3_tpu.scene import pools
from raytracer3_tpu.utils import runtime


def tri_mesh():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (3, 1))
    uv = np.zeros((3, 2), np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    geo = np.zeros(1, np.int32)
    return pos, nrm, uv, idx, geo


class TestPool:
    def test_instance_flattening_applies_transform(self):
        p = pools.GeometryPool()
        h = p.add_mesh(*tri_mesh())
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [5, 0, 0]
        p.add_instance(h)
        p.add_instance(h, t)
        flat = p.flatten(pad=False)
        assert flat["positions"].shape[0] == 6
        np.testing.assert_allclose(flat["positions"][3], [5, 0, 0], atol=1e-6)
        assert flat["real_tri_count"] == 2

    def test_padding_power_of_two(self):
        p = pools.GeometryPool()
        h = p.add_mesh(*tri_mesh())
        for _ in range(3):
            p.add_instance(h)
        flat = p.flatten()
        assert flat["positions"].shape[0] == 16  # 9 verts → 16
        assert flat["indices"].shape[0] == 4  # 3 tris → 4
        # Padding triangles are degenerate (all vertex 0).
        np.testing.assert_array_equal(flat["indices"][3], [0, 0, 0])
        assert flat["instance_id"][3] == -1

    def test_version_bumps(self):
        p = pools.GeometryPool()
        h = p.add_mesh(*tri_mesh())
        v0 = p.version
        i = p.add_instance(h)
        assert p.version > v0
        v1 = p.version
        p.set_transform(i, np.eye(4, dtype=np.float32))
        assert p.version > v1
        p.remove_instance(i)
        assert p.instance_count == 0

    def test_normal_transform_nonuniform_scale(self):
        p = pools.GeometryPool()
        h = p.add_mesh(*tri_mesh())
        t = np.diag([2.0, 1.0, 1.0, 1.0]).astype(np.float32)
        p.add_instance(h, t)
        flat = p.flatten(pad=False)
        # normal stays unit and still +z for an in-plane scale
        np.testing.assert_allclose(flat["normals"][0], [0, 0, 1], atol=1e-6)


class TestWorld:
    def test_spawn_render_rebuild(self):
        w = world_mod.World()
        mat = w.add_material(base_color=(1, 0, 0, 1))
        pos, nrm, uv, idx, geo = tri_mesh()
        h = w.add_mesh(pos, nrm, uv, idx, geo + mat)
        e = w.spawn(h, name="tri")
        s1 = w.scene()
        assert s1.num_triangles == 1  # padded cap of 1 is 1
        assert not w.dirty
        # Move the instance → dirty → rebuilt scene differs.
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [0, 0, 3]
        w.set_transform(e, t)
        assert w.dirty
        s2 = w.scene()
        assert float(jnp.max(jnp.abs(s2.positions - s1.positions))) > 1.0

    def test_backend_brute_end_to_end(self):
        from raytracer3_tpu.render import pathtracer
        from raytracer3_tpu.scene import analytic
        from raytracer3_tpu.utils.config import RenderSettings

        w = world_mod.World()
        # Build a world from the Cornell arrays via pool machinery.
        sc = analytic.cornell_box()
        w._materials = dict(
            base_color=list(np.asarray(sc.materials.base_color)),
            emission=list(np.asarray(sc.materials.emission)),
            metallic=list(np.asarray(sc.materials.metallic)),
            roughness=list(np.asarray(sc.materials.roughness)),
        )
        h = w.add_mesh(
            np.asarray(sc.positions), np.asarray(sc.normals),
            np.asarray(sc.uvs), np.asarray(sc.indices), np.asarray(sc.geo_id),
        )
        w.spawn(h)
        scene = w.scene()
        isect, occl = w.backend("brute")
        s = RenderSettings(width=8, height=8, bounces=2, samples=1, diffuse_only=True)
        img = pathtracer.render_image(scene, analytic.default_camera(), s, 0, isect, occl)
        assert np.isfinite(np.asarray(img)).all()
        assert float(img.max()) > 0

    def test_despawn(self):
        w = world_mod.World()
        w.add_material()
        h = w.add_mesh(*tri_mesh())
        e1 = w.spawn(h)
        e2 = w.spawn(h)
        w.despawn(e1)
        flat = w.pool.flatten(pad=False)
        assert flat["real_tri_count"] == 1


class TestRuntime:
    def test_device_info(self):
        i = runtime.device_info()
        assert i.platform == "cpu"
        assert i.num_devices == 8

    def test_describe(self):
        assert "cpu" in runtime.describe()

    def test_compile_cache_init(self, tmp_path):
        d = runtime.init_compilation_cache(str(tmp_path / "xla"))
        assert jax.config.jax_compilation_cache_dir == d
