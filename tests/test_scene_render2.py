"""Scene graph + deferred pipeline + screen-space effects tests (CPU)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jrender_tpu.scene import Scene, Render, Light, Texture, obj
from jrender_tpu.ops import image as I
from jrender_tpu.ops.voxelize import voxelization


def make_test_scene(tmp_path):
    """A floor plane + a box-ish quad, via the Scene OBJ loader."""
    objf = tmp_path / 'scene.obj'
    mtlf = tmp_path / 'scene.mtl'
    objf.write_text("""mtllib scene.mtl
v -2 -0.5 -2
v 2 -0.5 -2
v 2 -0.5 2
v -2 -0.5 2
v -0.4 -0.5 -0.4
v 0.4 -0.5 -0.4
v 0.4 0.4 -0.4
v -0.4 0.4 -0.4
usemtl floor
f 1 2 3
f 1 3 4
usemtl cube
f 5 6 7
f 5 7 8
""")
    mtlf.write_text("""newmtl floor
Kd 0.7 0.7 0.7
newmtl cube
Kd 0.8 0.2 0.2
""")
    return Scene.load_scene_from_obj(str(objf))


class TestSceneGraph:
    def test_load_scene(self, tmp_path):
        scene = make_test_scene(tmp_path)
        assert len(scene.objects) == 2
        assert set(scene.name_dic.keys()) == {'floor', 'cube'}
        assert scene.objects[0].face_vertices.shape[1:] == (3, 3)

    def test_mrt_concat(self, tmp_path):
        scene = make_test_scene(tmp_path)
        mrt = scene.MRT
        nf = sum(o.face_vertices.shape[0] for o in scene.objects)
        assert mrt.worldcoords.shape == (nf, 3, 3)
        assert mrt.normals.shape == (nf, 3, 3)
        assert mrt.metallic_roughness.shape == (nf, 3, 3)

    def test_deferred_render_blinn_phong(self, tmp_path):
        scene = make_test_scene(tmp_path)
        scene.append_light(Light(position=[0, 3, -3], direction=[0, -0.7, 0.7],
                                 type='directional', intensity=0.8, shadow=True,
                                 viewing_scale=3.0))
        scene.append_light(Light(type='ambient', intensity=0.3, shadow=False))
        render = Render(image_size=64, camera_mode='look',
                        eye=[0, 1.0, -3.0], camera_direction=[0, -0.25, 1.0])
        scene.set_render(render)
        img = scene.deferred_render(shading='blinn_phong')
        img = np.asarray(img)
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.05  # something lit

    def test_deferred_render_cook_torrance(self, tmp_path):
        scene = make_test_scene(tmp_path)
        scene.append_light(Light(position=[0, 3, -3], direction=[0, -0.7, 0.7],
                                 type='point', intensity=1.0, shadow=False))
        render = Render(image_size=32, camera_mode='look',
                        eye=[0, 1.0, -3.0], camera_direction=[0, -0.25, 1.0])
        scene.set_render(render)
        img = np.asarray(scene.deferred_render(shading='Cook_Torrance'))
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()

    def test_shadow_darkens(self, tmp_path):
        """With the light behind the cube, floor pixels in the shadow frustum
        must be darker than with shadows off."""
        def render_scene(shadow):
            scene = make_test_scene(tmp_path)
            scene.append_light(Light(position=[0, 2.0, -2.0],
                                     direction=[0, -0.7, 0.7], type='point',
                                     intensity=1.0, shadow=shadow))
            render = Render(image_size=64, camera_mode='look',
                            eye=[0, 1.5, -3.0], camera_direction=[0, -0.4, 1.0])
            scene.set_render(render)
            return np.asarray(scene.deferred_render(shading='blinn_phong'))

        with_shadow = render_scene(True)
        without = render_scene(False)
        assert with_shadow.sum() <= without.sum() + 1e-3


class TestImageOps:
    def test_sample2D_bilinear(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        uv = jnp.asarray([[[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]])
        v = np.asarray(I.sample2D(img, uv))
        assert v[0, 0] == 0.0 and v[0, 1] == 15.0
        assert v[0, 2] == 999999  # out of range -> default

    def test_conv_mean(self):
        x = jnp.ones((8, 8))
        w = jnp.ones((3, 3)) / 9
        y = np.asarray(I.conv_for_image(x, w, 0))
        np.testing.assert_allclose(y[4, 4], 1.0, atol=1e-6)
        assert y[0, 0] < 1.0  # zero padding at borders

    def test_sat_region_mean(self):
        img = jnp.ones((16, 16))
        sat = I.generate_SAT(img)
        assert float(sat[-1, -1]) == 256.0

    def test_fxaa_smooths_edge(self):
        img = np.zeros((32, 32, 3), np.float32)
        img[:, 16:] = 1.0
        out = np.asarray(I.FXAA(jnp.asarray(img)))
        assert np.isfinite(out).all()
        # edge columns get blended values
        assert ((out > 0.01) & (out < 0.99)).any()

    def test_ssao_occludes_corner(self):
        is_ = 32
        depth = np.full((is_, is_), 5.0, np.float32)
        # a step: right half much closer -> pixels at the base see occlusion
        depth[:, 16:] = 2.0
        normals = np.zeros((is_, is_, 3), np.float32)
        normals[..., 2] = -1.0
        fi = np.zeros((is_, is_), np.int32)
        occ = np.asarray(I.SSAO(jnp.asarray(depth), jnp.asarray(fi),
                                jnp.asarray(normals), width=0.5,
                                sample_num=64, sample_range_r=2.0,
                                key=jax.random.PRNGKey(0)))
        assert occ.shape == (is_, is_)
        assert occ.max() > 0.0 and occ.min() >= 0.0

    def test_ssdo_bounces_occluder_color(self):
        """SSDO gathers bounce color from occluders: a red near wall must
        bleed red onto the deeper floor next to it, strongest at the base,
        never invent other channels, and leave background pixels alone."""
        is_ = 32
        depth = np.full((is_, is_), 5.0, np.float32)
        depth[:, 16:] = 2.0  # right half steps toward the camera
        normals = np.zeros((is_, is_, 3), np.float32)
        normals[..., 2] = -1.0
        fi = np.zeros((is_, is_), np.int32)
        fi[:, :2] = -1  # background strip
        color = np.zeros((is_, is_, 3), np.float32)
        color[:, 16:, 0] = 1.0  # the occluding step is pure red
        out = np.asarray(I.SSDO(jnp.asarray(color), jnp.asarray(depth),
                                jnp.asarray(fi), jnp.asarray(normals),
                                width=0.5, sample_num=128,
                                sample_range_r=2.0,
                                key=jax.random.PRNGKey(0)))
        assert np.isfinite(out).all()
        bounce = out - color
        # the only scene color is red: bounce must not invent green/blue
        assert bounce[..., 1:].max() <= 1e-6
        near = bounce[:, 12:16, 0]  # floor columns at the base of the step
        far = bounce[:, 2:6, 0]     # open floor far from the step
        assert near.max() > 0.01
        assert near.mean() > far.mean()
        # background pixels (faces_ind < 0) pass through unchanged
        np.testing.assert_array_equal(out[:, :2], color[:, :2])

    def test_gaussian_blur_smooths(self):
        img = np.zeros((16, 16), np.float32)
        img[8, 8] = 1.0
        mod = np.ones((16, 16), np.float32)
        out = np.asarray(I.gaussian_blur(jnp.asarray(img), 7, 4.0,
                                         jnp.asarray(mod), dim=1))
        # reference semantics: pixels whose center value is 0 stay 0
        # (gaussian_blur.py flag check); the lit pixel gets a blurred value
        assert out[8, 7] == 0 and out[8, 9] == 0
        assert 0 < out[8, 8] <= 1.5

    def test_stretch_map(self):
        w = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        su, sv = I.compute_stretch_map(jnp.asarray(w))
        assert su.shape == (8, 8) and sv.shape == (8, 8)
        assert np.isfinite(np.asarray(su)[:, :-1]).all()


class TestVoxelize:
    def test_voxelize_cube(self):
        # a closed axis-aligned cube mesh, voxelized at 16^3
        lo, hi = 0.25, 0.75
        corners = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                            for z in (lo, hi)], np.float32)
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        tris = []
        for a, b, c, d in quads:
            tris += [[a, b, c], [a, c, d]]
        fv = corners[np.asarray(tris)][None]  # [1,12,3,3]
        vox = np.asarray(voxelization(jnp.asarray(fv), 16, normalize=False))
        assert vox.shape == (1, 16, 16, 16)
        # interior of the cube is filled (flood fill keeps inside)
        assert vox[0, 8, 8, 8] == 1
        # far corner outside is empty
        assert vox[0, 1, 1, 1] == 0
        # reasonable volume: at least the solid cube's voxels
        assert vox.sum() >= 7 ** 3

    def test_mesh_voxelize_api(self):
        from jrender_tpu.structures import Mesh
        verts = np.array([[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
        m = Mesh(verts, faces)
        vox = m.voxelize(16)
        assert np.asarray(vox).shape == (1, 16, 16, 16)


def _mirror_floor_scene(is_=64, width=0.5):
    """Synthetic G-buffers shared by the SSR/SSSR tests: a mirror floor at
    y=-1 (bottom half) and a bright red wall at z=5, camera looking +z.
    Returns (world, normals, color, faces_ind, ssr_faces, is_floor)."""
    ys, xs = np.meshgrid(np.arange(is_), np.arange(is_), indexing='ij')
    xi = (2 * xs + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys) + 1 - is_) / is_
    # floor: y = -1 -> depth where yi*width*z = -1 -> z = -1/(yi*width)
    floor_z = np.where(yi < -0.05, -1.0 / (yi * width), 100.0)
    wall_z = np.full_like(floor_z, 5.0)
    depth = np.where(floor_z < wall_z, floor_z, wall_z).astype(np.float32)
    is_floor = floor_z < wall_z
    world = np.stack([xi * width * depth, yi * width * depth, depth], -1)
    normals = np.where(is_floor[..., None],
                       np.array([0, 1.0, 0], np.float32),
                       np.array([0, 0, -1.0], np.float32)).astype(np.float32)
    color = np.where(is_floor[..., None],
                     np.array([0.1, 0.1, 0.1], np.float32),
                     np.array([0.9, 0.1, 0.1], np.float32)).astype(np.float32)
    faces_ind = np.where(is_floor, 0, 1000).astype(np.int32)
    ssr_faces = np.array([0, 500], np.int32)  # floor faces reflective
    return world, normals, color, faces_ind, ssr_faces, is_floor



class TestSSR:
    def test_mirror_floor_reflects(self):
        """Synthetic G-buffers: flat mirror floor + a bright wall; SSR must
        add reflected wall color onto floor pixels."""
        width = 0.5
        world, normals, color, faces_ind, ssr_faces, is_floor = \
            _mirror_floor_scene(width=width)

        out = np.asarray(I.SSR(jnp.asarray(color), jnp.asarray(world),
                               jnp.asarray(normals), jnp.asarray(faces_ind),
                               ssr_faces, width, far=100.0, max_steps=128))
        gained = (out - color)[is_floor]
        assert gained.max() > 0.2  # some floor pixel picked up the red wall

    def test_hiz_matches_naive_hits(self):
        """The mipmap-accelerated variant (SSR_cuda.py:260) must find the
        same reflections as the naive DDA march on the mirror-floor scene:
        hits only on the floor, strongly overlapping the naive hit set."""
        width = 0.5
        world, normals, color, faces_ind, ssr_faces, is_floor = \
            _mirror_floor_scene(width=width)

        # thickness 0.5: the scene's depth step per marched pixel (~0.2 at
        # the wall) must fit inside hiz's (z+pixel_bias, z+thickness] window
        naive = np.asarray(I.SSR(jnp.asarray(color), jnp.asarray(world),
                                 jnp.asarray(normals), jnp.asarray(faces_ind),
                                 ssr_faces, width, far=100.0, max_steps=256,
                                 world_thickness=0.5))
        hiz = np.asarray(I.SSR_hiz(jnp.asarray(color), jnp.asarray(world),
                                   jnp.asarray(normals),
                                   jnp.asarray(faces_ind), ssr_faces, width,
                                   far=100.0, max_steps=128,
                                   world_thickness=0.5))
        hits_naive = np.any(naive != color, axis=-1)
        hits_hiz = np.any(hiz != color, axis=-1)
        # reflections only appear on the reflective floor
        assert not hits_hiz[~is_floor].any()
        assert hits_hiz.sum() > 0
        # the two marches agree on the bulk of the hit set (edge pixels may
        # differ: hiz uses the reference's 0.04 pixel_bias, naive none)
        inter = (hits_naive & hits_hiz).sum()
        assert inter >= 0.5 * max(hits_naive.sum(), 1)
        # hi-z hits picked up the red wall color
        assert (hiz - color)[..., 0][hits_hiz].max() > 0.2


class TestSSSR:
    def test_zero_roughness_equals_mirror(self):
        """At roughness=0 the GGX half-vector collapses to the normal, so
        every stochastic sample marches the exact mirror ray: SSSR's bounce
        must equal the naive SSR gain at reflect_strength=1."""
        is_ = 64
        width = 0.5
        world, normals, color, faces_ind, ssr_faces, is_floor = \
            _mirror_floor_scene(is_=is_, width=width)
        rough = np.zeros((is_, is_, 1), np.float32)

        bounce = np.asarray(I.SSSR(jnp.asarray(color), jnp.asarray(world),
                                   jnp.asarray(normals), jnp.asarray(rough),
                                   jnp.asarray(faces_ind), ssr_faces, width,
                                   far=100.0, spp=2, max_steps=128))
        mirror = np.asarray(I.SSR(jnp.asarray(color), jnp.asarray(world),
                                  jnp.asarray(normals),
                                  jnp.asarray(faces_ind), ssr_faces, width,
                                  far=100.0, max_steps=128,
                                  reflect_strength=1.0))
        gain = mirror - color
        assert np.abs(bounce).max() > 0.2  # real reflected signal
        # near-exact agreement; knife-edge hit pixels may flip (cos_t has a
        # 1e-9 regularizer), allow <1% of pixels to differ
        diff = np.abs(bounce - gain).max(-1)
        assert (diff > 1e-3).mean() < 0.01


class TestSSS:
    def test_sss_texture_space_diffusion(self):
        """with_SSS meshes get texture-space blurred lighting baked in:
        the SSS pipeline (UV rasterize -> stretch maps -> 3 cumulative
        gaussians -> re-bake) must produce finite per-face textures of the
        right shape that differ from plain Lambert baking."""
        import jax.numpy as jnp
        from jrender_tpu.structures import Mesh
        from jrender_tpu.lighting import Lighting

        # two triangles with a simple UV atlas
        verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.5, 0],
                          [0.6, -0.5, 0], [1.0, 0.5, 0]], np.float32)
        faces = np.array([[0, 1, 2], [1, 3, 4]], np.int32)
        uv = np.array([[[0.1, 0.1], [0.45, 0.1], [0.25, 0.45]],
                       [[0.55, 0.1], [0.9, 0.1], [0.7, 0.45]]], np.float32)
        R = 4
        mesh = Mesh(verts, faces, texture_res=R, texture_type='surface',
                    with_SSS=True, face_texcoords=uv)
        mesh.textures = jnp.full((1, 2, R * R, 3), 0.6)

        lighting = Lighting(light_mode='surface', intensity_ambient=0.4,
                            intensity_directionals=0.6, directions=[0, 0, -1])
        out = lighting(mesh, eyes=[0, 0, -3])
        tex = np.asarray(out.textures)
        assert tex.shape == (1, 2, R * R, 3)
        assert np.isfinite(tex).all()
        assert tex.min() >= 0.0 and tex.max() <= 1.0
        assert tex.max() > 0.0  # something was baked


class TestSSRNoTruncation:
    def test_default_max_steps_never_truncates(self):
        """The reference marches reflections to the screen edge
        (SSR_cuda.py:100+); this port caps the DDA at max_steps.  On the
        mirror-floor scene the DEFAULT cap must already find every
        reflection the uncapped march finds: quadrupling max_steps must
        not change a single pixel."""
        width = 0.5
        world, normals, color, faces_ind, ssr_faces, is_floor = \
            _mirror_floor_scene(width=width)
        args = (jnp.asarray(color), jnp.asarray(world),
                jnp.asarray(normals), jnp.asarray(faces_ind), ssr_faces,
                width)
        out_default = np.asarray(I.SSR(*args, far=100.0))   # max_steps=256
        out_long = np.asarray(I.SSR(*args, far=100.0, max_steps=1024))
        np.testing.assert_array_equal(out_default, out_long)
        # and the reflection actually exists (the assertion is not vacuous)
        assert (out_default - color)[is_floor].max() > 0.2


class TestDegenerateMeshNormals:
    def test_f32_normals_survive_degenerate_faces(self):
        """The reference upcasts the normal cross product to float64
        (jrender/structures/mesh.py:219-221); TPUs have no f64, so the
        f32 path guards normalization with eps.  Near-zero-area slivers
        must keep direction and unit length; exactly-degenerate faces
        must produce finite (zero) normals, never NaN."""
        from jrender_tpu.structures import Mesh
        s = 3e-6   # sliver extent: area ~ 4.5e-12, squared-norm ~ 1e-23
        verts = np.array([
            [0, 0, 0], [s, 0, 0], [0, s, 0],        # tiny but valid (+z)
            [1, 1, 1], [1, 1, 1], [1, 1, 1],        # exactly degenerate
            [0, 0, 0], [1, 0, 0], [0, 1, 0],        # normal-size (+z)
        ], np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
        m = Mesh(verts[None], faces)
        n = np.asarray(m.surface_normals)[0]
        assert np.isfinite(n).all()
        # healthy faces: unit normals pointing +z (reference orientation)
        for i in (0, 2):
            np.testing.assert_allclose(np.linalg.norm(n[i]), 1.0, atol=1e-3)
            assert n[i, 2] > 0.99
        # vertex normals (segment-summed) must also stay finite
        vn = np.asarray(m.vertex_normals)
        assert np.isfinite(vn).all()
