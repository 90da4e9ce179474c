"""Golden-image parity for demos 1/2/4/5/6 against outputs SHIPPED BY
THE REFERENCE repo (data/results/*, committed by the jrender authors
from their CUDA runs) — cross-implementation parity, not
self-consistency.

demo1's rotation goldens are covered in test_renderer_golden; the
sigma/gamma blur sweep (bluring.gif) and the demo4 texture-optimization
convergence golden live here.  demo3 (specular) has NO shipped
artifact: it writes rotation.gif/bluring.gif to the same paths as
demo1, and the shipped files are numerically demo1's plain renders
(verified: plain render matches rotation.gif frame 0 at 3e-4 mean abs
diff vs 6.6e-3 for the metallic=0.5/roughness=0.4 specular render) —
demo3's Cook-Torrance path is instead covered by the demo5/6 PBR
goldens below, which exercise the same specular chain.
"""
import os

import numpy as np
import imageio.v2 as imageio
import jax.numpy as jnp
import pytest

import jrender_tpu as jr

REF = '/root/reference'
RESULTS = os.path.join(REF, 'data/results')


def _gif_frame0(path):
    return imageio.mimread(path, memtest=False)[0]


@pytest.mark.skipif(not os.path.exists(RESULTS), reason='no reference data')
class TestDemoGoldens:

    def test_demo2_initial_silhouette(self):
        """deform_00000.png is the silhouette of the half-scaled sphere
        template from camera 0, saved before the first optimizer update
        (demo2-deform.py:85-99)."""
        golden = imageio.imread(
            os.path.join(RESULTS, 'output_deform/deform_00000.png'))
        golden = golden.astype(np.float32) / 255.0

        mesh = jr.Mesh.from_obj(
            os.path.join(REF, 'data/obj/sphere/sphere_1352.obj'),
            dr_type='softras')
        cameras = np.load(os.path.join(REF, 'data/camera.npy')).astype(
            np.float32)
        r = jr.Renderer(image_size=64, sigma_val=1e-4, aggr_func_rgb='hard',
                        camera_mode='look_at', viewing_angle=15,
                        dr_type='softras')
        r.transform.set_eyes_from_angles(cameras[0, 0], cameras[0, 1],
                                         cameras[0, 2])
        sil = r.render_mesh(jr.Mesh(mesh.vertices * 0.5, mesh.faces),
                            mode='silhouettes')
        sil = np.asarray(sil)[0]
        assert sil.shape == golden.shape
        diff = np.abs(sil - golden)
        # soft silhouette edges quantized to u8: tight mean, bounded edges
        assert diff.mean() < 2e-3, f'mean diff {diff.mean():.5f}'
        assert (diff > 0.1).mean() < 0.01

    def _pbr_initial_frame(self, metallic, roughness, golden_gif,
                           optimize=None, ref_png=None, **renderer_kw):
        """Render the demo5/6 init (optionally replaying the reference's
        single pre-save Adam step, lr=0.1 betas=(0.5,0.999)) and return
        the abs diff vs the shipped gif's first frame."""
        import jax
        import optax
        golden = _gif_frame0(os.path.join(RESULTS, golden_gif))
        golden = golden[..., :3].astype(np.float32) / 255.0

        ts = 4
        mesh = jr.Mesh.from_obj(
            os.path.join(REF, 'data/obj/spot/spot_triangulated.obj'),
            texture_res=ts, load_texture=True, dr_type='softras')
        F = mesh.faces.shape[1]
        met = jnp.full((1, F, ts * ts, 1), metallic, jnp.float32)
        rough = jnp.full((1, F, ts * ts, 1), roughness, jnp.float32)
        r = jr.Renderer(dr_type='softras', **renderer_kw)
        r.transform.set_eyes_from_angles(2.732, 30, 140)

        def render(m, rg):
            return r.execute(mesh.vertices, mesh.faces, mesh.textures,
                             metallic_textures=m, roughness_textures=rg)

        if optimize is not None:
            ref = imageio.imread(os.path.join(REF, 'data/ref', ref_png))
            ref = jnp.asarray(ref[..., :3].astype(np.float32) / 255.0
                              ).transpose(2, 0, 1)[None]

            def loss_fn(v):
                m, rg = (v, rough) if optimize == 'metallic' else (met, v)
                img = render(m, rg)
                return jnp.sum((img[:, :3] - ref) ** 2)

            v0 = met if optimize == 'metallic' else rough
            opt = optax.adam(0.1, b1=0.5, b2=0.999)
            s = opt.init(v0)
            gv = jax.grad(loss_fn)(v0)
            up, s = opt.update(gv, s, v0)
            v1 = optax.apply_updates(v0, up)
            met, rough = (v1, rough) if optimize == 'metallic' else (met, v1)

        img = render(met, rough)
        img = np.asarray(img)[0, :3].transpose(1, 2, 0)
        assert img.shape == golden.shape
        return np.abs(np.clip(img, 0, 1) - golden)

    def test_demo5_initial_frame(self):
        """metallic=0, roughness=0.5 spot from azimuth 140
        (demo5-optim_metallic_textures.py:24-38); the shipped gif's first
        frame is saved after ONE Adam step, replayed here."""
        diff = self._pbr_initial_frame(
            0.0, 0.5, 'output_optim_metallic_textures/result.gif',
            optimize='metallic', ref_png='ref_metallic.png',
            light_intensity_directionals=1.0, light_intensity_ambient=0.0)
        assert diff.mean() < 5e-3, f'mean diff {diff.mean():.5f}'

    def test_demo6_initial_frame(self):
        """metallic=0.4, roughness=1 (demo6-optim_roughness_textures.py:
        29-31); roughness's first step is visually negligible."""
        diff = self._pbr_initial_frame(
            0.4, 1.0, 'output_optim_roughness_textures/result.gif')
        assert diff.mean() < 5e-3, f'mean diff {diff.mean():.5f}'

    @pytest.mark.parametrize('frame', [0, 5, 9])
    def test_demo1_blur_sweep(self, frame):
        """bluring.gif sweeps gamma 10^-4 -> 10^-2.2 with sigma =
        gamma/10 (demo1-render.py:50-60): the soft-aggregation blur at
        azimuth 45.  Covers set_sigma/set_gamma and the softmax
        temperature chain at values far from the defaults."""
        golden = imageio.mimread(
            os.path.join(RESULTS, 'output_render/bluring.gif'),
            memtest=False)
        mesh = jr.Mesh.from_obj(
            os.path.join(REF, 'data/obj/spot/spot_triangulated.obj'),
            load_texture=True, texture_res=5, texture_type='surface',
            dr_type='softras')
        r = jr.Renderer(dr_type='softras', backend='jax')
        r.transform.set_eyes_from_angles(2.732, 30, 45)
        gp = -4 + 0.2 * frame
        r.set_gamma(10 ** gp)
        r.set_sigma(10 ** (gp - 1))
        mesh.reset_()
        rgb = r.render_mesh(mesh, mode='rgb')
        ours = np.asarray(rgb)[0].transpose(1, 2, 0)
        ref = np.asarray(golden[frame])[..., :3].astype(np.float32) / 255.0
        diff = np.abs(np.clip(ours, 0, 1) - ref)
        assert diff.mean() < 5e-3, f'mean diff {diff.mean():.5f}'

    def test_demo4_texture_optimization_converges_to_golden(self):
        """demo4 optimizes 3-D n3mr textures so every random-azimuth
        render matches data/ref/ref_texture.png (demo4-optim_textures.py
        :19-69); the shipped result.gif frame 0 is the azimuth-0 render
        of the CONVERGED textures.  Replaying a shortened optimization
        (120 Adam steps vs the reference's 1000) must land within 5e-3
        mean abs diff of the reference's converged frame — the target
        image determines the fixed point, so cross-implementation
        gradient errors would show up as a different fixed point."""
        import jax
        import optax
        import jax.numpy as jnp
        golden = _gif_frame0(
            os.path.join(RESULTS, 'output_optim_textures/result.gif'))
        golden = golden[..., :3].astype(np.float32) / 255.0

        mesh = jr.Mesh.from_obj(
            os.path.join(REF, 'data/obj/spot/spot_triangulated.obj'),
            dr_type='n3mr', load_texture=True)
        verts = mesh.vertices * 0.6
        faces = mesh.faces
        F = faces.shape[1]
        ts = 4
        tex0 = jnp.ones((1, F, ts, ts, ts, 3), jnp.float32)
        img_ref = imageio.imread(
            os.path.join(REF, 'data/ref/ref_texture.png'))
        img_ref = jnp.asarray(img_ref.astype(np.float32) / 255.0
                              ).transpose(2, 0, 1)[None]
        r = jr.Renderer(camera_mode='look_at', perspective=False,
                        light_intensity_directionals=0.0,
                        light_intensity_ambient=1.0, dr_type='n3mr')
        rng = np.random.RandomState(1)

        def loss_fn(tex, az):
            r.transform.set_eyes_from_angles(2.732, 0, az)
            img = r.execute(verts, faces, jnp.tanh(tex))
            return jnp.sum((img - img_ref) ** 2)

        g = jax.jit(jax.value_and_grad(loss_fn))
        opt = optax.adam(0.03, b1=0.5, b2=0.999)
        s = opt.init(tex0)
        tex = tex0
        for _ in range(120):
            _, gr = g(tex, rng.uniform(0, 360))
            up, s = opt.update(gr, s, tex)
            tex = optax.apply_updates(tex, up)
        r.transform.set_eyes_from_angles(2.732, 0, 0)
        img = r.execute(verts, faces, jnp.tanh(tex))
        ours = np.asarray(img)[0, :3].transpose(1, 2, 0)
        diff = np.abs(np.clip(ours, 0, 1) - golden)
        init = np.asarray(r.execute(verts, faces, jnp.tanh(tex0))
                          )[0, :3].transpose(1, 2, 0)
        init_diff = np.abs(np.clip(init, 0, 1) - golden).mean()
        assert diff.mean() < 5e-3, f'mean diff {diff.mean():.5f}'
        assert diff.mean() < init_diff / 3  # real convergence, not slack
