"""Volume-rendering stack + NeRF trainer tests (CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jrender_tpu.vol import sample, sample_pdf, integrator, render_rays, render
from jrender_tpu.vol.camera import pinhole_get_rays, ndc_rays
from jrender_tpu.nerf import get_embedder, NeRF, init_nerf_params, nerf_apply
from jrender_tpu.nerf.model import img2mse, mse2psnr


class TestEmbedder:
    def test_shapes_and_values(self):
        embed, out_dim = get_embedder(multires=4)
        assert out_dim == 3 + 4 * 2 * 3
        x = jnp.asarray([[0.5, 0.0, -0.25]])
        e = embed(x)
        assert e.shape == (1, out_dim)
        np.testing.assert_allclose(np.asarray(e[0, :3]), [0.5, 0.0, -0.25])
        # first sin block is sin(2^0 * x)
        np.testing.assert_allclose(np.asarray(e[0, 3:6]), np.sin([0.5, 0, -0.25]),
                                   atol=1e-6)

    def test_identity(self):
        embed, out_dim = get_embedder(multires=4, i=-1)
        assert out_dim == 3
        x = jnp.ones((2, 3))
        np.testing.assert_array_equal(np.asarray(embed(x)), np.ones((2, 3)))


class TestIntegrator:
    def test_opaque_surface(self):
        # one huge density at sample 2 -> ray color = that sample's rgb
        N_rays, N_samples = 4, 8
        raw = np.zeros((N_rays, N_samples, 4), np.float32)
        raw[:, 2, 3] = 1e8          # sigma
        raw[:, :, :3] = -10.0       # sigmoid -> ~0
        raw[:, 2, 0] = 10.0         # red at the opaque sample
        z_vals = np.broadcast_to(np.linspace(2, 6, N_samples, dtype=np.float32),
                                 (N_rays, N_samples))
        rays_d = np.broadcast_to(np.array([0, 0, 1], np.float32), (N_rays, 3))
        rgb, disp, acc, weights, depth = integrator(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
        np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb)[:, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(depth), z_vals[:, 2], atol=1e-4)

    def test_empty_space_white_bkgd(self):
        raw = np.zeros((2, 4, 4), np.float32)
        raw[..., 3] = -100.0  # no density
        z_vals = np.broadcast_to(np.linspace(2, 6, 4, dtype=np.float32), (2, 4))
        rays_d = np.broadcast_to(np.array([0, 0, 1], np.float32), (2, 3))
        rgb, disp, acc, w, d = integrator(jnp.asarray(raw), jnp.asarray(z_vals),
                                          jnp.asarray(rays_d), white_bkgd=True)
        np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)


class TestSampling:
    def test_stratified_bounds(self):
        near = jnp.full((8, 1), 2.0)
        far = jnp.full((8, 1), 6.0)
        z = sample(8, 16, False, 1.0, near, far, key=jax.random.PRNGKey(0))
        z = np.asarray(z)
        assert z.shape == (8, 16)
        assert (z >= 2.0 - 1e-5).all() and (z <= 6.0 + 1e-5).all()
        assert (np.diff(z, axis=-1) >= 0).all()

    def test_lindisp(self):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 100.0)
        z = np.asarray(sample(1, 3, True, 0.0, near, far))
        np.testing.assert_allclose(z[0], [1.0, 1.0 / 0.505, 100.0], rtol=1e-4)

    def test_sample_pdf_concentrates(self):
        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (4, 9))
        weights = np.zeros((4, 8), np.float32)
        weights[:, 4] = 100.0  # all mass in bin 4 (z in [0.5, 0.625])
        s = np.asarray(sample_pdf(bins, jnp.asarray(weights), 16, det=True))
        frac_in = ((s > 0.49) & (s < 0.64)).mean()
        assert frac_in > 0.8


class TestCameras:
    def test_pinhole_center_ray(self):
        c2w = np.eye(4, dtype=np.float32)
        ro, rd = pinhole_get_rays(5, 5, 10.0, jnp.asarray(c2w))
        # center pixel looks along +z (vol-stack convention)
        d = np.asarray(rd)[2, 2]
        np.testing.assert_allclose(d / np.linalg.norm(d), [ -0.05/np.sqrt(1.005**2-1+1)*0, 0, 1][0:3], atol=0.06)
        assert np.asarray(ro).shape == (5, 5, 3)

    def test_ndc_ray_bounds(self):
        c2w = np.eye(4, dtype=np.float32)
        ro, rd = pinhole_get_rays(8, 8, 8.0, jnp.asarray(c2w))
        # place camera looking down -z like llff: flip
        ro = jnp.asarray(np.asarray(ro) + np.array([0, 0, 1.0], np.float32))
        rd2 = np.asarray(rd).copy()
        rd2[..., 2] = -1.0
        o, d = ndc_rays(8, 8, 8.0, 1.0, ro, jnp.asarray(rd2))
        assert np.isfinite(np.asarray(o)).all()
        assert np.isfinite(np.asarray(d)).all()


class TestModel:
    def test_forward_shapes(self):
        embed, ch = get_embedder(10)
        embed_d, ch_d = get_embedder(4)
        net = NeRF(D=4, W=64, input_ch=ch, input_ch_views=ch_d,
                   use_viewdirs=True, key=jax.random.PRNGKey(0))
        x = jnp.ones((7, ch + ch_d))
        out = net(x)
        assert out.shape == (7, 4)

    def test_no_viewdirs(self):
        net = NeRF(D=2, W=32, input_ch=3, input_ch_views=0, output_ch=4,
                   use_viewdirs=False, key=jax.random.PRNGKey(0))
        out = net(jnp.ones((5, 3)))
        assert out.shape == (5, 4)

    def test_grad_flows(self):
        params = init_nerf_params(jax.random.PRNGKey(0), D=2, W=32, input_ch=3,
                                  input_ch_views=0, use_viewdirs=False)

        def loss(p):
            return jnp.sum(nerf_apply(p, jnp.ones((4, 3)), 3, 0, (4,), False) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_bf16_compute_close_to_f32(self):
        """net_precision=bf16 (bf16 MXU matmuls, f32 params + accumulate)
        must track the f32 forward closely and keep gradients finite."""
        from jrender_tpu.nerf.trainer import make_network_query_fn
        embed_fn, input_ch = get_embedder(10, 0)
        embeddirs_fn, input_ch_views = get_embedder(4, 0)
        params = init_nerf_params(jax.random.PRNGKey(1), 8, 256, input_ch,
                                  input_ch_views, 5, (4,), True)
        mk = lambda dt: make_network_query_fn(  # noqa: E731
            embed_fn, embeddirs_fn, input_ch, input_ch_views, (4,), True,
            netchunk=4096, compute_dtype=dt)
        q32, qbf = mk(None), mk(jnp.bfloat16)

        k = jax.random.PRNGKey(2)
        pts = jax.random.uniform(k, (64, 8, 3), minval=-1.0, maxval=1.0)
        vd = pts[:, 0, :] / jnp.linalg.norm(pts[:, 0, :], axis=-1,
                                            keepdims=True)
        o32 = np.asarray(q32(pts, vd, params))
        obf = np.asarray(qbf(pts, vd, params))
        assert obf.dtype == np.float32  # accumulate/output stays f32
        scale = np.abs(o32).mean() + 1e-6
        assert np.abs(o32 - obf).mean() / scale < 0.02

        def loss(p):
            return jnp.sum(qbf(pts, vd, p) ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


def _toy_scene_query(pts, viewdirs, _net):
    """Analytic density field: a solid ball of radius 0.5 at origin, red."""
    d = jnp.linalg.norm(pts[..., :3], axis=-1)
    sigma = jnp.where(d < 0.5, 50.0, 0.0)
    rgb = jnp.stack([jnp.full_like(sigma, 10.0), jnp.full_like(sigma, -10.0),
                     jnp.full_like(sigma, -10.0)], -1)
    return jnp.concatenate([rgb, sigma[..., None]], -1)


class TestRenderRays:
    def test_toy_ball(self):
        # rays through origin hit the ball; off-center rays miss
        N = 4
        rays_o = np.tile(np.array([0, 0, -3.0], np.float32), (N, 1))
        rays_d = np.array([[0, 0, 1], [0, 0, 1], [1, 0, 3], [2, 0, 1]], np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        near = np.full((N, 1), 0.1, np.float32)
        far = np.full((N, 1), 6.0, np.float32)
        batch = jnp.asarray(np.concatenate([rays_o, rays_d, near, far], -1))
        out = render_rays(batch, None, _toy_scene_query, N_samples=128)
        rgb = np.asarray(out['rgb_map'])
        acc = np.asarray(out['acc_map'])
        assert acc[0] > 0.95 and rgb[0, 0] > 0.9   # hit: red
        assert acc[3] < 0.05                        # miss

    def test_hierarchical(self):
        N = 2
        rays_o = np.tile(np.array([0, 0, -3.0], np.float32), (N, 1))
        rays_d = np.tile(np.array([0, 0, 1.0], np.float32), (N, 1))
        near = np.full((N, 1), 0.1, np.float32)
        far = np.full((N, 1), 6.0, np.float32)
        batch = jnp.asarray(np.concatenate([rays_o, rays_d, near, far], -1))
        out = render_rays(batch, None, _toy_scene_query, N_samples=32,
                          N_importance=64)
        assert 'rgb0' in out
        assert np.asarray(out['acc_map'])[0] > 0.95


class TestTrainerOverfit:
    def test_overfit_single_image(self):
        """End-to-end: tiny NeRF overfits one tiny synthetic view; PSNR rises."""
        from types import SimpleNamespace
        from jrender_tpu.nerf.trainer import create_nerf, make_train_step, make_scan_train
        import optax

        args = SimpleNamespace(
            netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
            N_rand=256, lrate=5e-3, lrate_decay=250, chunk=4096, netchunk=8192,
            no_batching=True, no_reload=True, ft_path=None, N_iters=100,
            N_samples=32, N_importance=0, perturb=1.0, use_viewdirs=False,
            i_embed=0, multires=4, multires_views=2, raw_noise_std=0.0,
            precrop_iters=0, precrop_frac=0.5, dataset_type='blender',
            white_bkgd=False, lindisp=False, no_ndc=True, seed=0,
            basedir='/tmp/nerf_test', expname='t', steps_per_dispatch=10)

        # synthetic target: render the analytic ball from a fixed camera
        H = W = 24
        focal = 24.0
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -3.0
        rgb, _, _, _ = render(H, W, focal, chunk=4096, c2w=jnp.asarray(c2w[:3, :4]),
                              ndc=False, near=0.1, far=6.0,
                              network_fn=None, network_query_fn=_toy_scene_query,
                              N_samples=64)
        target = jnp.asarray(rgb)

        (rk_train, rk_test, start, params, optimizer, opt_state) = create_nerf(args)
        rk_train.pop('ndc', None)
        rk_train.pop('lindisp', None)
        rk_train['lindisp'] = False
        step_fn = make_train_step(optimizer, rk_train, H, W, focal, 0.1, 6.0,
                                  args.N_rand, 0, 0.5, ndc=False)
        scan_train = make_scan_train(step_fn, args.steps_per_dispatch)

        images = target[None]
        poses = jnp.asarray(c2w[None, :3, :4])
        key = jax.random.PRNGKey(0)
        psnr_first = None
        for it in range(10):
            key, sub = jax.random.split(key)
            img_idx = jnp.zeros((args.steps_per_dispatch,), jnp.int32)
            params, opt_state, losses, psnrs = scan_train(
                params, opt_state, images, poses, img_idx, it * 10, sub)
            if psnr_first is None:
                psnr_first = float(psnrs[0])
        psnr_last = float(psnrs[-1])
        assert psnr_last > psnr_first + 3.0, (psnr_first, psnr_last)
        assert psnr_last > 15.0, psnr_last


class TestKerasImport:
    def test_load_weights_from_keras(self):
        """Keras-layout weight import (utils.py:118-145): transposed-to-our
        convention matrices land in the right slots."""
        rng = np.random.RandomState(0)
        D, W = 2, 16
        embed, ch = get_embedder(2)
        embed_d, ch_d = get_embedder(1)
        net = NeRF(D=D, W=W, input_ch=ch, input_ch_views=ch_d,
                   use_viewdirs=True, key=jax.random.PRNGKey(0))
        weights = []
        for i in range(D):
            fan_in = ch if i == 0 else W
            weights += [rng.randn(fan_in, W).astype(np.float32),
                        rng.randn(W).astype(np.float32)]
        weights += [rng.randn(W, W).astype(np.float32), rng.randn(W).astype(np.float32)]      # feature
        weights += [rng.randn(ch_d + W, W // 2).astype(np.float32), rng.randn(W // 2).astype(np.float32)]  # views
        weights += [rng.randn(W // 2, 3).astype(np.float32), rng.randn(3).astype(np.float32)]  # rgb
        weights += [rng.randn(W, 1).astype(np.float32), rng.randn(1).astype(np.float32)]      # alpha
        net.load_weights_from_keras(weights)
        np.testing.assert_allclose(np.asarray(net.params['pts_linears'][0]['w']),
                                   weights[0])
        np.testing.assert_allclose(np.asarray(net.params['alpha_linear']['b']),
                                   weights[-1])
        out = net(jnp.ones((3, ch + ch_d)))
        assert np.isfinite(np.asarray(out)).all()

    def test_keras_import_matches_reference_semantics(self):
        """Cross-implementation check: an independent torch replica of the
        reference module (nerf_helper/utils.py:64-145 — same layer graph,
        same Keras-list indexing, weight.data = transpose(weights[idx]))
        must produce identical outputs from the same Keras-format weight
        list.  No official checkpoint ships with the reference and this
        environment has no network, so the reference's *code* is the
        ground truth for checkpoint layout; this validates ordering AND
        forward semantics (skip concat, relu placement, rgb|alpha order),
        not just slot assignment."""
        import torch
        import torch.nn as tnn

        rng = np.random.RandomState(3)
        D, W, skips = 4, 24, (2,)
        embed, ch = get_embedder(3)
        embed_d, ch_d = get_embedder(2)

        class TorchNeRF(tnn.Module):
            def __init__(self):
                super().__init__()
                self.pts_linears = tnn.ModuleList(
                    [tnn.Linear(ch, W)] +
                    [tnn.Linear(W, W) if i not in skips
                     else tnn.Linear(W + ch, W) for i in range(D - 1)])
                self.views_linears = tnn.ModuleList(
                    [tnn.Linear(ch_d + W, W // 2)])
                self.feature_linear = tnn.Linear(W, W)
                self.alpha_linear = tnn.Linear(W, 1)
                self.rgb_linear = tnn.Linear(W // 2, 3)

            def forward(self, x):
                input_pts, input_views = x[..., :ch], x[..., ch:]
                h = input_pts
                for i, l in enumerate(self.pts_linears):
                    h = torch.relu(l(h))
                    if i in skips:
                        h = torch.cat([input_pts, h], -1)
                alpha = self.alpha_linear(h)
                feature = self.feature_linear(h)
                h = torch.cat([feature, input_views], -1)
                for l in self.views_linears:
                    h = torch.relu(l(h))
                return torch.cat([self.rgb_linear(h), alpha], -1)

            def load_keras(self, ws):
                def put(lin, i):
                    lin.weight.data = torch.from_numpy(
                        np.transpose(ws[i]).copy())
                    lin.bias.data = torch.from_numpy(
                        np.transpose(ws[i + 1]).copy())
                for i in range(D):
                    put(self.pts_linears[i], 2 * i)
                put(self.feature_linear, 2 * D)
                put(self.views_linears[0], 2 * D + 2)
                put(self.rgb_linear, 2 * D + 4)
                put(self.alpha_linear, 2 * D + 6)

        # Keras checkpoint layout: flat [w0, b0, w1, b1, ...] with
        # w [in, out] — exactly what np.load('model.npy') yields.
        weights = []
        for i in range(D):
            fan_in = ch if i == 0 else (W + ch if (i - 1) in skips else W)
            weights += [rng.randn(fan_in, W).astype(np.float32),
                        rng.randn(W).astype(np.float32)]
        weights += [rng.randn(W, W).astype(np.float32),
                    rng.randn(W).astype(np.float32)]
        weights += [rng.randn(ch_d + W, W // 2).astype(np.float32),
                    rng.randn(W // 2).astype(np.float32)]
        weights += [rng.randn(W // 2, 3).astype(np.float32),
                    rng.randn(3).astype(np.float32)]
        weights += [rng.randn(W, 1).astype(np.float32),
                    rng.randn(1).astype(np.float32)]

        ours = NeRF(D=D, W=W, input_ch=ch, input_ch_views=ch_d, skips=skips,
                    use_viewdirs=True, key=jax.random.PRNGKey(0))
        ours.load_weights_from_keras(weights)
        theirs = TorchNeRF()
        theirs.load_keras(weights)

        x = rng.randn(17, ch + ch_d).astype(np.float32)
        got = np.asarray(ours(jnp.asarray(x)))
        want = theirs(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestEmbedDepth:
    def test_embed_depth_forward(self):
        """embed_depth appends z as a 4th embedded coordinate
        (demo7-nerf.py:96-101, rayMarching.py:57): the MLP input channel
        count grows accordingly and the render stays finite."""
        from jrender_tpu.nerf.trainer import make_network_query_fn

        embed_fn, input_ch = get_embedder(4, 0, input_dims=4)
        assert input_ch == 4 + 4 * 2 * 4
        params = init_nerf_params(jax.random.PRNGKey(0), 2, 32, input_ch,
                                  0, 4, (4,), False)
        query = make_network_query_fn(embed_fn, None, input_ch, 0, (4,),
                                      False, netchunk=4096)

        N = 4
        rays_o = np.tile(np.array([0, 0, -3.0], np.float32), (N, 1))
        rays_d = np.tile(np.array([0, 0, 1.0], np.float32), (N, 1))
        near = np.full((N, 1), 0.1, np.float32)
        far = np.full((N, 1), 6.0, np.float32)
        batch = jnp.asarray(np.concatenate([rays_o, rays_d, near, far], -1))
        out = render_rays(batch, params, query, N_samples=16,
                          embed_depth=True)
        assert np.isfinite(np.asarray(out['rgb_map'])).all()
        # without embed_depth the 4-dim embedder must fail on 3-dim pts
        with pytest.raises(Exception):
            render_rays(batch, params, query, N_samples=16,
                        embed_depth=False)


class TestPoseNormalization:
    def test_normalize_pose_radius(self):
        """normalize_pose recenters camera positions and rescales the
        farthest to target_radius (load_blender.py:111-124)."""
        from jrender_tpu.nerf.dataset import normalize_pose
        rng_ = np.random.RandomState(3)
        poses = np.tile(np.eye(4, dtype=np.float64)[None], (10, 1, 1))
        poses[:, :3, 3] = rng_.uniform(-5, 5, (10, 3)) + np.array([7.0, -2, 3])
        out = normalize_pose(poses.copy(), target_radius=2.5)
        pos = out[:, :3, 3]
        np.testing.assert_allclose(pos.mean(0), 0.0, atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(pos, axis=1).max(), 2.5,
                                   rtol=1e-12)
        # rotations untouched
        np.testing.assert_array_equal(out[:, :3, :3], poses[:, :3, :3])
