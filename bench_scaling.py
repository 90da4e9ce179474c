"""Scaling-efficiency benchmark: pixels/s (rasterizer) and rays/s (NeRF)
across device-mesh sizes.

On a real multi-chip slice this measures ICI scaling (BASELINE.md target:
>= 80% efficiency 1 chip -> 1 host -> N hosts).  On a single chip / CPU it
still validates the sharded code paths and prints per-size throughput.

Usage: python bench_scaling.py [--devices 1 2 4 8] [--cpu]
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--devices', type=int, nargs='*', default=None)
    parser.add_argument('--cpu', action='store_true',
                        help='force a virtual 8-device CPU mesh')
    parser.add_argument('--image-size', type=int, default=256)
    parser.add_argument('--rays', type=int, default=4096)
    args = parser.parse_args()

    if args.cpu:
        import os
        os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
            ' --xla_force_host_platform_device_count=8'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    else:
        from bench import _probe_backend
        _probe_backend()
    import jax
    import jax.numpy as jnp
    import optax

    from jrender_tpu.parallel import (make_device_mesh, shard_batch,
                                      soft_rasterize_sharded,
                                      make_sharded_nerf_step, shard_nerf_params)
    from jrender_tpu.ops.softras import make_params
    from jrender_tpu.nerf.model import init_nerf_params, get_embedder
    from jrender_tpu.nerf.trainer import make_network_query_fn

    n_avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]
    results = {}

    rng = np.random.RandomState(0)
    F = 1024
    is_ = args.image_size
    spread = 6.0 / is_
    centers = rng.uniform(-0.9, 0.9, size=(F, 1, 2))
    offs = rng.uniform(-spread, spread, size=(F, 3, 2))
    z = 3.0 + rng.uniform(-0.5, 0.5, size=(F, 3, 1))
    fv = jnp.asarray(np.concatenate([centers + offs, z], -1)
                     .astype(np.float32).reshape(1, F, 9))
    tex = jnp.asarray(rng.uniform(size=(1, F, 3, 3)).astype(np.float32))
    p = make_params(image_size=is_, sigma_val=1e-4, texture_type='vertex')

    from jrender_tpu.parallel.render import soft_rasterize_sharded_vjp

    for n in sizes:
        mesh = make_device_mesh(n_data=n, n_model=1)

        def rloss(f, t):
            return jnp.sum(soft_rasterize_sharded_vjp(f, t, p, mesh))
        gfn = jax.jit(jax.grad(rloss, argnums=(0, 1)))
        with mesh:
            gf, gt = gfn(fv, tex)
            jax.block_until_ready(gf)
            t0 = time.time()
            for _ in range(3):
                gf, gt = gfn(fv, tex)
            jax.block_until_ready(gf)
            dt = (time.time() - t0) / 3
        results[f'rasterize_px_per_s_{n}dev'] = is_ * is_ / dt

    # NeRF rays/s
    embed_fn, input_ch = get_embedder(6)
    embeddirs_fn, input_ch_views = get_embedder(2)
    key = jax.random.PRNGKey(0)
    for n in sizes:
        mesh = make_device_mesh(n_data=n, n_model=1)
        params = {'coarse': shard_nerf_params(
            init_nerf_params(key, D=4, W=128, input_ch=input_ch,
                             input_ch_views=input_ch_views, use_viewdirs=True),
            mesh)}
        optimizer = optax.adam(5e-4)
        opt_state = optimizer.init(params)
        nq = make_network_query_fn(embed_fn, embeddirs_fn, input_ch,
                                   input_ch_views, (4,), True)
        step = make_sharded_nerf_step(optimizer, nq, mesh, N_samples=32)
        N = args.rays
        rays_o = np.zeros((N, 3), np.float32)
        rays_d = rng.randn(N, 3).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        nearfar = np.broadcast_to(np.array([2.0, 6.0], np.float32), (N, 2))
        batch = np.concatenate([rays_o, rays_d, nearfar, rays_d], -1)
        target = rng.rand(N, 3).astype(np.float32)
        with mesh:
            rb = shard_batch(jnp.asarray(batch), mesh)
            tg = shard_batch(jnp.asarray(target), mesh)
            params, opt_state, loss = step(params, opt_state, rb, tg, key)
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state, rb, tg, key)
            jax.block_until_ready(loss)
            dt = (time.time() - t0) / 3
        results[f'nerf_rays_per_s_{n}dev'] = N / dt

    base_px = results.get(f'rasterize_px_per_s_{sizes[0]}dev')
    base_ray = results.get(f'nerf_rays_per_s_{sizes[0]}dev')
    for n in sizes:
        if n == sizes[0]:
            continue
        results[f'rasterize_scaling_eff_{n}dev'] = \
            results[f'rasterize_px_per_s_{n}dev'] / (base_px * n / sizes[0])
        results[f'nerf_scaling_eff_{n}dev'] = \
            results[f'nerf_rays_per_s_{n}dev'] / (base_ray * n / sizes[0])

    out = {k: round(float(v), 2) for k, v in results.items()}
    import os
    plat = 'cpu' if args.cpu else jax.devices()[0].platform
    if plat == 'cpu':
        out['_caveat'] = (
            'virtual CPU mesh on shared host cores: STRUCTURAL validation '
            'only (the shard_map/psum paths compile and run multi-device). '
            'The efficiency rows measure host-core contention, not ICI — '
            'e.g. all 8 virtual devices share ~4 cores, so 8dev "efficiency" '
            'is bounded near 1/n regardless of communication cost.  Real '
            'scaling projections: docs/SCALING_ANALYSIS.md.')
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f'SCALING_{plat}.json'), 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
