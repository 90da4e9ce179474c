"""N3MR benchmark: fwd+bwd at 1024x1024 on small/middle/large meshes.

Mirrors the reference's README NMR table (README.md:78-84: 32.1 / 95.7 /
114.7 ms fwd+bwd at 1024^2 for 280 / 3.3k / 39k-tri meshes on an unstated
GPU — BASELINE.md).  Methodology matches bench.py: rasterize at internal
size 1024 (no AA), grad(sum(rgb)) wrt vertices AND textures, steps chained
on-device via lax.scan so host/tunnel latency is excluded.

Prints one JSON line per mesh row:
  {"metric": "n3mr_fwd_bwd_1024px_<F>faces", "value": ms, "unit": "ms/frame",
   "vs_baseline": speedup}
"""
import json
import time
import functools

import numpy as np

from bench import uv_sphere

BASELINES = {  # faces -> reference ms (README.md:78-84)
    'small': 32.1,
    'middle': 95.7,
    'large': 114.7,
}
IMAGE_SIZE = 1024
TEX_SIZE = 2

# rings/segs chosen to land on the reference's 280 / 3.3k / 39k tri counts
MESHES = {
    'small': (13, 12),    # 2*12*12 = 288
    'middle': (38, 45),   # 2*45*37 = 3,330
    'large': (130, 153),  # 39,474
}


def main():
    from bench import _probe_backend
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.n3mr import rasterize

    for name, (rings, segs) in MESHES.items():
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces)
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        F = fv.shape[1]
        tex = jax.random.uniform(
            jax.random.PRNGKey(0),
            (1, F, TEX_SIZE, TEX_SIZE, TEX_SIZE, 3), jnp.float32)

        def one(x, t):
            img = rasterize(x.reshape(1, F, 3, 3), t,
                            image_size=IMAGE_SIZE, anti_aliasing=False)
            return jnp.sum(img)

        grad_fn = jax.grad(one, argnums=(0, 1))

        @functools.partial(jax.jit, static_argnums=(2,))
        def many(x, t, n):
            # carry-dependent inputs defeat loop-invariant hoisting (see
            # bench.py): the grad must actually run n times
            def body(c, _):
                gf, gt = grad_fn(x * (1.0 + c), t)
                return c + (gf[0, 0, 0] + gt[0, 0, 0, 0, 0, 0]) * 1e-32, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        n1, n2 = 2, 12
        assert np.isfinite(float(many(fv, tex, n1))), 'non-finite gradients'
        float(many(fv, tex, n2))

        # two-point timing cancels constant dispatch/tunnel overhead
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            float(many(fv, tex, n1))
            t1 = time.time()
            float(many(fv, tex, n2))
            t2 = time.time()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)

        base = BASELINES[name]
        print(json.dumps({
            'metric': f'n3mr_fwd_bwd_{IMAGE_SIZE}px_{F}faces',
            'value': round(best, 2),
            'unit': 'ms/frame',
            'vs_baseline': round(base / best, 3),
        }))


if __name__ == '__main__':
    main()
