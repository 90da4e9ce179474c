"""Component-level timing of the px_f SoftRas path on the real chip.

Times, per mesh row: fwd-only, fwd+bwd, and the work-list prep alone,
using the same carry-dependent scan + two-point methodology as bench.py.
"""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend

IMAGE_SIZE = 1024


def timed(fn, *args, n1=2, n2=12):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(len(args),))
    def many(*a):
        *xs, n = a

        def body(c, _):
            r = fn(*[x * (1.0 + c) if i == 0 else x
                     for i, x in enumerate(xs)])
            return c + r * 1e-32, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(many(*args, n1))
    float(many(*args, n2))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(many(*args, n1))
        t1 = time.time()
        float(many(*args, n2))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return best


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras import soft_rasterize
    from jrender_tpu.ops.softras.params import make_params
    from jrender_tpu.ops.softras import pallas_impl

    for name, rings, segs in [('small', 13, 12), ('large', 130, 153)]:
        verts, faces = uv_sphere(rings=rings, segs=segs)
        mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
        v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
        fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
        tex = jax.random.uniform(jax.random.PRNGKey(0),
                                 (1, fv.shape[1], 25, 3))
        F = fv.shape[1]

        def fwd_only(x, t):
            img = soft_rasterize(x, t, image_size=IMAGE_SIZE, sigma_val=1e-5,
                                 gamma_val=1e-4)
            return jnp.sum(img)

        grad_fn = jax.grad(fwd_only, argnums=(0, 1))

        def fwdbwd(x, t):
            gf, gt = grad_fn(x, t)
            return gf[0, 0, 0] + gt[0, 0, 0, 0]

        p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5, gamma_val=1e-4,
                        texture_type='surface', grad_mode='topk',
                        max_faces_per_pixel_for_grad=16)

        cap = max(pallas_impl.PF_FB, min(F, 2048))
        cap = (cap + pallas_impl.PF_FB - 1) // pallas_impl.PF_FB \
            * pallas_impl.PF_FB
        t_edge = pallas_impl._pf_tile_for(IMAGE_SIZE)
        n_tiles = (IMAGE_SIZE // t_edge) ** 2
        w_cap = pallas_impl._work_cap_pf(F, n_tiles, 1)

        def prep_only(x, t):
            out = pallas_impl._prep_work_data_pf(x, t, p, cap, w_cap, None)
            return out[7][6].astype(jnp.float32)[0]  # active flags

        def raw_fwd(x, t):
            out, aggrs, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
                x, t, p, True)
            return jnp.sum(out)

        r = {
            'F': F,
            'w_cap': w_cap,
            'prep_ms': round(timed(prep_only, fv, tex), 2),
            'raw_fwd_ms': round(timed(raw_fwd, fv, tex), 2),
            'api_fwd_ms': round(timed(fwd_only, fv, tex), 2),
            'fwd_bwd_ms': round(timed(fwdbwd, fv, tex), 2),
        }
        print(name, r, flush=True)


if __name__ == '__main__':
    main()
