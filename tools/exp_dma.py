"""Hypothesis test: is the px_f kernel DMA-bound on per-step block swaps?

Variant A: normal.  Variant B: all input index maps constant (block 0) —
wrong results, same compute, no input swaps.  Variant C: B + constant
output block — no output swaps either.
"""
import sys

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend
from tools.profile_softras import timed

IMAGE_SIZE = 1024


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras.params import make_params
    from jrender_tpu.ops.softras import pallas_impl
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    verts, faces = uv_sphere(rings=130, segs=153)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    F = fv.shape[1]
    tex = jax.random.uniform(jax.random.PRNGKey(0), (1, F, 25, 3))
    p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5, gamma_val=1e-4,
                    texture_type='surface', grad_mode='topk',
                    max_faces_per_pixel_for_grad=16)

    def fwd(x, t):
        out, _, _ = pallas_impl.soft_rasterize_fwd_pallas_pf(x, t, p, False)
        return jnp.sum(out)

    print('A normal        :', round(timed(fwd, fv, tex), 2), 'ms', flush=True)

    orig_scal7 = pallas_impl._scal7_spec

    def const_scal7(c, FB):
        return pl.BlockSpec(
            (1, c, FB),
            lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s: (0, 0, 0),
            memory_space=pltpu.VMEM)

    pallas_impl._scal7_spec = const_scal7
    try:
        print('B const inputs  :', round(timed(fwd, fv, tex), 2), 'ms',
              flush=True)
    finally:
        pallas_impl._scal7_spec = orig_scal7


if __name__ == '__main__':
    main()
