"""Time the real px_f fwd kernel with sections ablated (wrong results,
valid timing).  Env: JR_ABLATE=euclid_min, JR_PF_TILE, JR_BIN_MT."""
import sys
import os

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

    verts, faces = uv_sphere(rings=130, segs=153)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    F = fv.shape[1]
    tex_s = jax.random.uniform(jax.random.PRNGKey(0), (1, F, 25, 3))
    tex_v = jax.random.uniform(jax.random.PRNGKey(0), (1, F, 3, 3))

    tag = (f"t={pallas_impl._pf_tile_for(IMAGE_SIZE)} "
           f"ablate={os.environ.get('JR_ABLATE','-')}")
    for tt, tex, dist in [('vertex', tex_v, 'euclidean'),
                          ('vertex', tex_v, 'barycentric'),
                          ('vertex', tex_v, 'hard'),
                          ('surface', tex_s, 'euclidean')]:
        p = make_params(image_size=IMAGE_SIZE, sigma_val=1e-5, gamma_val=1e-4,
                        texture_type=tt, dist_func=dist, grad_mode='topk',
                        max_faces_per_pixel_for_grad=16)

        def fwd(x, t, p=p):
            out, _, _ = pallas_impl.soft_rasterize_fwd_pallas_pf(x, t, p, False)
            return jnp.sum(out)

        print(f'{tag} {tt}/{dist}: {timed(fwd, fv, tex_s if tt=="surface" else tex_v):.2f} ms', flush=True)


if __name__ == '__main__':
    main()
