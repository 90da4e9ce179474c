"""Capture a jax.profiler trace of the SoftRas fwd+bwd step on TPU."""
import sys
import functools

sys.path.insert(0, '/root/repo')
from bench import uv_sphere, _probe_backend

IMAGE_SIZE = 1024


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras import soft_rasterize

    rings, segs = {"small": (13, 12), "middle": (38, 45), "large": (130, 153)}[sys.argv[1]]
    verts, faces = uv_sphere(rings=rings, segs=segs)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    tex = jax.random.uniform(jax.random.PRNGKey(0), (1, fv.shape[1], 25, 3))

    def one(x, t):
        img = soft_rasterize(x, t, image_size=IMAGE_SIZE, sigma_val=1e-5,
                             gamma_val=1e-4)
        return jnp.sum(img)

    grad_fn = jax.grad(one, argnums=(0, 1))

    @functools.partial(jax.jit, static_argnums=(2,))
    def many(x, t, n):
        def body(c, _):
            gf, gt = grad_fn(x * (1.0 + c), t)
            return c + gf[0, 0, 0] * 1e-32, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(many(fv, tex, 4))  # compile
    with jax.profiler.trace(sys.argv[2]):
        float(many(fv, tex, 4))
    print('trace done')


if __name__ == '__main__':
    main()
