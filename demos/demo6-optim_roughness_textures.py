"""Demo 6: optimize per-face roughness textures toward a reference render.

TPU port of /root/reference/demo6-optim_roughness_textures.py:1-79 —
metallic map fixed at 0.4, roughness initialized to 1.0 and optimized
with Adam(lr=0.1, betas=(0.5, 0.999)) against data/ref/ref_roughness.png.
"""
import argparse
import os

import numpy as np
import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import optax
import tqdm

import jrender_tpu as jr

data_dir = '/root/reference/data'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-io', '--filename_obj', type=str,
                        default=os.path.join(data_dir, 'obj/spot/spot_triangulated.obj'))
    parser.add_argument('-ir', '--filename_ref', type=str,
                        default=os.path.join(data_dir, 'ref/ref_roughness.png'))
    parser.add_argument('-or', '--filename_output', type=str,
                        default='/tmp/output_optim_roughness_textures')
    parser.add_argument('-n', '--iters', type=int, default=15)
    args = parser.parse_args()
    os.makedirs(args.filename_output, exist_ok=True)

    ts = 4
    template = jr.Mesh.from_obj(args.filename_obj, texture_res=ts,
                                load_texture=True, dr_type='softras')
    vertices = template.vertices
    faces = template.faces
    textures = template.textures
    T = ts * ts

    metallic = jnp.full((1, faces.shape[1], T, 1), 0.4, jnp.float32)
    roughness = jnp.ones((1, faces.shape[1], T, 1), jnp.float32)

    image_ref = jnp.asarray(
        imageio.imread(args.filename_ref).astype('float32') / 255.0
    )[..., :3].transpose(2, 0, 1)[None]

    renderer = jr.Renderer(dr_type='softras')
    renderer.transform.set_eyes_from_angles(2.732, 30, 140)

    optimizer = optax.adam(0.1, b1=0.5, b2=0.999)
    opt_state = optimizer.init(roughness)

    def render(rough):
        return renderer(vertices, faces, textures,
                        metallic_textures=metallic, roughness_textures=rough)

    @jax.jit
    def step(rough, opt_state):
        def loss_fn(rough):
            return jnp.sum((render(rough) - image_ref) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(rough)
        updates, opt_state = optimizer.update(grads, opt_state, rough)
        return optax.apply_updates(rough, updates), opt_state, loss

    render_j = jax.jit(render)
    writer = imageio.get_writer(
        os.path.join(args.filename_output, 'result.gif'), mode='I')
    loop = tqdm.tqdm(range(args.iters))
    for i in loop:
        roughness, opt_state, loss = step(roughness, opt_state)
        loop.set_description('Loss: %.2f' % float(loss))
        image = np.asarray(render_j(roughness))[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()
    print('wrote', args.filename_output)


if __name__ == '__main__':
    main()
