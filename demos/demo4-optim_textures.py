"""Demo 4: optimize n3mr volumetric textures toward a reference image.

TPU port of demo4-optim_textures.py (random-viewpoint texture fitting).
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
                        default=os.path.join(data_dir, 'ref/ref_texture.png'))
    parser.add_argument('-or', '--filename_output', type=str,
                        default='/tmp/output_optim_textures')
    parser.add_argument('-n', '--iters', type=int, default=300)
    args = parser.parse_args()
    os.makedirs(args.filename_output, exist_ok=True)
    rng = np.random.RandomState(1)

    template = jr.Mesh.from_obj(args.filename_obj, dr_type='n3mr', load_texture=True)
    vertices = template.vertices * 0.6
    faces = template.faces
    ts = 4
    textures = jnp.ones((1, faces.shape[1], ts, ts, ts, 3), jnp.float32)

    image_ref = jnp.asarray(
        imageio.imread(args.filename_ref).astype('float32') / 255.0
    ).transpose(2, 0, 1)[None]

    renderer = jr.Renderer(camera_mode='look_at', perspective=False,
                           light_intensity_directionals=0.0,
                           light_intensity_ambient=1.0, dr_type='n3mr')

    optimizer = optax.adam(0.03, b1=0.5, b2=0.999)
    opt_state = optimizer.init(textures)

    @jax.jit
    def step(tex, opt_state, azimuth):
        renderer.transform.set_eyes_from_angles(2.732, 0, 0)  # static init
        eye = jr.get_points_from_angles(jnp.asarray(2.732), jnp.asarray(0.0), azimuth)

        def loss_fn(t):
            renderer.transform.set_eyes(eye)
            img = renderer(vertices, faces, jnp.tanh(t))
            return jnp.sum((img - image_ref) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(tex)
        updates, opt_state = optimizer.update(grads, opt_state, tex)
        return optax.apply_updates(tex, updates), opt_state, loss

    loop = tqdm.tqdm(range(args.iters))
    for i in loop:
        az = jnp.asarray(rng.uniform(0, 360), jnp.float32)
        textures, opt_state, loss = step(textures, opt_state, az)
        if i % 20 == 0:
            loop.set_description('Loss: %.1f' % float(loss))

    writer = imageio.get_writer(os.path.join(args.filename_output, 'result.gif'),
                                mode='I')
    for azimuth in tqdm.tqdm(range(0, 360, 8), desc='Drawing'):
        renderer.transform.set_eyes_from_angles(2.732, 0, azimuth)
        images = renderer(vertices, faces, jnp.tanh(textures))
        image = np.asarray(images)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()
    print('wrote', args.filename_output)


if __name__ == '__main__':
    main()
