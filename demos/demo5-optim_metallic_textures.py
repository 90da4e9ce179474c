"""Demo 5: optimize per-face metallic textures toward a reference render.

TPU port of demo5-optim_metallic_textures.py (demo6 is the same with the
roughness map optimized instead: --mode roughness).
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
    parser.add_argument('-ir', '--filename_ref', type=str, default=None)
    parser.add_argument('-or', '--filename_output', type=str,
                        default='/tmp/output_optim_metallic')
    parser.add_argument('--mode', choices=['metallic', 'roughness'],
                        default='metallic')
    parser.add_argument('-n', '--iters', type=int, default=200)
    args = parser.parse_args()
    if args.filename_ref is None:
        ref_name = ('ref_metallic.png' if args.mode == 'metallic'
                    else 'ref_roughness.png')
        args.filename_ref = os.path.join(data_dir, 'ref', ref_name)
    os.makedirs(args.filename_output, exist_ok=True)

    ts = 4
    template = jr.Mesh.from_obj(args.filename_obj, texture_res=ts,
                                load_texture=True, dr_type='softras')
    vertices = template.vertices
    faces = template.faces
    textures = template.textures
    T = ts * ts

    if args.mode == 'metallic':
        opt_init = jnp.zeros((1, faces.shape[1], T, 1), jnp.float32)
        fixed = jnp.full((1, faces.shape[1], T, 1), 0.5)
    else:
        opt_init = jnp.full((1, faces.shape[1], T, 1), 0.5)
        fixed = jnp.zeros((1, faces.shape[1], T, 1), jnp.float32)

    image_ref = jnp.asarray(
        imageio.imread(args.filename_ref).astype('float32') / 255.0
    )[..., :3].transpose(2, 0, 1)[None]

    renderer = jr.Renderer(dr_type='softras', light_intensity_directionals=1.0,
                           light_intensity_ambient=0.0)
    renderer.transform.set_eyes_from_angles(2.732, 30, 140)

    optimizer = optax.adam(0.05, b1=0.5, b2=0.999)
    opt_state = optimizer.init(opt_init)
    opt_var = opt_init

    @jax.jit
    def step(var, opt_state):
        def loss_fn(var):
            if args.mode == 'metallic':
                img = renderer(vertices, faces, textures,
                               metallic_textures=var, roughness_textures=fixed)
            else:
                img = renderer(vertices, faces, textures,
                               metallic_textures=fixed, roughness_textures=var)
            return jnp.sum((img - image_ref) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(var)
        updates, opt_state = optimizer.update(grads, opt_state, var)
        return optax.apply_updates(var, updates), opt_state, loss

    loop = tqdm.tqdm(range(args.iters))
    for i in loop:
        opt_var, opt_state, loss = step(opt_var, opt_state)
        if i % 20 == 0:
            loop.set_description('Loss: %.2f' % float(loss))

    writer = imageio.get_writer(os.path.join(args.filename_output, 'result.gif'),
                                mode='I')
    for azimuth in tqdm.tqdm(range(0, 360, 8), desc='Drawing'):
        renderer.transform.set_eyes_from_angles(2.732, 30, azimuth)
        if args.mode == 'metallic':
            img = renderer(vertices, faces, textures, metallic_textures=opt_var,
                           roughness_textures=fixed)
        else:
            img = renderer(vertices, faces, textures, metallic_textures=fixed,
                           roughness_textures=opt_var)
        image = np.asarray(img)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()
    print('wrote', args.filename_output)


if __name__ == '__main__':
    main()
