"""Demo 2: deform a sphere template to match 120 target silhouettes.

TPU port of demo2-deform.py: the whole optimization step (render 120
views + IoU / Laplacian / Flatten losses + Adam update) is one jitted
function.
"""
import argparse
import os
import time

import numpy as np
import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import optax
import tqdm

import jrender_tpu as jr
from jrender_tpu import neg_iou_loss, LaplacianLoss, FlattenLoss

data_dir = '/root/reference/data'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--filename-input', type=str,
                        default=os.path.join(data_dir, 'source.npy'))
    parser.add_argument('-c', '--camera-input', type=str,
                        default=os.path.join(data_dir, 'camera.npy'))
    parser.add_argument('-t', '--template-mesh', type=str,
                        default=os.path.join(data_dir, 'obj/sphere/sphere_1352.obj'))
    parser.add_argument('-o', '--output-dir', type=str, default='/tmp/output_deform')
    parser.add_argument('-b', '--batch-size', type=int, default=120)
    parser.add_argument('-n', '--iters', type=int, default=1000)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    template = jr.Mesh.from_obj(args.template_mesh)
    vertices0 = template.vertices * 0.5
    faces = template.faces

    laplacian_loss = LaplacianLoss(np.asarray(vertices0[0]), np.asarray(faces[0]))
    flatten_loss = FlattenLoss(np.asarray(faces[0]))

    images_gt = jnp.asarray(np.load(args.filename_input).astype('float32') / 255.0)
    cameras = np.load(args.camera_input).astype('float32')
    B = args.batch_size

    renderer = jr.Renderer(image_size=64, sigma_val=1e-4, aggr_func_rgb='hard',
                           camera_mode='look_at', viewing_angle=15,
                           dr_type='softras')
    renderer.transform.set_eyes_from_angles(
        jnp.asarray(cameras[:B, 0]), jnp.asarray(cameras[:B, 1]),
        jnp.asarray(cameras[:B, 2]))

    params = {'displace': jnp.zeros(vertices0.shape),
              'center': jnp.zeros((1, 1, 3))}
    optimizer = optax.adam(0.01, b1=0.5, b2=0.99)
    opt_state = optimizer.init(params)

    def build_vertices(p):
        base = jnp.log(jnp.abs(vertices0) / (1 - jnp.abs(vertices0)))
        centroid = jnp.tanh(p['center'])
        v = jax.nn.sigmoid(base + p['displace']) * jnp.sign(vertices0)
        v = jax.nn.relu(v) * (1 - centroid) - jax.nn.relu(-v) * (centroid + 1)
        return v + centroid

    @jax.jit
    def step(p, opt_state):
        def loss_fn(p):
            v = build_vertices(p)
            mesh = jr.Mesh(jnp.repeat(v, B, 0), jnp.repeat(faces, B, 0))
            sil = renderer.render_mesh(mesh, mode='silhouettes')
            loss = neg_iou_loss(sil, images_gt[:B, 3]) + \
                0.03 * jnp.mean(laplacian_loss(v)) + \
                0.0003 * jnp.mean(flatten_loss(v))
            return loss, sil
        (loss, sil), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss, sil

    t0 = time.time()
    writer = imageio.get_writer(os.path.join(args.output_dir, 'deform.gif'), mode='I')
    loop = tqdm.tqdm(range(args.iters))
    for i in loop:
        params, opt_state, loss, sil = step(params, opt_state)
        if i % 50 == 0:
            loop.set_description('Loss: %.4f' % float(loss))
        if i % 100 == 0:
            image = np.asarray(sil)[0]
            writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()

    v = build_vertices(params)
    jr.Mesh(v, faces).save_obj(os.path.join(args.output_dir, 'plane.obj'),
                               save_texture=False)
    print(f'Cost {time.time() - t0:.1f} secs, final loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
