"""Demo 1: render a textured mesh from rotating viewpoints + sigma/gamma blur.

TPU port of the reference demo1-render.py (same outputs: rotation.gif,
bluring.gif).
"""
import argparse
import os

import numpy as np
import imageio.v2 as imageio
import tqdm

import jrender_tpu as jr

data_dir = '/root/reference/data'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--filename-input', type=str,
                        default=os.path.join(data_dir, 'obj/spot/spot_triangulated.obj'))
    parser.add_argument('-o', '--output-dir', type=str, default='/tmp/output_render')
    parser.add_argument('--frames', type=int, default=90)
    args = parser.parse_args()

    camera_distance = 2.732
    elevation = 30

    mesh = jr.Mesh.from_obj(args.filename_input, load_texture=True, texture_res=5,
                            texture_type='surface', dr_type='softras')
    renderer = jr.Renderer(dr_type='softras')
    os.makedirs(args.output_dir, exist_ok=True)

    azimuths = list(range(0, 360, 360 // args.frames))
    writer = imageio.get_writer(os.path.join(args.output_dir, 'rotation.gif'), mode='I')
    for azimuth in tqdm.tqdm(azimuths, desc='Drawing rotation'):
        mesh.reset_()
        renderer.transform.set_eyes_from_angles(camera_distance, elevation, azimuth)
        rgb = renderer.render_mesh(mesh, mode='rgb')
        image = np.asarray(rgb)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()

    writer = imageio.get_writer(os.path.join(args.output_dir, 'bluring.gif'), mode='I')
    renderer.transform.set_eyes_from_angles(camera_distance, elevation, 45)
    for gamma_pow in tqdm.tqdm(np.arange(-4, -2, 0.2), desc='Drawing blurring'):
        mesh.reset_()
        renderer.set_gamma(10 ** gamma_pow)
        renderer.set_sigma(10 ** (gamma_pow - 1))
        images = renderer.render_mesh(mesh, mode='rgb')
        image = np.asarray(images)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()
    print('wrote', args.output_dir)


if __name__ == '__main__':
    main()
