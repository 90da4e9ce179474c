"""Demo 1.5: subsurface scattering via texture-space diffusion.

TPU port of demo1.5-SSS.py (head mesh with with_SSS=True).  Note: the
reference data ships only head.mtl/bump maps; point --filename-input at a
head.obj with UVs to reproduce the reference gif.
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
                        default=os.path.join(data_dir, 'head/head.obj'))
    parser.add_argument('-o', '--output-dir', type=str, default='/tmp/output_sss')
    args = parser.parse_args()
    camera_distance = 2
    elevation = 20

    mesh = jr.Mesh.from_obj(args.filename_input, load_texture=True,
                            texture_res=15, texture_type='surface',
                            dr_type='softras', normalization=True, with_SSS=True)
    renderer = jr.Renderer(
        dr_type='softras', image_size=1024, light_intensity_ambient=0.45,
        light_color_ambient=[1, 1, 1], light_intensity_directionals=1,
        light_color_directionals=[1.0, 1.0, 1.0],
        light_directions=[0.65, -0.2, -1], dist_func='barycentric',
        aggr_func_rgb='hard', camera_mode='look_at', eye=[1.1, 0.5, -1.5],
        camera_direction=[-0.8, -0.2, 1])

    os.makedirs(args.output_dir, exist_ok=True)
    writer = imageio.get_writer(os.path.join(args.output_dir,
                                             'head_rotation_1024.gif'), mode='I')
    for azimuth in tqdm.tqdm(range(0, 360, 4), desc='Drawing rotation'):
        mesh.reset_()
        renderer.transform.set_eyes_from_angles(camera_distance, elevation, azimuth)
        rgb = renderer.render_mesh(mesh, mode='rgb')
        image = np.asarray(rgb)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()


if __name__ == '__main__':
    main()
