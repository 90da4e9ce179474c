"""Demo 3: render with Cook-Torrance specular (metallic/roughness).

TPU port of demo3-render_specular.py.
"""
import argparse
import os

import numpy as np
import imageio.v2 as imageio
import jax.numpy as jnp
import tqdm

import jrender_tpu as jr

data_dir = '/root/reference/data'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--filename-input', type=str,
                        default=os.path.join(data_dir, 'obj/spot/spot_triangulated.obj'))
    parser.add_argument('-o', '--output-dir', type=str, default='/tmp/output_specular')
    parser.add_argument('--metallic', type=float, default=0.5)
    parser.add_argument('--roughness', type=float, default=0.4)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    camera_distance = 2.732
    elevation = 30

    mesh = jr.Mesh.from_obj(args.filename_input, load_texture=True, texture_res=5,
                            texture_type='surface', dr_type='softras')
    metallic = jnp.full((1, mesh.num_faces, 5 ** 2, 1), args.metallic)
    roughness = jnp.full((1, mesh.num_faces, 5 ** 2, 1), args.roughness)

    renderer = jr.Renderer(dr_type='softras', light_intensity_directionals=0.7,
                           light_intensity_ambient=0.5)

    writer = imageio.get_writer(os.path.join(args.output_dir, 'rotation.gif'), mode='I')
    for azimuth in tqdm.tqdm(range(0, 360, 8), desc='Drawing'):
        mesh.reset_()
        renderer.transform.set_eyes_from_angles(camera_distance, elevation, azimuth)
        rgb = renderer(mesh.vertices, mesh.faces, textures=mesh.textures,
                       metallic_textures=metallic, roughness_textures=roughness)
        image = np.asarray(rgb)[0].transpose(1, 2, 0)
        writer.append_data((255 * np.clip(image, 0, 1)).astype(np.uint8))
    writer.close()
    print('wrote', args.output_dir)


if __name__ == '__main__':
    main()
