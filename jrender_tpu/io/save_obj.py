"""Save meshes to .obj (+ .mtl / texture atlas PNG).

Reference: jrender/io/save_obj.py:31-96.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops.texture import create_texture_image


def save_obj(filename, vertices, faces, textures=None, texture_res=16,
             texture_type='surface'):
    assert texture_type in ('surface', 'vertex')
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)

    filename_mtl = filename[:-4] + '.mtl'
    vertices_textures = None
    if textures is not None and texture_type == 'surface':
        assert texture_res >= 2
        import imageio.v2 as imageio
        filename_texture = filename[:-4] + '.png'
        material_name = 'material_1'
        texture_image, vertices_textures = create_texture_image(textures, texture_res)
        texture_image = (np.clip(texture_image, 0, 1) * 255).astype('uint8')
        imageio.imwrite(filename_texture, texture_image)

    with open(filename, 'w') as f:
        f.write('# %s\n#\n\n' % os.path.basename(filename))
        if textures is not None:
            f.write('mtllib %s\n\n' % os.path.basename(filename_mtl))

        if textures is not None and texture_type == 'vertex':
            tex = np.asarray(textures)
            for vertex, color in zip(vertices, tex):
                f.write('v %.8f %.8f %.8f %.8f %.8f %.8f\n' % (
                    vertex[0], vertex[1], vertex[2], color[0], color[1], color[2]))
            f.write('\n')
        else:
            for vertex in vertices:
                f.write('v %.8f %.8f %.8f\n' % (vertex[0], vertex[1], vertex[2]))
            f.write('\n')

        if textures is not None and texture_type == 'surface':
            for vertex in vertices_textures.reshape(-1, 2):
                f.write('vt %.8f %.8f\n' % (vertex[0], vertex[1]))
            f.write('\n')
            f.write('usemtl %s\n' % 'material_1')
            for i, face in enumerate(faces):
                f.write('f %d/%d %d/%d %d/%d\n' % (
                    face[0] + 1, 3 * i + 1, face[1] + 1, 3 * i + 2, face[2] + 1, 3 * i + 3))
            f.write('\n')
        else:
            for face in faces:
                f.write('f %d %d %d\n' % (face[0] + 1, face[1] + 1, face[2] + 1))

    if textures is not None and texture_type == 'surface':
        with open(filename_mtl, 'w') as f:
            f.write('newmtl material_1\n')
            f.write('map_Kd %s\n' % os.path.basename(filename[:-4] + '.png'))


def save_voxel(filename, voxel):
    voxel = np.asarray(voxel)
    coords = np.argwhere(voxel == 1).astype(np.float32)
    coords /= np.asarray(voxel.shape, np.float32)[None, :]
    return save_obj(filename, coords, np.zeros((0, 3), np.int32))
