"""Wavefront OBJ/MTL loading.

Parity with the reference loaders:
  * dispatch            -- jrender/io/load_obj.py:9-21
  * softras loader      -- jrender/io/utils/_load_obj_for_softras.py:142-207
  * n3mr loader         -- jrender/io/utils/_load_obj_for_n3mr.py:7-135

Parsing happens on the host (numpy); texture baking runs as jitted JAX
(ops/texture.py).  Returns numpy/jnp arrays ready for Mesh().
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops import texture as T


def _imread(path):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack((img,) * 3, -1)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return img


def _parse_lines(filename_obj):
    with open(filename_obj) as f:
        return f.readlines()


def _native_parsed(filename_obj):
    """Parse with the C++ loader when available (native/objloader.cpp)."""
    try:
        from ..native import parse_obj_native
        return parse_obj_native(filename_obj)
    except Exception:
        return None


def _parse_vertices(lines):
    vs = [[float(v) for v in ln.split()[1:4]] for ln in lines
          if ln.split() and ln.split()[0] == 'v']
    return np.vstack(vs).astype(np.float32)


def _parse_faces(lines):
    faces = []
    for ln in lines:
        parts = ln.split()
        if not parts or parts[0] != 'f':
            continue
        vs = parts[1:]
        v0 = int(vs[0].split('/')[0])
        for i in range(len(vs) - 2):
            v1 = int(vs[i + 1].split('/')[0])
            v2 = int(vs[i + 2].split('/')[0])
            faces.append((v0, v1, v2))
    return np.vstack(faces).astype(np.int32) - 1


def _parse_texcoord_faces(lines):
    """Returns (vt array [Nt,2], per-face vt index triplets, material names)."""
    vts = [[float(v) for v in ln.split()[1:3]] for ln in lines
           if ln.split() and ln.split()[0] == 'vt']
    faces = []
    material_names = []
    material_name = ''
    for ln in lines:
        parts = ln.split()
        if not parts:
            continue
        if parts[0] == 'f':
            vs = parts[1:]

            def vt_of(tok):
                return int(tok.split('/')[1]) if ('/' in tok and '//' not in tok) else 0

            v0 = vt_of(vs[0])
            for i in range(len(vs) - 2):
                faces.append((v0, vt_of(vs[i + 1]), vt_of(vs[i + 2])))
                material_names.append(material_name)
        elif parts[0] == 'usemtl':
            material_name = parts[1]
    vts = np.vstack(vts).astype(np.float32) if vts else np.zeros((1, 2), np.float32)
    faces = np.vstack(faces).astype(np.int32) - 1
    return vts, faces, material_names


def load_mtl(filename_mtl):
    """Kd colors + map_Kd filenames + optional normal map filename.

    Reference: _load_obj_for_softras.py:17-38.
    """
    texture_filenames = {}
    normal_filename = ''
    colors = {}
    material_name = ''
    with open(filename_mtl) as f:
        for line in f.readlines():
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'newmtl':
                material_name = parts[1]
            elif parts[0] == 'map_Kd':
                texture_filenames[material_name] = parts[1]
            elif parts[0] == 'Kd':
                colors[material_name] = np.array([float(x) for x in parts[1:4]])
            elif parts[0] == 'map_normal':
                normal_filename = parts[2]
    return colors, texture_filenames, normal_filename


def _load_textures_softras(filename_obj, filename_mtl, texture_res, face_vertices):
    lines = _parse_lines(filename_obj)
    vts, vt_faces, material_names = _parse_texcoord_faces(lines)
    face_texcoords = vts[vt_faces]                                   # [F,3,2]

    colors, texture_filenames, normal_filename = load_mtl(filename_mtl)

    F = face_texcoords.shape[0]
    Tsz = texture_res ** 2
    textures = np.ones((F, 3), np.float32)
    for material_name, color in colors.items():
        mask = np.array(material_names) == material_name
        textures[mask] = color
    textures = jnp.asarray(np.repeat(textures[:, None, :], Tsz, axis=1))

    fc = jnp.asarray(face_texcoords)
    for material_name, filename_texture in texture_filenames.items():
        path = os.path.join(os.path.dirname(filename_obj), filename_texture)
        image = _imread(path)[::-1].copy()
        is_update = jnp.asarray((np.array(material_names) == material_name).astype(np.int32))
        textures = T.load_textures_softras(jnp.asarray(image), fc, textures, is_update)

    if normal_filename == '':
        normal_textures = None
        TBN = None
    else:
        path = os.path.join(os.path.dirname(filename_obj), normal_filename)
        image = _imread(path)
        if image.shape[2] == 3 and np.allclose(image[..., 0], image[..., 1]) \
                and np.allclose(image[..., 1], image[..., 2]):
            image = T.bump_to_normal(image[..., 0])
        TBN = T.create_TBN(fc, jnp.asarray(face_vertices))
        is_update = jnp.ones((F,), jnp.int32)
        normal_textures = jnp.ones((F, Tsz, 3), jnp.float32)
        normal_textures = T.load_textures_softras(
            jnp.asarray(image[::-1].copy()), fc, normal_textures, is_update)
        from ..utils.math import normalize
        normal_textures = normalize(normal_textures * 2 - 1, axis=2)
    return textures, normal_textures, TBN, fc


def _load_textures_n3mr(filename_obj, filename_mtl, texture_res, texture_wrapping,
                        use_bilinear):
    lines = _parse_lines(filename_obj)
    vts, vt_faces, material_names = _parse_texcoord_faces(lines)
    face_texcoords = jnp.asarray(vts[vt_faces])

    colors, texture_filenames, _ = load_mtl(filename_mtl)

    F = face_texcoords.shape[0]
    ts = texture_res
    textures = np.full((F, 3), 0.5, np.float32)
    for material_name, color in colors.items():
        mask = np.array(material_names) == material_name
        textures[mask] = color
    textures = jnp.asarray(
        np.broadcast_to(textures[:, None, None, None, :], (F, ts, ts, ts, 3)).copy())

    for material_name, filename_texture in texture_filenames.items():
        path = os.path.join(os.path.dirname(filename_obj), filename_texture)
        image = _imread(path)[::-1].copy()
        is_update = jnp.asarray((np.array(material_names) == material_name).astype(np.int32))
        textures = T.load_textures_n3mr(jnp.asarray(image), face_texcoords, textures,
                                        is_update, T.WRAPPING[texture_wrapping],
                                        bool(use_bilinear))
    return textures


def load_obj(filename_obj, normalization=False, load_texture=False, dr_type='softras',
             texture_res=4, texture_type='surface', texture_wrapping='REPEAT',
             use_bilinear=True):
    """Load a Wavefront .obj; see module docstring for returned tuples."""
    assert dr_type in ('softras', 'n3mr')
    lines = _parse_lines(filename_obj)
    parsed = _native_parsed(filename_obj)
    if parsed is not None and parsed.faces.shape[0] > 0:
        vertices = parsed.vertices
        faces = parsed.faces
    else:
        vertices = _parse_vertices(lines)
        faces = _parse_faces(lines)

    textures = normal_textures = TBN = face_texcoords = None
    if load_texture and texture_type == 'surface':
        for line in lines:
            if line.startswith('mtllib'):
                filename_mtl = os.path.join(os.path.dirname(filename_obj), line.split()[1])
                if dr_type == 'softras':
                    fv = vertices[faces]
                    textures, normal_textures, TBN, face_texcoords = _load_textures_softras(
                        filename_obj, filename_mtl, texture_res, fv)
                else:
                    textures = _load_textures_n3mr(
                        filename_obj, filename_mtl, texture_res, texture_wrapping,
                        use_bilinear)
        if textures is None:
            raise Exception('Failed to load textures.')
    elif load_texture and texture_type == 'vertex':
        tex = [[float(v) for v in ln.split()[4:7]] for ln in lines
               if ln.split() and ln.split()[0] == 'v']
        textures = jnp.asarray(np.vstack(tex).astype(np.float32))

    # normalize into a unit cube centered at zero (softras loader :199-203)
    if normalization:
        vertices = vertices - vertices.min(0)
        vertices = vertices / np.abs(vertices).max()
        vertices = vertices * 2
        vertices = vertices - vertices.max(0) / 2

    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces)
    if not load_texture:
        return vertices, faces
    if dr_type == 'softras':
        return vertices, faces, textures, normal_textures, TBN, face_texcoords
    return vertices, faces, textures
