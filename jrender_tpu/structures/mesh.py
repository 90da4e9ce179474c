"""Batched triangle mesh for the TPU renderer.

API mirrors the reference ``jrender/structures/mesh.py`` (Mesh, 375 LoC):
vertices/faces/textures with lazily-derived face_vertices, surface_normals,
vertex_normals, surface_ResNormals, fill_back_/reset_, from_obj/save_obj,
voxelize, join_meshes_as_scene.

TPU-first design notes:
  * Registered as a JAX pytree so a Mesh can cross jit/vmap boundaries;
    static attributes (texture_type, dr_type, texture_res) live in aux data.
  * vertex_normals uses ``jax.ops.segment_sum`` -- a deterministic
    replacement for the reference's ``reindex_reduce`` scatter-add
    (mesh.py:231-248).
  * surface_normals: the reference upcasts the cross product to float64
    (mesh.py:219-221); TPUs have no f64 so we keep f32 -- differences are
    below normalize() tolerance for the bundled assets.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import normalize


def face_vertices(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex coordinates: [B,V,C],[B,F,3] -> [B,F,3,C].

    Reference: jrender/structures/utils/faces_vertices.py:4-19.
    """
    assert vertices.ndim == 3
    assert faces.ndim == 3
    # The TPU backend miscompiles a batched gather whose operands are both
    # compile-time constants (observed: wrong folded values on v5e via the
    # remote compiler; plain unbatched gathers fold fine).  Demos/users
    # routinely jit closures over a fixed mesh, which makes both operands
    # constants — the barrier keeps them runtime values at zero cost.
    vertices, faces = jax.lax.optimization_barrier((vertices, faces))
    return jax.vmap(lambda v, f: v[f])(vertices, faces)


def surface_normals_fn(fv: jnp.ndarray) -> jnp.ndarray:
    """Per-face unit normals from face_vertices [B,F,3,3].

    Matches reference orientation: normalize(cross(v2-v1, v0-v1))
    (mesh.py:214-228).
    """
    v10 = fv[:, :, 0] - fv[:, :, 1]
    v12 = fv[:, :, 2] - fv[:, :, 1]
    return normalize(jnp.cross(v12, v10), axis=2, eps=1e-12)


def vertex_normals_fn(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via deterministic segment-sum scatter.

    Reference semantics (mesh.py:231-248): for each face, accumulate
    cross products at each corner vertex, then normalize.
    """
    bs, nv = vertices.shape[:2]
    fv = face_vertices(vertices, faces)
    # contribution at corner k: cross(v_{k+1} - v_k, v_{k+2} - v_k)
    n0 = jnp.cross(fv[:, :, 1] - fv[:, :, 0], fv[:, :, 2] - fv[:, :, 0])
    n1 = jnp.cross(fv[:, :, 2] - fv[:, :, 1], fv[:, :, 0] - fv[:, :, 1])
    n2 = jnp.cross(fv[:, :, 0] - fv[:, :, 2], fv[:, :, 1] - fv[:, :, 2])

    def scatter(one_n, one_f):
        acc = jax.ops.segment_sum(one_n[0], one_f[:, 0], num_segments=nv)
        acc += jax.ops.segment_sum(one_n[1], one_f[:, 1], num_segments=nv)
        acc += jax.ops.segment_sum(one_n[2], one_f[:, 2], num_segments=nv)
        return acc

    normals = jax.vmap(scatter)(jnp.stack([n0, n1, n2], 1), faces)
    return normalize(normals, axis=2, eps=1e-6)


class Mesh:
    """Batched triangle mesh; see module docstring for parity notes."""

    def __init__(self, vertices, faces, textures=None, texture_res=1,
                 texture_type='surface', dr_type='softras', metallic_textures=None,
                 roughness_textures=None, normal_textures=None, TBN=None,
                 with_SSS=False, face_texcoords=None):
        vertices = jnp.asarray(vertices, jnp.float32) if not isinstance(vertices, jnp.ndarray) else vertices
        faces = jnp.asarray(faces, jnp.int32) if not isinstance(faces, jnp.ndarray) else faces
        if faces.dtype != jnp.int32:
            faces = faces.astype(jnp.int32)
        if vertices.dtype != jnp.float32:
            vertices = vertices.astype(jnp.float32)
        if vertices.ndim == 2:
            vertices = vertices[None]
        if faces.ndim == 2:
            faces = faces[None]

        self._vertices = vertices
        self._faces = faces
        self.texture_type = texture_type
        self.dr_type = dr_type
        self._with_specular = True
        self._with_SSS = with_SSS
        self._fill_back = False

        bs = vertices.shape[0]
        nv = vertices.shape[1]
        nf = faces.shape[1]

        if face_texcoords is not None:
            face_texcoords = jnp.asarray(face_texcoords, jnp.float32)
            if face_texcoords.ndim == 3:
                face_texcoords = face_texcoords[None]
        self._face_texcoords = face_texcoords

        # default metallic/roughness maps (mesh.py:85-101)
        if texture_type == 'surface':
            if dr_type == 'softras':
                m_shape = (bs, nf, texture_res ** 2, 1)
            else:  # n3mr
                m_shape = (bs, nf, texture_res, texture_res, texture_res, 1)
        elif texture_type == 'vertex':
            m_shape = (bs, nv, 1)
        else:
            raise ValueError('texture type not applicable')
        self._metallic_textures = (jnp.asarray(metallic_textures, jnp.float32)
                                   if metallic_textures is not None else jnp.zeros(m_shape, jnp.float32))
        self._roughness_textures = (jnp.asarray(roughness_textures, jnp.float32)
                                    if roughness_textures is not None else jnp.ones(m_shape, jnp.float32))

        # textures (mesh.py:104-137)
        if textures is None:
            if texture_type == 'surface':
                if dr_type == 'softras':
                    textures = jnp.ones((bs, nf, texture_res ** 2, 3), jnp.float32)
                else:
                    textures = jnp.ones((bs, nf, texture_res, texture_res, texture_res, 3), jnp.float32)
                self.texture_res = texture_res
            else:
                textures = jnp.ones((bs, nv, 3), jnp.float32)
                self.texture_res = 1
        else:
            textures = jnp.asarray(textures, jnp.float32)
            if textures.ndim == 3 and texture_type == 'surface':
                textures = textures[None]
            if textures.ndim == 2 and texture_type == 'vertex':
                textures = textures[None]
            if textures.ndim == 5:
                textures = textures[None]
            if dr_type == 'softras':
                if texture_type == 'surface':
                    self.texture_res = int(np.sqrt(textures.shape[2]))
                else:
                    self.texture_res = 1
            else:
                self.texture_res = textures.shape[2]
        self._textures = textures

        if normal_textures is not None:
            normal_textures = jnp.asarray(normal_textures, jnp.float32)
            if normal_textures.ndim == 3:
                normal_textures = normal_textures[None]
            if TBN is not None:
                TBN = jnp.asarray(TBN, jnp.float32)
                if TBN.ndim == 3:
                    TBN = TBN[None]
        self._normal_textures = normal_textures
        self._TBN = TBN

        self._origin_vertices = self._vertices
        self._origin_faces = self._faces
        self._origin_textures = self._textures

    # -- shape info ---------------------------------------------------------
    @property
    def batch_size(self):
        return self._vertices.shape[0]

    @property
    def num_vertices(self):
        return self._vertices.shape[1]

    @property
    def num_faces(self):
        return self._faces.shape[1]

    # -- core tensors -------------------------------------------------------
    @property
    def faces(self):
        return self._faces

    @faces.setter
    def faces(self, faces):
        self._faces = faces

    @property
    def vertices(self):
        return self._vertices

    @vertices.setter
    def vertices(self, vertices):
        self._vertices = vertices

    @property
    def textures(self):
        return self._textures

    @textures.setter
    def textures(self, textures):
        self._textures = textures

    @property
    def metallic_textures(self):
        return self._metallic_textures

    @metallic_textures.setter
    def metallic_textures(self, v):
        self._metallic_textures = v

    @property
    def roughness_textures(self):
        return self._roughness_textures

    @roughness_textures.setter
    def roughness_textures(self, v):
        self._roughness_textures = v

    @property
    def normal_textures(self):
        return self._normal_textures

    @property
    def TBN(self):
        return self._TBN

    @property
    def face_texcoords(self):
        return self._face_texcoords

    @property
    def with_specular(self):
        return self._with_specular

    @with_specular.setter
    def with_specular(self, v):
        self._with_specular = v

    @property
    def with_SSS(self):
        return self._with_SSS

    # -- derived quantities (recomputed on access; XLA CSEs under jit) ------
    @property
    def face_vertices(self):
        return face_vertices(self._vertices, self._faces)

    @property
    def surface_normals(self):
        if self._normal_textures is None:
            return surface_normals_fn(self.face_vertices)
        # average normal-texture texels, rotate through TBN (mesh.py:222-225)
        sn = jnp.sum(self._normal_textures, axis=2) / self.texture_res ** 2
        sn = jnp.matmul(sn[:, :, None, :], self._TBN)[:, :, 0, :]
        return normalize(sn, axis=2)

    @property
    def vertex_normals(self):
        return vertex_normals_fn(self._vertices, self._faces)

    @property
    def surface_ResNormals(self):
        """Per-texel world-space normals from normal map x TBN (mesh.py:276-284)."""
        TBN = self._TBN[:, :, None, :, :]  # [B,F,1,3,3]
        nt = self._normal_textures[:, :, :, None, :]  # [B,F,T,1,3]
        res = jnp.matmul(nt, TBN)[:, :, :, 0, :]
        return normalize(res, axis=3)

    @property
    def face_textures(self):
        if self.texture_type == 'surface':
            return self._textures
        elif self.texture_type == 'vertex':
            return face_vertices(self._textures, self._faces)
        raise ValueError('texture type not applicable')

    # -- mutation helpers ---------------------------------------------------
    def fill_back_(self):
        """Duplicate faces reversed so backfaces render (mesh.py:259-263)."""
        if not self._fill_back:
            self._faces = jnp.concatenate([self._faces, self._faces[:, :, ::-1]], axis=1)
            self._textures = jnp.concatenate([self._textures, self._textures], axis=1)
            self._fill_back = True

    def reset_(self):
        self._vertices = self._origin_vertices
        self._faces = self._origin_faces
        self._textures = self._origin_textures
        self._fill_back = False

    # -- IO -----------------------------------------------------------------
    @classmethod
    def from_obj(cls, filename_obj, normalization=False, load_texture=False,
                 dr_type='softras', texture_res=1, texture_type='surface',
                 texture_wrapping='REPEAT', use_bilinear=True, with_SSS=False):
        from ..io import load_obj
        textures = None
        normal_textures = None
        TBN = None
        face_texcoords = None
        if load_texture:
            if dr_type == 'softras':
                vertices, faces, textures, normal_textures, TBN, face_texcoords = load_obj(
                    filename_obj, normalization=normalization, texture_res=texture_res,
                    load_texture=True, dr_type=dr_type, texture_type=texture_type,
                    texture_wrapping=texture_wrapping, use_bilinear=use_bilinear)
            else:
                vertices, faces, textures = load_obj(
                    filename_obj, normalization=normalization, texture_res=texture_res,
                    load_texture=True, dr_type=dr_type, texture_type=texture_type,
                    texture_wrapping=texture_wrapping, use_bilinear=use_bilinear)
        else:
            vertices, faces = load_obj(filename_obj, normalization=normalization,
                                       texture_res=texture_res, load_texture=False,
                                       dr_type=dr_type)
        return cls(vertices, faces, textures, texture_res, texture_type, dr_type=dr_type,
                   normal_textures=normal_textures, TBN=TBN, with_SSS=with_SSS,
                   face_texcoords=face_texcoords)

    def save_obj(self, filename_obj, save_texture=False, texture_res_out=16):
        from ..io import save_obj
        if self.batch_size != 1:
            raise ValueError('Could not save when batch size >= 1')
        if save_texture:
            save_obj(filename_obj, self.vertices[0], self.faces[0], textures=self.textures[0],
                     texture_res=texture_res_out, texture_type=self.texture_type)
        else:
            save_obj(filename_obj, self.vertices[0], self.faces[0], textures=None)

    def voxelize(self, voxel_size=32):
        from ..ops.voxelize import voxelization
        fv = self.face_vertices * voxel_size / (voxel_size - 1) + 0.5
        return voxelization(fv, voxel_size, False)


def join_meshes_as_scene(meshes: List[Mesh], include_texture: bool = True) -> Mesh:
    """Concatenate meshes with vertex-index offsets (mesh.py:345-374)."""
    vert = meshes[0].vertices
    face = meshes[0].faces
    num_vertices = vert.shape[1]
    for mesh in meshes[1:]:
        vert = jnp.concatenate([vert, mesh.vertices], axis=1)
        face = jnp.concatenate([face, mesh.faces + num_vertices], axis=1)
        num_vertices += mesh.vertices.shape[1]
    if not include_texture:
        return Mesh(vert, face)
    if meshes[0].textures is None:
        if any(m.textures is not None for m in meshes):
            raise ValueError('Inconsistent textures in join_meshes_as_scene.')
        return Mesh(vert, face)
    if any(m.textures is None for m in meshes):
        raise ValueError('Inconsistent textures in join_meshes_as_scene.')
    dr_type = meshes[0].dr_type
    texture_type = meshes[0].texture_type
    if not all(dr_type == m.dr_type and texture_type == m.texture_type for m in meshes):
        raise ValueError('Inconsistent textures in join_meshes_as_scene (dr_type or texture_type).')
    tex = meshes[0].textures
    for mesh in meshes[1:]:
        tex = jnp.concatenate([tex, mesh.textures], axis=1)
    return Mesh(vertices=vert, faces=face, textures=tex, texture_type=texture_type, dr_type=dr_type)


# -- pytree registration ----------------------------------------------------
def _mesh_flatten(m: Mesh):
    children = (m._vertices, m._faces, m._textures, m._metallic_textures,
                m._roughness_textures, m._normal_textures, m._TBN, m._face_texcoords)
    aux = (m.texture_type, m.dr_type, m.texture_res, m._with_specular, m._with_SSS,
           m._fill_back)
    return children, aux


def _mesh_unflatten(aux, children):
    m = object.__new__(Mesh)
    (m._vertices, m._faces, m._textures, m._metallic_textures,
     m._roughness_textures, m._normal_textures, m._TBN, m._face_texcoords) = children
    (m.texture_type, m.dr_type, m.texture_res, m._with_specular, m._with_SSS,
     m._fill_back) = aux
    m._origin_vertices = m._vertices
    m._origin_faces = m._faces
    m._origin_textures = m._textures
    return m


jax.tree_util.register_pytree_node(Mesh, _mesh_flatten, _mesh_unflatten)
