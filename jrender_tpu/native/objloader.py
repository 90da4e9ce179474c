"""ctypes bindings for the native OBJ parser (native/objloader.cpp).

Compiled on first use with g++ into the package directory; a module-level
flag reports availability so callers can fall back to the Python parser.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'objloader.cpp')
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_objloader.so')


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO) or
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.check_call(
                    ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _SO],
                    stderr=subprocess.DEVNULL)
            lib = ctypes.CDLL(_SO)
        except Exception:
            _LIB = None
            return None
        lib.obj_parse_file.restype = ctypes.c_void_p
        lib.obj_parse_file.argtypes = [ctypes.c_char_p]
        lib.obj_parse_string.restype = ctypes.c_void_p
        lib.obj_parse_string.argtypes = [ctypes.c_char_p, ctypes.c_long]
        for name in ('obj_num_vertices', 'obj_num_texcoords', 'obj_num_normals',
                     'obj_num_faces', 'obj_num_materials'):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [ctypes.c_void_p]
        for name, ct in (('obj_copy_vertices', ctypes.c_float),
                         ('obj_copy_texcoords', ctypes.c_float),
                         ('obj_copy_normals', ctypes.c_float),
                         ('obj_copy_faces', ctypes.c_int),
                         ('obj_copy_face_vt', ctypes.c_int),
                         ('obj_copy_face_vn', ctypes.c_int),
                         ('obj_copy_face_mat', ctypes.c_int)):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ct)]
        lib.obj_material_name.restype = ctypes.c_char_p
        lib.obj_material_name.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.obj_mtllib.restype = ctypes.c_char_p
        lib.obj_mtllib.argtypes = [ctypes.c_void_p]
        lib.obj_free.restype = None
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class ParsedObj(NamedTuple):
    vertices: np.ndarray     # [V,3] f32
    texcoords: np.ndarray    # [Nt,2] f32
    normals: np.ndarray      # [Nn,3] f32
    faces: np.ndarray        # [F,3] i32
    face_vt: np.ndarray      # [F,3] i32 (-1 when absent)
    face_vn: np.ndarray      # [F,3] i32
    face_mat: np.ndarray     # [F] i32 material id (-1 before first usemtl)
    materials: list          # material names in id order
    mtllib: str


def parse_obj_native(path: str) -> Optional[ParsedObj]:
    lib = _load()
    if lib is None:
        return None
    h = lib.obj_parse_file(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        nv = lib.obj_num_vertices(h)
        nt = lib.obj_num_texcoords(h)
        nn = lib.obj_num_normals(h)
        nf = lib.obj_num_faces(h)
        nm = lib.obj_num_materials(h)
        vertices = np.empty((nv, 3), np.float32)
        texcoords = np.empty((nt, 2), np.float32)
        normals = np.empty((nn, 3), np.float32)
        faces = np.empty((nf, 3), np.int32)
        face_vt = np.empty((nf, 3), np.int32)
        face_vn = np.empty((nf, 3), np.int32)
        face_mat = np.empty((nf,), np.int32)
        if nv:
            lib.obj_copy_vertices(h, vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nt:
            lib.obj_copy_texcoords(h, texcoords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nn:
            lib.obj_copy_normals(h, normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nf:
            lib.obj_copy_faces(h, faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
            lib.obj_copy_face_vt(h, face_vt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
            lib.obj_copy_face_vn(h, face_vn.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
            lib.obj_copy_face_mat(h, face_mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        materials = [lib.obj_material_name(h, i).decode() for i in range(nm)]
        mtllib = lib.obj_mtllib(h).decode()
        return ParsedObj(vertices, texcoords, normals, faces, face_vt, face_vn,
                         face_mat, materials, mtllib)
    finally:
        lib.obj_free(h)
