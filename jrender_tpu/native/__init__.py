"""Native (C++) host components, loaded via ctypes.

Currently: the fast OBJ parser (native/objloader.cpp) — the production
replacement for the Python line parser; falls back silently when the
toolchain is unavailable.
"""
from .objloader import parse_obj_native, native_available
