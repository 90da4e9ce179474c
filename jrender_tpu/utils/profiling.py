"""Profiling / tracing helpers — the TPU-native replacement for the
reference's ad-hoc time.time() prints (render2.py:462-466,
demo7-nerf.py:506,591) and commented jt.display_memory_info().

Wraps jax.profiler so callers get one consistent surface:

    with profiling.trace('/tmp/trace'):        # Perfetto/XProf trace dir
        step(...)

    with profiling.annotate('rasterize'):      # named region in the trace
        out = soft_rasterize(...)

    with profiling.timed('rasterize') as t:    # wall-clock, device-synced
        out = soft_rasterize(...)
    print(t.ms)

The NeRF trainer exposes this via --profile_dir N-step traces.
"""
from __future__ import annotations

import contextlib
import time

import jax


def trace(log_dir: str):
    """Context manager: capture a device trace viewable in XProf/Perfetto.

    On backends without profiler support this degrades to a no-op rather
    than failing the run.
    """
    try:
        return jax.profiler.trace(log_dir)
    except Exception:  # pragma: no cover - backend-specific
        return contextlib.nullcontext()


def annotate(name: str):
    """Named region: shows up as a span in profiler traces and as a scope
    in compiled HLO (helps attribute fusions to pipeline stages)."""
    return jax.named_scope(name)


class _Timer:
    __slots__ = ('ms',)

    def __init__(self):
        self.ms = 0.0


@contextlib.contextmanager
def timed(name: str | None = None, sync: bool = True):
    """Wall-clock a block; blocks on all outstanding device work first and
    after (so async dispatch doesn't misattribute time), like the
    reference's sync()-then-time pattern (demo2-deform.py:78,105)."""
    if sync:
        _block_all()
    t = _Timer()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if sync:
            _block_all()
        t.ms = (time.perf_counter() - t0) * 1e3
        if name:
            print(f'[timed] {name}: {t.ms:.3f} ms')


def _block_all():
    try:
        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:  # pragma: no cover
        pass
