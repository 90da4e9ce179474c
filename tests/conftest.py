"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-chip
sharding is validated via host-platform device emulation).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon sitecustomize force-registers the TPU plugin and sets
# jax_platforms='axon,cpu'; override via config (env vars are ignored).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = '/root/reference/data'


@pytest.fixture(scope='session')
def spot_obj_path():
    return os.path.join(REFERENCE_DATA, 'obj/spot/spot_triangulated.obj')


@pytest.fixture(scope='session')
def sphere_obj_path():
    return os.path.join(REFERENCE_DATA, 'obj/sphere/sphere_642.obj')


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded from the test id: every test sees the
    # same mesh/texture content regardless of suite execution order.  (A
    # session-scoped stream made content order-dependent, which turned a
    # numerics-tolerance edge into a rare order-dependent flake.)
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode()) % (2 ** 31)
    return np.random.RandomState(seed)


def make_random_mesh(rng, num_faces=24, scale=0.7, z_offset=2.5):
    """Small random triangle soup in front of the camera (camera space).

    Faces live near z = z_offset with xy in roughly [-scale, scale], so
    they are visible to the rasterizer's NDC [-1, 1] pixel grid.
    """
    centers = rng.uniform(-scale, scale, size=(num_faces, 1, 2))
    offs = rng.uniform(-0.35, 0.35, size=(num_faces, 3, 2))
    xy = centers + offs
    z = z_offset + rng.uniform(-0.4, 0.4, size=(num_faces, 3, 1))
    fv = np.concatenate([xy, z], axis=-1).astype(np.float32)
    return fv[None]  # [1, F, 3, 3]


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The suite compiles several hundred interpret-mode Pallas programs;
    keeping every executable alive for the whole session has produced
    rare late-session segfaults inside XLA:CPU's compiler (observed at
    ~2/3 through a full run, never in per-file runs).  Dropping the
    in-memory jit cache per module bounds the accumulation; the
    persistent on-disk cache (where configured) is unaffected."""
    yield
    import jax
    jax.clear_caches()
    _TESTS_SINCE_CLEAR[0] = 0


@pytest.fixture(autouse=True)
def _bound_jax_cache_within_module():
    """The round-5 suite put ~135 tests in test_softras_pallas alone, so
    the executable accumulation that used to crash only across modules
    now reproduces WITHIN one module.  Clear every 40 tests as well."""
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 40:
        _TESTS_SINCE_CLEAR[0] = 0
        import jax
        jax.clear_caches()
