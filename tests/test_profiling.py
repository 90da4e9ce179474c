"""Profiling helpers (SURVEY §5 tracing: jax.profiler replaces the
reference's ad-hoc time.time() prints)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from jrender_tpu.utils import profiling


def test_annotate_and_timed():
    with profiling.annotate('outer'):
        x = jnp.ones((8, 8)).sum()
    with profiling.timed() as t:
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert t.ms > 0.0
    assert float(x) == 64.0


def test_annotate_inside_jit():
    @jax.jit
    def f(a):
        with profiling.annotate('stage1'):
            b = a * 2
        with profiling.annotate('stage2'):
            return b.sum()

    assert float(f(jnp.ones((4, 4)))) == 32.0


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / 'trace')
    with profiling.trace(d):
        jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, 'profiler trace produced no files'


def test_trainer_profile_dir_flag(tmp_path):
    """--profile_dir captures a device trace of one train dispatch."""
    from jrender_tpu.nerf.config import parse_args
    from jrender_tpu.nerf.trainer import train
    from test_nerf_train_e2e import make_blender_dataset

    root = str(tmp_path / 'data')
    make_blender_dataset(root)
    cfg = tmp_path / 'cfg.txt'
    cfg.write_text("""expname = tp
dataset_type = blender
white_bkgd = True
no_batching = True
N_samples = 8
N_rand = 64
netdepth = 2
netwidth = 16
multires = 2
N_iters = 30
steps_per_dispatch = 10
i_print = 30
i_weights = 0
testskip = 1
""")
    prof_dir = str(tmp_path / 'prof')
    args = parse_args(['--config', str(cfg), '--datadir', root,
                       '--basedir', str(tmp_path / 'logs'),
                       '--profile_dir', prof_dir])
    params, _, history = train(args)
    assert np.isfinite(history[-1][2])
    found = []
    for r, _, files in os.walk(prof_dir):
        found += files
    assert found, 'no trace files written by --profile_dir'
