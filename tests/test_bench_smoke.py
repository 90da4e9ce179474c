"""bench.py row-function smoke at a small image size.

The driver's end-of-round artifact is produced by bench.py on the real
chip; a row that cannot even trace (bad shapes, a renamed kwarg, a
route that errors) would surface only there.  This runs the SoftRas and
N3MR row builders (including the round-5 AA=True variant) at 64px on
CPU so row construction breaks in CI instead of in the artifact.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo')
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def small_image(monkeypatch):
    monkeypatch.setattr(bench, 'IMAGE_SIZE', 64)


def _check(row):
    assert row is not None
    assert np.isfinite(row['value']) and row['value'] > 0
    assert row['unit'] == 'ms/frame'


def test_softras_small_row():
    row = bench.softras_row('small', 13, 12, 7.3)
    _check(row)
    assert 'vs_baseline' in row


def test_n3mr_small_row_both_aa():
    row = bench.n3mr_row('small', 13, 12, 32.1, aa=False)
    _check(row)
    assert not row['metric'].endswith('_aa')
    row_aa = bench.n3mr_row('small', 13, 12, 32.1, aa=True)
    _check(row_aa)
    assert row_aa['metric'].endswith('_aa')
