"""pxt tile-size sweep on the real chip (headline mesh).

The 16px tile is a r2-era choice.  Smaller tiles cut true candidate
pairs (a ~5px bench-mesh face overlaps less of an 8px tile) but add
8-lane group-rounding slack per tile; bigger tiles do the reverse.
JR_PXG_TILE is read at MODULE IMPORT (pxg_impl.py:61), so each setting
runs in a subprocess.

Usage: python tools/exp_pxt_tile.py [large middle ...]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
import bench
rows = {{n: (r, s, b) for n, r, s, b in bench.ROWS}}
r, s, b = rows[{name!r}]
row = bench.softras_row({name!r}, r, s, b)
row.update(pxg_tile=int(os.environ['JR_PXG_TILE']))
print('ROW ' + json.dumps(row), flush=True)
'''


def main():
    names = sys.argv[1:] or ['large']
    for name in names:
        for tile in (8, 16, 32):
            env = dict(os.environ, JR_PXG_TILE=str(tile), JR_DIR_MAX='0')
            try:
                out = subprocess.run(
                    [sys.executable, '-c',
                     CHILD.format(repo=REPO, name=name)],
                    env=env, capture_output=True, text=True, timeout=1800)
                for line in out.stdout.splitlines():
                    if line.startswith('ROW '):
                        print(line[4:], flush=True)
                        break
                else:
                    print(json.dumps({'metric': f'ERR_{name}',
                                      'pxg_tile': tile,
                                      'tail': out.stdout[-200:]
                                      + out.stderr[-200:]}), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({'metric': f'TIMEOUT_{name}',
                                  'pxg_tile': tile}), flush=True)


if __name__ == '__main__':
    main()
