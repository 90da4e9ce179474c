"""dir-layout tuning sweep on the real chip: tile size x dispatch cap.

Times the bench small (288) and middle (3,330) SoftRas rows through the
public grad step for each (JR_DIR_TILE, JR_DIR_MAX) combination.  The
knob-keyed jit caches (pxg_impl._knob_jit) make mid-process env changes
safe.  Each setting is one scan-chained measurement (bench methodology).

Usage: python tools/exp_dir_tune.py [small middle]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(names, tiles=(16, 32), caps=(0, 1024, 4096)):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    rows = {n: (r, s, b) for n, r, s, b in bench.ROWS}
    for name in names:
        r, s, baseline = rows[name]
        for cap in caps:
            for tile in tiles:
                if cap == 0 and tile != tiles[0]:
                    continue  # cap 0 -> pxt route; tile knob is dir-only
                os.environ['JR_DIR_MAX'] = str(cap)
                os.environ['JR_DIR_TILE'] = str(tile)
                try:
                    row = bench.softras_row(name, r, s, baseline)
                    row.update(dir_max=cap, dir_tile=tile)
                except Exception as e:  # noqa: BLE001
                    row = {'metric': f'ERR_{name}', 'dir_max': cap,
                           'dir_tile': tile,
                           'error': f'{type(e).__name__}: {e}'[:200]}
                print(json.dumps(row), flush=True)
    os.environ.pop('JR_DIR_MAX', None)
    os.environ.pop('JR_DIR_TILE', None)


if __name__ == '__main__':
    run(sys.argv[1:] or ['small', 'middle'])
