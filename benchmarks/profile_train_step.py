"""Op-level profile of the jitted regressor train step on the real chip.

Captures a jax.profiler trace of the fused train step (augs + fwd + bwd +
optim + metrics, train/steps.py) and prints the top self-time ops from the
XLA device trace, so optimization work targets measured hot spots instead
of guesses (the MobileNet family is depthwise-conv heavy, which lands on
the VPU, not the MXU — see DEVELOPMENT.md).

Usage: python benchmarks/profile_train_step.py [--batch 128] [--steps 10]
"""

import argparse
import glob
import gzip
import json
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from train_throughput import make_cfg  # noqa: E402  (same tiny config)
from tpudet3d.train.pipeline import setup_training


def capture(batch, steps):
    pipe = setup_training(make_cfg(batch), with_loaders=False)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.randint(key, (batch, 224, 224, 3), 0, 255,
                              jnp.int32).astype(jnp.uint8)
    kps = jax.random.uniform(key, (batch, 9, 2)) * 224
    cats = jax.random.randint(key, (batch,), 0, 9)
    state, metrics = pipe.train_step(pipe.state, imgs, kps, cats, key)
    jax.block_until_ready(metrics)

    logdir = tempfile.mkdtemp(prefix='tpudet3d_prof_')
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, metrics = pipe.train_step(state, imgs, kps, cats,
                                             jax.random.PRNGKey(i))
        jax.block_until_ready(metrics)
    return logdir


def summarize(logdir, top=25):
    """Aggregate self-time per HLO op name from the trace-viewer JSON
    (trace.json.gz contains device-side XLA op events)."""
    paths = glob.glob(osp.join(logdir, 'plugins/profile/*/*.trace.json.gz'))
    assert paths, f'no trace under {logdir}'
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device lanes only: pid names like "/device:TPU:0" carry XLA ops
    device_pids = {e['pid'] for e in events
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'TPU' in str(e.get('args', {}).get('name', ''))}
    totals, counts = {}, {}
    total_dev_us = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        dur = float(e.get('dur', 0.0))
        totals[name] = totals.get(name, 0.0) + dur
        counts[name] = counts.get(name, 0) + 1
        total_dev_us += dur
    print(f'total device op-time: {total_dev_us / 1e3:.2f} ms '
          f'({len(totals)} distinct ops)')
    print(f'{"self ms":>9} {"%":>6} {"count":>6}  op')
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f'{us / 1e3:9.2f} {100 * us / total_dev_us:6.2f} '
              f'{counts[name]:6d}  {name[:90]}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()
    logdir = capture(args.batch, args.steps)
    print('trace:', logdir)
    summarize(logdir, args.top)


if __name__ == '__main__':
    main()
