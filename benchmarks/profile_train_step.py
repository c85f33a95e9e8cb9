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


def summarize(logdir, top=25, raw=False):
    """Aggregate self-time per XLA op from the xplane device trace
    ("XLA Ops" line of the /device:TPU plane).  Ops are grouped by HLO
    name with the trailing fusion counter stripped, so all instances of
    e.g. ``fusion.123`` / ``fusion.456`` with the same stem and category
    report together.  ``raw=True`` keeps full per-instruction names (with
    result shapes) so individual hot fusions can be matched to HLO."""
    paths = glob.glob(osp.join(logdir, 'plugins/profile/*/*.xplane.pb'))
    assert paths, f'no xplane under {logdir}'
    import os
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION',
                          'python')
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(paths[0], 'rb') as f:
        space.ParseFromString(f.read())
    import re
    totals, counts = {}, {}
    total_ps = 0
    for plane in space.planes:
        if not plane.name.startswith('/device:TPU'):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, '?')
                # '%convert_reduce_fusion.12 = (f32[64]...' → stem
                stem = name if raw else re.sub(
                    r'\.[0-9]+$', '', name.split(' = ')[0].lstrip('%'))
                totals[stem] = totals.get(stem, 0) + ev.duration_ps
                counts[stem] = counts.get(stem, 0) + 1
                total_ps += ev.duration_ps
    print(f'total device op-time: {total_ps / 1e9:.2f} ms '
          f'({len(totals)} distinct op stems)')
    print(f'{"self ms":>9} {"%":>6} {"count":>6}  op')
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f'{ps / 1e9:9.2f} {100 * ps / total_ps:6.2f} '
              f'{counts[name]:6d}  {name[:90]}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--logdir', type=str, default='',
                    help='summarize an existing trace instead of capturing')
    args = ap.parse_args()
    logdir = args.logdir or capture(args.batch, args.steps)
    print('trace:', logdir)
    summarize(logdir, args.top)


if __name__ == '__main__':
    main()
