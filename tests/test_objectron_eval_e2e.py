"""End-to-end objectron_eval CLI run: synthetic TFRecord shards → fused
two-stage engine → protocol evaluator → written AP reports.

Mirrors the reference flow (/root/reference/scripts/objectron_eval.py:261-286:
per-class shard walk → Detector/Regressor → vendor Evaluator → report files)
with this repo's tiny-engine stand-in for the full models.  Gated behind
TPUDET3D_SLOW=1 like the other engine integration tests (first fused-engine
compile on the 1-core CI host takes minutes).
"""

import os
import os.path as osp
import re
import struct
import sys

import numpy as np
import pytest

cv = pytest.importorskip('cv2')

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'scripts'))

from tests.test_engine import tiny_engine
from tests.test_protocol import (make_example, _feature_bytes,
                                 _feature_floats, _feature_ints)

slow = pytest.mark.skipif(os.environ.get('TPUDET3D_SLOW') != '1',
                          reason='set TPUDET3D_SLOW=1 to run engine tests')


def _write_shard(path, examples):
    with open(path, 'wb') as f:
        for ex in examples:
            f.write(struct.pack('<Q', len(ex)))
            f.write(b'\x00' * 4)        # length crc (reader skips)
            f.write(ex)
            f.write(b'\x00' * 4)        # data crc (reader skips)


def _make_eval_example(rng, height=240, width=320, n_objects=2):
    """One tf.train.Example in the Objectron eval-shard schema: JPEG frame,
    per-instance point_2d/point_3d, visibility, ground plane."""
    img = rng.randint(0, 255, (height, width, 3)).astype(np.uint8)
    for _ in range(n_objects):
        x, y = rng.randint(20, width - 80), rng.randint(20, height - 80)
        cv.rectangle(img, (x, y), (x + 60, y + 60),
                     tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
    ok, enc = cv.imencode('.jpg', img)
    assert ok
    kps2d = rng.rand(n_objects, 9, 3).astype(np.float32) * 0.8 + 0.1
    # a plausible camera-space layout ~1m in front of the camera
    centers = rng.randn(n_objects, 1, 3).astype(np.float32) * 0.1 \
        + np.asarray([0., 0., -1.])
    kps3d = centers + rng.randn(n_objects, 9, 3).astype(np.float32) * 0.05
    return make_example({
        'image/encoded': _feature_bytes([enc.tobytes()]),
        'point_2d': _feature_floats(kps2d.reshape(-1).tolist()),
        'point_3d': _feature_floats(kps3d.reshape(-1).tolist()),
        'instance_num': _feature_ints([n_objects]),
        'object/visibility': _feature_floats([1.0] * n_objects),
        'plane/center': _feature_floats([0., -0.5, -1.]),
        'plane/normal': _feature_floats([0., 1., 0.]),
    })


@slow
def test_objectron_eval_cli_end_to_end(tmp_path, monkeypatch, capsys):
    rng = np.random.RandomState(3)
    classes = ['bike', 'book']
    data_root = tmp_path / 'records'
    for cls in classes:
        (data_root / cls).mkdir(parents=True)
        _write_shard(str(data_root / cls / 'shard-000'),
                     [_make_eval_example(rng) for _ in range(2)])

    import demo
    import objectron_eval
    # stand-in for the full-size SSD300+MNv3 build (same engine class/API)
    monkeypatch.setattr(demo, 'build_engine',
                        lambda *a, **kw: tiny_engine())
    report_dir = tmp_path / 'reports'
    monkeypatch.setattr(sys, 'argv', [
        'objectron_eval.py', '--eval_data', str(data_root),
        '--classes', *classes, '--max_num', '2',
        '--report_dir', str(report_dir), '--det_tresh', '0.0'])
    objectron_eval.main()

    for cls in classes:
        report = (report_dir / f'report_{cls}.txt').read_text()
        # vendor report sections (reference objectron_eval.py:188-237)
        for section in ('Mean Error 2D', 'Mean 3D IoU', 'Mean Azimuth Error',
                        'Mean Polar Error', 'IoU Thresholds', 'AP @3D IoU',
                        'AP @2D Pixel', 'AP @Azimuth', 'AP @Polar',
                        'AP @ADD', 'AP @ADDS'):
            assert section in report, (cls, section)
        # AP = TP / total GT instances (vendor normalization); with
        # det_conf=0 duplicate predictions can hit the same GT at degenerate
        # thresholds, so the bound is preds-per-GT, not 1.
        aps = [float(v)
               for line in report.splitlines() if line.startswith('AP @')
               for v in re.findall(r'\d+\.\d+', line)]
        max_dup = 4 * 2 / (2 * 2)      # max_detections*images / instances
        assert aps and all(0.0 <= v <= max_dup + 1e-4 for v in aps), aps
    out = capsys.readouterr().out
    assert 'evaluated 2 examples' in out


@slow
def test_objectron_eval_cli_mixed_frame_shapes(tmp_path, monkeypatch,
                                               capsys):
    """Shards whose frames change resolution mid-stream: the batched loop
    must flush chunks at shape boundaries and still evaluate every
    example (scripts/objectron_eval.py stream_chunks)."""
    rng = np.random.RandomState(4)
    data_root = tmp_path / 'records'
    (data_root / 'cup').mkdir(parents=True)
    examples = ([_make_eval_example(rng, height=240, width=320)
                 for _ in range(2)]
                + [_make_eval_example(rng, height=180, width=320)
                   for _ in range(2)])
    _write_shard(str(data_root / 'cup' / 'shard-000'), examples)

    import demo
    import objectron_eval
    monkeypatch.setattr(demo, 'build_engine',
                        lambda *a, **kw: tiny_engine())
    report_dir = tmp_path / 'reports'
    monkeypatch.setattr(sys, 'argv', [
        'objectron_eval.py', '--eval_data', str(data_root),
        '--classes', 'cup', '--report_dir', str(report_dir),
        '--det_tresh', '0.0', '--batch', '8'])
    objectron_eval.main()
    out = capsys.readouterr().out
    assert 'evaluated 4 examples' in out
    assert 'Mean 3D IoU' in (report_dir / 'report_cup.txt').read_text()
