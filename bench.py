"""Headline benchmark: 3D-vertex regressor inference throughput on TPU vs
the reference-style PyTorch-CPU serial path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Pipeline under test (this round): normalized crop batch → MobileNetV3-large
multi-head regressor forward (bf16, jit) — the stage-2 hot path of the
two-stage system.  The baseline emulates the reference deployment: torch CPU
batch-1, one forward per detection (ie_wrappers.py:48,61,128-136).  The
measured baseline number is cached in BASELINE_MEASURED.json.
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      osp.join(osp.dirname(osp.abspath(__file__)), '.jax_cache'))

import numpy as np

BASELINE_FILE = osp.join(osp.dirname(osp.abspath(__file__)),
                         'BASELINE_MEASURED.json')
CROP = 224
BATCH = 256


def measure_torch_baseline(n_crops=12):
    """Reference-style serial batch-1 CPU inference, crops/sec."""
    import torch
    from benchmarks.torch_baseline import TorchRegressorBaseline
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchRegressorBaseline().eval()
    x = torch.rand(1, 3, CROP, CROP)
    with torch.no_grad():
        model(x)  # warmup
        start = time.perf_counter()
        for _ in range(n_crops):
            model(x)
        elapsed = time.perf_counter() - start
    return n_crops / elapsed


def get_baseline():
    if osp.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    data = {'torch_cpu_regressor_crops_per_sec': measure_torch_baseline(),
            'note': 'reference-style serial batch-1 torch-CPU regressor '
                    '(reference deploys via OpenVINO CPU batch 1, '
                    'ie_wrappers.py:61)'}
    with open(BASELINE_FILE, 'w') as f:
        json.dump(data, f, indent=1)
    return data


def measure_tpu(n_iters=30):
    import jax
    import jax.numpy as jnp
    from tpudet3d.core import AttrDict
    from tpudet3d.models import build_model

    cfg = AttrDict(model=dict(name='mobilenetv3_large_21k', pretrained=False,
                              num_classes=9, bf16=True))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    imgs = jnp.zeros((BATCH, CROP, CROP, 3), jnp.float32)
    cats = jnp.zeros((BATCH,), jnp.int32)
    variables = model.init({'params': key, 'dropout': key}, imgs, cats)

    mean = jnp.asarray([0.5931, 0.4690, 0.4229]) * 255
    std = jnp.asarray([0.2471, 0.2214, 0.2157]) * 255

    @jax.jit
    def infer(raw_u8):
        x = (raw_u8.astype(jnp.float32) - mean) / std
        kp, logits = model.apply(variables, x, export=True)
        label = jnp.argmax(logits, axis=1)
        sel = jnp.take_along_axis(
            kp.transpose(1, 0, 2, 3), label[:, None, None, None].astype(jnp.int32)
            * jnp.ones((1, 1, 9, 2), jnp.int32), axis=1)[:, 0]
        return sel, label

    raw = jnp.asarray(np.random.randint(0, 255, (BATCH, CROP, CROP, 3)),
                      jnp.uint8)
    out = infer(raw)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_iters):
        out = infer(raw)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return BATCH * n_iters / elapsed


def main():
    baseline = get_baseline()
    tpu_fps = measure_tpu()
    base_fps = baseline['torch_cpu_regressor_crops_per_sec']
    print(json.dumps({
        'metric': 'regressor crops/sec (224x224, stage-2 hot path)',
        'value': round(tpu_fps, 2),
        'unit': 'crops/sec/chip',
        'vs_baseline': round(tpu_fps / base_fps, 2),
    }))


if __name__ == '__main__':
    main()
