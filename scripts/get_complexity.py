"""Model complexity report: FLOPs/MACs + parameter count via XLA cost
analysis (reference scripts/get_complexity.py uses ptflops)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from tpudet3d.core import read_py_config

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.models import build_model
from tpudet3d.train import param_count


def main():
    parser = argparse.ArgumentParser(description='Estimating model complexity')
    parser.add_argument('--config', type=str, required=True)
    args = parser.parse_args()
    cfg = read_py_config(args.config)
    model = build_model(cfg, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    shape = (1, *cfg.data.resize, 3)
    x = jnp.zeros(shape, jnp.float32)
    cats = jnp.zeros((1,), jnp.int32)
    # host copy: lowering a closure over on-device params fetches each
    # leaf separately over the host link (see infer/export.py)
    variables = jax.device_get(
        jax.jit(model.init)({'params': key, 'dropout': key}, x, cats))

    def fwd(img):
        return model.apply(variables, img, export=True)

    lowered = jax.jit(fwd).lower(x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    n_params = param_count(variables['params'])
    print(f'{"Input shape:":<30} {str(shape):<8}')
    print(f'{"Computational complexity:":<30} {flops / 2 / 1e6:.2f} MMac '
          f'({flops / 1e9:.3f} GFLOPs)')
    print(f'{"Number of parameters:":<30} {n_params / 1e6:.2f} M')


if __name__ == '__main__':
    main()
