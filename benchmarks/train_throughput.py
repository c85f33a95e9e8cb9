"""Regressor training throughput (device-resident batch, real chip).

Usage: python benchmarks/train_throughput.py [--batch 128]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from tpudet3d.core import AttrDict
from tpudet3d.train.pipeline import setup_training

NORM = dict(mean=[0.5931, 0.4690, 0.4229], std=[0.2471, 0.2214, 0.2157])


def make_cfg(batch):
    return AttrDict(
        data=dict(root='', resize=(224, 224), train_batch_size=batch,
                  val_batch_size=batch, max_epochs=2, num_workers=4,
                  category_list='all', synthetic=True, synthetic_length=256,
                  normalization=NORM),
        model=dict(name='mobilenetv3_large_21k', pretrained=False,
                   num_classes=9, bf16=True),
        data_parallel=dict(use_parallel=True, num_devices=None),
        optim=dict(name='adam', lr=1e-3, momentum=0.9, wd=1e-4,
                   betas=(0.9, 0.999), rho=0.9, alpha=0.99, nesterov=True),
        scheduler=dict(name='multistepLR', gamma=0.6, exp_gamma=0.975,
                       steps=[60]),
        loss=dict(names=['l1', 'add_loss', 'cross_entropy'],
                  coeffs=([1., .1], [.2]), smoothl1_beta=0.2,
                  alwa=dict(use=False, lam_cls=1., lam_reg=1., C=100,
                            compute_std=True), w=5.18, eps=1.),
        output_dir='/tmp/bench_train',
        utils=dict(debug_mode=False, random_seeds=5, save_freq=100,
                   print_freq=100, debug_steps=100, eval_freq=100),
        regime=dict(type='training', vis_only=False),
        train_data_pipeline=[('convert_color', dict()),
                             ('horizontal_flip', dict(p=0.4)),
                             ('random_brightness_contrast', dict(p=0.3)),
                             ('random_rotate', dict(angle_limit=10., p=0.4)),
                             ('normalize', NORM), ('to_tensor', dict())],
        test_data_pipeline=[('convert_color', dict()), ('normalize', NORM),
                            ('to_tensor', dict())])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--iters', type=int, default=30)
    args = parser.parse_args()
    pipe = setup_training(make_cfg(args.batch), with_loaders=False)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.randint(key, (args.batch, 224, 224, 3), 0, 255,
                              jnp.int32).astype(jnp.uint8)
    kps = jax.random.uniform(key, (args.batch, 9, 2)) * 224
    cats = jax.random.randint(key, (args.batch,), 0, 9)
    state, metrics = pipe.train_step(pipe.state, imgs, kps, cats, key)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(args.iters):
        state, metrics = pipe.train_step(state, imgs, kps, cats,
                                         jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)
    dt = time.time() - t0
    print(f'batch {args.batch}: {dt / args.iters * 1000:.1f} ms/step, '
          f'{args.batch * args.iters / dt:.0f} img/s')


if __name__ == '__main__':
    main()
