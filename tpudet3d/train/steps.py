"""Jitted train / eval step factories.

The hot loop (reference torchdet3d/trainer/train.py:42-108) becomes a single
compiled XLA program: forward (multi-head select), loss (incl. ALWA state
transition), backward, optimizer update, and the on-the-fly ADD/SADD/acc
metrics — no per-batch ``.item()`` device syncs; metrics come back as one
small device array per step.

Data parallelism: the batch arrives sharded over the mesh 'data' axis
(parallel.shard_batch) and the state replicated; jit/GSPMD inserts the
gradient all-reduce.  ``donate_argnums=0`` recycles the state buffers.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..eval.metrics import add_sadd_per_sample, NUM_KEYPOINTS
from .state import TrainState

__all__ = ['make_train_step', 'make_eval_step']


def make_train_step(model, loss_manager, optimizer, augment_fn=None,
                    ema_decay=0.0):
    """``augment_fn`` (batched device augmentation) is traced INTO the same
    jitted program when given: the raw uint8 batch goes straight from HBM
    through augment into the first conv with no intermediate f32 image
    round-trip (measured: 24.3 → 16.5 ms/step at batch 128 on v5e-1).

    ``ema_decay > 0`` maintains an exponential moving average of the
    params inside the same program (one fused elementwise sweep per
    step; XLA fuses it with the optimizer update, so it is
    bandwidth-free relative to a separate dispatch)."""
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, gt_kp, gt_cats, rng_key):
        if augment_fn is not None:
            aug_key, dropout_key = jax.random.split(rng_key)
            imgs_a, gt_kp_a = augment_fn(imgs, gt_kp, aug_key)
        else:
            dropout_key = rng_key
            imgs_a, gt_kp_a = imgs, gt_kp

        def loss_fn(params):
            (kp, logits), mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                imgs_a, gt_cats, train=True,
                rngs={'dropout': dropout_key},
                mutable=['batch_stats'])
            loss, new_alwa = loss_manager.parse_losses(
                kp, gt_kp_a, logits, gt_cats, state.step, state.alwa)
            return loss, (mutated['batch_stats'], kp, logits, new_alwa)

        (loss, (new_bs, kp, logits, new_alwa)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        add_sum, sadd_sum = add_sadd_per_sample(kp, gt_kp_a)
        metrics = jnp.stack([
            loss,
            jnp.mean(add_sum) / NUM_KEYPOINTS,
            jnp.mean(sadd_sum) / NUM_KEYPOINTS,
            jnp.mean((jnp.argmax(logits, axis=1) == gt_cats).astype(jnp.float32)),
        ])
        if ema_decay > 0:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt_state, alwa=new_alwa,
                               step=state.step + 1, ema_params=new_ema)
        return new_state, metrics

    return train_step


def make_eval_step(model, num_classes=9):
    """Per-batch evaluation: per-class metric sums + counts, on device
    (replaces reference evaluate.py:88-114 + metrics.py:39-89).
    ``compute_iou`` is a static arg: two compiled variants, matching the
    reference's skip of the expensive 3D IoU on non-final epochs
    (SURVEY.md §8.16)."""
    from ..eval.metrics import _metrics_segments

    @partial(jax.jit, static_argnames=('compute_iou',))
    def eval_step(params, batch_stats, imgs, gt_kp, gt_cats, weights=None,
                  compute_iou=True):
        kp, logits = model.apply({'params': params, 'batch_stats': batch_stats},
                                 imgs, gt_cats, train=False)
        return _metrics_segments(kp, gt_kp, logits, gt_cats,
                                 num_classes, compute_iou, weights), (kp, logits)

    return eval_step
