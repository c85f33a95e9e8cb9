"""Detector training: jitted SSD train step + epoch driver.

The reference delegates this entirely to an external mmdetection fork
(SGD lr 0.05, warmup 1200 iters, steps [25,30,35], 40 epochs — config
:145-164).  Here it is a first-class component: one donated-state jitted
step (forward → assign → mine → loss → SGD), data-parallel over the mesh.
The ``loss_balancing`` weights are trainable parameters alongside the
network (config :39).
"""

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core import AverageMeter
from .anchors import generate_anchors
from .losses import ssd_loss

__all__ = ['DetTrainState', 'create_detector_state', 'make_detector_train_step',
           'warmup_step_lr', 'DetectorTrainer']


@struct.dataclass
class DetTrainState:
    params: Any
    balance: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA of the model params (optim.ema_decay > 0); None when disabled.
    # Same semantics as the regressor TrainState (train/state.py).
    ema_params: Any = None


def warmup_step_lr(base_lr=0.05, warmup_iters=1200, warmup_ratio=1.0 / 3,
                   milestones=(25, 30, 35), gamma=0.1, steps_per_epoch=100):
    """mmdet 'step' policy with linear warmup (reference config :148-153),
    as a pure function of the global step — jit-friendly."""
    milestones = tuple(int(m) * steps_per_epoch for m in milestones)

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) *
                          jnp.minimum(step / warmup_iters, 1.0))
        decay = gamma ** sum((step >= m).astype(jnp.float32)
                             for m in milestones)
        return warm * decay

    return lr


def create_detector_state(model, optimizer, rng, input_size=300, batch=2,
                          ema_decay=0.0):
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    # jitted: eager flax init dispatches hundreds of tiny device ops — on a
    # high-RTT host->TPU link that costs minutes; one compiled (and
    # persistently cached) program costs ~1 s warm
    variables = jax.jit(model.init)(rng, x)
    params = variables['params']
    balance = {'s_cls': jnp.zeros(()), 's_reg': jnp.zeros(())}
    opt_state = optimizer.init({'model': params, 'balance': balance})
    return DetTrainState(params=params, balance=balance,
                         batch_stats=variables.get('batch_stats', {}),
                         opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                         # a COPY — aliased buffers break donated steps
                         ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                                     if ema_decay > 0 else None))


def make_detector_train_step(model, optimizer, lr_fn=None, use_balance=False,
                             input_size=None, ema_decay=0.0, giou_weight=0.0,
                             cascade_pos_thr=0.5):
    """``use_balance`` enables the (clamped) learned loss weighting; plain
    sum converges faster on short schedules (see losses.ssd_loss note).
    ``input_size`` overrides the anchor grid (default: reference 300).
    A cascade model (SSDDetector(cascade=True)) returns per-stage deltas
    in train mode; the loss then adds the stage-2 term automatically."""
    anchors = jnp.asarray(generate_anchors()
                          if input_size is None else
                          generate_anchors(input_size))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: DetTrainState, imgs, gt_boxes, gt_labels, gt_valid):
        def loss_fn(trainable):
            (logits, deltas), mutated = model.apply(
                {'params': trainable['model'],
                 'batch_stats': state.batch_stats},
                imgs, train=True, mutable=['batch_stats'])
            if isinstance(deltas, tuple):
                deltas, deltas2 = deltas
            else:
                deltas2 = None
            balance = ((trainable['balance']['s_cls'],
                        trainable['balance']['s_reg'])
                       if use_balance else None)
            total, parts = ssd_loss(
                logits, deltas, anchors, gt_boxes, gt_labels, gt_valid,
                balance_params=balance, cascade_deltas=deltas2,
                cascade_pos_thr=cascade_pos_thr, giou_weight=giou_weight)
            return total, (mutated['batch_stats'], parts)

        trainable = {'model': state.params, 'balance': state.balance}
        (total, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, new_opt = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        metrics = jnp.stack([total, parts['cls_loss'], parts['reg_loss'],
                             parts['num_pos']])
        if ema_decay > 0:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                state.ema_params, new_trainable['model'])
        else:
            new_ema = state.ema_params
        return DetTrainState(params=new_trainable['model'],
                             balance=new_trainable['balance'],
                             batch_stats=new_bs, opt_state=new_opt,
                             step=state.step + 1, ema_params=new_ema), metrics

    return train_step


@dataclass
class DetectorTrainer:
    """Epoch driver for the SSD stage (reference: external mmdet runner)."""
    train_step: Callable
    state: Any
    train_loader: Any
    lr_fn: Optional[Callable]
    opt_set_lr: Callable
    max_epoch: int
    log_path: str
    writer: Any = None
    print_freq: int = 20
    save_freq: int = 5
    augment_fn: Optional[Callable] = None
    put_fn: Callable = jnp.asarray
    rng: Any = None

    def train(self, epoch, is_last_epoch):
        meters = [AverageMeter() for _ in range(4)]
        names = ('loss', 'cls', 'reg', 'npos')
        t0 = time.time()
        for it, batch in enumerate(self.train_loader):
            imgs, boxes, labels, valid = batch[:4]
            if self.lr_fn is not None:
                self.opt_set_lr(self.state.opt_state,
                                float(self.lr_fn(int(np.asarray(self.state.step)))))
            imgs_d = self.put_fn(imgs)
            boxes_d = self.put_fn(boxes)
            labels_d = self.put_fn(labels)
            valid_d = self.put_fn(valid)
            if self.augment_fn is not None:
                self.rng, key = jax.random.split(self.rng)
                imgs_d, boxes_d = self.augment_fn(imgs_d, boxes_d, key)
            self.state, metrics = self.train_step(self.state, imgs_d, boxes_d,
                                                  labels_d, valid_d)
            if it % self.print_freq == 0:
                m = np.asarray(metrics)
                for meter, v in zip(meters, m):
                    meter.update(float(v), imgs.shape[0])
                msg = ' '.join(f'{n} {mm.val:.4f}({mm.avg:.4f})'
                               for n, mm in zip(names, meters))
                print(f'det epoch [{epoch}/{self.max_epoch}][{it}] {msg} '
                      f'({time.time() - t0:.1f}s)', flush=True)
                if self.writer is not None:
                    step = int(np.asarray(self.state.step))
                    for n, v in zip(names, m):
                        self.writer.add_scalar(f'Det/{n}', float(v), step)
        if epoch % self.save_freq == 0 or is_last_epoch:
            from ..utils.checkpoint import save_snap
            save_snap(self.state, epoch, self.log_path)
        return self.state
