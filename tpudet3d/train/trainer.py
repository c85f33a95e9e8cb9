"""Epoch-driver Trainer (reference torchdet3d/trainer/train.py).

Everything hot runs in one jitted program (train/steps.py) — including
device-side augmentation — so the loop body is: enqueue next batch, read the
previous step's 4-scalar metric vector.  JAX's async dispatch gives the
pipelining the reference needed explicit DataLoader workers for.
"""

import datetime
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import AverageMeter
from ..utils.checkpoint import save_snap
from .optim import set_learning_rate, current_learning_rate

__all__ = ['Trainer']


@dataclass
class Trainer:
    train_step: Callable        # jitted (state, imgs, kps, cats, key) -> (state, metrics)
    state: Any
    train_loader: Any
    lr_schedule: Optional[Callable]   # epoch -> lr
    writer: Any
    max_epoch: int
    log_path: str
    augment_fn: Optional[Callable] = None  # jitted (imgs, kps, key) -> (imgs, kps)
    put_fn: Callable = jnp.asarray   # host batch -> (sharded) device array
    save_chkpt: bool = True
    debug: bool = False
    debug_steps: int = 30
    save_freq: int = 10
    print_freq: int = 10
    train_step_counter: int = 0
    rng: Any = field(default_factory=lambda: jax.random.PRNGKey(0))

    def train(self, epoch, is_last_epoch):
        """Train one epoch; returns the new state (functional style)."""
        losses, add_m, sadd_m, acc_m, batch_time = (
            AverageMeter(), AverageMeter(), AverageMeter(), AverageMeter(),
            AverageMeter())
        if self.lr_schedule is not None:
            set_learning_rate(self.state.opt_state, self.lr_schedule(epoch))
        lr = current_learning_rate(self.state.opt_state)

        num_iters = len(self.train_loader)
        start = time.time()
        pending = None  # (metrics_device, batch_size) — read one step late
        try:
            from tqdm import tqdm
            loop = tqdm(total=num_iters, leave=False,
                        desc=f'Epoch [{epoch}/{self.max_epoch}]')
        except ImportError:
            loop = None

        def drain(pending_item):
            metrics, bs, step_idx = pending_item
            m = np.asarray(metrics)
            if not np.all(np.isfinite(m)):
                # failure detection (SURVEY.md §5.3): surface divergence with
                # context instead of training on garbage
                raise FloatingPointError(
                    f'non-finite training metrics at step {step_idx}: '
                    f'loss={m[0]} ADD={m[1]} SADD={m[2]} acc={m[3]} '
                    f'(lr={lr}) — checkpoint at {self.log_path} can be '
                    f'resumed with a lower lr')
            losses.update(float(m[0]), bs)
            add_m.update(float(m[1]), bs)
            sadd_m.update(float(m[2]), bs)
            acc_m.update(float(m[3]), bs)
            if self.writer is not None:
                self.writer.add_scalar('Train/loss', float(m[0]),
                                       global_step=step_idx)
                self.writer.add_scalar('Train/ADD', add_m.avg,
                                       global_step=step_idx)
                self.writer.add_scalar('Train/SADD', sadd_m.avg,
                                       global_step=step_idx)
                self.writer.add_scalar('Train/ACC', acc_m.avg,
                                       global_step=step_idx)

        for it, (imgs, kps, cats, _true_n) in enumerate(self.train_loader):
            self.rng, aug_key, drop_key = jax.random.split(self.rng, 3)
            imgs_d = self.put_fn(imgs)
            kps_d = self.put_fn(kps)
            cats_d = self.put_fn(cats)
            if self.augment_fn is not None:
                imgs_d, kps_d = self.augment_fn(imgs_d, kps_d, aug_key)
            self.state, metrics = self.train_step(self.state, imgs_d, kps_d,
                                                  cats_d, drop_key)
            if pending is not None:
                drain(pending)       # previous step's metrics — no stall
            pending = (metrics, imgs.shape[0], self.train_step_counter)
            self.train_step_counter += 1

            batch_time.update(time.time() - start)
            nb_this = num_iters - (it + 1)
            nb_future = (self.max_epoch - (epoch + 1)) * num_iters
            eta = str(datetime.timedelta(
                seconds=int(batch_time.avg * (nb_this + nb_future))))
            if it % self.print_freq == 0 or it == num_iters - 1:
                print(f'epoch: [{epoch}/{self.max_epoch}][{it}/{num_iters}]\t'
                      f'time {batch_time.val:.3f} ({batch_time.avg:.3f})\t'
                      f'eta {eta}\t'
                      f'cls acc {acc_m.val:.3f} ({acc_m.avg:.3f})\t'
                      f'ADD {add_m.val:.4f} ({add_m.avg:.4f})\t'
                      f'SADD {sadd_m.val:.4f} ({sadd_m.avg:.4f})\t'
                      f'loss {losses.avg:.5f}\t'
                      f'lr {lr:.6f}', flush=True)
            if loop is not None:
                loop.update(1)
                loop.set_postfix(loss=losses.avg, ADD=add_m.avg,
                                 SADD=sadd_m.avg, acc=acc_m.avg, lr=lr)
            start = time.time()
            if self.debug and it == self.debug_steps:
                break

        if loop is not None:
            loop.close()
        if pending is not None:
            drain(pending)
        if self.save_chkpt and (epoch % self.save_freq == 0 or is_last_epoch) \
                and not self.debug:
            save_snap(self.state, epoch, self.log_path)
        return self.state
