"""Evaluator: validation metrics + visual test (reference
torchdet3d/evaluation/evaluate.py).

The per-batch work — forward, ADD/SADD/acc, EPnP lift + oriented 3D IoU —
is one jitted program producing per-class sums (train/steps.make_eval_step);
the host only accumulates 9x5 scalars per batch.  The reference instead
round-trips every batch to numpy and runs per-sample qhull (SURVEY.md §3.2).
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import AverageMeter, TextTable, OBJECTRON_CLASSES, mkdir_if_missing
from ..utils.drawing import draw_kp
from ..train.state import eval_params

__all__ = ['Evaluator']


@dataclass
class Evaluator:
    eval_step: Callable     # jitted (params, bstats, imgs, kps, cats) -> segment sums
    state_fn: Callable      # () -> current TrainState (picks up trainer updates)
    val_loader: Any
    test_loader: Any
    test_transform: Optional[Callable]  # jitted batched test pipeline
    writer: Any = None
    max_epoch: int = 0
    num_classes: int = len(OBJECTRON_CLASSES)
    samples: Any = 'random'
    num_samples: int = 10
    path_to_save_imgs: str = './testing_images'
    debug: bool = False
    debug_steps: int = 30
    test_dataset: Any = None
    put_fn: Callable = jnp.asarray
    rng: Any = field(default_factory=lambda: jax.random.PRNGKey(1))

    def val(self, epoch=None, compute_iou=True):
        """Full validation epoch; prints the per-class table and returns
        (ADD, SADD, ACC, IOU) averages."""
        meters = {name: AverageMeter() for name in ('ADD', 'SADD', 'ACC', 'IOU')}
        cls_sums = np.zeros((self.num_classes, 4), np.float64)
        cls_counts = np.zeros(self.num_classes, np.float64)

        state = self.state_fn()
        for it, (imgs, kps, cats, true_n) in enumerate(self.val_loader):
            imgs_d = self.put_fn(imgs)
            kps_d = self.put_fn(kps)
            cats_d = self.put_fn(cats)
            if self.test_transform is not None:
                self.rng, key = jax.random.split(self.rng)
                imgs_d, kps_d = self.test_transform(imgs_d, kps_d, key)
            # mask padded tail samples of the (static-shape) final batch
            weights = jnp.asarray(
                (np.arange(imgs.shape[0]) < true_n).astype(np.float32))
            (add_s, sadd_s, iou_s, acc_s, counts), _ = self.eval_step(
                eval_params(state), state.batch_stats, imgs_d, kps_d, cats_d,
                weights, compute_iou=bool(compute_iou))
            add_s, sadd_s, iou_s, acc_s, counts = map(
                np.asarray, (add_s, sadd_s, iou_s, acc_s, counts))
            bs = int(true_n)
            # batch means (reference meters weight by batch size)
            meters['ADD'].update(add_s.sum() / bs, bs)
            meters['SADD'].update(sadd_s.sum() / bs, bs)
            meters['ACC'].update(acc_s.sum() / bs, bs)
            meters['IOU'].update(iou_s.sum() / bs, bs)
            cls_sums += np.stack([add_s, sadd_s, acc_s, iou_s], 1)
            cls_counts += counts
            if self.debug and it == self.debug_steps:
                break

        if epoch is not None and self.writer is not None:
            self.writer.add_scalar('Val/ADD', meters['ADD'].avg, global_step=epoch)
            self.writer.add_scalar('Val/SADD', meters['SADD'].avg, global_step=epoch)
            self.writer.add_scalar('Val/ACC', meters['ACC'].avg, global_step=epoch)
            if compute_iou:
                self.writer.add_scalar('Val/IOU', meters['IOU'].avg, global_step=epoch)

        header = ['category name', 'ADD', 'SADD', 'accuracy']
        if compute_iou:
            header.append('IOU')
        table = TextTable(header)
        avg_row = ['Average metrics', meters['ADD'].avg, meters['SADD'].avg,
                   meters['ACC'].avg]
        if compute_iou:
            avg_row.append(meters['IOU'].avg)
        table.add_row(avg_row)
        for cls_ in range(self.num_classes):
            n = max(cls_counts[cls_], 1)
            row = [OBJECTRON_CLASSES[cls_], cls_sums[cls_, 0] / n,
                   cls_sums[cls_, 1] / n, cls_sums[cls_, 2] / n]
            if compute_iou:
                row.append(cls_sums[cls_, 3] / n)
            table.add_row(row)
        ep_mess = f'epoch: {epoch}\n' if epoch is not None else ''
        print(f'\nComputed val metrics:\n{ep_mess}{table}', flush=True)
        return (meters['ADD'].avg, meters['SADD'].avg, meters['ACC'].avg,
                meters['IOU'].avg)

    def visual_test(self):
        """Sample N test items, draw GT vs predicted keypoints re-projected
        to the original frame (reference evaluate.py:31-72)."""
        if self.test_dataset is None:
            print('visual_test: no test dataset configured, skipping')
            return
        ds = self.test_dataset
        mkdir_if_missing(self.path_to_save_imgs)
        if self.samples == 'random':
            indexes = np.random.choice(len(ds), min(self.num_samples, len(ds)),
                                       replace=False)
        else:
            indexes = self.samples

        state = self.state_fn()
        for idx in indexes:
            orig_img, img, kps_px, cat, crop_cords = ds[int(idx)]
            imgs_d = jnp.asarray(img[None])
            kps_d = jnp.asarray(kps_px[None])
            if self.test_transform is not None:
                self.rng, key = jax.random.split(self.rng)
                imgs_d, kps_d = self.test_transform(imgs_d, kps_d, key)
            _, (pred_kp, logits) = self.eval_step(
                eval_params(state), state.batch_stats, imgs_d, kps_d,
                jnp.asarray([cat], jnp.int32), compute_iou=False)
            pred_kp = np.array(pred_kp[0])      # writable copies
            gt_kp = np.array(kps_d[0])
            draw_kp(orig_img, self.transform_kp(gt_kp.copy(), crop_cords),
                    f'{self.path_to_save_imgs}/tested_image_{idx}_true.jpg',
                    RGB=False, normalized=False)
            label = OBJECTRON_CLASSES[int(np.argmax(np.asarray(logits[0])))]
            draw_kp(orig_img, self.transform_kp(pred_kp, crop_cords),
                    f'{self.path_to_save_imgs}/tested_image_{idx}_predicted.jpg',
                    RGB=False, normalized=False, label=label)
        print(f'visual test images saved to {self.path_to_save_imgs}')

    def run_eval_pipe(self, visual_only=False):
        print('.' * 10, 'Run evaluating protocol', '.' * 10)
        if not visual_only:
            self.val(compute_iou=True)
        self.visual_test()

    @staticmethod
    def transform_kp(kp, crop_cords):
        """[0,1] crop coords → original-frame pixels (reference :157-165)."""
        x0, y0, x1, y1 = crop_cords
        kp[:, 0] = kp[:, 0] * (x1 - x0) + x0
        kp[:, 1] = kp[:, 1] * (y1 - y0) + y0
        return kp
