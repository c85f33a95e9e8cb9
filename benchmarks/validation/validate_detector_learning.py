import os.path as _osp
import sys, time
sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
from tpudet3d.core import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp, optax
from tpudet3d.detect import SSDDetector, generate_anchors, decode_detections
from tpudet3d.detect.train import create_detector_state, make_detector_train_step, warmup_step_lr
from tpudet3d.data.detection_dataset import SyntheticDetection
from tpudet3d.data.det_transforms import build_detector_augmentations
from tpudet3d.detect.assigner import iou_xyxy

model = SSDDetector(num_classes=9, dtype=jnp.bfloat16)
opt = optax.inject_hyperparams(lambda learning_rate: optax.chain(
    optax.add_decayed_weights(5e-4),
    optax.sgd(learning_rate, momentum=0.9)))(learning_rate=0.01)
state = create_detector_state(model, opt, jax.random.PRNGKey(0), 300, 2)
step = make_detector_train_step(model, opt)
aug = jax.jit(build_detector_augmentations())
test_aug = jax.jit(build_detector_augmentations(train=False))
anchors = jnp.asarray(generate_anchors())

ds = SyntheticDetection(length=256, input_size=300, max_boxes=4)
def batch(idx):
    items = [ds[int(i) % len(ds)] for i in idx]
    return tuple(np.stack([it[k] for it in items]) for k in range(4))

B = 32
lr_fn = warmup_step_lr(base_lr=0.05, warmup_iters=100, milestones=(400,), gamma=0.3, steps_per_epoch=1)

def evaluate(state, tag):
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    hits = total = 0
    max_scores = []
    for i in range(300, 316):
        img, boxes, labels, valid = ds[i % len(ds)]
        img_d, _ = test_aug(jnp.asarray(img[None]), jnp.asarray(boxes[None]), jax.random.PRNGKey(0))
        logits, deltas = fwd(img_d)
        dets = np.asarray(decode_detections(logits[0], deltas[0], anchors, max_per_img=8, pre_nms_k=32))
        max_scores.append(dets[:, 4].max())
        gt = boxes[valid]
        if not len(gt): continue
        ious = np.asarray(iou_xyxy(jnp.asarray(dets[:, :4]), jnp.asarray(gt)))
        for g in range(len(gt)):
            total += 1
            if np.any((ious[:, g] > 0.5) & (dets[:, 4] > 0.3)):
                hits += 1
    print(f'[{tag}] recall@0.5: {hits}/{total}, max scores: '
          f'{np.mean(max_scores):.3f}±{np.std(max_scores):.3f}', flush=True)

t0=time.time()
for i in range(600):
    imgs, boxes, labels, valid = batch(np.random.RandomState(i).randint(0, 256, B))
    state.opt_state.hyperparams['learning_rate'] = jnp.asarray(float(lr_fn(i)), jnp.float32)
    imgs_d, boxes_d = aug(jnp.asarray(imgs), jnp.asarray(boxes), jax.random.PRNGKey(i))
    state, metrics = step(state, imgs_d, boxes_d, jnp.asarray(labels), jnp.asarray(valid))
    if i % 100 == 0:
        m = np.asarray(metrics)
        print(f'step {i}: loss {m[0]:.3f} cls {m[1]:.3f} reg {m[2]:.3f} npos {m[3]:.1f} ({time.time()-t0:.0f}s)', flush=True)
        evaluate(state, f'step{i}')
evaluate(state, 'final')
