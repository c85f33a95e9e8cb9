import os.path as _osp
import sys
sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
from tpudet3d.core import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp, optax
from tpudet3d.detect import SSDDetector, generate_anchors, decode_detections
from tpudet3d.detect.train import create_detector_state, make_detector_train_step
from tpudet3d.data.detection_dataset import SyntheticDetection
from tpudet3d.detect.assigner import iou_xyxy

model = SSDDetector(num_classes=9, dtype=jnp.float32)
opt = optax.inject_hyperparams(lambda learning_rate: optax.sgd(learning_rate, momentum=0.9))(learning_rate=0.02)
state = create_detector_state(model, opt, jax.random.PRNGKey(0), 300, 2)
step = make_detector_train_step(model, opt)
anchors = jnp.asarray(generate_anchors())

ds = SyntheticDetection(length=8, input_size=300, max_boxes=4)
items = [ds[i] for i in range(8)]
imgs = jnp.asarray(np.stack([it[0] for it in items]).astype(np.float32)[..., ::-1] / 255.0)
boxes = jnp.asarray(np.stack([it[1] for it in items]))
labels = jnp.asarray(np.stack([it[2] for it in items]))
valid = jnp.asarray(np.stack([it[3] for it in items]))
print('gt counts:', np.asarray(valid).sum(1), flush=True)

for i in range(400):
    state, metrics = step(state, imgs, boxes, labels, valid)
    if i % 100 == 0:
        m = np.asarray(metrics)
        print(f'step {i}: loss {m[0]:.3f} cls {m[1]:.3f} reg {m[2]:.3f} npos {m[3]:.1f}', flush=True)

variables = {'params': state.params, 'batch_stats': state.batch_stats}
logits, deltas = jax.jit(lambda x: model.apply(variables, x, train=False))(imgs)
hits = total = 0
for i in range(8):
    dets = np.asarray(decode_detections(logits[i], deltas[i], anchors, max_per_img=8, pre_nms_k=32))
    gt = np.asarray(boxes[i])[np.asarray(valid[i])]
    glab = np.asarray(labels[i])[np.asarray(valid[i])]
    ious = np.asarray(iou_xyxy(jnp.asarray(dets[:, :4]), jnp.asarray(gt)))
    print(f'img{i}: max score {dets[:,4].max():.3f} det_labels {dets[:3,5].astype(int)} gt {glab}', flush=True)
    for g in range(len(gt)):
        total += 1
        if np.any((ious[:, g] > 0.5) & (dets[:, 4] > 0.3)):
            hits += 1
print(f'overfit recall: {hits}/{total}', flush=True)
