# Stage-1 box-quality arm (VERDICT r4 item 1): identical recipe to
# mnv2_ssd_300_scene.py plus two flag-gated localization levers —
#   * cascade=True: a second per-level regression head regressing the
#     residual from the stage-1 decoded box at CASCADE_STDS, assigned at
#     the tighter 0.5 IoU (tpudet3d/detect/ssd.py, losses.py);
#   * giou_weight=2.0: (1 - GIoU) over positives added to each stage's
#     SmoothL1 so the optimizer sees the overlap metric the chain's crop
#     framing actually consumes.
# Goal: matched mean IoU 0.871 -> >=0.90 on the held-out protocol scenes
# (benchmarks/validation/eval_box_quality.py) and the undiluted hard-NMS
# chain row 0.621 -> >=0.67 (GT-box ceiling 0.698).  Reference detector
# being tightened: the clustered-anchor SSD it outsources to mmdetection
# (/root/reference/configs/detection/mnv2_ssd_300_2_heads.py).
input_size = 300

data = dict(
    root='',
    train_batch_size=64,
    val_batch_size=64,
    max_epochs=40,
    num_workers=4,
    min_size=17,
    max_boxes=16,
    synthetic='scene',
    synthetic_length=3072,
    scene_seed=23,
    scene_cache='./output/scene_cache',
)

model = dict(name='mnv2_ssd_300', num_classes=9, width_mult=1.0, bf16=True,
             cascade=True)

data_parallel = dict(use_parallel=True, num_devices=None)

optim = dict(name='sgd', lr=0.05, momentum=0.9, wd=5e-4)

scheduler = dict(policy='step', warmup_iters=300, warmup_ratio=1.0 / 3,
                 steps=[25, 30, 35], gamma=0.1)

train_cfg = dict(pos_iou_thr=0.4, neg_iou_thr=0.4, neg_pos_ratio=3,
                 smoothl1_beta=1.0, loss_balancing=False,
                 uniform_neg_weight=0.1,
                 giou_weight=2.0, cascade_pos_thr=0.5)

test_cfg = dict(nms_iou=0.45, score_thr=0.02, max_per_img=200)

augment = dict(flip_p=0.5, rot_p=0.0, expand_crop=False)

output_dir = './output/detector_cascade'

utils = dict(random_seeds=5, save_freq=5, print_freq=20)
