# MobileNetV2-SSD-300 2-heads detector training config (tpudet3d-native).
# Mirrors the capability surface of the reference's external-mmdetection
# config (/root/reference/configs/detection/mnv2_ssd_300_2_heads.py) with
# the framework's own schema.

input_size = 300

data = dict(
    root='./data',
    train_batch_size=80,
    val_batch_size=80,
    max_epochs=40,
    num_workers=4,
    min_size=17,
    max_boxes=16,
    synthetic=False,
    synthetic_length=2048,
)

model = dict(name='mnv2_ssd_300', num_classes=9, width_mult=1.0, bf16=True)

data_parallel = dict(use_parallel=True, num_devices=None)

optim = dict(name='sgd', lr=0.05, momentum=0.9, wd=5e-4)

scheduler = dict(policy='step', warmup_iters=1200, warmup_ratio=1.0 / 3,
                 steps=[25, 30, 35], gamma=0.1)

# loss_balancing: clamped learned weighting available, but plain sum
# converges much faster on short schedules (tpudet3d/detect/losses.py note);
# the reference's mmdet fork enables its own variant (config :39)
train_cfg = dict(pos_iou_thr=0.4, neg_iou_thr=0.4, neg_pos_ratio=3,
                 smoothl1_beta=1.0, loss_balancing=False,
                 uniform_neg_weight=0.1)

test_cfg = dict(nms_iou=0.45, score_thr=0.02, max_per_img=200)

augment = dict(flip_p=0.5, rot_p=0.5)

output_dir = './output/detector'

utils = dict(random_seeds=5, save_freq=5, print_freq=20)
