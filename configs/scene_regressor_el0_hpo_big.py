# Recipe-scaling arm on the WINNING loss (VERDICT r4 item 2): the `big`
# recipe (2x scenes, 60 epochs, weight EMA 0.998) on the repo's own HPO
# WingLoss w=4.6616/eps=0.0967 that beat the inherited w=5.18/eps=1 on
# every chain column (BASELINE.md round 4).  Replaces the stale
# scene_regressor_el0_wing_big.py, which scaled the superseded loss.
# Same schema as configs/default_config.py.

data = dict(
    root='',
    resize=(224, 224),
    train_batch_size=128,
    val_batch_size=128,
    max_epochs=60,
    num_workers=4,
    category_list='all',
    normalization=dict(mean=[0.5931, 0.4690, 0.4229],
                       std=[0.2471, 0.2214, 0.2157]),
    synthetic='scene',
    synthetic_length=8192,
    scene_seed=23,
    scene_cache='./output/scene_cache',
)

model = dict(name='efficientnet-lite0', pretrained=False, num_classes=9,
             bf16=True, load_weights='', resume='')

data_parallel = dict(use_parallel=True, num_devices=None)

optim = dict(name='adam', lr=0.001, momentum=0.9, wd=1e-4, betas=(0.9, 0.999),
             rho=0.9, alpha=0.99, nesterov=True, ema_decay=0.998)

scheduler = dict(name='multistepLR', gamma=0.6, exp_gamma=0.975,
                 steps=[33, 45, 54])

loss = dict(names=['wing', 'add_loss', 'cross_entropy'], coeffs=([1., .1], [.2]),
            smoothl1_beta=0.2,
            alwa=dict(use=False, lam_cls=1., lam_reg=1., C=100,
                      compute_std=True),
            w=4.6616, eps=0.0967)

output_dir = './output/scene_regressor_el0_hpo_big'

# save_freq 3 (not the family's 10): this 60-epoch cell trains across
# driver-session boundaries that wipe nothing but CAN cut the process,
# so dense snapshots keep the resume/measure queue's epoch-tagged rows
# cheap.  Snapshot cadence does not affect the training math.
utils = dict(debug_mode=False, random_seeds=5, save_freq=3, print_freq=20,
             debug_steps=100, eval_freq=5)

regime = dict(type='training', vis_only=False)

train_data_pipeline = [('convert_color', dict()),
                       ('horizontal_flip', dict(p=0.4)),
                       ('random_brightness_contrast', dict(p=0.3)),
                       ('random_rotate', dict(angle_limit=10., p=0.4)),
                       ('normalize', data['normalization']),
                       ('to_tensor', dict(img_shape=data['resize']))]

test_data_pipeline = [('convert_color', dict()),
                      ('normalize', data['normalization']),
                      ('to_tensor', dict(img_shape=data['resize']))]
