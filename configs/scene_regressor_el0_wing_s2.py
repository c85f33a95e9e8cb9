# Seed-2 replicate of the wing arm (VERDICT r4 item 3): identical recipe
# to scene_regressor_el0_wing.py (inherited w=5.18/eps=1, same
# scene_seed=23 shards) with ONLY utils.random_seeds changed 5 -> 107 —
# the paired partner of scene_regressor_el0_hpo_s2.py.

data = dict(
    root='',
    resize=(224, 224),
    train_batch_size=128,
    val_batch_size=128,
    max_epochs=40,
    num_workers=4,
    category_list='all',
    normalization=dict(mean=[0.5931, 0.4690, 0.4229],
                       std=[0.2471, 0.2214, 0.2157]),
    synthetic='scene',
    synthetic_length=4096,
    scene_seed=23,
    scene_cache='./output/scene_cache',
)

model = dict(name='efficientnet-lite0', pretrained=False, num_classes=9,
             bf16=True, load_weights='', resume='')

data_parallel = dict(use_parallel=True, num_devices=None)

optim = dict(name='adam', lr=0.001, momentum=0.9, wd=1e-4, betas=(0.9, 0.999),
             rho=0.9, alpha=0.99, nesterov=True)

scheduler = dict(name='multistepLR', gamma=0.6, exp_gamma=0.975,
                 steps=[22, 30, 36])

loss = dict(names=['wing', 'add_loss', 'cross_entropy'], coeffs=([1., .1], [.2]),
            smoothl1_beta=0.2,
            alwa=dict(use=False, lam_cls=1., lam_reg=1., C=100,
                      compute_std=True),
            w=5.18, eps=1.)

output_dir = './output/scene_regressor_el0_wing_s2'

utils = dict(debug_mode=False, random_seeds=107, save_freq=10, print_freq=20,
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
