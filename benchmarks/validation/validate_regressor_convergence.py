"""Regressor convergence demo: synthetic wireframe boxes, 25 epochs."""
import os.path as _osp
import sys, time
sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..', 'tests'))
from tpudet3d.core import enable_compile_cache
enable_compile_cache()
import numpy as np, jax
from tpudet3d.core import AttrDict
from tpudet3d.train.pipeline import setup_training
from tpudet3d.train.optim import set_learning_rate
from tpudet3d.eval.evaluator import Evaluator

norm = dict(mean=[0.5931, 0.4690, 0.4229], std=[0.2471, 0.2214, 0.2157])
cfg = AttrDict(
    data=dict(root='', resize=(128, 128), train_batch_size=128,
              val_batch_size=128, max_epochs=25, num_workers=4,
              category_list='all', synthetic=True, synthetic_length=2048,
              normalization=norm),
    model=dict(name='mobilenetv3_small', pretrained=False, num_classes=9, bf16=True),
    data_parallel=dict(use_parallel=True, num_devices=None),
    optim=dict(name='adam', lr=2e-3, momentum=0.9, wd=1e-4, betas=(0.9, 0.999),
               rho=0.9, alpha=0.99, nesterov=True),
    scheduler=dict(name='multistepLR', gamma=0.3, exp_gamma=0.975, steps=[15, 21]),
    loss=dict(names=['l1', 'add_loss', 'cross_entropy'], coeffs=([1., .1], [.2]),
              smoothl1_beta=0.2,
              alwa=dict(use=False, lam_cls=1., lam_reg=1., C=100, compute_std=True),
              w=5.18, eps=1.),
    output_dir='/tmp/reg_conv',
    utils=dict(debug_mode=False, random_seeds=5, save_freq=100, print_freq=100,
               debug_steps=100, eval_freq=5),
    regime=dict(type='training', vis_only=False),
    train_data_pipeline=[('convert_color', dict()),
                         ('horizontal_flip', dict(p=0.4)),
                         ('random_brightness_contrast', dict(p=0.3)),
                         ('random_rotate', dict(angle_limit=10., p=0.4)),
                         ('normalize', norm), ('to_tensor', dict())],
    test_data_pipeline=[('convert_color', dict()), ('normalize', norm),
                        ('to_tensor', dict())])

pipe = setup_training(cfg)
state = pipe.state
rng = jax.random.PRNGKey(7)
t0 = time.time()
for epoch in range(25):
    set_learning_rate(state.opt_state, pipe.lr_schedule(epoch))
    for imgs, kps, cats, _n in pipe.train_loader:
        rng, k = jax.random.split(rng)
        state, metrics = pipe.train_step(state, pipe.put_fn(imgs),
                                         pipe.put_fn(kps), pipe.put_fn(cats), k)
    if epoch % 5 == 4 or epoch == 0:
        m = np.asarray(metrics)
        print(f'epoch {epoch}: loss {m[0]:.4f} ADD {m[1]:.4f} SADD {m[2]:.4f} acc {m[3]:.3f} ({time.time()-t0:.0f}s)', flush=True)

ev = Evaluator(eval_step=pipe.eval_step, state_fn=lambda: state,
               val_loader=pipe.val_loader, test_loader=pipe.test_loader,
               test_transform=pipe.test_aug, put_fn=pipe.put_fn)
add, sadd, acc, iou = ev.val(epoch=24, compute_iou=True)
print(f'FINAL: ADD {add:.4f} SADD {sadd:.4f} acc {acc:.3f} IoU {iou:.4f}', flush=True)
