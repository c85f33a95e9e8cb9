"""Worker subprocess for tests/test_multihost.py — executes the multi-host
seam for real: ``jax.distributed.initialize`` via ``maybe_init_distributed``
(loopback coordinator), a global 2-process x 4-CPU-device Mesh, per-process
local batch slices assembled into global arrays through ``shard_batch``'s
``make_array_from_process_local_data`` branch, a jitted sharded train step,
and a cross-process metric check against a host-numpy reference.

Run only via the parent test (it spawns ``python tests/multihost_worker.py
<proc_id> <num_procs> <port>`` once per process).
"""

import os
import os.path as osp
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

# 4 virtual CPU devices per process BEFORE jax import; the parent test's
# 8-device XLA_FLAGS must not leak in
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
os.environ['JAX_PLATFORMS'] = 'cpu'

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

import jax  # noqa: E402

# sitecustomize in this image pre-registers a TPU platform plugin and
# clobbers JAX_PLATFORMS (see tests/conftest.py) — force CPU through the
# config, and pick the gloo CPU collectives so the CPU client becomes
# multi-process after jax.distributed.initialize
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpudet3d.parallel import (maybe_init_distributed, make_mesh,  # noqa: E402
                               shard_batch, replicate, local_batch_slice)

maybe_init_distributed(dict(coordinator_address=f'127.0.0.1:{port}',
                            num_processes=num_procs, process_id=proc_id))
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert jax.device_count() == 4 * num_procs, jax.device_count()

mesh = make_mesh()

# deterministic global batch, identical on every process; each feeds only
# its local slice (the multi-host loader contract, parallel/sharding.py)
rng = np.random.RandomState(0)
GLOBAL_BATCH, DIM = 16, 8
X = rng.randn(GLOBAL_BATCH, DIM).astype(np.float32)
Y = rng.randn(GLOBAL_BATCH, 1).astype(np.float32)

sl = local_batch_slice(GLOBAL_BATCH, mesh)
batch = shard_batch({'x': X[sl], 'y': Y[sl]}, mesh)
assert batch['x'].shape == (GLOBAL_BATCH, DIM), batch['x'].shape

w = replicate(jnp.zeros((DIM, 1), jnp.float32), mesh)


@jax.jit
def train_step(w, x, y):
    def loss_fn(w):
        return jnp.mean((x @ w - y) ** 2)

    loss, grad = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * grad, loss


for _ in range(3):
    w, loss = train_step(w, batch['x'], batch['y'])

# metric reduction: loss is computed from the GLOBALLY sharded batch, so
# every process must see the identical full-batch value (GSPMD inserted
# the cross-process all-reduce)
got = float(loss)

# the step returns the loss at the PRE-update weights, so the reference
# captures it at the top of the final iteration
w_ref = np.zeros((DIM, 1), np.float32)
want = None
for _ in range(3):
    resid = X @ w_ref - Y
    want = float(np.mean(resid ** 2))
    w_ref = w_ref - 0.1 * (2.0 / GLOBAL_BATCH * X.T @ resid)
assert abs(got - want) < 1e-4, (got, want)

print(f'MULTIHOST_OK process={proc_id} loss={got:.6f}', flush=True)
