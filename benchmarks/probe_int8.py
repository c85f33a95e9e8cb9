"""Probe: does int8 beat bf16 through XLA:TPU on this chip/stack?

TPU v5e MXU peak is 2x for int8 vs bf16 (394 vs 197 TOPS).  Whether a
jax program actually reaches that depends on XLA lowering
``lax.dot_general`` / ``conv_general_dilated`` with int8 operands and
``preferred_element_type=int32`` onto the int8 MXU path *through this
axon PJRT plugin*.  This probe measures representative shapes from the
serving program (SSD300 MNv2 + 224^2 regressor towers are ~all 1x1/3x3
convs) before we invest in a PTQ engine path (DEVELOPMENT.md round-3
notes: int8 PTQ is the known next serving lever).

Run when the TPU is otherwise idle (single-tenant!):
    python benchmarks/probe_int8.py
"""

import functools
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from tpudet3d.core import enable_compile_cache

enable_compile_cache()


def timed(fn, *args, iters=30, repeats=3, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    vals = []
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        vals.append((time.perf_counter() - start) / iters)
    return min(vals)


@functools.partial(jax.jit, static_argnames=('reps',))
def mm_bf16(a, b, reps=8):
    def body(x, _):
        y = jax.lax.dot(x, b, precision=None,
                        preferred_element_type=jnp.bfloat16)
        return y.astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, a, None, length=reps)
    return out


@functools.partial(jax.jit, static_argnames=('reps',))
def mm_int8(a, b, reps=8):
    def body(x, _):
        y = jax.lax.dot(x, b, preferred_element_type=jnp.int32)
        # wrap back to int8 so the chained iteration stays int8-in
        return (y >> 8).astype(jnp.int8), None
    out, _ = jax.lax.scan(body, a, None, length=reps)
    return out


@functools.partial(jax.jit, static_argnames=('stride', 'reps'))
def conv_bf16(x, k, stride=1, reps=4):
    def body(h, _):
        y = jax.lax.conv_general_dilated(
            h, k, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16)
        return y.astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, None, length=reps)
    return out


@functools.partial(jax.jit, static_argnames=('stride', 'reps'))
def conv_int8(x, k, stride=1, reps=4):
    def body(h, _):
        y = jax.lax.conv_general_dilated(
            h, k, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8), None
    out, _ = jax.lax.scan(body, x, None, length=reps)
    return out


def main():
    rng = np.random.default_rng(0)
    print(f'device: {jax.devices()[0]}')

    # -- square matmul peak ratio ------------------------------------
    n = 4096
    a16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    reps = 8
    t16 = timed(mm_bf16, a16, b16) / reps
    t8 = timed(mm_int8, a8, b8) / reps
    fl = 2 * n ** 3
    print(f'matmul {n}^2            bf16 {t16*1e3:7.3f} ms ({fl/t16/1e12:6.1f} T) '
          f'int8 {t8*1e3:7.3f} ms ({fl/t8/1e12:6.1f} T)  speedup x{t16/t8:.2f}')

    # -- serving-representative convs (NHWC, batch 32) ----------------
    # (label, x-shape, k-shape, stride)
    # scan carries must be shape-invariant, so every case is channel-
    # square at stride 1 (the MXU int8-vs-bf16 question is set by tile
    # occupancy, not by the exact in/out ratio); expansion/projection and
    # stride-2 convs are represented by their nearest square shape
    cases = [
        ('1x1 pw 28^2 144->144 ', (32, 28, 28, 144), (1, 1, 144, 144)),
        ('1x1 pw 14^2 576->576 ', (32, 14, 14, 576), (1, 1, 576, 576)),
        ('3x3    56^2  64->64  ', (32, 56, 56, 64), (3, 3, 64, 64)),
        ('3x3   112^2  32->32  ', (32, 112, 112, 32), (3, 3, 32, 32)),
        ('3x3    75^2  64->64  ', (32, 75, 75, 64), (3, 3, 64, 64)),
    ]
    reps = 4
    for label, xs, ks in cases:
        x16 = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        k16 = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, ks), jnp.int8)
        t16 = timed(conv_bf16, x16, k16) / reps
        t8 = timed(conv_int8, x8, k8) / reps
        fl = 2 * xs[0] * xs[1] * xs[2] * ks[0] * ks[1] * ks[2] * ks[3]
        print(f'conv {label} bf16 {t16*1e3:7.3f} ms ({fl/t16/1e12:6.1f} T) '
              f'int8 {t8*1e3:7.3f} ms ({fl/t8/1e12:6.1f} T)  '
              f'speedup x{t16/t8:.2f}')


if __name__ == '__main__':
    main()
