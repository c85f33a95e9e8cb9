"""Persistent XLA compilation cache helper.

This environment imports jax from sitecustomize before any user code, so
``JAX_COMPILATION_CACHE_DIR`` in the env is too late — the config API is the
reliable path.  Every CLI/bench entry point calls this once.
"""

import os.path as osp

__all__ = ['enable_compile_cache']

_DEFAULT = osp.abspath(osp.join(osp.dirname(__file__), '..', '..',
                                '.jax_cache'))


def enable_compile_cache(path=None):
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', path or _DEFAULT)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception as e:  # pragma: no cover
        print(f'compile cache unavailable: {e}')
