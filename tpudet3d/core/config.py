"""Python-file config system.

Capability parity with the reference's ``read_py_config``
(/root/reference/torchdet3d/utils/utils.py:66-84), which imports a ``.py``
file as a module and wraps its globals in an ``addict.Dict``.  ``addict`` is
not available here, so :class:`AttrDict` reimplements the two behaviours the
reference code relies on:

* attribute access (``cfg.model.name``), recursively;
* missing keys resolve to an *empty* AttrDict that is falsy
  (``if cfg.model.resume: ...`` works when ``resume`` was never set).
"""

import copy
import importlib.util
import os.path as osp
import warnings

__all__ = ['AttrDict', 'read_py_config', 'check_isfile', 'merge_cli_overrides']


class AttrDict(dict):
    """Recursive attribute dict; missing keys yield empty (falsy) AttrDicts."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if arg is None:
                continue
            for k, v in dict(arg).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @classmethod
    def _convert(cls, value):
        if isinstance(value, AttrDict):
            return value
        if isinstance(value, dict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._convert(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._convert(value))

    __setattr__ = __setitem__

    def __getattr__(self, key):
        if key.startswith('__'):
            raise AttributeError(key)
        return self[key]

    def __missing__(self, key):
        # Do NOT store: repeated reads of an unset key must stay falsy and
        # must not pollute the config that gets archived to disk.
        return AttrDict()

    def __delattr__(self, key):
        del self[key]

    def __deepcopy__(self, memo):
        out = AttrDict()
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out

    def to_dict(self):
        out = {}
        for k, v in self.items():
            if isinstance(v, AttrDict):
                v = v.to_dict()
            elif isinstance(v, (list, tuple)):
                v = type(v)(i.to_dict() if isinstance(i, AttrDict) else i for i in v)
            out[k] = v
        return out


def check_isfile(fpath):
    """Returns True if ``fpath`` is a file; warns otherwise
    (reference: torchdet3d/utils/utils.py:33-45)."""
    isfile = osp.isfile(fpath)
    if not isfile:
        warnings.warn(f'No file found at "{fpath}"')
    return isfile


def read_py_config(filename):
    """Import a ``.py`` config file and return its globals as an AttrDict.

    Unlike the reference (utils.py:66-84) we use an importlib spec instead of
    mutating ``sys.path``, so configs with identical module names in
    different directories cannot shadow each other.
    """
    filename = osp.abspath(osp.expanduser(filename))
    if not check_isfile(filename):
        raise RuntimeError('config not found')
    assert filename.endswith('.py')
    module_name = osp.basename(filename)[:-3]
    spec = importlib.util.spec_from_file_location(module_name, filename)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return AttrDict({
        name: value for name, value in vars(mod).items()
        if not name.startswith('__')
    })


def merge_cli_overrides(cfg, args):
    """CLI override hook (reference: scripts/main.py:17-21)."""
    if getattr(args, 'root', ''):
        cfg.data.root = args.root
    if getattr(args, 'output_dir', ''):
        cfg.output_dir = args.output_dir
    return cfg
