"""Stdout tee-logger (reference: torchdet3d/utils/utils.py:289-333)."""

import errno
import os
import os.path as osp
import sys

__all__ = ['Logger', 'mkdir_if_missing']


def mkdir_if_missing(dirname):
    """Creates dirname if it is missing (reference utils.py:47-54)."""
    if dirname and not osp.exists(dirname):
        try:
            os.makedirs(dirname)
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise


class Logger:
    """Writes console output to an external text file as well."""

    def __init__(self, fpath=None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            mkdir_if_missing(osp.dirname(fpath))
            self.file = open(fpath, 'w')

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        if self.console is not sys.__stdout__:
            # never close the real stdout
            pass
        if self.file is not None:
            self.file.close()
            self.file = None
