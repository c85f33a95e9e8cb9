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
TARGETS = ['tpudet3d', 'scripts', 'benchmarks', 'bench.py', '__graft_entry__.py']


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


def check_unused_imports(path):
    """Module-level imports that never appear again in the file."""
    if path.name == '__init__.py':
        return []   # re-export modules
    src = path.read_text()
    tree = ast.parse(src)
    imported = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split('.')[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == '*':
                    continue
                imported[alias.asname or alias.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    lines = src.split('\n')
    errs = []
    for name, lineno in imported.items():
        if name not in used and 'noqa' not in lines[lineno - 1]:
            errs.append(f'{path}:{lineno}: unused import {name}')
    return errs


def main():
    errors = []
    for path in iter_py_files():
        errors.extend(check_syntax(path))
        errors.extend(check_unused_imports(path))
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print(f'lint ok ({sum(1 for _ in iter_py_files())} files)')


if __name__ == '__main__':
    main()
