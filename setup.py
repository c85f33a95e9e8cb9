import os.path as osp

from setuptools import find_packages, setup


def get_version():
    ns = {}
    with open(osp.join(osp.dirname(__file__), 'tpudet3d', 'version.py')) as f:
        exec(f.read(), ns)
    return ns['__version__']


setup(
    name='tpudet3d',
    version=get_version(),
    description='TPU-native two-stage 3D object detection framework '
                '(Objectron), JAX/XLA/Pallas/pjit',
    packages=find_packages(include=['tpudet3d', 'tpudet3d.*']),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy',
    ],
    extras_require={
        'data': ['opencv-python'],
        'test': ['pytest'],
    },
)
