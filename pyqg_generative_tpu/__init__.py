"""pyqg_generative_tpu: a TPU-native framework for generative data-driven
stochastic subgrid parameterizations of a two-layer quasi-geostrophic ocean
model.

From-scratch JAX/XLA re-design with the capabilities of
m2lines/pyqg_generative (JAMES 2023, doi 10.1029/2023MS003681): the pyqg
pseudo-spectral core, coarse-graining operators, CNN/GAN/VAE/GZ closures,
online coupling, offline/online metrics and experiment orchestration — all as
fused XLA programs with `vmap`ed ensembles and mesh-sharded sweeps.
"""

__version__ = "0.1.0"

from . import qg, utils  # lightweight; heavier subpackages import lazily


def __getattr__(name):
    # lazy subpackage imports keep `import pyqg_generative_tpu` cheap
    import importlib
    if name in ("ml", "models", "sim", "eval", "parallel", "exp"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
