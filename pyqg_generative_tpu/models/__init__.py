from .base import Parameterization, load_model, MODEL_REGISTRY
from .ols_model import OLSModel
from .mean_var_model import MeanVarModel
from .cgan_regression import CGANRegression
from .cvae_regression import CVAERegression
