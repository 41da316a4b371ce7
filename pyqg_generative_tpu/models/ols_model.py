"""Deterministic CNN regression baseline (reference models/ols_model.py).

A plain MSE-regression AndrewCNN mapping coarse PV to subgrid forcing; zero
predicted variance. Serves as the deterministic baseline of the closure
family.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ml.nets import AndrewCNN
from ..ml.scalers import ChannelwiseScaler
from ..ml.train import apply_in_batches, log_to_dataset
from ..utils import xrlite as xr
from .base import (Parameterization, extract, array_to_dataset,
                   prepare_PV_data, register_model, save_model_args,
                   save_variables, load_variables)
from .common import bn_apply, nhwc_from_lev, lev_from_nhwc, train_regression


@register_model
class OLSModel(Parameterization):
    def __init__(self, div: bool = False, batch_norm: bool = True,
                 bias: bool = True, final_activation: str = "None",
                 hidden_channels=(128, 64, 32, 32, 32, 32, 32),
                 folder: str = "model"):
        self.folder = folder
        self.div = div
        self.batch_norm = batch_norm
        self.bias = bias
        self.final_activation = final_activation
        self.hidden_channels = tuple(hidden_channels)
        self.net = AndrewCNN(n_out=2, div=div, batch_norm=batch_norm,
                             bias=bias, final_activation=final_activation,
                             hidden_channels=self.hidden_channels)
        self.variables = None
        self._jit_cache = {}
        self.load_model(folder)

    # ------------------------------------------------------------- training
    def fit(self, ds_train, ds_test, num_epochs: int = 50,
            batch_size: int = 64, learning_rate: float = 1e-3,
            verbose: bool = True, **kw):
        X_train, Y_train, X_test, Y_test, self.x_scale, self.y_scale = \
            prepare_PV_data(ds_train, ds_test)
        self.variables, log = train_regression(
            self.net, X_train, Y_train, X_test, Y_test,
            num_epochs, batch_size, learning_rate, verbose=verbose,
            checkpoint_dir=os.path.join(self.folder, "ckpt"))
        self.save_model(log)

    def save_model(self, log=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.variables, f"{self.folder}/net.msgpack")
        self.x_scale.write("x_scale.json", self.folder)
        self.y_scale.write("y_scale.json", self.folder)
        save_model_args("OLSModel", folder=self.folder, div=self.div,
                        batch_norm=self.batch_norm, bias=self.bias,
                        final_activation=self.final_activation,
                        hidden_channels=list(self.hidden_channels))
        if log:
            log_to_dataset(log).to_npz(f"{self.folder}/stats.npz")

    def load_model(self, folder):
        if os.path.exists(f"{folder}/net.msgpack"):
            template = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)), train=True)
            template = {"params": template["params"],
                        "batch_stats": template.get("batch_stats", {})}
            self.variables = load_variables(template, f"{folder}/net.msgpack")
            self.x_scale = ChannelwiseScaler().read("x_scale.json", folder)
            self.y_scale = ChannelwiseScaler().read("y_scale.json", folder)
            return True
        return False

    # ------------------------------------------------------------- inference
    def _apply(self, x):
        out, _ = bn_apply(self.net, self.variables["params"],
                          self.variables["batch_stats"], x, False)
        return out

    def predict_snapshot(self, q, noise=None):
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        y = self._apply(x) * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def predict_mean_snapshot(self, q, M: int = 100):
        return self.predict_snapshot(q)

    def predict(self, ds, M: int = 1000) -> xr.Dataset:
        X = self.x_scale.normalize(extract(ds, "q"))
        ck = id(self.variables)
        if ck not in self._jit_cache:
            self._jit_cache[ck] = jax.jit(self._apply)
        fn = self._jit_cache[ck]
        Y = self.y_scale.denormalize(
            apply_in_batches(lambda x: fn(jnp.asarray(x)), X))
        da = array_to_dataset(ds, Y, "q_forcing_advection")
        return xr.Dataset({"q_forcing_advection": da,
                           "q_forcing_advection_mean": da,
                           "q_forcing_advection_var": da * 0})
