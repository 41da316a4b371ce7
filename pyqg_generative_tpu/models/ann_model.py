"""Pointwise stencil MLP closure (reference models/ann_model.py).

An MLP maps a (stencil_size x stencil_size) PV patch to the forcing at the
center point; optional scale-invariant mode norm^2 * f(x/norm). The reference
extracts stencils with host-side python loops
(tools/cnn_tools.py:321-358); here stencil extraction is a fused `jnp.roll`
stack, so the closure runs fully on-device both offline and inside the
scanned solver step.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ml.nets import ANN
from ..ml.train import apply_in_batches, log_to_dataset
from ..utils import xrlite as xr
from .base import (Parameterization, register_model, save_model_args,
                   save_variables, load_variables)
from .common import train_regression

BATCH_SIZE = 2 ** 15


def stencil_stack(q, stencil_size: int = 3):
    """(..., ny, nx) -> (..., ny, nx, stencil_size^2) of circular patches.
    Feature order is row-major over (dy, dx) offsets; the center element is
    at index stencil_size^2 // 2."""
    s2 = stencil_size // 2
    feats = []
    for dy in range(-s2, s2 + 1):
        for dx in range(-s2, s2 + 1):
            feats.append(jnp.roll(q, (-dy, -dx), axis=(-2, -1)))
    return jnp.stack(feats, axis=-1)


def _flatten_fields(ds: xr.Dataset, key: str) -> np.ndarray:
    """(run,time,lev,y,x) -> (batch, ny, nx) stacking run/time/lev."""
    var = ds[key]
    for d in ("run", "time"):
        if d not in var.dims:
            var = var.expand_dims(d)
    v = var.transpose("run", "time", "lev", "y", "x").values
    return v.reshape(-1, v.shape[-2], v.shape[-1]).astype("float32")


def prepare_data_ANN(ds_list, stencil_size: int, step: int = 3):
    """Multi-dataset stencil training arrays with step-subsampling
    (reference tools/cnn_tools.py:373-396)."""
    if not isinstance(ds_list, (list, tuple)):
        ds_list = [ds_list]
    X, Y = [], []
    for ds in ds_list:
        q = _flatten_fields(ds, "q")
        f = _flatten_fields(ds, "q_forcing_advection")
        st = np.asarray(stencil_stack(jnp.asarray(q), stencil_size))
        X.append(st[:, ::step, ::step, :].reshape(-1, stencil_size ** 2))
        Y.append(f[:, ::step, ::step].reshape(-1, 1))
    X = np.concatenate(X)
    Y = np.concatenate(Y)
    center = stencil_size ** 2 // 2
    x_scale = float(X[:, center].astype("float64").std())
    y_scale = float(Y.astype("float64").std())
    return X, Y, x_scale, y_scale


@register_model
class ANNModel(Parameterization):
    def __init__(self, scale_invariant: bool = False, stencil_size: int = 3,
                 hidden_channels=(24, 24), folder: str = "model",
                 read: bool = True):
        self.folder = folder
        self.stencil_size = stencil_size
        self.hidden_channels = tuple(hidden_channels)
        self.scale_invariant = scale_invariant
        self.net = ANN(n_out=1, hidden_channels=self.hidden_channels,
                       degree=2 if scale_invariant else None)
        self.variables = None
        self._jit_cache = {}
        if read:
            self.load_model(folder)

    def fit(self, ds_train, ds_test, num_epochs: int = 50,
            batch_size: int = BATCH_SIZE, learning_rate: float = 1e-3,
            verbose: bool = True, **kw):
        X_train, Y_train, self.x_scale, self.y_scale = \
            prepare_data_ANN(ds_train, self.stencil_size)
        X_test, Y_test, _, _ = prepare_data_ANN(ds_test, self.stencil_size)
        X_train, X_test = X_train / self.x_scale, X_test / self.x_scale
        Y_train, Y_test = Y_train / self.y_scale, Y_test / self.y_scale
        self.variables, log = train_regression(
            self.net, X_train, Y_train, X_test, Y_test,
            num_epochs, min(batch_size, len(X_train)), learning_rate,
            verbose=verbose)
        self.save_model(log)

    def save_model(self, log=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.variables, f"{self.folder}/net.msgpack")
        with open(f"{self.folder}/scale.json", "w") as f:
            json.dump({"x_scale": self.x_scale, "y_scale": self.y_scale}, f)
        save_model_args("ANNModel", folder=self.folder,
                        stencil_size=self.stencil_size,
                        hidden_channels=list(self.hidden_channels),
                        scale_invariant=self.scale_invariant)
        if log:
            log_to_dataset(log).to_npz(f"{self.folder}/stats.npz")

    def load_model(self, folder):
        if os.path.exists(f"{folder}/net.msgpack"):
            t = self.net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, self.stencil_size ** 2)))
            t = {"params": t["params"], "batch_stats": {}}
            self.variables = load_variables(t, f"{folder}/net.msgpack")
            with open(f"{folder}/scale.json") as f:
                scale = json.load(f)
            self.x_scale = scale["x_scale"]
            self.y_scale = scale["y_scale"]
            return True
        return False

    # ------------------------------------------------------------- inference
    def _field_apply(self, q):
        """(lev/batch, ny, nx) -> same shape, fully fused."""
        st = stencil_stack(q.astype(jnp.float32), self.stencil_size)
        x = st / self.x_scale
        y = self.net.apply({"params": self.variables["params"]},
                           x.reshape(-1, self.stencil_size ** 2))
        return self.y_scale * y.reshape(q.shape)

    def predict_snapshot(self, q, noise=None):
        return self._field_apply(q).astype(q.dtype)

    def predict_mean_snapshot(self, q, M: int = 100):
        return self.predict_snapshot(q)

    def predict(self, ds, M: int = 1000) -> xr.Dataset:
        var = ds["q"]
        for d in ("run", "time"):
            if d not in var.dims:
                var = var.expand_dims(d)
        v = var.transpose("run", "time", "lev", "y", "x")
        flat = v.values.reshape(-1, v.shape[-2], v.shape[-1]).astype("float32")
        ck = id(self.variables)
        if ck not in self._jit_cache:
            self._jit_cache[ck] = jax.jit(self._field_apply)
        fn = self._jit_cache[ck]
        Y = apply_in_batches(lambda x: fn(jnp.asarray(x)), flat,
                             batch_size=256)
        da = xr.DataArray(Y.reshape(v.shape), dims=v.dims)
        return xr.Dataset({"q_forcing_advection": da,
                           "q_forcing_advection_mean": da,
                           "q_forcing_advection_var": da * 0})
