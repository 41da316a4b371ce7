"""Guillaumin-Zanna (GZ 2021) mean + variance stochastic closure
(reference models/mean_var_model.py).

Two AndrewCNNs: one for the conditional mean, a second with a softplus head
for the pointwise conditional variance, trained in a second stage on the
squared residuals of the first. Sampling: mean + sqrt(var) * eps.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ml.nets import AndrewCNN, VarCNN
from ..ml.scalers import ChannelwiseScaler
from ..ml.train import apply_in_batches, log_to_dataset
from ..utils import xrlite as xr
from .base import (Parameterization, extract, array_to_dataset,
                   prepare_PV_data, register_model, save_model_args,
                   save_variables, load_variables)
from .common import bn_apply, nhwc_from_lev, lev_from_nhwc, train_regression


@register_model
class MeanVarModel(Parameterization):
    def __init__(self, hidden_channels=(128, 64, 32, 32, 32, 32, 32),
                 folder: str = "model", online_backend: str = "xla",
                 online_variant: str = "dx",
                 inference_dtype: str = "float32"):
        self.folder = folder
        self.hidden_channels = tuple(hidden_channels)
        self.net_mean = AndrewCNN(n_out=2, hidden_channels=self.hidden_channels)
        self.net_var = VarCNN(2, hidden_channels=self.hidden_channels)
        self.vars_mean = None
        self.vars_var = None
        self._jit_cache = {}
        # 'xla' (default) or 'pallas': run BOTH online CNNs (mean + var) as
        # fused VMEM-resident kernels (ml.pallas_conv) with BatchNorms
        # folded into the convs — the GZ online step is two full CNN
        # forwards, the most network-bound closure, so the fused kernel's
        # ~2x (dx variant) applies twice per step. The softplus variance
        # head is applied outside the kernel (elementwise, exact).
        self.online_backend = online_backend
        self.online_variant = online_variant
        self._infer_dtype = jnp.bfloat16 \
            if inference_dtype == "bfloat16" else jnp.float32
        self._pallas_cache = None
        self.load_model(folder)

    def fit(self, ds_train, ds_test, num_epochs: int = 50,
            batch_size: int = 64, learning_rate: float = 1e-3,
            verbose: bool = True, **kw):
        X_train, Y_train, X_test, Y_test, self.x_scale, self.y_scale = \
            prepare_PV_data(ds_train, ds_test)

        self.vars_mean, log_mean = train_regression(
            self.net_mean, X_train, Y_train, X_test, Y_test,
            num_epochs, batch_size, learning_rate, verbose=verbose,
            checkpoint_dir=os.path.join(self.folder, "ckpt_mean"))

        # second stage: variance net on squared residuals
        # (reference models/mean_var_model.py:55-64)
        fn = jax.jit(lambda x: bn_apply(
            self.net_mean, self.vars_mean["params"],
            self.vars_mean["batch_stats"], x, False)[0])
        Yhat_train = apply_in_batches(lambda x: fn(jnp.asarray(x)), X_train)
        Yhat_test = apply_in_batches(lambda x: fn(jnp.asarray(x)), X_test)
        rsq_train = (Y_train - Yhat_train) ** 2
        rsq_test = (Y_test - Yhat_test) ** 2
        self.vars_var, log_var = train_regression(
            self.net_var, X_train, rsq_train, X_test, rsq_test,
            num_epochs, batch_size, learning_rate, verbose=verbose,
            checkpoint_dir=os.path.join(self.folder, "ckpt_var"))
        self.save_model(log_mean, log_var)

    def save_model(self, log_mean=None, log_var=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.vars_mean, f"{self.folder}/net_mean.msgpack")
        save_variables(self.vars_var, f"{self.folder}/net_var.msgpack")
        self.x_scale.write("x_scale.json", self.folder)
        self.y_scale.write("y_scale.json", self.folder)
        save_model_args("MeanVarModel", folder=self.folder,
                        hidden_channels=list(self.hidden_channels))
        if log_mean:
            log_to_dataset(log_mean).to_npz(f"{self.folder}/stats_mean.npz")
        if log_var:
            log_to_dataset(log_var).to_npz(f"{self.folder}/stats_var.npz")

    def load_model(self, folder):
        if os.path.exists(f"{folder}/net_mean.msgpack"):
            x0 = jnp.zeros((1, 32, 32, 2))
            key = jax.random.PRNGKey(0)
            tm = self.net_mean.init(key, x0, train=True)
            tv = self.net_var.init(key, x0, train=True)
            mk = lambda t: {"params": t["params"],
                            "batch_stats": t.get("batch_stats", {})}
            self.vars_mean = load_variables(mk(tm), f"{folder}/net_mean.msgpack")
            self.vars_var = load_variables(mk(tv), f"{folder}/net_var.msgpack")
            self.x_scale = ChannelwiseScaler().read("x_scale.json", folder)
            self.y_scale = ChannelwiseScaler().read("y_scale.json", folder)
            return True
        return False

    # ------------------------------------------------------------- inference
    def latent_shape(self, ny, nx):
        return (ny, nx, 2)

    def generate_latent_noise(self, key, ny, nx):
        return jax.random.normal(key, self.latent_shape(ny, nx), jnp.float32)

    def _apply_mean(self, x):
        return bn_apply(self.net_mean, self.vars_mean["params"],
                        self.vars_mean["batch_stats"], x, False)[0]

    def _apply_var(self, x):
        return bn_apply(self.net_var, self.vars_var["params"],
                        self.vars_var["batch_stats"], x, False)[0]

    def _online_fns(self):
        """Fused pallas forwards for (mean, var) with BN folded into the
        convs (exact for eval-mode BN + circular padding). Cached per
        weights identity; interpret mode on CPU (tests)."""
        cache_key = (self.vars_mean, self.vars_var)
        if self._pallas_cache is None or \
                self._pallas_cache[0] is not cache_key[0] or \
                self._pallas_cache[1] is not cache_key[1]:
            from ..ml.nets import fold_batchnorm
            from ..ml.pallas_conv import make_online_cnn, merge_folded_pair
            interp = jax.default_backend() == "cpu"
            # The first predict may happen inside a trace (the sampler's
            # lax.cond refresh in run_ensemble): fold/pack eagerly so the
            # cached closure captures concrete weights, not tracers.
            with jax.ensure_compile_time_eval():
                if self.online_variant.endswith("pair"):
                    # ONE block-diagonal program for mean+var (fills the
                    # 128-lane tiles the 32/64-channel layers waste; halves
                    # the per-program overhead) — output [mean(2) | var(2)]
                    base = self.online_variant[:-len("pair")] or "dx"
                    merged = merge_folded_pair(
                        fold_batchnorm(self.vars_mean),
                        fold_batchnorm(self.vars_var))
                    fpair = make_online_cnn(merged,
                                            compute_dtype=self._infer_dtype,
                                            interpret=interp, variant=base)
                    fns = (lambda x: fpair(x)[..., :2],
                           lambda x: fpair(x)[..., 2:], fpair)
                else:
                    fns = tuple(
                        make_online_cnn(fold_batchnorm(v),
                                        compute_dtype=self._infer_dtype,
                                        interpret=interp,
                                        variant=self.online_variant)
                        for v in cache_key)
            self._pallas_cache = (*cache_key, fns)
        return self._pallas_cache[2]

    def predict_snapshot(self, q, noise):
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        if self.online_backend == "pallas" and self.vars_mean["batch_stats"]:
            fns = self._online_fns()
            if len(fns) == 3:          # fused mean+var pair program
                y4 = fns[2](x)
                y = y4[..., :2] + noise[None] * jnp.sqrt(
                    jax.nn.softplus(y4[..., 2:]))
            else:
                fm, fv = fns
                # the kernel returns the final pre-activation conv;
                # VarCNN's softplus head is elementwise, applied here
                y = fm(x) + noise[None] * jnp.sqrt(jax.nn.softplus(fv(x)))
        else:
            y = self._apply_mean(x) + noise[None] * jnp.sqrt(self._apply_var(x))
        return lev_from_nhwc(y * jnp.asarray(self.y_scale.std)).astype(q.dtype)

    def predict_mean_snapshot(self, q, M: int = 100):
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        y = self._apply_mean(x) * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def predict(self, ds, M: int = 1000) -> xr.Dataset:
        X = self.x_scale.normalize(extract(ds, "q"))
        ck = (id(self.vars_mean), id(self.vars_var))
        if ck not in self._jit_cache:
            self._jit_cache[ck] = (jax.jit(self._apply_mean),
                                   jax.jit(self._apply_var))
        fm, fv = self._jit_cache[ck]
        mean = self.y_scale.denormalize(
            apply_in_batches(lambda x: fm(jnp.asarray(x)), X))
        var = self.y_scale.denormalize_var(
            apply_in_batches(lambda x: fv(jnp.asarray(x)), X))
        rng = np.random.default_rng(0)
        Y = mean + np.sqrt(var) * rng.standard_normal(var.shape).astype("float32")
        return xr.Dataset({
            "q_forcing_advection": array_to_dataset(ds, Y, "q_forcing_advection"),
            "q_forcing_advection_mean": array_to_dataset(ds, mean, "m"),
            "q_forcing_advection_var": array_to_dataset(ds, var, "v")})
