"""Bottleneck conditional VAE (reference models/cvae_bottleneck.py).

Same sigma-VAE training recipe as CVAERegression but with a *flat* 100-dim
latent: a strided-conv `Downsampling` encoder produces (mu, logvar) of the
deep latent and an `Upsampling` deep-decoder maps samples back to a
2-channel latent image fed to the AndrewCNN decoder (reference :29,41-42,
105-110). Not part of the main paper pipeline; kept for completeness.

Note: the reference's online `predict_snapshot` passes image-shaped noise to a
flat-latent decoder (a latent bug, reference :120-128); here the online latent
is correctly the flat deep latent.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ml.nets import AndrewCNN, Downsampling, Upsampling
from ..ml.scalers import ChannelwiseScaler
from .base import (register_model, save_model_args, save_variables,
                   load_variables)
from .common import bn_apply
from .cvae_regression import CVAERegression


@register_model
class CVAEBottleneck(CVAERegression):
    def __init__(self, regression: str = "full_loss", nx: int = 64,
                 decoder_var: str | float = "adaptive",
                 folder: str = "model", div: bool = False,
                 deep_latent: int = 100):
        self.folder = folder
        self.regression = regression
        self.decoder_var = decoder_var
        self.div = div
        self.nx = nx
        self.n_latent = 2
        self.deep_latent = deep_latent
        self.hidden_channels = (128, 64, 32, 32, 32, 32, 32)

        self.decoder = AndrewCNN(n_out=2, div=div)
        self.encoder = Downsampling(n_down=4, n_out=2 * deep_latent, nx=nx)
        self.deep_decoder = Upsampling(n_up=4, n_out=self.n_latent, nx=nx)
        if regression != "None":
            self.net_mean = AndrewCNN(n_out=2, div=div)

        self.vars_enc = None
        self.vars_dec = None
        self.vars_deep = None
        self.vars_mean = None
        self._jit_cache = {}
        self.load_model(folder)

    # ------------------------------------------------ training plumbing
    def _init_vae_variables(self, key, nx):
        mk = lambda t: {"params": t["params"],
                        "batch_stats": t.get("batch_stats", {})}
        k1, k2, k3 = jax.random.split(key, 3)
        if self.vars_enc is None:
            self.vars_enc = mk(self.encoder.init(
                k1, jnp.zeros((1, nx, nx, 4)), train=True))
        if self.vars_deep is None:
            self.vars_deep = mk(self.deep_decoder.init(
                k2, jnp.zeros((1, self.deep_latent)), train=True))
        if self.vars_dec is None:
            self.vars_dec = mk(self.decoder.init(
                k3, jnp.zeros((1, nx, nx, 2 + self.n_latent)), train=True))
        params = {"enc": self.vars_enc["params"],
                  "deep": self.vars_deep["params"],
                  "dec": self.vars_dec["params"]}
        bstats = {"enc": self.vars_enc["batch_stats"],
                  "deep": self.vars_deep["batch_stats"],
                  "dec": self.vars_dec["batch_stats"]}
        return params, bstats

    def _set_vae_variables(self, params, bstats):
        self.vars_enc = {"params": params["enc"], "batch_stats": bstats["enc"]}
        self.vars_deep = {"params": params["deep"],
                          "batch_stats": bstats["deep"]}
        self.vars_dec = {"params": params["dec"], "batch_stats": bstats["dec"]}

    def _encode_train(self, params, bstats, x, y, train):
        out, bs_enc = bn_apply(self.encoder, params["enc"], bstats["enc"],
                               jnp.concatenate([x, y], axis=-1), train)
        mu = out[:, :self.deep_latent]
        logvar = out[:, self.deep_latent:]
        return mu, logvar, {**bstats, "enc": bs_enc}

    def _decode_train(self, params, bstats, x, z, train):
        zimg, bs_deep = bn_apply(self.deep_decoder, params["deep"],
                                 bstats["deep"], z, train)
        yhat, bs_dec = bn_apply(self.decoder, params["dec"], bstats["dec"],
                                jnp.concatenate([x, zimg], axis=-1), train)
        return yhat, {**bstats, "deep": bs_deep, "dec": bs_dec}

    # ------------------------------------------------------------- inference
    def latent_shape(self, ny, nx):
        return (self.deep_latent,)

    def generate_latent_noise(self, key, ny, nx):
        return jax.random.normal(key, (self.deep_latent,), jnp.float32)

    def generate(self, x, z):
        if z.ndim == 1:
            z = z[None]
        zimg = bn_apply(self.deep_decoder, self.vars_deep["params"],
                        self.vars_deep["batch_stats"], z, False)[0]
        y = bn_apply(self.decoder, self.vars_dec["params"],
                     self.vars_dec["batch_stats"],
                     jnp.concatenate([x, zimg], axis=-1), False)[0]
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, self.vars_mean["params"],
                             self.vars_mean["batch_stats"], x, False)[0]
        return y

    def predict_snapshot(self, q, noise):
        from .common import nhwc_from_lev, lev_from_nhwc
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        y = self.generate(x, noise) * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def _generate_with(self, variables, x, z):
        zimg = bn_apply(self.deep_decoder, variables["deep"]["params"],
                        variables["deep"]["batch_stats"], z, False)[0]
        y = bn_apply(self.decoder, variables["G"]["params"],
                     variables["G"]["batch_stats"],
                     jnp.concatenate([x, zimg], axis=-1), False)[0]
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, variables["mean"]["params"],
                             variables["mean"]["batch_stats"], x, False)[0]
        return y

    def _predict_variables(self):
        return {"G": self.vars_dec, "deep": self.vars_deep,
                "mean": self.vars_mean if self.regression != "None"
                else {"params": {}, "batch_stats": {}}}

    def _mean_var_program(self, M: int):
        def fn(variables, x, key):
            def body(carry, k):
                s, ss, first, is_first = carry
                z = jax.random.normal(k, (x.shape[0], self.deep_latent))
                y = self._generate_with(variables, x, z)
                first = jnp.where(is_first, y, first)
                return (s + y, ss + y * y, first,
                        jnp.zeros_like(is_first)), None

            keys = jax.random.split(key, M)
            init = (jnp.zeros_like(x[..., :2]), jnp.zeros_like(x[..., :2]),
                    jnp.zeros_like(x[..., :2]), jnp.ones((), bool))
            (s, ss, first, _), _ = jax.lax.scan(body, init, keys)
            mean = s / M
            var = (ss - M * mean ** 2) / max(M - 1, 1)
            return first, mean, var
        return fn

    # ------------------------------------------------------------ persistence
    def save_model(self, log=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.vars_enc, f"{self.folder}/encoder.msgpack")
        save_variables(self.vars_deep, f"{self.folder}/deep_decoder.msgpack")
        save_variables(self.vars_dec, f"{self.folder}/decoder.msgpack")
        if self.regression != "None":
            save_variables(self.vars_mean, f"{self.folder}/net_mean.msgpack")
        self.x_scale.write("x_scale.json", self.folder)
        self.y_scale.write("y_scale.json", self.folder)
        save_model_args("CVAEBottleneck", folder=self.folder,
                        regression=self.regression, nx=self.nx, div=self.div,
                        decoder_var=self.decoder_var,
                        deep_latent=self.deep_latent)
        if log:
            from .cgan_regression import loss_to_dataset
            stats, _ = loss_to_dataset(log)
            stats.to_npz(f"{self.folder}/stats.npz")

    def load_model(self, folder):
        if os.path.exists(f"{folder}/deep_decoder.msgpack"):
            key = jax.random.PRNGKey(0)
            mk = lambda t: {"params": t["params"],
                            "batch_stats": t.get("batch_stats", {})}
            self.vars_enc = load_variables(
                mk(self.encoder.init(key, jnp.zeros((1, self.nx, self.nx, 4)),
                                     train=True)),
                f"{folder}/encoder.msgpack")
            self.vars_deep = load_variables(
                mk(self.deep_decoder.init(
                    key, jnp.zeros((1, self.deep_latent)), train=True)),
                f"{folder}/deep_decoder.msgpack")
            self.vars_dec = load_variables(
                mk(self.decoder.init(
                    key, jnp.zeros((1, self.nx, self.nx, 2 + self.n_latent)),
                    train=True)),
                f"{folder}/decoder.msgpack")
            if self.regression != "None":
                self.vars_mean = load_variables(
                    mk(self.net_mean.init(
                        key, jnp.zeros((1, self.nx, self.nx, 2)), train=True)),
                    f"{folder}/net_mean.msgpack")
            self.x_scale = ChannelwiseScaler().read("x_scale.json", folder)
            self.y_scale = ChannelwiseScaler().read("y_scale.json", folder)
            return True
        return False
