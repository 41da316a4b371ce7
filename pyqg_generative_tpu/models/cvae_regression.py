"""Conditional sigma-VAE stochastic closure (reference models/cvae_regression.py).

Decoder identical to the GAN generator (AndrewCNN(4ch -> 2ch)); encoder
AndrewCNN(4ch -> 4ch) produces per-pixel (mu, logvar) of a 2-channel
image-shaped latent. Loss = MSE/(2 var_p) summed over pixels + KL summed over
pixels, batch-averaged; `decoder_var='adaptive'` calibrates var_p to the batch
MSE (Rybkin sigma-VAE, reference :180-231, stop-gradient on var_p matching the
reference's `.item()`). Adam(2e-4) with lr x0.1 at {1/2, 3/4, 7/8} epochs.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ml.nets import AndrewCNN
from ..ml.scalers import ChannelwiseScaler
from ..ml.train import apply_in_batches, epoch_permutation
from .base import (Parameterization, prepare_PV_data, register_model,
                   save_model_args, save_variables, load_variables)
from .cgan_regression import evaluate_prediction, loss_to_dataset
from .common import bn_apply, nhwc_from_lev, lev_from_nhwc, train_regression


@register_model
class CVAERegression(Parameterization):
    def __init__(self, regression: str = "None",
                 decoder_var: str | float = "adaptive",
                 folder: str = "model", div: bool = False,
                 hidden_channels=(128, 64, 32, 32, 32, 32, 32),
                 online_backend: str = "xla", online_variant: str = "dx",
                 inference_dtype: str = "float32"):
        self.folder = folder
        self.regression = regression
        self.decoder_var = decoder_var
        self.div = div
        self.hidden_channels = tuple(hidden_channels)
        self.n_latent = 2
        # 'xla' (default) or 'pallas': run the online decoder as a fused
        # VMEM-resident kernel with BatchNorms folded into the convs
        # (ml.pallas_conv, same plumbing as CGANRegression/MeanVarModel).
        # Only used when div=False (the spectral-divergence head is a
        # separate rFFT stage the kernel does not cover).
        self.online_backend = online_backend
        self.online_variant = online_variant
        self._infer_dtype = jnp.bfloat16 \
            if inference_dtype == "bfloat16" else jnp.float32
        self._pallas_cache = None

        self.decoder = AndrewCNN(n_out=2, div=div,
                                 hidden_channels=self.hidden_channels)
        self.encoder = AndrewCNN(n_out=2 * self.n_latent)
        if regression != "None":
            self.net_mean = AndrewCNN(n_out=2, div=div)

        self.vars_enc = None
        self.vars_dec = None
        self.vars_mean = None
        self._jit_cache = {}
        self.load_model(folder)

    # --------------------------------------------------------------- fitting
    def fit(self, ds_train, ds_test, num_epochs: int = 200,
            num_epochs_regression: int = 50, batch_size: int = 64,
            learning_rate: float = 2e-4, nruns: int = 5,
            verbose: bool = True, key: int = 0,
            checkpoint_every: int = 25):
        X_train, Y_train, X_test, Y_test, self.x_scale, self.y_scale = \
            prepare_PV_data(ds_train, ds_test)
        if self.regression != "None":
            self.vars_mean, _ = train_regression(
                self.net_mean, X_train, Y_train, X_test, Y_test,
                num_epochs_regression, batch_size, 1e-3, verbose=verbose)
        log = train_CVAE(self, ds_train, ds_test, X_train, Y_train,
                         num_epochs, batch_size, learning_rate, nruns,
                         verbose=verbose, key=key,
                         checkpoint_every=checkpoint_every)
        self.save_model(log)

    def save_model(self, log=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.vars_enc, f"{self.folder}/encoder.msgpack")
        save_variables(self.vars_dec, f"{self.folder}/decoder.msgpack")
        if self.regression != "None":
            save_variables(self.vars_mean, f"{self.folder}/net_mean.msgpack")
        self.x_scale.write("x_scale.json", self.folder)
        self.y_scale.write("y_scale.json", self.folder)
        save_model_args("CVAERegression", folder=self.folder,
                        regression=self.regression, div=self.div,
                        decoder_var=self.decoder_var,
                        hidden_channels=list(self.hidden_channels))
        if log:
            stats, epoch = loss_to_dataset(log)
            stats.to_npz(f"{self.folder}/stats.npz")
            print("Optimal epoch:", epoch)

    def use_optimal_epoch(self) -> bool:
        """Switch the decoder to the best-offline-loss epoch weights
        (decoder_opt.msgpack) if they were saved during training (the
        reference logs Epoch_opt but keeps last-epoch weights,
        cvae_regression.py:249-254; retaining both is this framework's
        realization-selection lever)."""
        path = f"{self.folder}/decoder_opt.msgpack"
        if not os.path.exists(path):
            return False
        key = jax.random.PRNGKey(0)
        t = self.decoder.init(key, jnp.zeros((1, 32, 32, 2 + self.n_latent)),
                              train=True)
        template = {"params": t["params"],
                    "batch_stats": t.get("batch_stats", {})}
        self.vars_dec = load_variables(template, path)
        return True

    def load_model(self, folder):
        if os.path.exists(f"{folder}/decoder.msgpack"):
            key = jax.random.PRNGKey(0)
            mk = lambda t: {"params": t["params"],
                            "batch_stats": t.get("batch_stats", {})}
            tdec = self.decoder.init(
                key, jnp.zeros((1, 32, 32, 2 + self.n_latent)), train=True)
            self.vars_dec = load_variables(mk(tdec), f"{folder}/decoder.msgpack")
            tenc = self.encoder.init(
                key, jnp.zeros((1, 32, 32, 4)), train=True)
            self.vars_enc = load_variables(mk(tenc), f"{folder}/encoder.msgpack")
            if self.regression != "None":
                tm = self.net_mean.init(key, jnp.zeros((1, 32, 32, 2)),
                                        train=True)
                self.vars_mean = load_variables(mk(tm),
                                                f"{folder}/net_mean.msgpack")
            self.x_scale = ChannelwiseScaler().read("x_scale.json", folder)
            self.y_scale = ChannelwiseScaler().read("y_scale.json", folder)
            return True
        return False

    # ------------------------------------------------ training plumbing
    # (overridable by CVAEBottleneck which has a flat deep latent)
    def _init_vae_variables(self, key, nx):
        mk = lambda t: {"params": t["params"],
                        "batch_stats": t.get("batch_stats", {})}
        k1, k2 = jax.random.split(key)
        if self.vars_enc is None:
            self.vars_enc = mk(self.encoder.init(
                k1, jnp.zeros((1, nx, nx, 4)), train=True))
        if self.vars_dec is None:
            self.vars_dec = mk(self.decoder.init(
                k2, jnp.zeros((1, nx, nx, 2 + self.n_latent)), train=True))
        params = {"enc": self.vars_enc["params"],
                  "dec": self.vars_dec["params"]}
        bstats = {"enc": self.vars_enc["batch_stats"],
                  "dec": self.vars_dec["batch_stats"]}
        return params, bstats

    def _set_vae_variables(self, params, bstats):
        self.vars_enc = {"params": params["enc"],
                         "batch_stats": bstats["enc"]}
        self.vars_dec = {"params": params["dec"],
                         "batch_stats": bstats["dec"]}

    def _encode_train(self, params, bstats, x, y, train):
        enc_out, bs_enc = bn_apply(self.encoder, params["enc"],
                                   bstats["enc"],
                                   jnp.concatenate([x, y], axis=-1), train)
        mu = enc_out[..., :self.n_latent]
        logvar = enc_out[..., self.n_latent:]
        return mu, logvar, {**bstats, "enc": bs_enc}

    def _decode_train(self, params, bstats, x, z, train):
        yhat, bs_dec = bn_apply(self.decoder, params["dec"], bstats["dec"],
                                jnp.concatenate([x, z], axis=-1), train)
        return yhat, {**bstats, "dec": bs_dec}

    # ------------------------------------------------------------- inference
    def latent_shape(self, ny, nx):
        return (ny, nx, self.n_latent)

    def generate_latent_noise(self, key, ny, nx):
        return jax.random.normal(key, self.latent_shape(ny, nx), jnp.float32)

    def _online_dec(self):
        """Fused pallas forward for the BN-folded decoder, cached per
        weights identity (rebuilt after use_optimal_epoch)."""
        if self._pallas_cache is None or \
                self._pallas_cache[0] is not self.vars_dec:
            from ..ml.nets import fold_batchnorm
            from ..ml.pallas_conv import make_online_cnn
            interp = jax.default_backend() == "cpu"
            # First predict may happen inside a trace (sampler lax.cond
            # refresh): fold/pack eagerly so the cached closure captures
            # concrete weights, not tracers.
            with jax.ensure_compile_time_eval():
                fn = make_online_cnn(fold_batchnorm(self.vars_dec),
                                     compute_dtype=self._infer_dtype,
                                     interpret=interp,
                                     variant=self.online_variant)
            self._pallas_cache = (self.vars_dec, fn)
        return self._pallas_cache[1]

    def generate(self, x, z):
        xin = jnp.concatenate([x, z], axis=-1)
        if self.online_backend == "pallas" and not self.div \
                and self.vars_dec["batch_stats"]:
            y = self._online_dec()(xin)
        else:
            y = bn_apply(self.decoder, self.vars_dec["params"],
                         self.vars_dec["batch_stats"], xin, False)[0]
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, self.vars_mean["params"],
                             self.vars_mean["batch_stats"], x, False)[0]
        return y

    # share the GAN's sampling-based prediction machinery
    def predict_snapshot(self, q, noise):
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        y = self.generate(x, noise[None]) * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def predict_mean_snapshot(self, q, M: int = 100, key=None):
        from .cgan_regression import CGANRegression
        return CGANRegression.predict_mean_snapshot(self, q, M, key)

    def _mean_var_program(self, M: int):
        from .cgan_regression import CGANRegression
        return CGANRegression._mean_var_program(self, M)

    def _jitted(self, name, builder, *key_extra):
        key = (name, *key_extra)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(builder())
        return self._jit_cache[key]

    def _generate_with(self, variables, x, z):
        y = bn_apply(self.decoder, variables["G"]["params"],
                     variables["G"]["batch_stats"],
                     jnp.concatenate([x, z], axis=-1), False)[0]
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, variables["mean"]["params"],
                             variables["mean"]["batch_stats"], x, False)[0]
        return y

    def _predict_variables(self):
        return {"G": self.vars_dec,
                "mean": self.vars_mean if self.regression != "None"
                else {"params": {}, "batch_stats": {}}}

    def predict(self, ds, M: int = 1000, key: int = 0):
        from .cgan_regression import CGANRegression
        return CGANRegression.predict(self, ds, M, key)


# --------------------------------------------------------------------------


def make_vae_loss(net: CVAERegression):
    """The sigma-VAE objective as a pure function of (params, bstats, key,
    batch, train) — shared by train_CVAE and the vmapped multi-replica
    trainer (ml.multifit). Reference models/cvae_regression.py:141-176
    (recon + KL with adaptive decoder variance)."""

    def loss_fn(params, bstats, kz, x, y, ymean, train):
        mu, logvar, bstats = net._encode_train(params, bstats, x, y, train)
        std = jnp.exp(0.5 * logvar)
        var = std ** 2
        eps = jax.random.normal(kz, std.shape)
        z = eps * std + mu
        yhat, bstats = net._decode_train(params, bstats, x, z, train)
        if net.regression != "None":
            yhat = yhat + ymean

        b = x.shape[0]
        KL_pointwise = 0.5 * (mu ** 2 + var - 1.0 - logvar)
        MSE_pointwise = (yhat - y) ** 2
        if net.decoder_var == "adaptive":
            var_p = jax.lax.stop_gradient(MSE_pointwise.mean())
        elif net.decoder_var == "fixed":
            var_p = 1.0
        else:
            var_p = float(net.decoder_var)
        loss_recon = MSE_pointwise.reshape(b, -1).sum(-1).mean() / (2.0 * var_p)
        loss_KL = KL_pointwise.reshape(b, -1).sum(-1).mean()
        loss = loss_recon + loss_KL
        metrics = {"loss": loss, "loss_recon": loss_recon, "loss_KL": loss_KL,
                   "MSE": MSE_pointwise.mean(), "var_latent": var.mean(),
                   "var_aggr": mu.var() + var.mean()}
        return loss, (metrics, bstats)

    return loss_fn


def train_CVAE(net: CVAERegression, ds_train, ds_test, X_train, Y_train,
               num_epochs: int, batch_size: int, learning_rate: float,
               nruns=5, verbose=True, key: int = 0,
               checkpoint_every: int = 25):
    rng = np.random.default_rng(key)
    jkey = jax.random.PRNGKey(key)
    n = len(X_train)
    steps = int(np.ceil(n / batch_size))
    nx = X_train.shape[1]

    if net.regression != "None":
        fmean = jax.jit(lambda x: bn_apply(
            net.net_mean, net.vars_mean["params"],
            net.vars_mean["batch_stats"], x, False)[0])
        Y_mean = apply_in_batches(lambda x: fmean(jnp.asarray(x)), X_train)
    else:
        Y_mean = np.zeros_like(Y_train)

    sched = [int(num_epochs * f) * steps for f in (0.5, 0.75, 0.875)]
    tx = optax.adam(optax.piecewise_constant_schedule(
        learning_rate, {b: 0.1 for b in sched}))

    jkey, k1 = jax.random.split(jkey)
    params, bstats = net._init_vae_variables(k1, nx)
    opt_state = tx.init(params)

    Xd, Yd, Md = map(jnp.asarray, (X_train, Y_train, Y_mean))

    loss_fn = make_vae_loss(net)

    def train_epoch(carry, perm, ekey, Xd, Yd, Md):
        def body(c, inp):
            params, bstats, opt_state = c
            idx, i = inp
            kz = jax.random.fold_in(ekey, i)
            x, y, ymean = Xd[idx], Yd[idx], Md[idx]
            (loss, (metrics, bstats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bstats, kz, x, y, ymean, True)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, bstats, opt_state), metrics

        idxs = jnp.arange(perm.shape[0])
        carry, metrics = jax.lax.scan(body, carry, (perm, idxs))
        return carry, {k: v.mean() for k, v in metrics.items()}

    train_epoch_j = jax.jit(train_epoch)

    import time as _time
    log: dict = {}
    carry = (params, bstats, opt_state)

    from ..ml.train import TrainCheckpointer
    ckpt = TrainCheckpointer(net.folder, checkpoint_every,
                             name="vae_train_ckpt")
    epoch0 = 0
    best = {"loss": float("inf"), "vars_dec": None, "epoch": 0}
    # Best-epoch tracking is part of the checkpointed state (as in
    # train_CGAN), so a crash-resumed run keeps any pre-crash best decoder
    # and decoder_opt.msgpack matches an uninterrupted run bit-for-bit.
    best_template = jax.device_get(net.vars_dec)
    try:
        resumed = ckpt.restore((carry, best_template))
        restored_best = True
    except Exception:
        # a vae_train_ckpt.npz written by the pre-best-tracking layout
        # holds only the carry; restore it so an in-flight run resumes
        # (losing only the pre-crash best-decoder candidate)
        resumed = ckpt.restore(carry)
        restored_best = False
        if resumed is not None and verbose:
            print("resuming from a legacy carry-only VAE checkpoint "
                  "(pre-crash best-epoch candidate not recoverable)")
    if resumed is not None:
        if restored_best:
            epoch0, (carry, best_vars), log, rng, jkey, extra = resumed
        else:
            epoch0, carry, log, rng, jkey, extra = resumed
            best_vars = None
        if restored_best and extra.get("best_epoch", 0) > 0:
            best = {"loss": extra["best_loss"], "vars_dec": best_vars,
                    "epoch": extra["best_epoch"]}
        net._set_vae_variables(carry[0], carry[1])
        if verbose:
            print(f"resuming VAE training from epoch {epoch0}")
    t_s = _time.time()
    for epoch in range(epoch0, num_epochs):
        t_e = _time.time()
        perm = jnp.asarray(epoch_permutation(rng, n, batch_size))
        jkey, ekey = jax.random.split(jkey)
        carry, metrics = train_epoch_j(carry, perm, ekey, Xd, Yd, Md)
        params, bstats, opt_state = carry
        net._set_vae_variables(params, bstats)
        row = {k: float(v) for k, v in metrics.items()}
        if nruns:
            row.update(evaluate_prediction(net, ds_train, nruns, key=epoch))
            row.update({f"{k}_test": v for k, v in evaluate_prediction(
                net, ds_test, nruns, key=epoch).items()})
            opt_loss = row.get("L2_total_test", np.inf) + \
                row.get("L2_residual_test", np.inf)
            if opt_loss < best["loss"]:
                best.update(loss=opt_loss, epoch=epoch + 1,
                            vars_dec=jax.device_get(net.vars_dec))
        for k, v in row.items():
            log.setdefault(k, []).append(v)
        ckpt.maybe_save(
            epoch + 1,
            (carry, best["vars_dec"] if best["vars_dec"] is not None
             else best_template),
            log, rng, jkey,
            extra={"best_loss": best["loss"] if best["epoch"] else 0.0,
                   "best_epoch": best["epoch"]})
        if verbose:
            t = _time.time()
            eta = (t - t_s) * (num_epochs / (epoch + 1) - 1)
            print(f"[{epoch + 1}/{num_epochs}] [{t - t_e:.2f}/{eta:.2f}] "
                  f"MSE: {row['MSE']:.4g} KL: {row['loss_KL']:.4g}")
    ckpt.clear()
    if best["vars_dec"] is not None:
        from .base import save_variables as _save
        os.makedirs(net.folder, exist_ok=True)
        _save(best["vars_dec"], f"{net.folder}/decoder_opt.msgpack")
    return log
