"""Conditional GAN stochastic closure (reference models/cgan_regression.py).

Recipe (kept from the reference, re-implemented as one jitted scan per epoch):

* generator G(q, z) — AndrewCNN(4ch -> 2ch) or DeepInversion U-Net; critic D
  with *pairwise minibatch discrimination*: it scores triples (x, y_a, y_b),
  6 input channels, no norm layers (reference :57);
* critic loss  -0.5 (D(x,y,ŷ2) + D(x,ŷ1,y)) + D(x,ŷ1,ŷ2)  with drift penalty
  LAMBDA_DRIFT * D(x,y,ŷ2)^2 and WGAN-GP gradient penalty LAMBDA_GP on
  interpolates between a (randomly ordered) real pair and the fake pair
  (reference :197-222, :289-306);
* generator updated every 5th critic step; both use Adam(2e-4, betas
  (0.5, 0.999)) with lr halved at {1/2, 3/4, 7/8} of the epochs (:267-272);
* optional deterministic-mean split: regression in {'None', 'full_loss',
  'residual_loss'} (:26-32);
* per-epoch offline evaluation (subgrid scores on a run subsample, M=16)
  logged with the optimal-epoch tracker (:224-245).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ml.nets import AndrewCNN, DCGANDiscriminator, DeepInversionGenerator
from ..ml.scalers import ChannelwiseScaler
from ..ml.train import (apply_in_batches, epoch_permutation, log_to_dataset)
from ..utils import xrlite as xr
from ..eval.metrics import subgrid_scores
from .base import (Parameterization, extract, array_to_dataset,
                   prepare_PV_data, register_model, save_model_args,
                   save_variables, load_variables)
from .common import bn_apply, nhwc_from_lev, lev_from_nhwc, train_regression

LAMBDA_DRIFT = 1e-3
LAMBDA_GP = 10.0


@register_model
class CGANRegression(Parameterization):
    def __init__(self, regression: str = "None", nx: int = 64,
                 generator: str = "Andrew", folder: str = "model",
                 div: bool = False,
                 hidden_channels=(128, 64, 32, 32, 32, 32, 32),
                 inference_dtype: str = "float32",
                 online_backend: str = "xla",
                 online_variant: str = "dx"):
        self.folder = folder
        # 'xla' (default) or 'pallas': the fused VMEM-resident kernel for
        # the online generator (ml.pallas_conv; exactness-tested, measured
        # ~1.1x the XLA conv path at 10x64^2 on v5e — see docs/ROADMAP.md).
        # online_variant picks the pallas kernel strategy
        # ('packed'/'tap'/'dx' — ml.pallas_conv.make_online_cnn).
        self.online_backend = online_backend
        self.online_variant = online_variant
        self._pallas_cache = None
        self.regression = regression
        self.generator = generator
        self.nx = nx
        self.div = div
        self.hidden_channels = tuple(hidden_channels)
        self.n_latent = 2
        # compute dtype of the *online* generator path; params stay float32
        # (bfloat16 doubles MXU throughput inside the fused solver step)
        self._infer_dtype = jnp.bfloat16 \
            if inference_dtype == "bfloat16" else jnp.float32

        if generator == "Andrew":
            self.G = AndrewCNN(n_out=2, div=div,
                               hidden_channels=self.hidden_channels)
            # online path: BatchNorms folded into the convs (ml.nets.fold_
            # batchnorm) -> batch_norm=False module, optionally bf16
            self.G_online = AndrewCNN(n_out=2, div=div,
                                      hidden_channels=self.hidden_channels,
                                      batch_norm=False,
                                      dtype=self._infer_dtype)
            self._fold_cache = None
        elif generator == "DeepInversion":
            self.G = DeepInversionGenerator(n_out=2)
            self.G_online = DeepInversionGenerator(n_out=2,
                                                   dtype=self._infer_dtype)
        else:
            raise ValueError("generator not implemented")
        self.D = DCGANDiscriminator(nx=nx, bn="None")
        if regression != "None":
            self.net_mean = AndrewCNN(n_out=2, div=div)

        self.vars_G = None
        self.vars_D = None
        self.vars_mean = None
        self._jit_cache = {}
        self.load_model(folder)

    # --------------------------------------------------------------- fitting
    def fit(self, ds_train, ds_test, num_epochs: int = 200,
            num_epochs_regression: int = 50, batch_size: int = 64,
            learning_rate: float = 2e-4, nruns: int = 5,
            verbose: bool = True, key: int = 0,
            checkpoint_every: int = 25, retain_every: int = 0):
        X_train, Y_train, X_test, Y_test, self.x_scale, self.y_scale = \
            prepare_PV_data(ds_train, ds_test)

        if self.regression != "None" and self.vars_mean is None:
            self.vars_mean, _ = train_regression(
                self.net_mean, X_train, Y_train, X_test, Y_test,
                num_epochs_regression, batch_size, 1e-3, verbose=verbose)

        log = train_CGAN(self, ds_train, ds_test, X_train, Y_train,
                         num_epochs, batch_size, learning_rate, nruns,
                         verbose=verbose, key=key,
                         checkpoint_every=checkpoint_every,
                         retain_every=retain_every)
        self.save_model(log)

    def save_model(self, log=None):
        os.makedirs(self.folder, exist_ok=True)
        save_variables(self.vars_G, f"{self.folder}/G.msgpack")
        save_variables(self.vars_D, f"{self.folder}/D.msgpack")
        if self.regression != "None":
            save_variables(self.vars_mean, f"{self.folder}/net_mean.msgpack")
        self.x_scale.write("x_scale.json", self.folder)
        self.y_scale.write("y_scale.json", self.folder)
        save_model_args("CGANRegression", folder=self.folder,
                        regression=self.regression, nx=self.nx,
                        generator=self.generator, div=self.div,
                        hidden_channels=list(self.hidden_channels))
        if log:
            stats, epoch = loss_to_dataset(log)
            stats.to_npz(f"{self.folder}/stats.npz")
            print("Optimal epoch is", epoch)

    def load_model(self, folder):
        if os.path.exists(f"{folder}/G.msgpack"):
            key = jax.random.PRNGKey(0)
            x0 = jnp.zeros((1, self.nx, self.nx, 2 + self.n_latent))
            tG = self.G.init(key, x0, train=True)
            mk = lambda t: {"params": t["params"],
                            "batch_stats": t.get("batch_stats", {})}
            self.vars_G = load_variables(mk(tG), f"{folder}/G.msgpack")
            d0 = jnp.zeros((1, self.nx, self.nx, 6))
            tD = self.D.init(key, d0, train=True)
            self.vars_D = load_variables(mk(tD), f"{folder}/D.msgpack")
            if self.regression != "None":
                tm = self.net_mean.init(key, jnp.zeros((1, self.nx, self.nx, 2)),
                                        train=True)
                self.vars_mean = load_variables(mk(tm),
                                                f"{folder}/net_mean.msgpack")
            self.x_scale = ChannelwiseScaler().read("x_scale.json", folder)
            self.y_scale = ChannelwiseScaler().read("y_scale.json", folder)
            return True
        return False

    def _load_generator_file(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        key = jax.random.PRNGKey(0)
        tG = self.G.init(key, jnp.zeros((1, self.nx, self.nx,
                                         2 + self.n_latent)), train=True)
        template = {"params": tG["params"],
                    "batch_stats": tG.get("batch_stats", {})}
        self.vars_G = load_variables(template, path)
        if hasattr(self, "_fold_cache"):
            self._fold_cache = None
        return True

    def use_optimal_epoch(self) -> bool:
        """Switch the generator to the best-offline-loss epoch weights
        (G_opt.msgpack) if they were saved during training."""
        return self._load_generator_file(f"{self.folder}/G_opt.msgpack")

    def use_stable_epoch(self) -> bool:
        """Switch the generator to the online-stability-selected epoch
        weights (G_stable.msgpack, written by select_stable_epoch)."""
        return self._load_generator_file(f"{self.folder}/G_stable.msgpack")

    def select_stable_epoch(self, pyqg_params=None, q_init=None,
                            years: float = 3.0, n_ens: int = 2,
                            target_std: float | None = None,
                            target_kespec=None, spectrum_weight: float = 1.0,
                            verbose: bool = True):
        """Online-stability-aware epoch selection: probe every banked epoch
        (epoch_bank/G_*.msgpack, written by fit(retain_every=...)) with a
        short coupled rollout from an equilibrated state and keep the
        generator whose equilibrium amplitude stays closest to the target
        (saved as G_stable.msgpack and loaded into the model). The
        reference's Epoch_opt uses offline loss only; online hot-equilibrium
        drift is invisible to it.

        If `target_kespec` is given — a (lev, l, k) 2-D KE spectrum of the
        coarse-grained reference (e.g. target["KEspec"].mean("run").values) —
        the probe also accumulates the rollout's KEspec over its second half
        and adds `spectrum_weight` x (normalized isotropic-KE-spectrum RMSE,
        k < 2/3 Nyquist — the metric stack's definition) to the score: a
        closure can hold the right std(q) with the wrong spectrum shape.
        Returns (best_epoch, {epoch: (std, spec_err)})."""
        import glob as _glob

        from ..qg.params import QGParams, YEAR, ANDREW_1000_STEPS
        from ..sim import run_ensemble

        bank = sorted(_glob.glob(f"{self.folder}/epoch_bank/G_*.msgpack"),
                      key=lambda f: int(f.split("_")[-1].split(".")[0]))
        if not bank:
            return None, {}
        p = pyqg_params or QGParams(nx=self.nx, dt=7200.0,
                                    precision="single")
        # with a spectrum target, accumulate diagnostics over the 2nd half
        tave_frac = 0.5 if target_kespec is not None else 1.0
        p = p.replace(tmax=years * YEAR,
                      tavestart=tave_frac * years * YEAR)
        if q_init is None:
            data = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "..", "tests", "data",
                "eddy48_snapshot.npz")
            q_init = np.load(data)["q"]
        if target_std is None:
            target_std = float(np.std(q_init))

        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, self.nx, self.nx, 2 + self.n_latent))
        tG = self.G.init(key, x0, train=True)
        template = {"params": tG["params"],
                    "batch_stats": tG.get("batch_stats", {})}
        orig = self.vars_G
        results = {}
        best = (None, np.inf, None)
        for f in bank:
            epoch = int(f.split("_")[-1].split(".")[0])
            self.vars_G = load_variables(template, f)
            if hasattr(self, "_fold_cache"):
                self._fold_cache = None
            ds = run_ensemble(p, {"self": self, "sampling": "constant",
                                  "nsteps": 1}, n_ens=n_ens, q_init=q_init,
                              sampling_freq=ANDREW_1000_STEPS, key=epoch)
            std = float(np.std(ds["q"].values[:, -1]))
            spec_err = 0.0
            if target_kespec is not None and "KEspec" not in ds:
                import warnings
                warnings.warn(
                    "select_stable_epoch: target_kespec given but the probe "
                    "run has no KEspec (with_diags off?) — the spectrum "
                    "term drops out and selection degrades to "
                    "amplitude-only", stacklevel=2)
            if target_kespec is not None and "KEspec" in ds:
                from ..eval.comparison import _spectral_rmse
                probe_spec = ds["KEspec"].values
                if probe_spec.ndim == 4:  # (run, lev, l, k)
                    probe_spec = probe_spec.mean(axis=0)
                diff, scale = _spectral_rmse(probe_spec,
                                             np.asarray(target_kespec))
                spec_err = float(diff / scale)
            results[epoch] = (std, spec_err)
            score = abs(np.log(std / target_std)) + \
                spectrum_weight * spec_err
            if verbose:
                print(f"epoch {epoch}: final std(q) {std:.3e} "
                      f"(target {target_std:.3e})"
                      + (f", KEspec err {spec_err:.3f}"
                         if target_kespec is not None else ""))
            if score < best[1]:
                best = (epoch, score, jax.device_get(self.vars_G))
        self.vars_G = orig
        if best[0] is not None:
            save_variables(best[2], f"{self.folder}/G_stable.msgpack")
            self.vars_G = best[2]
            if hasattr(self, "_fold_cache"):
                self._fold_cache = None
        return best[0], results

    # ------------------------------------------------------------- inference
    def latent_shape(self, ny, nx):
        return (ny, nx, self.n_latent)

    def generate_latent_noise(self, key, ny, nx):
        return jax.random.normal(key, self.latent_shape(ny, nx), jnp.float32)

    def _gen(self, params, batch_stats, x, z):
        out, _ = bn_apply(self.G, params, batch_stats,
                          jnp.concatenate([x, z], axis=-1), False)
        return out

    def generate(self, x, z):
        """Normalized-space generation (x, z NHWC)."""
        y = self._gen(self.vars_G["params"], self.vars_G["batch_stats"], x, z)
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, self.vars_mean["params"],
                             self.vars_mean["batch_stats"], x, False)[0]
        return y

    def _online_vars(self):
        """Variables for the online generator (BN-folded for AndrewCNN)."""
        if self.generator != "Andrew" or not self.vars_G["batch_stats"]:
            return self.vars_G
        if self._fold_cache is None or \
                self._fold_cache[0] is not self.vars_G:
            from ..ml.nets import fold_batchnorm
            # Fold eagerly even if first reached inside a trace — the
            # cache must hold concrete arrays, not tracers.
            with jax.ensure_compile_time_eval():
                folded = fold_batchnorm(self.vars_G)
            self._fold_cache = (self.vars_G, folded)
        return self._fold_cache[1]

    def predict_snapshot(self, q, noise):
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)
        ov = self._online_vars()
        xin = jnp.concatenate([x, noise[None]], axis=-1)
        if self.online_backend == "pallas" and self.generator == "Andrew" \
                and ov is not self.vars_G:
            if self._pallas_cache is None or \
                    self._pallas_cache[0] is not ov:
                from ..ml.pallas_conv import make_online_cnn
                interp = jax.default_backend() == "cpu"
                # First predict may happen inside a trace (sampler
                # lax.cond refresh): pack eagerly so the cached closure
                # captures concrete weights, not tracers.
                with jax.ensure_compile_time_eval():
                    fn = make_online_cnn(ov, compute_dtype=self._infer_dtype,
                                         interpret=interp,
                                         variant=self.online_variant)
                self._pallas_cache = (ov, fn)
            y = self._pallas_cache[1](xin)
        else:
            # folded vars pair with the bn-less G_online module. (A
            # roll-matmul conv path exists in ml.nets but measured slower
            # inside the fused step, where XLA's conv lowering is already
            # near-optimal.)
            net = self.G_online if ov is not self.vars_G else self.G
            y, _ = bn_apply(net, ov["params"], ov["batch_stats"], xin, False)
        y = y.astype(jnp.float32)
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, self.vars_mean["params"],
                             self.vars_mean["batch_stats"], x, False)[0]
        y = y * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def predict_mean_snapshot(self, q, M: int = 100, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = nhwc_from_lev(q).astype(jnp.float32) / jnp.asarray(self.x_scale.std)

        def body(c, k):
            return c + self.generate(x, jax.random.normal(
                k, x.shape[:-1] + (self.n_latent,))), None

        keys = jax.random.split(key, M)
        total, _ = jax.lax.scan(body, jnp.zeros_like(x), keys)
        y = total / M * jnp.asarray(self.y_scale.std)
        return lev_from_nhwc(y).astype(q.dtype)

    def _generate_with(self, variables, x, z):
        """Generation with weights passed as arguments (not trace constants)
        so the jitted sampling program survives weight updates."""
        y, _ = bn_apply(self.G, variables["G"]["params"],
                        variables["G"]["batch_stats"],
                        jnp.concatenate([x, z], axis=-1), False)
        if self.regression != "None":
            y = y + bn_apply(self.net_mean, variables["mean"]["params"],
                             variables["mean"]["batch_stats"], x, False)[0]
        return y

    def _mean_var_program(self, M: int):
        """(variables, x, key) -> (sample, mean, var) over M generator draws,
        as a scanned on-device program (replaces the reference's python loop
        over M forwards, models/cgan_regression.py:139-145)."""
        def fn(variables, x, key):
            zshape = x.shape[:-1] + (self.n_latent,)

            def body(carry, k):
                s, ss, first, is_first = carry
                y = self._generate_with(variables, x,
                                        jax.random.normal(k, zshape))
                first = jnp.where(is_first, y, first)
                return (s + y, ss + y * y, first, jnp.zeros_like(is_first)), None

            keys = jax.random.split(key, M)
            init = (jnp.zeros_like(x[..., :2]), jnp.zeros_like(x[..., :2]),
                    jnp.zeros_like(x[..., :2]), jnp.ones((), bool))
            (s, ss, first, _), _ = jax.lax.scan(body, init, keys)
            mean = s / M
            var = (ss - M * mean ** 2) / max(M - 1, 1)
            return first, mean, var
        return fn

    def _jitted(self, name, builder, *key_extra):
        """Per-instance jit cache; weights are call arguments, so the cache
        key is only the program shape (M, ...). The per-epoch offline eval
        therefore compiles once, not once per epoch."""
        key = (name, *key_extra)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(builder())
        return self._jit_cache[key]

    def _predict_variables(self):
        return {"G": self.vars_G,
                "mean": self.vars_mean if self.regression != "None"
                else {"params": {}, "batch_stats": {}}}

    def predict(self, ds, M: int = 1000, key: int = 0) -> xr.Dataset:
        X = self.x_scale.normalize(extract(ds, "q"))
        fn = self._jitted("mean_var", lambda: self._mean_var_program(M), M)
        keys = iter(jax.random.split(jax.random.PRNGKey(key), 10 ** 6))
        variables = self._predict_variables()

        def run(x):
            return fn(variables, jnp.asarray(x), next(keys))

        Y, mean, var = apply_in_batches(run, X, batch_size=64)
        return xr.Dataset({
            "q_forcing_advection": array_to_dataset(
                ds, self.y_scale.denormalize(Y), "f"),
            "q_forcing_advection_mean": array_to_dataset(
                ds, self.y_scale.denormalize(mean), "m"),
            "q_forcing_advection_var": array_to_dataset(
                ds, self.y_scale.denormalize_var(var), "v")})

    def predict_ensemble(self, ds, M: int = 1000, key: int = 0):
        X = self.x_scale.normalize(extract(ds, "q"))

        def fn(x, k):
            zs = jax.random.normal(
                k, (M,) + x.shape[:-1] + (self.n_latent,))
            return jax.lax.map(lambda z: self.generate(x, z), zs)

        jfn = jax.jit(fn)
        keys = iter(jax.random.split(jax.random.PRNGKey(key), 10 ** 6))
        Y = apply_in_batches(lambda x: jfn(jnp.asarray(x), next(keys)), X,
                             batch_size=16)
        q = ds["q"]
        for d in ("run", "time"):
            if d not in q.dims:
                q = q.expand_dims(d)
        shape = q.transpose("run", "time", "lev", "y", "x").shape
        arr = np.moveaxis(self.y_scale.denormalize(Y), -1, 2)
        arr = arr.reshape((shape[0], shape[1], M) + shape[2:]).transpose(
            2, 0, 1, 3, 4, 5)
        return xr.DataArray(arr, dims=("ens", "run", "time", "lev", "y", "x"))


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def evaluate_prediction(net, ds, nruns=None, M: int = 16, key: int = 0):
    """Subgrid scores on a run subsample (reference cgan_regression.py:224-234)."""
    nrun = ds["q"].sizes()["run"] if "run" in ds["q"].dims else 1
    idx = np.arange(nrun)
    if nruns is not None and nruns < len(idx):
        idx = np.random.default_rng(key).choice(idx, nruns, replace=False)
    sub = ds.isel(run=idx)
    preds = net.predict(sub, M=M)
    s = subgrid_scores(sub["q_forcing_advection"],
                       preds["q_forcing_advection_mean"],
                       preds["q_forcing_advection"])
    return {k: float(np.mean(s[k].values))
            for k in ("L2_mean", "L2_total", "L2_residual")} | \
        {"var_ratio": float(np.mean(s["var_ratio"].values))}


def loss_to_dataset(log: dict):
    """Training curves + optimal-epoch tracking
    (reference cgan_regression.py:236-245)."""
    ds = log_to_dataset(log)
    if "L2_total_test" in log and "L2_residual_test" in log:
        loss = np.asarray(log["L2_total_test"]) + \
            np.asarray(log["L2_residual_test"])
        ds["loss_opt"] = xr.DataArray(loss, ("epoch",))
        epoch_opt = int(np.argmin(loss)) + 1
        ds["Epoch_opt"] = xr.DataArray(np.asarray(epoch_opt))
        return ds, epoch_opt
    return ds, len(next(iter(log.values()), []))


def make_gan_batch_step(net: CGANRegression, txG, txD):
    """One full GAN training step (critic update + every-5th generator
    update) as a pure function — shared by the epoch scan and by the
    multi-chip sharded dryrun.

    carry = (paramsG, batch_stats_G, optG, paramsD, optD)
    batch = (x, y, ymean) NHWC; i = global batch index; key = PRNG key.
    """

    def d_apply(paramsD, xin):
        return net.D.apply({"params": paramsD,
                            "batch_stats": net.vars_D["batch_stats"]},
                           xin, train=False)

    def g_forward(paramsG, bsG, x, z, train):
        return bn_apply(net.G, paramsG, bsG,
                        jnp.concatenate([x, z], axis=-1), train)

    def batch_step(c, batch, i, kb):
        pG, bsG, oG, pD, oD = c
        x, y, ymean = batch
        kz1, kz2, keps, kswap, _ = jax.random.split(kb, 5)
        if net.regression == "residual_loss":
            y = y - ymean
        zshape = x.shape[:-1] + (net.n_latent,)
        z1 = jax.random.normal(kz1, zshape)
        z2 = jax.random.normal(kz2, zshape)

        yfake1, bsG = g_forward(pG, bsG, x, z1, True)
        yfake2, bsG = g_forward(pG, bsG, x, z2, True)
        if net.regression == "full_loss":
            yfake1 = yfake1 + ymean
            yfake2 = yfake2 + ymean
        yf1 = jax.lax.stop_gradient(yfake1)
        yf2 = jax.lax.stop_gradient(yfake2)

        # ---------------- critic update -----------------------------------
        def d_loss_fn(pD):
            Dtrue1 = d_apply(pD, jnp.concatenate([x, y, yf2], -1))
            Dtrue2 = d_apply(pD, jnp.concatenate([x, yf1, y], -1))
            Dfake = d_apply(pD, jnp.concatenate([x, yf1, yf2], -1))
            D_loss = -0.5 * (Dtrue1.mean() + Dtrue2.mean()) + Dfake.mean()
            D_drift = LAMBDA_DRIFT * (Dtrue1 ** 2).mean()

            eps = jax.random.uniform(keps, (x.shape[0], 1, 1, 1))
            swap = jax.random.bernoulli(kswap)
            ytrue_cat = jnp.where(
                swap, jnp.concatenate([yf1, y], -1),
                jnp.concatenate([y, yf2], -1))
            yfake_cat = jnp.concatenate([yf1, yf2], -1)
            yinterp = eps * ytrue_cat + (1 - eps) * yfake_cat

            def d_on_interp(yi):
                return d_apply(pD, jnp.concatenate([x, yi], -1)).sum()

            dDdy = jax.grad(d_on_interp)(yinterp)
            norms = jnp.sqrt(
                (dDdy.reshape(dDdy.shape[0], -1) ** 2).sum(-1) + 1e-12)
            D_grad = LAMBDA_GP * ((norms - 1.0) ** 2).mean()
            return D_loss + D_grad + D_drift, (D_loss, D_grad, D_drift)

        (_, (D_loss, D_grad, D_drift)), gD = jax.value_and_grad(
            d_loss_fn, has_aux=True)(pD)
        updD, oD = txD.update(gD, oD, pD)
        pD = optax.apply_updates(pD, updD)

        # ---------------- generator update (every 5th batch) --------------
        def g_step(args):
            pG, bsG, oG = args

            def g_loss_fn(pG):
                yg1, bs1 = g_forward(pG, bsG, x, z1, True)
                yg2, bs2 = g_forward(pG, bs1, x, z2, True)
                if net.regression == "full_loss":
                    yg1 = yg1 + ymean
                    yg2 = yg2 + ymean
                G_loss = -d_apply(
                    pD, jnp.concatenate([x, yg1, yg2], -1)).mean()
                return G_loss, bs2

            (G_loss, bsG), gG = jax.value_and_grad(
                g_loss_fn, has_aux=True)(pG)
            updG, oG = txG.update(gG, oG, pG)
            pG = optax.apply_updates(pG, updG)
            return (pG, bsG, oG), G_loss.astype(jnp.float32)

        def g_skip(args):
            return args, jnp.zeros((), jnp.float32)

        (pG, bsG, oG), G_loss = jax.lax.cond(
            i % 5 == 0, g_step, g_skip, (pG, bsG, oG))

        metrics = {"D_loss": D_loss, "D_grad": D_grad,
                   "D_drift": D_drift, "G_loss": G_loss}
        return (pG, bsG, oG, pD, oD), metrics

    return batch_step


def train_CGAN(net: CGANRegression, ds_train, ds_test, X_train, Y_train,
               num_epochs: int, batch_size: int, learning_rate: float,
               nruns=5, verbose=True, key: int = 0,
               checkpoint_every: int = 25, retain_every: int = 0):
    """retain_every > 0 banks the generator weights every `retain_every`
    epochs to `<folder>/epoch_bank/G_<epoch>.msgpack` — feed of
    `CGANRegression.select_stable_epoch`, the online-stability-aware epoch
    selection this framework adds on top of the reference's offline-loss
    Epoch_opt (docs/VALIDATION.md round-2: online quality of GAN
    realizations is dominated by hot-equilibrium drift that offline scores
    do not predict)."""
    rng = np.random.default_rng(key)
    jkey = jax.random.PRNGKey(key)
    n = len(X_train)
    steps = int(np.ceil(n / batch_size))

    # mean-correction targets (reference :255-258)
    if net.regression != "None":
        fmean = jax.jit(lambda x: bn_apply(
            net.net_mean, net.vars_mean["params"],
            net.vars_mean["batch_stats"], x, False)[0])
        Y_mean = apply_in_batches(lambda x: fmean(jnp.asarray(x)), X_train)
    else:
        Y_mean = np.zeros_like(Y_train)

    sched = [int(num_epochs * f) * steps for f in (0.5, 0.75, 0.875)]
    lr_sched = optax.piecewise_constant_schedule(
        learning_rate, {b: 0.5 for b in sched})
    txD = optax.adam(lr_sched, b1=0.5, b2=0.999)
    txG = optax.adam(lr_sched, b1=0.5, b2=0.999)

    jkey, k1, k2 = jax.random.split(jkey, 3)
    x0 = jnp.zeros((1, net.nx, net.nx, 2 + net.n_latent), jnp.float32)
    if net.vars_G is None:
        vG = net.G.init(k1, x0, train=True)
        net.vars_G = {"params": vG["params"],
                      "batch_stats": vG.get("batch_stats", {})}
    if net.vars_D is None:
        vD = net.D.init(k2, jnp.zeros((1, net.nx, net.nx, 6)), train=True)
        net.vars_D = {"params": vD["params"],
                      "batch_stats": vD.get("batch_stats", {})}
    optG = txG.init(net.vars_G["params"])
    optD = txD.init(net.vars_D["params"])

    Xd = jnp.asarray(X_train)
    Yd = jnp.asarray(Y_train)
    Md = jnp.asarray(Y_mean)

    batch_step = make_gan_batch_step(net, txG, txD)

    def train_epoch(carry, perm, ekey, Xd, Yd, Md):
        # data enters as arguments (not trace constants): keeps the compiled
        # program small and independent of the dataset size
        def body(c, inp):
            idx, i = inp
            kb = jax.random.fold_in(ekey, i)
            return batch_step(c, (Xd[idx], Yd[idx], Md[idx]), i, kb)

        steps_idx = jnp.arange(perm.shape[0])
        carry, metrics = jax.lax.scan(body, carry, (perm, steps_idx))
        return carry, {k: v.mean() for k, v in metrics.items()}

    train_epoch_j = jax.jit(train_epoch)

    import time as _time
    log: dict = {}
    carry = (net.vars_G["params"], net.vars_G["batch_stats"], optG,
             net.vars_D["params"], optD)
    best = {"loss": float("inf"), "vars_G": None, "epoch": 0}

    from ..ml.train import TrainCheckpointer
    ckpt = TrainCheckpointer(net.folder, checkpoint_every,
                             name="gan_train_ckpt")
    epoch0 = 0
    best_template = jax.device_get(net.vars_G)
    resumed = ckpt.restore((carry, best_template))
    if resumed is not None:
        epoch0, (carry, best_vars), log, rng, jkey, extra = resumed
        if extra.get("best_epoch", 0) > 0:
            best = {"loss": extra["best_loss"], "vars_G": best_vars,
                    "epoch": extra["best_epoch"]}
        net.vars_G = {"params": carry[0], "batch_stats": carry[1]}
        net.vars_D = {"params": carry[3],
                      "batch_stats": net.vars_D["batch_stats"]}
        if verbose:
            print(f"resuming GAN training from epoch {epoch0}")

    t_s = _time.time()
    for epoch in range(epoch0, num_epochs):
        t_e = _time.time()
        perm = jnp.asarray(epoch_permutation(rng, n, batch_size))
        jkey, ekey = jax.random.split(jkey)
        carry, metrics = train_epoch_j(carry, perm, ekey, Xd, Yd, Md)
        pG, bsG, oG, pD, oD = carry
        net.vars_G = {"params": pG, "batch_stats": bsG}
        net.vars_D = {"params": pD, "batch_stats": net.vars_D["batch_stats"]}
        row = {k: float(v) for k, v in metrics.items()}
        if nruns:
            row.update({k: v for k, v in evaluate_prediction(
                net, ds_train, nruns, key=epoch).items()})
            row.update({f"{k}_test": v for k, v in evaluate_prediction(
                net, ds_test, nruns, key=epoch).items()})
            # optimal-epoch tracking with retained weights: the reference
            # logs Epoch_opt but keeps last-epoch weights
            # (cgan_regression.py:236-245); online quality scatters strongly
            # across epochs, so the best-offline-loss generator is kept too
            opt_loss = row.get("L2_total_test", np.inf) + \
                row.get("L2_residual_test", np.inf)
            if opt_loss < best["loss"]:
                best.update(loss=opt_loss, epoch=epoch + 1,
                            vars_G=jax.device_get(net.vars_G))
        if retain_every and (epoch + 1) % retain_every == 0:
            from .base import save_variables as _save
            bank = os.path.join(net.folder, "epoch_bank")
            os.makedirs(bank, exist_ok=True)
            _save(jax.device_get(net.vars_G),
                  os.path.join(bank, f"G_{epoch + 1}.msgpack"))
        for k, v in row.items():
            log.setdefault(k, []).append(v)
        ckpt.maybe_save(
            epoch + 1,
            (carry, best["vars_G"] if best["vars_G"] is not None
             else best_template),
            log, rng, jkey,
            extra={"best_loss": best["loss"] if best["epoch"] else 0.0,
                   "best_epoch": best["epoch"]})
        if verbose:
            t = _time.time()
            eta = (t - t_s) * (num_epochs / (epoch + 1) - 1)
            print(f"[{epoch + 1}/{num_epochs}] [{t - t_e:.2f}/{eta:.2f}] "
                  f"D_loss: {row['D_loss']:.3f} G_loss: {row['G_loss']:.3f}"
                  + (f" L2_total: {row.get('L2_total_test', float('nan')):.3f}"
                     if nruns else ""))
    ckpt.clear()
    if best["vars_G"] is not None:
        from .base import save_variables as _save
        os.makedirs(net.folder, exist_ok=True)
        _save(best["vars_G"], f"{net.folder}/G_opt.msgpack")
    return log
