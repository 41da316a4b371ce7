"""Vmapped multi-replica training: K independent GAN/VAE realizations in
ONE XLA program on one chip.

The reference trains its 5 realizations per (model, operator, resolution)
as 5 SLURM jobs on 5 GPUs (scripts/train_parameterizations.py:26-35). On a
TPU the replicas are a vmapped leading axis instead: the per-batch update
is already a pure function of (carry, batch, key), so `jax.vmap` over
stacked carries (and per-replica permutations/keys) turns K trainings into
one program whose convolutions run at K x the batch size — far better MXU
utilization at 48^2/64^2 than K sequential runs, with identical
per-replica semantics.

RNG streams replicate the sequential trainers exactly (same init keys,
same numpy shuffle stream, same per-epoch fold-in), so replica r of a
vmapped run matches a sequential `fit(..., key=keys[r])` up to vmap
numerics (the batched conv lowering reduces in a different order; measured
drift ~5e-5/epoch on CPU f32, identical initialization bit-for-bit) —
enforced by tests/test_multifit.py.

Replicas may share one dataset (multi-seed: in_axes=None, data held once
in HBM) or bring their own of identical shape (multi-dataset, e.g.
Operator1+Operator2 at the same resolution: stacked with in_axes=0).
"""
from __future__ import annotations

import json
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.checkpoints import load_checkpoint, save_checkpoint
from .train import epoch_permutation

__all__ = ["fit_gan_ensemble", "fit_vae_ensemble"]


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack(tree, r):
    return jax.tree_util.tree_map(lambda x: x[r], tree)


def _prepare(nets, ds_trains, ds_tests):
    """Per-replica normalized arrays + scalers; datasets shared by identity
    are prepared once. Returns (Xs, Ys, Xts, Yts, shared: bool)."""
    from ..models.base import prepare_PV_data

    cache = {}
    Xs, Ys = [], []
    for net, dtr, dte in zip(nets, ds_trains, ds_tests):
        k = (id(dtr), id(dte))
        if k not in cache:
            cache[k] = prepare_PV_data(dtr, dte)
        X_train, Y_train, _, _, x_scale, y_scale = cache[k]
        net.x_scale, net.y_scale = x_scale, y_scale
        Xs.append(X_train)
        Ys.append(Y_train)
    shared = len(cache) == 1
    shapes = {x.shape for x in Xs}
    if len(shapes) != 1:
        raise ValueError(f"replica datasets must have identical shapes for "
                         f"vmapped training, got {sorted(shapes)}")
    return Xs, Ys, shared


class _MultiCheckpointer:
    """Stacked-carry checkpoint/resume for a vmapped ensemble run (same
    bit-exact-resume contract as ml.train.TrainCheckpointer, one file for
    the whole replica set). Resume requires the identical replica set."""

    def __init__(self, folder, every, name):
        self.path = None
        if folder and every > 0:
            os.makedirs(folder, exist_ok=True)
            self.path = os.path.join(folder, name + ".npz")
        self.every = max(1, int(every))

    def maybe_save(self, epoch, carry, bests, logs, rngs, jkeys):
        if self.path is None or epoch % self.every:
            return
        # The epoch is embedded in the npz itself AND written to the meta
        # file, meta published LAST: a crash between the two writes leaves a
        # newer carry with a stale meta, which restore() detects via the
        # epoch disagreement and refuses — never a silent re-train on an
        # already-advanced carry (round-4 advisor finding).
        save_checkpoint(self.path,
                        ((carry, bests), np.int64(epoch)))
        meta = {"epoch": int(epoch), "logs": logs,
                "rng_states": [r.bit_generator.state for r in rngs],
                "jkeys": [np.asarray(jax.device_get(k)).tolist()
                          for k in jkeys]}
        tmp = self.path + ".meta.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.path + ".meta.json")

    def restore(self, template):
        if self.path is None or not os.path.exists(self.path) or \
                not os.path.exists(self.path + ".meta.json"):
            return None
        try:
            carry_bests, ck_epoch = load_checkpoint(
                self.path, (template, np.int64(0)))
        except (KeyError, ValueError, TypeError):
            # legacy (pre-round-5) checkpoint without the embedded epoch:
            # load it as before and trust the meta (old contract)
            carry_bests, ck_epoch = load_checkpoint(self.path, template), None
        with open(self.path + ".meta.json") as f:
            meta = json.load(f)
        if ck_epoch is not None and int(ck_epoch) != int(meta["epoch"]):
            raise RuntimeError(
                f"multifit checkpoint {self.path} is torn: carry epoch "
                f"{int(ck_epoch)} != meta epoch {meta['epoch']} (crash "
                f"between carry and meta writes) — delete both to restart")
        rngs = []
        for st in meta["rng_states"]:
            r = np.random.default_rng()
            r.bit_generator.state = st
            rngs.append(r)
        jkeys = [jnp.asarray(np.asarray(k, dtype=np.uint32))
                 for k in meta["jkeys"]]
        return meta["epoch"], carry_bests, meta["logs"], rngs, jkeys

    def clear(self):
        if self.path is not None:
            for p in (self.path, self.path + ".meta.json"):
                if os.path.exists(p):
                    os.remove(p)


def _check_homogeneous(nets, attr_names):
    for a in attr_names:
        vals = {repr(getattr(n, a, None)) for n in nets}
        if len(vals) != 1:
            raise ValueError(f"vmapped ensemble requires identical `{a}` "
                             f"across replicas, got {vals}")
    if getattr(nets[0], "regression", "None") != "None":
        raise ValueError("vmapped ensemble supports regression='None' only "
                         "(per-replica mean nets are not stacked)")


def _run_ensemble_epochs(*, nets, ds_trains, ds_tests, make_epoch_fn,
                         carries, keys, num_epochs, batch_size, nruns,
                         verbose, Xs, Ys, shared, per_epoch_hook,
                         best_of_row, ckpt_name, checkpoint_every,
                         best_templates):
    """The shared epoch loop: vmapped train epochs + per-replica host-side
    offline eval / optimal-epoch tracking (identical to the sequential
    trainers' loops)."""
    from ..models.cgan_regression import evaluate_prediction

    K = len(nets)
    n = Xs[0].shape[0]

    if shared:
        Xd, Yd = jnp.asarray(Xs[0]), jnp.asarray(Ys[0])
        dx = None
    else:
        Xd = jnp.stack([jnp.asarray(x) for x in Xs])
        Yd = jnp.stack([jnp.asarray(y) for y in Ys])
        dx = 0
    # ymean is identically zero for regression='None'; share one buffer
    Md = jnp.zeros_like(Yd if dx is None else Yd[0])

    epoch_fn = jax.jit(jax.vmap(make_epoch_fn(),
                                in_axes=(0, 0, 0, dx, dx, None)))

    # per-replica RNG streams, replicating the sequential trainers
    rngs = [np.random.default_rng(k) for k in keys]
    carry_list, jkey_list = carries
    carry = _stack(carry_list)
    jkeys = list(jkey_list)

    # one shared predict-program cache across replicas (weights are call
    # arguments, so the compiled sampler is architecture-keyed, not
    # replica-keyed)
    cache = nets[0]._jit_cache
    for net in nets[1:]:
        net._jit_cache = cache

    logs = [dict() for _ in range(K)]
    bests = [{"loss": float("inf"), "vars": None, "epoch": 0}
             for _ in range(K)]

    ckpt = _MultiCheckpointer(nets[0].folder, checkpoint_every, ckpt_name)
    epoch0 = 0
    resumed = ckpt.restore((carry, _stack(best_templates)))
    if resumed is not None:
        epoch0, (carry, best_stack), logs, rngs, jkeys = resumed
        for r in range(K):
            saved = logs[r].get("_best_epoch", [0])
            if saved and saved[-1] > 0:
                bests[r] = {"loss": logs[r]["_best_loss"][-1],
                            "vars": jax.device_get(_unstack(best_stack, r)),
                            "epoch": saved[-1]}
        if verbose:
            print(f"resuming ensemble training from epoch {epoch0}")

    t_s = time.time()
    for epoch in range(epoch0, num_epochs):
        t_e = time.time()
        perms = jnp.stack([jnp.asarray(epoch_permutation(r, n, batch_size))
                           for r in rngs])
        eks = []
        for r in range(K):
            jkeys[r], ek = jax.random.split(jkeys[r])
            eks.append(ek)
        carry, metrics = epoch_fn(carry, perms, jnp.stack(eks), Xd, Yd, Md)
        metrics = {k: np.asarray(v) for k, v in metrics.items()}

        for r in range(K):
            row = {k: float(v[r]) for k, v in metrics.items()}
            per_epoch_hook(nets[r], _unstack(carry, r), epoch)
            if nruns:
                row.update(evaluate_prediction(nets[r], ds_trains[r], nruns,
                                               key=epoch))
                row.update({f"{k}_test": v for k, v in evaluate_prediction(
                    nets[r], ds_tests[r], nruns, key=epoch).items()})
                opt_loss = best_of_row(row)
                if opt_loss < bests[r]["loss"]:
                    bests[r].update(loss=opt_loss, epoch=epoch + 1,
                                    vars=jax.device_get(
                                        _best_vars_of(nets[r])))
            for k, v in row.items():
                logs[r].setdefault(k, []).append(v)
            logs[r]["_best_loss"] = [bests[r]["loss"]
                                     if bests[r]["epoch"] else 0.0]
            logs[r]["_best_epoch"] = [bests[r]["epoch"]]
        ckpt.maybe_save(epoch + 1, carry,
                        _stack([b["vars"] if b["vars"] is not None else t
                                for b, t in zip(bests, best_templates)]),
                        logs, rngs, jkeys)
        if verbose:
            t = time.time()
            eta = (t - t_s) * (num_epochs / (epoch + 1) - 1)
            head = next(k for k in metrics if "loss" in k.lower())
            print(f"[{epoch + 1}/{num_epochs}] [{t - t_e:.2f}/{eta:.2f}] "
                  f"{head}: " + " ".join(f"{float(v):.4g}"
                                         for v in metrics[head]),
                  flush=True)
    ckpt.clear()
    for log in logs:
        log.pop("_best_loss", None)
        log.pop("_best_epoch", None)
    return carry, logs, bests


def _best_vars_of(net):
    """The weights retained for the optimal epoch (generator or decoder)."""
    if hasattr(net, "vars_dec") and net.vars_dec is not None:
        return net.vars_dec
    return net.vars_G


def fit_gan_ensemble(nets: Sequence, ds_trains, ds_tests,
                     num_epochs: int = 200, batch_size: int = 64,
                     learning_rate: float = 2e-4, nruns: int = 5,
                     keys: Sequence[int] | None = None, verbose: bool = True,
                     retain_every: int = 0, checkpoint_every: int = 25):
    """Train K CGANRegression replicas in one vmapped program.

    Per-replica results are indistinguishable from `net.fit(..., key=k)`:
    each net ends with its own vars_G/vars_D, G_opt.msgpack, epoch bank and
    stats.npz. Reference protocol: 5 realizations per configuration,
    scripts/train_parameterizations.py:26-35.
    """
    from ..models.cgan_regression import make_gan_batch_step

    K = len(nets)
    keys = list(keys) if keys is not None else list(range(K))
    _check_homogeneous(nets, ("regression", "generator", "nx", "div",
                              "hidden_channels"))
    Xs, Ys, shared = _prepare(nets, ds_trains, ds_tests)

    n = Xs[0].shape[0]
    steps = int(np.ceil(n / batch_size))
    sched = [int(num_epochs * f) * steps for f in (0.5, 0.75, 0.875)]
    lr_sched = optax.piecewise_constant_schedule(
        learning_rate, {b: 0.5 for b in sched})
    txD = optax.adam(lr_sched, b1=0.5, b2=0.999)
    txG = optax.adam(lr_sched, b1=0.5, b2=0.999)

    carry_list, jkey_list, best_templates = [], [], []
    for net, key in zip(nets, keys):
        jkey = jax.random.PRNGKey(key)
        jkey, k1, k2 = jax.random.split(jkey, 3)
        x0 = jnp.zeros((1, net.nx, net.nx, 2 + net.n_latent), jnp.float32)
        vG = net.G.init(k1, x0, train=True)
        net.vars_G = {"params": vG["params"],
                      "batch_stats": vG.get("batch_stats", {})}
        vD = net.D.init(k2, jnp.zeros((1, net.nx, net.nx, 6)), train=True)
        net.vars_D = {"params": vD["params"],
                      "batch_stats": vD.get("batch_stats", {})}
        carry_list.append((net.vars_G["params"], net.vars_G["batch_stats"],
                           txG.init(net.vars_G["params"]),
                           net.vars_D["params"],
                           txD.init(net.vars_D["params"])))
        jkey_list.append(jkey)
        best_templates.append(jax.device_get(net.vars_G))

    batch_step = make_gan_batch_step(nets[0], txG, txD)

    def make_epoch_fn():
        def train_epoch(carry, perm, ekey, Xd, Yd, Md):
            def body(c, inp):
                idx, i = inp
                kb = jax.random.fold_in(ekey, i)
                return batch_step(c, (Xd[idx], Yd[idx], Md[idx]), i, kb)

            steps_idx = jnp.arange(perm.shape[0])
            carry, metrics = jax.lax.scan(body, carry, (perm, steps_idx))
            return carry, {k: v.mean() for k, v in metrics.items()}
        return train_epoch

    def hook(net, c, epoch):
        pG, bsG, _, pD, _ = c
        net.vars_G = {"params": pG, "batch_stats": bsG}
        net.vars_D = {"params": pD, "batch_stats": net.vars_D["batch_stats"]}
        if retain_every and (epoch + 1) % retain_every == 0:
            from ..models.base import save_variables
            bank = os.path.join(net.folder, "epoch_bank")
            os.makedirs(bank, exist_ok=True)
            save_variables(jax.device_get(net.vars_G),
                           os.path.join(bank, f"G_{epoch + 1}.msgpack"))

    carry, logs, bests = _run_ensemble_epochs(
        nets=nets, ds_trains=ds_trains, ds_tests=ds_tests,
        make_epoch_fn=make_epoch_fn, carries=(carry_list, jkey_list),
        keys=keys, num_epochs=num_epochs, batch_size=batch_size,
        nruns=nruns, verbose=verbose, Xs=Xs, Ys=Ys, shared=shared,
        per_epoch_hook=hook,
        best_of_row=lambda row: row.get("L2_total_test", np.inf)
        + row.get("L2_residual_test", np.inf),
        ckpt_name="gan_multi_ckpt", checkpoint_every=checkpoint_every,
        best_templates=best_templates)

    from ..models.base import save_variables
    for r, net in enumerate(nets):
        c = _unstack(carry, r)
        pG, bsG, _, pD, _ = c
        net.vars_G = {"params": pG, "batch_stats": bsG}
        net.vars_D = {"params": pD, "batch_stats": net.vars_D["batch_stats"]}
        if bests[r]["vars"] is not None:
            os.makedirs(net.folder, exist_ok=True)
            save_variables(bests[r]["vars"], f"{net.folder}/G_opt.msgpack")
        net.save_model(logs[r])
    return logs


def fit_vae_ensemble(nets: Sequence, ds_trains, ds_tests,
                     num_epochs: int = 200, batch_size: int = 64,
                     learning_rate: float = 2e-4, nruns: int = 5,
                     keys: Sequence[int] | None = None, verbose: bool = True,
                     checkpoint_every: int = 25):
    """Train K CVAERegression replicas in one vmapped program (see
    fit_gan_ensemble)."""
    from ..models.cvae_regression import make_vae_loss

    K = len(nets)
    keys = list(keys) if keys is not None else list(range(K))
    _check_homogeneous(nets, ("regression", "div", "decoder_var",
                              "hidden_channels"))
    Xs, Ys, shared = _prepare(nets, ds_trains, ds_tests)
    nx = Xs[0].shape[1]

    n = Xs[0].shape[0]
    steps = int(np.ceil(n / batch_size))
    sched = [int(num_epochs * f) * steps for f in (0.5, 0.75, 0.875)]
    tx = optax.adam(optax.piecewise_constant_schedule(
        learning_rate, {b: 0.1 for b in sched}))

    carry_list, jkey_list, best_templates = [], [], []
    for net, key in zip(nets, keys):
        jkey = jax.random.PRNGKey(key)
        jkey, k1 = jax.random.split(jkey)
        net.vars_enc = net.vars_dec = None
        params, bstats = net._init_vae_variables(k1, nx)
        carry_list.append((params, bstats, tx.init(params)))
        jkey_list.append(jkey)
        best_templates.append(jax.device_get(net.vars_dec))

    loss_fn = make_vae_loss(nets[0])

    def make_epoch_fn():
        def train_epoch(carry, perm, ekey, Xd, Yd, Md):
            def body(c, inp):
                params, bstats, opt_state = c
                idx, i = inp
                kz = jax.random.fold_in(ekey, i)
                x, y, ymean = Xd[idx], Yd[idx], Md[idx]
                (_, (metrics, bstats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, bstats, kz, x, y,
                                           ymean, True)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, bstats, opt_state), metrics

            idxs = jnp.arange(perm.shape[0])
            carry, metrics = jax.lax.scan(body, carry, (perm, idxs))
            return carry, {k: v.mean() for k, v in metrics.items()}
        return train_epoch

    def hook(net, c, epoch):
        params, bstats, _ = c
        net._set_vae_variables(params, bstats)

    carry, logs, bests = _run_ensemble_epochs(
        nets=nets, ds_trains=ds_trains, ds_tests=ds_tests,
        make_epoch_fn=make_epoch_fn, carries=(carry_list, jkey_list),
        keys=keys, num_epochs=num_epochs, batch_size=batch_size,
        nruns=nruns, verbose=verbose, Xs=Xs, Ys=Ys, shared=shared,
        per_epoch_hook=hook,
        best_of_row=lambda row: row.get("L2_total_test", np.inf)
        + row.get("L2_residual_test", np.inf),
        ckpt_name="vae_multi_ckpt", checkpoint_every=checkpoint_every,
        best_templates=best_templates)

    from ..models.base import save_variables
    for r, net in enumerate(nets):
        params, bstats, _ = _unstack(carry, r)
        net._set_vae_variables(params, bstats)
        if bests[r]["vars"] is not None:
            os.makedirs(net.folder, exist_ok=True)
            save_variables(bests[r]["vars"],
                           f"{net.folder}/decoder_opt.msgpack")
        net.save_model(logs[r])
    return logs
