"""Shared plumbing for CNN-based closures: batchnorm-aware apply, MSE
regression training, weight persistence."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ml import train as T
__all__ = ["bn_apply", "mse_loss_fn", "train_regression", "nhwc_from_lev",
           "lev_from_nhwc"]


def nhwc_from_lev(q):
    """(lev, ny, nx) -> (1, ny, nx, lev)"""
    return jnp.moveaxis(q, 0, -1)[None]


def lev_from_nhwc(x):
    """(1, ny, nx, lev) -> (lev, ny, nx)"""
    return jnp.moveaxis(x[0], -1, 0)


def bn_apply(net, params, batch_stats, x, train: bool, **kw):
    """Apply a flax module tracking batch statistics when training."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, upd = net.apply(variables, x, train=True,
                             mutable=["batch_stats"], **kw)
        return out, upd.get("batch_stats", batch_stats)
    return net.apply(variables, x, train=False, **kw), batch_stats


def mse_loss_fn(net):
    def loss_fn(params, batch_stats, key, batch, train):
        x, y = batch
        pred, new_bs = bn_apply(net, params, batch_stats, x, train)
        loss = jnp.mean((pred - y) ** 2)
        return loss, ({"loss": loss}, new_bs)
    return loss_fn


def train_regression(net, X_train, Y_train, X_test, Y_test,
                     num_epochs: int, batch_size: int, learning_rate: float,
                     rng=None, key=None, verbose=True, log_dict=None,
                     checkpoint_dir=None, checkpoint_every: int = 25):
    """Generic MSE regression training (reference tools/cnn_tools.py:645-700).
    If checkpoint_dir is given, training state is checkpointed mid-run and
    resumed bit-for-bit on restart (ml.train.TrainCheckpointer)."""
    rng = rng or np.random.default_rng(0)
    key = key if key is not None else jax.random.PRNGKey(0)
    steps = int(np.ceil(len(X_train) / batch_size))
    tx = T.multistep_adam(learning_rate, num_epochs, steps)
    state = T.init_training_state(net, tx, key, jnp.asarray(X_train[:1]))
    arrays = (jnp.asarray(X_train), jnp.asarray(Y_train))
    test = (jnp.asarray(X_test), jnp.asarray(Y_test))
    state, log = T.fit(mse_loss_fn(net), state, tx, arrays, test,
                       num_epochs, batch_size, rng=rng, key=key,
                       verbose=verbose, log_dict=log_dict,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every)
    return {"params": state.params, "batch_stats": state.batch_stats}, log
