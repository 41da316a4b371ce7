"""Mesh parallelism on the 8-device virtual CPU platform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyqg_generative_tpu.parallel import (make_mesh, ensemble_sharding,
                                          shard_params_tp, product_configs,
                                          run_experiment)
from pyqg_generative_tpu.qg.params import QGParams
from pyqg_generative_tpu.sim import run_ensemble
from pyqg_generative_tpu.utils import xrlite as xr


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_ensemble_matches_unsharded():
    p = QGParams(nx=16, dt=14400.0, tmax=10 * 14400.0, tavestart=0.0,
                 precision="double")
    mesh = make_mesh({"ens": 8})
    sh = ensemble_sharding(mesh)
    ds_sharded = run_ensemble(p, n_ens=8, sampling_freq=5 * 14400.0,
                              with_diags=False, sharding=sh, key=3)
    ds_local = run_ensemble(p, n_ens=8, sampling_freq=5 * 14400.0,
                            with_diags=False, key=3)
    np.testing.assert_allclose(ds_sharded["q"].values, ds_local["q"].values,
                               rtol=1e-10, atol=1e-14)


def test_dp_training_step_matches_single_device():
    """Data-parallel gradient step equals the single-device step."""
    import optax
    from pyqg_generative_tpu.ml import nets
    from pyqg_generative_tpu.models.common import mse_loss_fn

    net = nets.AndrewCNN(n_out=2, hidden_channels=(8,), batch_norm=False)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (16, 8, 8, 2))
    Y = 0.5 * X
    variables = net.init(key, X[:1], train=True)
    params = variables["params"]
    tx = optax.sgd(0.1)
    opt = tx.init(params)
    loss_fn = mse_loss_fn(net)

    def step(params, opt, x, y):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, {}, None, (x, y), False)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, l

    p1, _, l1 = jax.jit(step)(params, opt, X, Y)

    mesh = make_mesh({"dp": 8})
    xs = jax.device_put(X, NamedSharding(mesh, P("dp")))
    ys = jax.device_put(Y, NamedSharding(mesh, P("dp")))
    pr = jax.device_put(params, NamedSharding(mesh, P()))
    p2, _, l2 = jax.jit(step)(pr, opt, xs, ys)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_shard_params_tp_specs():
    mesh = make_mesh({"dp": 4, "tp": 2})
    params = {"conv": {"kernel": np.zeros((3, 3, 4, 8)),
                       "bias": np.zeros((8,))},
              "odd": {"kernel": np.zeros((3, 3, 4, 7))}}
    sh = shard_params_tp(params, mesh)
    assert sh["conv"]["kernel"].spec == P(None, None, None, "tp")
    assert sh["odd"]["kernel"].spec == P()


def test_tp_sharded_conv_matches_replicated():
    """Tensor-parallel (output-channel sharded) conv application equals the
    replicated computation."""
    from pyqg_generative_tpu.ml import nets

    net = nets.AndrewCNN(n_out=2, hidden_channels=(16, 16),
                         batch_norm=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 2))
    variables = net.init(key, x, train=True)

    def f(params, x):
        return net.apply({"params": params}, x, train=False)

    y_ref = jax.jit(f)(variables["params"], x)

    mesh = make_mesh({"dp": 2, "tp": 4})
    sh = shard_params_tp(variables["params"], mesh, "tp")
    params_tp = jax.device_put(variables["params"], sh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp")))
    y_tp = jax.jit(f)(params_tp, x_sh)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_graft_entry_and_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    q = np.fft.irfftn(np.asarray(out[0].qh), s=(64, 64), axes=(-2, -1))
    assert np.isfinite(q).all()

    ge.dryrun_multichip(8)


def test_sweep_runner(tmp_path):
    cfgs = product_configs(nx=[8, 16], seed=[0])
    assert len(cfgs) == 2

    calls = []

    def fn(nx, seed):
        calls.append((nx, seed))
        ds = xr.Dataset()
        ds["x"] = xr.DataArray(np.zeros((nx,)), ("x",))
        return ds

    res = run_experiment(str(tmp_path), fn, cfgs, verbose=False)
    assert len(res) == 2
    # re-run skips existing outputs
    run_experiment(str(tmp_path), fn, cfgs, verbose=False)
    assert len(calls) == 2
