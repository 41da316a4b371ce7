"""Vmapped multi-replica training (ml.multifit): per-replica parity with
the sequential trainers, multi-dataset stacking, artifact layout."""
import os

import jax
import numpy as np
import pytest

from pyqg_generative_tpu.ml.multifit import fit_gan_ensemble, fit_vae_ensemble
from pyqg_generative_tpu.models import CGANRegression, CVAERegression

from test_closures import make_synthetic_ds

NX = 16
SMALL = dict(hidden_channels=(8, 8))


@pytest.fixture(scope="module")
def ds_pair():
    rng = np.random.default_rng(2)
    return (make_synthetic_ds(rng, nrun=4, ntime=8, nx=NX, noise=1.0),
            make_synthetic_ds(rng, nrun=2, ntime=4, nx=NX, noise=1.0))


@pytest.fixture(scope="module")
def ds_pair_b():
    rng = np.random.default_rng(7)
    return (make_synthetic_ds(rng, nrun=4, ntime=8, nx=NX, noise=1.0),
            make_synthetic_ds(rng, nrun=2, ntime=4, nx=NX, noise=1.0))


def tree_allclose(a, b, rtol=2e-2, atol=2e-3):
    """Parity within vmap numerics: the vmapped conv lowering reduces in a
    different order than the serial one, so replica weights drift ~5e-5 per
    epoch from the sequential run (measured, CPU f32). The failure modes
    this guards — swapped replicas, broken per-replica RNG streams, shared
    state across seeds — produce O(1e-1) differences."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_gan_ensemble_matches_sequential(tmp_path, ds_pair):
    """Replica r of the vmapped run == sequential fit(key=r): same init
    keys, same shuffle stream, same per-batch fold-in."""
    ds_train, ds_test = ds_pair
    seq = []
    for seed in (0, 1):
        m = CGANRegression(nx=NX, folder=str(tmp_path / f"seq{seed}"),
                           **SMALL)
        m.fit(ds_train, ds_test, num_epochs=2, batch_size=16, nruns=0,
              verbose=False, key=seed)
        seq.append(m)

    nets = [CGANRegression(nx=NX, folder=str(tmp_path / f"vm{seed}"),
                           **SMALL) for seed in (0, 1)]
    fit_gan_ensemble(nets, [ds_train] * 2, [ds_test] * 2, num_epochs=2,
                     batch_size=16, nruns=0, keys=[0, 1], verbose=False)
    for m, n in zip(seq, nets):
        tree_allclose(m.vars_G, n.vars_G)
        tree_allclose(m.vars_D["params"], n.vars_D["params"])
    # seeds genuinely differ
    g0 = jax.tree_util.tree_leaves(nets[0].vars_G["params"])[0]
    g1 = jax.tree_util.tree_leaves(nets[1].vars_G["params"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # save_model artifacts per replica
    for seed in (0, 1):
        assert os.path.exists(tmp_path / f"vm{seed}" / "G.msgpack")
        assert os.path.exists(tmp_path / f"vm{seed}" / "model_args.json")


def test_gan_ensemble_multi_dataset(tmp_path, ds_pair, ds_pair_b):
    """Two replicas with different datasets (stacked in_axes=0) match the
    sequential fits on their own data."""
    pairs = [ds_pair, ds_pair_b]
    seq = []
    for i, (dtr, dte) in enumerate(pairs):
        m = CGANRegression(nx=NX, folder=str(tmp_path / f"sq{i}"), **SMALL)
        m.fit(dtr, dte, num_epochs=1, batch_size=16, nruns=0,
              verbose=False, key=i)
        seq.append(m)
    nets = [CGANRegression(nx=NX, folder=str(tmp_path / f"vd{i}"), **SMALL)
            for i in range(2)]
    fit_gan_ensemble(nets, [p[0] for p in pairs], [p[1] for p in pairs],
                     num_epochs=1, batch_size=16, nruns=0, keys=[0, 1],
                     verbose=False)
    for m, n in zip(seq, nets):
        tree_allclose(m.vars_G, n.vars_G)
        # scalers are per-dataset
        np.testing.assert_allclose(m.x_scale.std, n.x_scale.std)


def test_gan_ensemble_epoch_bank_and_opt(tmp_path, ds_pair):
    """retain_every banks per-replica generator weights; nruns>0 tracks and
    saves each replica's optimal-epoch generator."""
    ds_train, ds_test = ds_pair
    nets = [CGANRegression(nx=NX, folder=str(tmp_path / f"bk{i}"), **SMALL)
            for i in range(2)]
    logs = fit_gan_ensemble(nets, [ds_train] * 2, [ds_test] * 2,
                            num_epochs=2, batch_size=16, nruns=1,
                            keys=[0, 1], verbose=False, retain_every=1)
    for i in range(2):
        for e in (1, 2):
            assert os.path.exists(
                tmp_path / f"bk{i}" / "epoch_bank" / f"G_{e}.msgpack")
        assert os.path.exists(tmp_path / f"bk{i}" / "G_opt.msgpack")
        assert len(logs[i]["L2_total_test"]) == 2


def test_vae_ensemble_matches_sequential(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    seq = []
    for seed in (0, 1):
        m = CVAERegression(folder=str(tmp_path / f"vs{seed}"), **SMALL)
        m.fit(ds_train, ds_test, num_epochs=2, batch_size=16, nruns=0,
              verbose=False, key=seed)
        seq.append(m)
    nets = [CVAERegression(folder=str(tmp_path / f"vv{seed}"), **SMALL)
            for seed in (0, 1)]
    fit_vae_ensemble(nets, [ds_train] * 2, [ds_test] * 2, num_epochs=2,
                     batch_size=16, nruns=0, keys=[0, 1], verbose=False)
    for m, n in zip(seq, nets):
        tree_allclose(m.vars_dec, n.vars_dec)
        tree_allclose(m.vars_enc, n.vars_enc)
    for seed in (0, 1):
        assert os.path.exists(tmp_path / f"vv{seed}" / "decoder.msgpack")


def test_vae_ensemble_opt_epoch(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    nets = [CVAERegression(folder=str(tmp_path / f"vo{i}"), **SMALL)
            for i in range(2)]
    fit_vae_ensemble(nets, [ds_train] * 2, [ds_test] * 2, num_epochs=2,
                     batch_size=16, nruns=1, keys=[0, 1], verbose=False)
    for i in range(2):
        assert os.path.exists(tmp_path / f"vo{i}" / "decoder_opt.msgpack")
        m = CVAERegression(folder=str(tmp_path / f"vo{i}"), **SMALL)
        assert m.use_optimal_epoch()
