"""Mid-run training checkpoint/resume: kill training partway and resume to a
bit-identical final state (VERDICT round-1 item 8; the reference only had
job-level resubmit, scripts/train_parameterizations.py:10-19)."""
import os

import numpy as np
import pytest

from pyqg_generative_tpu.models import (CGANRegression, CVAERegression,
                                        OLSModel)

from test_closures import make_synthetic_ds

NX = 16
SMALL = dict(hidden_channels=(8, 8))


@pytest.fixture(scope="module")
def ds_pair():
    rng = np.random.default_rng(7)
    return (make_synthetic_ds(rng, nrun=4, ntime=8, nx=NX, noise=1.0),
            make_synthetic_ds(rng, nrun=2, ntime=4, nx=NX, noise=1.0))


def _leaves(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _assert_trees_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def test_gan_resume_bitexact(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    EPOCHS = 4

    # uninterrupted run
    f_ref = str(tmp_path / "gan_ref")
    m_ref = CGANRegression(nx=NX, folder=f_ref, **SMALL)
    m_ref.fit(ds_train, ds_test, num_epochs=EPOCHS, batch_size=16, nruns=2,
              verbose=False, key=3)

    # interrupted at epoch 2 (checkpoint_every=2), then resumed by a fresh
    # process-equivalent: brand-new model object, same folder
    f_int = str(tmp_path / "gan_int")
    m1 = CGANRegression(nx=NX, folder=f_int, **SMALL)
    with pytest.raises(KeyboardInterrupt):
        _fit_interrupted(m1, ds_train, ds_test, EPOCHS, stop_after=2, key=3)
    assert os.path.exists(os.path.join(f_int, "gan_train_ckpt.npz"))

    m2 = CGANRegression(nx=NX, folder=f_int, **SMALL)
    m2.fit(ds_train, ds_test, num_epochs=EPOCHS, batch_size=16, nruns=2,
           verbose=False, key=3)

    _assert_trees_equal(m_ref.vars_G["params"], m2.vars_G["params"])
    _assert_trees_equal(m_ref.vars_D["params"], m2.vars_D["params"])
    # checkpoint cleaned up after a completed run
    assert not os.path.exists(os.path.join(f_int, "gan_train_ckpt.npz"))
    # optimal-epoch retention survives the interruption
    assert os.path.exists(os.path.join(f_ref, "G_opt.msgpack")) == \
        os.path.exists(os.path.join(f_int, "G_opt.msgpack"))


def _fit_interrupted(m, ds_train, ds_test, epochs, stop_after, key):
    """Run fit() but raise (simulated crash) after `stop_after` epochs, by
    patching the checkpointer save to count."""
    from pyqg_generative_tpu.ml import train as train_mod

    orig = train_mod.TrainCheckpointer.maybe_save
    count = {"n": 0}

    def counting(self, epoch, *a, **kw):
        orig(self, epoch, *a, **kw)
        if self.path and epoch >= stop_after:
            count["n"] += 1
            raise KeyboardInterrupt

    train_mod.TrainCheckpointer.maybe_save = counting
    try:
        m.fit(ds_train, ds_test, num_epochs=epochs, batch_size=16, nruns=2,
              verbose=False, key=key, checkpoint_every=2)
    finally:
        train_mod.TrainCheckpointer.maybe_save = orig


def test_vae_resume_bitexact(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    EPOCHS = 4

    f_ref = str(tmp_path / "vae_ref")
    m_ref = CVAERegression(folder=f_ref, **SMALL)
    m_ref.fit(ds_train, ds_test, num_epochs=EPOCHS, batch_size=16, nruns=2,
              verbose=False, key=5)

    f_int = str(tmp_path / "vae_int")
    m1 = CVAERegression(folder=f_int, **SMALL)
    with pytest.raises(KeyboardInterrupt):
        _fit_interrupted(m1, ds_train, ds_test, EPOCHS, stop_after=2, key=5)
    assert os.path.exists(os.path.join(f_int, "vae_train_ckpt.npz"))

    m2 = CVAERegression(folder=f_int, **SMALL)
    m2.fit(ds_train, ds_test, num_epochs=EPOCHS, batch_size=16, nruns=2,
           verbose=False, key=5)

    _assert_trees_equal(m_ref.vars_dec["params"], m2.vars_dec["params"])
    _assert_trees_equal(m_ref.vars_enc["params"], m2.vars_enc["params"])
    assert not os.path.exists(os.path.join(f_int, "vae_train_ckpt.npz"))
