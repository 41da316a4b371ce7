"""Checkpoint/resume: interrupted run equals uninterrupted run exactly."""
import os

import numpy as np
import jax
import pytest

from pyqg_generative_tpu.qg.params import QGParams
from pyqg_generative_tpu.sim import (advance_run, init_run_carry,
                                     run_simulation, set_initial_condition)
from pyqg_generative_tpu.utils.checkpoints import (load_checkpoint,
                                                   save_checkpoint)

P = QGParams(nx=24, dt=14400.0, tmax=40 * 14400.0, tavestart=10 * 14400.0,
             taveint=14400.0, precision="double")
SNAP = 10 * 14400.0


def _wrap(carry):
    return {"state": carry[0], "sampler": carry[1], "diags": carry[2]}


def _unwrap(d):
    return (d["state"], d["sampler"], d["diags"])


def test_resume_bitexact(tmp_path):
    from pyqg_generative_tpu.models.mean_var_model import MeanVarModel  # noqa

    q0 = set_initial_condition(P, 0)
    param = None

    # uninterrupted: 4 snapshot chunks
    carry = init_run_carry(P, q0, jax.random.PRNGKey(0), None, True)
    carry, ds_full = advance_run(carry, P, param, n_snaps=4,
                                 sampling_freq=SNAP)

    # interrupted: 2 chunks, checkpoint, restore, 2 more chunks
    carry2 = init_run_carry(P, q0, jax.random.PRNGKey(0), None, True)
    carry2, ds_a = advance_run(carry2, P, param, n_snaps=2,
                               sampling_freq=SNAP)
    ckpt = str(tmp_path / "run.npz")
    save_checkpoint(ckpt, _wrap(carry2))

    template = _wrap(init_run_carry(P, q0, jax.random.PRNGKey(0), None, True))
    restored = _unwrap(load_checkpoint(ckpt, template))
    # dtypes/values identical after round trip
    np.testing.assert_array_equal(np.asarray(restored[0].qh),
                                  np.asarray(carry2[0].qh))
    assert restored[0].qh.dtype == carry2[0].qh.dtype
    assert int(restored[0].tc) == int(carry2[0].tc)

    _, ds_b = advance_run(restored, P, param, n_snaps=2, sampling_freq=SNAP)

    np.testing.assert_array_equal(ds_full["q"].values[:2], ds_a["q"].values)
    np.testing.assert_array_equal(ds_full["q"].values[2:], ds_b["q"].values)
    # time coordinates continue correctly
    np.testing.assert_allclose(ds_b["time"].values,
                               ds_full["time"].values[2:])
    # diagnostics running means agree at the end
    np.testing.assert_allclose(ds_b["KEspec"].values,
                               ds_full["KEspec"].values, rtol=1e-12)


def test_resume_with_stochastic_closure(tmp_path):
    """Sampler memory (noise, cached forcing, PRNG key) survives the
    checkpoint: a constant-sampler closure resumes mid-window."""
    import jax.numpy as jnp
    from pyqg_generative_tpu.models.base import Parameterization

    class NoiseForcing(Parameterization):
        def latent_shape(self, ny, nx):
            return (ny, nx, 2)

        def generate_latent_noise(self, key, ny, nx):
            return jax.random.normal(key, self.latent_shape(ny, nx),
                                     jnp.float32)

        def predict_snapshot(self, q, noise):
            return 1e-12 * jnp.moveaxis(noise, -1, 0).astype(q.dtype)

    model = NoiseForcing()
    param = {"self": model, "sampling": "constant", "nsteps": 7}
    q0 = set_initial_condition(P, 1)

    carry = init_run_carry(P, q0, jax.random.PRNGKey(1), model, False)
    carry, ds_full = advance_run(carry, P, param, n_snaps=4,
                                 sampling_freq=SNAP, with_diags=False)

    carry2 = init_run_carry(P, q0, jax.random.PRNGKey(1), model, False)
    carry2, _ = advance_run(carry2, P, param, n_snaps=2, sampling_freq=SNAP,
                            with_diags=False)
    ckpt = str(tmp_path / "run2.npz")
    save_checkpoint(ckpt, _wrap(carry2))
    template = _wrap(init_run_carry(P, q0, jax.random.PRNGKey(1), model,
                                    False))
    restored = _unwrap(load_checkpoint(ckpt, template))
    assert int(restored[1].counter) == int(carry2[1].counter)
    _, ds_b = advance_run(restored, P, param, n_snaps=2, sampling_freq=SNAP,
                          with_diags=False)
    np.testing.assert_array_equal(ds_full["q"].values[2:], ds_b["q"].values)
