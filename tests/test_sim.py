import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqg_generative_tpu.qg.params import QGParams, DAY
from pyqg_generative_tpu.sim import (run_simulation, run_ensemble,
                                     generate_subgrid_forcing)
from pyqg_generative_tpu.sim.stochastic import (SamplerState, init_sampler,
                                                sample_forcing)
from pyqg_generative_tpu.models.base import Parameterization


P = QGParams(nx=32, dt=14400.0, tmax=80 * 14400.0, tavestart=20 * 14400.0,
             taveint=14400.0, precision="double")
SNAP = 20 * 14400.0  # 4 snapshots


class NullForcing(Parameterization):
    """Closure returning zero forcing (for coupling-machinery tests)."""

    def latent_shape(self, ny, nx):
        return (ny, nx, 2)

    def generate_latent_noise(self, key, ny, nx):
        return jax.random.normal(key, self.latent_shape(ny, nx), jnp.float32)

    def predict_snapshot(self, q, noise):
        return jnp.zeros_like(q)

    def predict_mean_snapshot(self, q, M=100):
        return jnp.zeros_like(q)


class TinyForcing(NullForcing):
    """Noise-dependent forcing: forcing = amp * noise (lev-first)."""
    amp = 1e-12

    def predict_snapshot(self, q, noise):
        return self.amp * jnp.moveaxis(noise, -1, 0).astype(q.dtype)


def test_run_simulation_dataset_contract():
    ds = run_simulation(P, sampling_freq=SNAP)
    for v in ("q", "u", "v", "psi"):
        assert ds[v].dims == ("time", "lev", "y", "x")
        assert ds[v].shape == (4, 2, 32, 32)
        assert ds[v].dtype == np.float32
        assert np.isfinite(ds[v].values).all()
    assert ds["time"].attrs["units"] == "days"
    np.testing.assert_allclose(ds["time"].values,
                               [20 * 14400 / DAY * (i + 1) for i in range(4)])
    # diagnostics present with spectral dims
    assert ds["KEspec"].dims == ("lev", "l", "k")
    assert ds["KEflux"].dims == ("l", "k")
    assert "pyqg_params" in ds.attrs


def test_run_simulation_q_init_passthrough(rng):
    q0 = rng.standard_normal((2, 32, 32)) * 1e-6
    ds = run_simulation(P, q_init=q0, sampling_freq=SNAP, with_diags=False)
    assert np.isfinite(ds["q"].values).all()


def test_parameterized_run_with_null_forcing_matches_unforced():
    ds0 = run_simulation(P, sampling_freq=SNAP, with_diags=False, key=1)
    ds1 = run_simulation(P, {"self": NullForcing(), "sampling": "AR1",
                             "nsteps": 1},
                         sampling_freq=SNAP, with_diags=False, key=1)
    np.testing.assert_allclose(ds0["q"].values, ds1["q"].values, atol=1e-12)


def test_parameterized_run_forcing_changes_solution():
    ds0 = run_simulation(P, sampling_freq=SNAP, with_diags=False, key=1)
    ds1 = run_simulation(P, {"self": TinyForcing(), "sampling": "AR1",
                             "nsteps": 1},
                         sampling_freq=SNAP, with_diags=False, key=1)
    assert not np.allclose(ds0["q"].values, ds1["q"].values, atol=0)
    # paramspec diagnostics appear for parameterized runs
    ds2 = run_simulation(P, {"self": TinyForcing()}, sampling_freq=SNAP)
    assert "paramspec" in ds2
    assert "paramspec_KEflux" in ds2


def test_run_ensemble_members_differ():
    ds = run_ensemble(P, n_ens=3, sampling_freq=SNAP, with_diags=False)
    assert ds["q"].dims == ("run", "time", "lev", "y", "x")
    assert ds["q"].shape[0] == 3
    assert not np.allclose(ds["q"].values[0], ds["q"].values[1])


def test_generate_subgrid_forcing_contract():
    p = QGParams(nx=64, dt=3600.0, tmax=20 * 3600.0, precision="double")
    out = generate_subgrid_forcing([16, 32], p, sampling_freq=10 * 3600.0)
    assert set(out.keys()) == {"Operator2-16-dealias", "Operator2-32-dealias",
                               "Operator5-16-dealias", "Operator5-32-dealias"}
    ds = out["Operator2-16-dealias"]
    for v in ("q_forcing_advection", "q", "u", "v", "psi"):
        assert ds[v].shape == (2, 2, 16, 16)
        assert np.isfinite(ds[v].values).all()
    # forcing has zero spatial mean mode? not exactly, but finite and small
    S = ds["q_forcing_advection"].values
    q = ds["q"].values
    assert np.abs(S).max() < 1e-6 * max(1.0, np.abs(q).max())


def test_generate_subgrid_forcing_batch_matches_single():
    from pyqg_generative_tpu.sim import generate_subgrid_forcing_batch
    p = QGParams(nx=64, dt=3600.0, tmax=20 * 3600.0, precision="double")
    batch = generate_subgrid_forcing_batch(
        [16], p, sampling_freq=10 * 3600.0, keys=[0, 3])
    assert len(batch) == 2
    for j, key in enumerate((0, 3)):
        single = generate_subgrid_forcing(
            [16], p, sampling_freq=10 * 3600.0, key=key)
        for c in single:
            for v in ("q_forcing_advection", "q", "u", "v", "psi"):
                np.testing.assert_allclose(batch[j][c][v].values,
                                           single[c][v].values,
                                           rtol=1e-6, atol=1e-30)


# ------------------------------------------------------------ samplers

def _sampler_model():
    return NullForcing()


def test_ar1_sampler_statistics():
    model = _sampler_model()
    st = init_sampler(0, model, 8, 8, np.float64)
    n = 10

    def compute(noise):
        return jnp.zeros((2, 8, 8))

    a = 1 - 1 / n
    xs = [st.noise]
    for _ in range(200):
        _, st = sample_forcing(model, compute, st, "AR1", n)
        xs.append(st.noise)
    xs = np.stack([np.asarray(x).ravel() for x in xs])
    # lag-1 autocorrelation approx a, variance stays near 1
    x0, x1 = xs[:-1].ravel(), xs[1:].ravel()
    rho = np.corrcoef(x0, x1)[0, 1]
    assert abs(rho - a) < 0.05
    assert abs(xs.std() - 1.0) < 0.1


def test_frozen_noise_sampler():
    model = _sampler_model()
    st = init_sampler(0, model, 8, 8, np.float64)
    noise0 = np.asarray(st.noise).copy()
    for _ in range(5):
        _, st = sample_forcing(model, lambda z: jnp.zeros((2, 8, 8)), st,
                               "AR1", -1)
    np.testing.assert_array_equal(np.asarray(st.noise), noise0)


def test_constant_sampler_skips_computation():
    model = _sampler_model()
    st = init_sampler(0, model, 8, 8, np.float64)
    calls = []

    def compute(noise):
        # traced only; use the forcing value to detect refresh steps
        return jnp.full((2, 8, 8), jnp.sum(noise))

    forcings = []
    for i in range(6):
        f, st = sample_forcing(model, compute, st, "constant", 3)
        forcings.append(float(np.asarray(f)[0, 0, 0]))
    # refresh at steps 0 and 3: values constant within each window
    assert forcings[0] == forcings[1] == forcings[2]
    assert forcings[3] == forcings[4] == forcings[5]
    assert forcings[0] != forcings[3]


def test_run_ensemble_segmented_equivalence():
    """Segmented execution is bit-identical to the single-program ensemble
    (the carry IS the full scan state)."""
    import numpy as np
    from pyqg_generative_tpu.qg.params import QGParams
    from pyqg_generative_tpu.sim import run_ensemble, run_ensemble_segmented

    p = QGParams(nx=16, dt=14400.0, tmax=16 * 14400.0, tavestart=0.0,
                 precision="single")
    a = run_ensemble(p, None, n_ens=2, sampling_freq=4 * 14400.0, key=3)
    b = run_ensemble_segmented(p, None, n_ens=2, sampling_freq=4 * 14400.0,
                               key=3, n_segments=2)
    for v in ("q", "u", "v"):
        np.testing.assert_array_equal(a[v].values, b[v].values)
    np.testing.assert_allclose(a["KEspec"].values, b["KEspec"].values,
                               rtol=1e-6)
