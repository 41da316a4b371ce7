import numpy as np
import jax.numpy as jnp
import pytest

from pyqg_generative_tpu.models import OLSModel, MeanVarModel, load_model
from pyqg_generative_tpu.utils import xrlite as xr


def make_synthetic_ds(rng, nrun=2, ntime=8, nx=16, slope=2.0, noise=0.1):
    """Forcing = slope * q + heteroscedastic noise, with amplitudes roughly
    matching the physical scales (q ~ 1e-5, S ~ 1e-11)."""
    q = rng.standard_normal((nrun, ntime, 2, nx, nx)).astype("float32") * 1e-5
    eps = rng.standard_normal(q.shape).astype("float32")
    S = (slope * q + noise * np.abs(q) * eps) * 1e-6
    psi = rng.standard_normal(q.shape).astype("float32") * 1e2
    ds = xr.Dataset()
    ds["q"] = xr.DataArray(q, dims=("run", "time", "lev", "y", "x"))
    ds["q_forcing_advection"] = xr.DataArray(
        S, dims=("run", "time", "lev", "y", "x"))
    ds["psi"] = xr.DataArray(psi, dims=("run", "time", "lev", "y", "x"))
    return ds


@pytest.fixture(scope="module")
def ds_pair():
    rng = np.random.default_rng(0)
    return (make_synthetic_ds(rng, nrun=6, ntime=16),
            make_synthetic_ds(rng, nrun=2, ntime=8))


def small_kw(folder):
    return dict(hidden_channels=(8, 8), folder=folder)


def test_ols_fit_predict_saveload(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    folder = str(tmp_path / "model")
    m = OLSModel(batch_norm=False, **small_kw(folder))
    m.fit(ds_train, ds_test, num_epochs=40, batch_size=16,
          learning_rate=2e-3, verbose=False)
    preds = m.predict(ds_test)
    assert preds["q_forcing_advection"].shape == ds_test["q"].shape
    # learned the linear map reasonably well
    err = preds["q_forcing_advection"].values - \
        ds_test["q_forcing_advection"].values
    rel = np.sqrt((err ** 2).mean() /
                  (ds_test["q_forcing_advection"].values ** 2).mean())
    assert rel < 0.5

    # reload from folder through the registry (no eval())
    m2 = load_model(folder)
    assert isinstance(m2, OLSModel)
    p2 = m2.predict(ds_test)
    np.testing.assert_allclose(p2["q_forcing_advection"].values,
                               preds["q_forcing_advection"].values, rtol=1e-5)


def test_ols_online_call_demeans(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    folder = str(tmp_path / "m2")
    m = OLSModel(**small_kw(folder))
    m.fit(ds_train, ds_test, num_epochs=2, batch_size=16, verbose=False)
    q = jnp.asarray(ds_test["q"].values[0, 0])
    forcing = m(q, None)
    assert forcing.shape == q.shape
    np.testing.assert_allclose(np.asarray(forcing.mean(axis=(-2, -1))), 0.0,
                               atol=1e-17)


def test_meanvar_learns_variance(tmp_path):
    rng = np.random.default_rng(1)
    ds_train = make_synthetic_ds(rng, nrun=6, ntime=16, noise=1.0)
    ds_test = make_synthetic_ds(rng, noise=1.0)
    folder = str(tmp_path / "gz")
    m = MeanVarModel(**small_kw(folder))
    m.fit(ds_train, ds_test, num_epochs=30, batch_size=16,
          learning_rate=2e-3, verbose=False)
    preds = m.predict(ds_test)
    assert float(preds["q_forcing_advection_var"].values.min()) >= 0
    # sampled output differs from the mean (stochastic)
    resid = preds["q_forcing_advection"].values - \
        preds["q_forcing_advection_mean"].values
    assert resid.std() > 0.01 * preds["q_forcing_advection"].values.std()
    # variance correlates with |q| (heteroscedastic signal learned)
    v = preds["q_forcing_advection_var"].values.ravel()
    a = (ds_test["q"].values ** 2).ravel()
    corr = np.corrcoef(v, a)[0, 1]
    assert corr > 0.2


def test_offline_harness_keys(tmp_path, ds_pair):
    ds_train, ds_test = ds_pair
    folder = str(tmp_path / "m3")
    m = OLSModel(**small_kw(folder))
    m.fit(ds_train, ds_test, num_epochs=2, batch_size=16, verbose=False)
    out = m.test_offline(ds_test, ensemble_size=4)
    expected = ["R2_mean", "R2_total", "R2_residual", "L2_mean", "L2_total",
                "L2_residual", "spatial_mse", "temporal_mse", "mse",
                "spatial_nmse", "temporal_nmse", "nmse", "spatial_skill",
                "temporal_skill", "skill", "spatial_correlation",
                "temporal_correlation", "correlation", "temporal_var_ratio",
                "var_ratio", "PSD", "PSD_gen", "PSD_res", "PSD_gen_res",
                "PSD_mean", "Eflux", "Eflux_gen", "Eflux_res", "Eflux_gen_res",
                "Eflux_mean", "L2_PSD", "L2_Eflux", "CSD_res", "CSD_gen_res",
                "PDF0", "PDF1", "PDF_gen0", "PDF_res0", "PDF_gen_res1"]
    for k in expected:
        assert k in out, k
    # perfect-prediction sanity: skill of OLS against itself
    perfect = m.predict(ds_test)
    perfect["psi"] = ds_test["psi"]
    from pyqg_generative_tpu.eval.metrics import subgrid_scores
    s = subgrid_scores(perfect["q_forcing_advection_mean"],
                       perfect["q_forcing_advection_mean"],
                       perfect["q_forcing_advection_mean"])
    assert abs(s["R2_mean"].values - 1.0) < 1e-6
    assert abs(s["L2_mean"].values) < 1e-6
