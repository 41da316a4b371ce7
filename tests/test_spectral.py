import numpy as np

from pyqg_generative_tpu.qg.grid import make_grid
from pyqg_generative_tpu.qg.spectral import calc_ispec, spectrum
from pyqg_generative_tpu.utils import xrlite as xr


def test_calc_ispec_parseval(rng):
    """The documented invariant (reference tools/spectral_tools.py:133-134):
    signal.var() == phr.sum() * dkr in summation mode."""
    n = 64
    g = make_grid(n)
    x = rng.standard_normal((n, n))
    x -= x.mean()
    xh = np.fft.rfftn(x) / g.M
    var_dens = np.abs(xh) ** 2
    kr, phr = calc_ispec(g, var_dens, averaging=False, truncate=False)
    dkr = kr[1] - kr[0]
    np.testing.assert_allclose(phr.sum() * dkr, x.var(), rtol=1e-3)


def test_calc_ispec_batched(rng):
    g = make_grid(32)
    dens = rng.random((2, 32, 17))
    kr, phr = calc_ispec(g, dens, averaging=False, truncate=False)
    assert phr.shape == (2, kr.size)
    _, p0 = calc_ispec(g, dens[0], averaging=False, truncate=False)
    np.testing.assert_allclose(phr[0], p0)


def test_spectrum_power_parseval(rng):
    n = 32
    data = rng.standard_normal((2, 60, 2, n, n))
    da = xr.DataArray(data, dims=("run", "time", "lev", "y", "x"))
    sp = spectrum(time=slice(None, None))
    out = sp(da)
    assert out.dims == ("lev", "k")
    dk = out.coords["k"][1] - out.coords["k"][0]
    x = data - data.mean(axis=(-2, -1), keepdims=True)
    energy_phys = (x ** 2).mean(axis=(0, 1, 3, 4))  # per lev
    # truncate=False default keeps all modes -> Parseval per layer
    np.testing.assert_allclose(out.values.sum(axis=-1) * dk, energy_phys,
                               rtol=2e-2)


def test_spectrum_cospectrum_and_crosslayer(rng):
    n = 32
    a = xr.DataArray(rng.standard_normal((1, 50, 2, n, n)),
                     dims=("run", "time", "lev", "y", "x"))
    b = xr.DataArray(rng.standard_normal((1, 50, 2, n, n)),
                     dims=("run", "time", "lev", "y", "x"))
    co = spectrum(type="cospectrum", time=slice(None, None))(a, b)
    assert co.dims == ("lev", "k")
    cl = spectrum(type="cross_layer", time=slice(None, None))(a)
    assert cl.dims == ("k",)
    # cospectrum of a field with itself is its power spectrum
    pw = spectrum(time=slice(None, None))(a)
    co_aa = spectrum(type="cospectrum", time=slice(None, None))(a, a)
    np.testing.assert_allclose(co_aa.values, pw.values, rtol=1e-10)
