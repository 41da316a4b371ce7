import numpy as np

from pyqg_generative_tpu.qg.grid import make_grid


def test_wavenumber_layout():
    g = make_grid(16, L=1e6)
    np.testing.assert_allclose(
        g.kk, 2 * np.pi * np.fft.rfftfreq(16, d=1e6 / 16))
    np.testing.assert_allclose(
        g.ll, 2 * np.pi * np.fft.fftfreq(16, d=1e6 / 16))
    assert g.k.shape == (16, 9)
    assert g.wv2[0, 0] == 0.0


def test_spectral_derivative_exact():
    g = make_grid(32)
    x = g.x
    f = np.sin(4 * 2 * np.pi * x / g.L)
    df = g.ifft(g.fft(f) * g.ik)
    expected = (4 * 2 * np.pi / g.L) * np.cos(4 * 2 * np.pi * x / g.L)
    np.testing.assert_allclose(df, expected, atol=1e-12)


def test_filter_properties():
    g = make_grid(64, filterfac=23.6)
    # unity in the resolved band, decaying beyond 0.65*pi
    assert np.all(g.filtr[g.wvx <= 0.65 * np.pi] == 1.0)
    assert np.all(g.filtr <= 1.0)
    assert g.filtr[g.ny // 2, g.nk - 1] < 1e-3
    # sharp variant acts as a hard cutoff
    gs = make_grid(64, filterfac=1e20)
    beyond = gs.wvx > 0.65 * np.pi
    assert np.all(gs.filtr[beyond] == 0.0)
    assert np.all(gs.filtr[~beyond] == 1.0)


def test_grid_cache():
    assert make_grid(32) is make_grid(32)
    assert make_grid(32) is not make_grid(32, filterfac=1e20)
