import numpy as np
import jax.numpy as jnp

from pyqg_generative_tpu.qg import operators as op
from pyqg_generative_tpu.qg.grid import make_grid
from pyqg_generative_tpu.qg.params import QGParams


def band_limited(rng, n, kmax, nfields=1):
    """Random real fields whose spectra vanish for |k| or |l| >= kmax modes."""
    g = make_grid(n)
    out = []
    for _ in range(nfields):
        xh = np.zeros((n, n // 2 + 1), dtype=complex)
        xh[:kmax, :kmax] = rng.standard_normal((kmax, kmax)) + \
            1j * rng.standard_normal((kmax, kmax))
        xh[-kmax + 1:, :kmax] = rng.standard_normal((kmax - 1, kmax)) + \
            1j * rng.standard_normal((kmax - 1, kmax))
        xh[0, 0] = 0.0
        x = np.fft.irfftn(xh, s=(n, n), axes=(-2, -1))
        out.append(x / x.std())
    return out[0] if nfields == 1 else out


def test_cut_off_preserves_low_modes(rng):
    """Truncation must keep resolved harmonics exactly (amplitude-rescaled)."""
    n, nc = 64, 16
    x = band_limited(rng, n, kmax=6)  # resolved by the coarse grid
    y = np.asarray(op.cut_off(x, nc))
    # the coarse field evaluated on coincident spectral modes equals x
    xh = np.fft.rfftn(x) / n ** 2
    yh = np.fft.rfftn(y) / nc ** 2
    np.testing.assert_allclose(yh[:6, :6], xh[:6, :6], atol=1e-12)
    np.testing.assert_allclose(yh[-5:, :6], xh[-5:, :6], atol=1e-12)


def test_cut_off_zeroes_2h_harmonics(rng):
    n, nc = 64, 16
    x = rng.standard_normal((n, n))
    yh = np.fft.rfftn(np.asarray(op.cut_off(x, nc)))
    assert abs(yh[nc // 2, 0]) < 1e-10
    np.testing.assert_allclose(abs(yh[:, nc // 2]), 0.0, atol=1e-10)


def test_cut_off_batched(rng):
    x = rng.standard_normal((2, 3, 32, 32))
    y = np.asarray(op.cut_off(x, 16))
    assert y.shape == (2, 3, 16, 16)
    y0 = np.asarray(op.cut_off(x[1, 2], 16))
    np.testing.assert_allclose(y[1, 2], y0, atol=1e-12)


def test_coarsegrain_box_average(rng):
    x = rng.standard_normal((8, 8))
    y = np.asarray(op.coarsegrain(x, 4))
    manual = x.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    # coarsegrain also cleans Nyquist harmonics; compare after same cleaning
    np.testing.assert_allclose(y, np.asarray(op.clean_2h(manual)), atol=1e-12)
    # means agree exactly
    np.testing.assert_allclose(y.mean(), x.mean(), atol=1e-12)


def test_fft_interpolate_roundtrip(rng):
    """Upsample then downsample is identity for clean fields
    (the reference validates this in notebooks/3-2-dealiasing.ipynb)."""
    n, N = 32, 48
    x = band_limited(rng, n, kmax=10)
    up = op.fft_interpolate(jnp.asarray(x), n, N)
    back = np.asarray(op.fft_interpolate(up, N, n))
    np.testing.assert_allclose(back, x, atol=1e-10)


def test_fft_interpolate_exact_on_harmonics():
    """Trig interpolation is exact on resolved harmonics (fields sampled at
    the FFT sample positions j*dx)."""
    n, N = 32, 48
    L = 1e6
    xs = lambda m: np.meshgrid(np.arange(m) * L / m, np.arange(m) * L / m)
    x, y = xs(n)
    f = np.cos(3 * 2 * np.pi * x / L) * np.sin(5 * 2 * np.pi * y / L)
    F = np.asarray(op.fft_interpolate(jnp.asarray(f), n, N))
    X, Y = xs(N)
    expected = np.cos(3 * 2 * np.pi * X / L) * np.sin(5 * 2 * np.pi * Y / L)
    np.testing.assert_allclose(F, expected, atol=1e-10)


def test_fft_interpolate_commutes_with_derivative(rng):
    n, N = 32, 48
    x = band_limited(rng, n, kmax=8)
    g, G = make_grid(n), make_grid(N)
    dx_then_up = op.fft_interpolate(
        jnp.asarray(g.ifft(g.fft(x) * g.ik)), n, N)
    up_then_dx = G.ifft(G.fft(np.asarray(
        op.fft_interpolate(jnp.asarray(x), n, N))) * G.ik)
    np.testing.assert_allclose(np.asarray(dx_then_up), up_then_dx, atol=1e-10)


def test_gauss_filter_transmission(rng):
    n = 64
    g = make_grid(n)
    x = rng.standard_normal((n, n))
    y = np.asarray(op.gauss_filter(x, n // 2))  # ratio 2
    xh, yh = np.fft.rfftn(x), np.fft.rfftn(y)
    expected = np.exp(-g.wv2 * (2 * g.dx) ** 2 / 24)
    mask = np.abs(xh) > 1e-12
    np.testing.assert_allclose((yh / xh)[mask].real, expected[mask], atol=1e-7)


def test_operator_composites_shapes(rng):
    x = rng.standard_normal((2, 256, 256))
    for name, f in op.OPERATORS.items():
        y = np.asarray(f(jnp.asarray(x), 64))
        assert y.shape == (2, 64, 64), name
        assert np.isfinite(y).all(), name


def test_advect_dealias_consistency(rng):
    """On sufficiently band-limited fields all dealiasing modes agree."""
    n = 64
    q, u, v = band_limited(rng, n, kmax=8, nfields=3)
    a0 = np.asarray(op.advect(jnp.asarray(q), jnp.asarray(u), jnp.asarray(v)))
    a32 = np.asarray(op.advect(jnp.asarray(q), jnp.asarray(u),
                               jnp.asarray(v), "3/2-rule"))
    np.testing.assert_allclose(a0, a32, rtol=1e-7, atol=1e-12 * np.abs(a0).max())


def test_pv_subgrid_forcing_identity_operator_is_zero(rng):
    """With the identity 'coarsening' at the same resolution and exact
    dealiasing, the subgrid forcing vanishes."""
    p = QGParams(nx=32, precision="double")
    q = np.stack(band_limited(rng, 32, kmax=5, nfields=2)) * 1e-5
    ident = lambda x, nc: x
    forcing, _ = op.PV_subgrid_forcing(jnp.asarray(q), 32, ident, p, "3/2-rule")
    forcing = np.asarray(forcing)
    assert np.abs(forcing).max() < 1e-18  # q ~ 1e-5 => advect ~ 1e-12


def test_pv_subgrid_forcing_shapes(rng):
    p = QGParams(nx=64, precision="double")
    q = np.stack(band_limited(rng, 64, kmax=10, nfields=2)) * 1e-5
    forcing, (qc, uc, vc, psic) = op.PV_subgrid_forcing(
        jnp.asarray(q), 32, op.Operator2, p, "3/2-rule")
    for arr in (forcing, qc, uc, vc, psic):
        assert np.asarray(arr).shape == (2, 32, 32)
        assert np.isfinite(np.asarray(arr)).all()


def test_gcm_filter_discrete_gaussian():
    """gcm_filter follows the gcm_filters construction: polynomial of the
    discrete 5-point Laplacian approximating exp(-k^2 L^2 / 24); it must (a)
    preserve the mean exactly, (b) match the spectral Gaussian closely at
    well-resolved scales, (c) damp *less* than the continuous Gaussian at
    grid scale (discrete eigenvalues are smaller than k^2 there)."""
    import numpy as np
    import jax.numpy as jnp
    from pyqg_generative_tpu.qg.operators import gauss_filter, gcm_filter
    from pyqg_generative_tpu.qg.grid import make_grid

    n, nc = 64, 32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float64))
    Y = np.asarray(gcm_filter(X, nc))
    Yg = np.asarray(gauss_filter(X, nc))
    # mean preserved exactly (k=0 transmission is 1)
    np.testing.assert_allclose(Y.mean(axis=(-2, -1)),
                               np.asarray(X).mean(axis=(-2, -1)), atol=1e-12)
    # large-scale mode almost untouched and close to the spectral Gaussian
    g = make_grid(n)
    x = np.arange(n) * g.dx
    mode = np.cos(2 * np.pi * x / g.L)[None, :] * np.ones((n, 1))
    m1 = np.asarray(gcm_filter(jnp.asarray(mode[None]), nc))[0]
    m2 = np.asarray(gauss_filter(jnp.asarray(mode[None]), nc))[0]
    np.testing.assert_allclose(m1, m2, rtol=2e-3, atol=1e-6)
    # at grid scale the discrete filter transmits more than the continuous
    nyq = np.cos(np.pi * np.arange(n))[None, :] * np.ones((n, 1))
    t_disc = float(np.abs(np.asarray(
        gcm_filter(jnp.asarray(nyq[None]), nc))).max())
    t_cont = float(np.abs(np.asarray(
        gauss_filter(jnp.asarray(nyq[None]), nc))).max())
    assert t_disc > t_cont
