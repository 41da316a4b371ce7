"""Physics validation of the QG core: inversion, budget identities, stepping.

Includes an independent pure-numpy reference stepper (written from the same
equations, separate code path) to cross-check the JAX implementation in
float64 — the role pyqg trajectories play for the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqg_generative_tpu.qg import core, diagnostics
from pyqg_generative_tpu.qg.grid import make_grid
from pyqg_generative_tpu.qg.params import QGParams, EDDY_PARAMS

P64 = QGParams(nx=32, precision="double")


def random_state(rng, p, amp=1e-5, kmax=6):
    g = make_grid(p.nx)
    qh = np.zeros((2, g.ny, g.nk), dtype=complex)
    qh[:, :kmax, :kmax] = rng.standard_normal((2, kmax, kmax)) + \
        1j * rng.standard_normal((2, kmax, kmax))
    qh[:, -kmax + 1:, :kmax] = rng.standard_normal((2, kmax - 1, kmax)) + \
        1j * rng.standard_normal((2, kmax - 1, kmax))
    qh[:, 0, 0] = 0
    q = np.fft.irfftn(qh, s=(g.ny, g.nx), axes=(-2, -1))
    q = amp * q / q.std()
    return core.init_state(jnp.asarray(q), p)


# ---------------------------------------------------------------- inversion

def test_invert_roundtrip(rng):
    p = P64
    g = make_grid(p.nx)
    st = random_state(rng, p)
    ph = core.invert(st.qh, p)
    # rebuild qh from ph through the forward stretching operator
    wv2 = g.wv2
    q1h = -(wv2 + p.F1) * np.asarray(ph[0]) + p.F1 * np.asarray(ph[1])
    q2h = p.F2 * np.asarray(ph[0]) - (wv2 + p.F2) * np.asarray(ph[1])
    np.testing.assert_allclose(q1h, np.asarray(st.qh[0]), rtol=1e-10,
                               atol=1e-10 * np.abs(np.asarray(st.qh)).max())
    np.testing.assert_allclose(q2h, np.asarray(st.qh[1]), rtol=1e-10,
                               atol=1e-10 * np.abs(np.asarray(st.qh)).max())
    # mean mode gauge-fixed
    assert ph[0][0, 0] == 0


def _spec_sum(d):
    """Sum a 2D rfft-layout quadratic diagnostic over the full plane
    (interior k columns count twice by conjugate symmetry)."""
    d = np.asarray(d)
    return d[..., 0].sum() + d[..., -1].sum() + 2 * d[..., 1:-1].sum()


# ---------------------------------------------------------- budget identities

def test_paramspec_splits_exactly(rng):
    """paramspec == paramspec_KEflux + paramspec_APEflux, mode by mode."""
    p = P64
    st = random_state(rng, p)
    flds = core.fields(st.qh, p)
    forcing = rng.standard_normal((2, p.nx, p.nx)) * 1e-11
    fh = jnp.fft.rfftn(jnp.asarray(forcing), axes=(-2, -1))
    d = diagnostics.compute_diagnostics(flds, st.qh, p, forcing_h=fh)
    np.testing.assert_allclose(
        np.asarray(d["paramspec"]),
        np.asarray(d["paramspec_KEflux"] + d["paramspec_APEflux"]),
        rtol=1e-8, atol=1e-12 * np.abs(np.asarray(d["paramspec"])).max())


def test_apegen_matches_mean_term_energy_input(rng):
    """APEgenspec equals the directly computed energy tendency of the
    mean-flow terms, mode by mode."""
    p = P64
    g = make_grid(p.nx)
    st = random_state(rng, p)
    flds = core.fields(st.qh, p)
    ph, qh = np.asarray(flds.ph), np.asarray(st.qh)
    dels = np.array([p.del1, p.del2])
    U = np.array(p.Ubg)
    Qy = np.array(p.Qy)
    ik = g.ik
    T_mean = np.stack([
        -ik * (U[i] * qh[i] + Qy[i] * ph[i]) for i in (0, 1)])
    direct = -(dels[:, None, None] * (np.conj(ph) * T_mean).real).sum(0) / g.M ** 2
    d = diagnostics.compute_diagnostics(flds, st.qh, p)
    np.testing.assert_allclose(np.asarray(d["APEgenspec"]), direct,
                               atol=np.abs(direct).max() * 1e-9)


def test_nonlinear_transfers_sum_to_zero(rng):
    """Advection redistributes but does not create energy: total KEflux and
    APEflux vanish (band-limited fields so triple products are alias-free)."""
    p = P64
    st = random_state(rng, p, kmax=5)  # 5 < 32/6
    flds = core.fields(st.qh, p)
    d = diagnostics.compute_diagnostics(flds, st.qh, p)
    ke_scale = _spec_sum(np.abs(np.asarray(d["KEflux"])))
    ape_scale = _spec_sum(np.abs(np.asarray(d["APEflux"])))
    assert abs(_spec_sum(d["KEflux"])) < 1e-8 * max(ke_scale, 1e-300)
    assert abs(_spec_sum(d["APEflux"])) < 1e-6 * max(ape_scale, 1e-300)
    # same for the enstrophy transfer
    ens_scale = _spec_sum(np.abs(np.asarray(d["ENSflux"])))
    assert abs(_spec_sum(d["ENSflux"])) < 1e-6 * max(ens_scale, 1e-300)


def test_friction_diag_matches_direct(rng):
    p = P64
    g = make_grid(p.nx)
    st = random_state(rng, p)
    flds = core.fields(st.qh, p)
    d = diagnostics.compute_diagnostics(flds, st.qh, p)
    ph = np.asarray(flds.ph)
    expected = -p.rek * p.del2 * g.wv2 * np.abs(ph[1]) ** 2 / g.M ** 2
    np.testing.assert_allclose(np.asarray(d["KEfrictionspec"]), expected,
                               rtol=1e-10)
    assert _spec_sum(d["KEfrictionspec"]) <= 0.0


# ------------------------------------------------------- numpy cross-check

def numpy_reference_step(q, p, nsteps):
    """Independent float64 reference: same equations, written with plain
    numpy loops over steps (no jax)."""
    g = make_grid(p.nx)
    F1, F2 = p.F1, p.F2
    wv2 = g.wv2
    det = wv2 * (wv2 + F1 + F2)
    qh = np.fft.rfftn(q, axes=(-2, -1))
    f_p = np.zeros_like(qh)
    f_pp = np.zeros_like(qh)
    for tc in range(nsteps):
        with np.errstate(divide="ignore", invalid="ignore"):
            p1h = np.where(det > 0, (-(wv2 + F2) * qh[0] - F1 * qh[1]) / np.where(det == 0, 1, det), 0)
            p2h = np.where(det > 0, (-F2 * qh[0] - (wv2 + F1) * qh[1]) / np.where(det == 0, 1, det), 0)
        ph = np.stack([p1h, p2h])
        u = np.fft.irfftn(-g.il * ph, s=(g.ny, g.nx), axes=(-2, -1))
        v = np.fft.irfftn(g.ik * ph, s=(g.ny, g.nx), axes=(-2, -1))
        qr = np.fft.irfftn(qh, s=(g.ny, g.nx), axes=(-2, -1))
        f = np.zeros_like(qh)
        for i, (Ui, Qyi) in enumerate(zip(p.Ubg, p.Qy)):
            uq = (u[i] + Ui) * qr[i]
            vq = v[i] * qr[i]
            f[i] = -(g.ik * np.fft.rfftn(uq) + g.il * np.fft.rfftn(vq)) \
                - g.ik * Qyi * ph[i]
        f[1] += p.rek * wv2 * ph[1]
        if tc == 0:
            qtend = p.dt * f
        elif tc == 1:
            qtend = p.dt * (1.5 * f - 0.5 * f_p)
        else:
            qtend = p.dt * (23 / 12 * f - 16 / 12 * f_p + 5 / 12 * f_pp)
        qh = g.filtr * (qh + qtend)
        f_pp, f_p = f_p, f
    return np.fft.irfftn(qh, s=(g.ny, g.nx), axes=(-2, -1))


def test_step_matches_numpy_reference(rng):
    p = QGParams(nx=32, dt=14400.0, precision="double")
    q0 = np.asarray(core.default_initial_q(p, rng=np.random.default_rng(7)))
    st = core.init_state(jnp.asarray(q0), p)
    for _ in range(20):
        st = core.step(st, p)
    q_jax = np.fft.irfftn(np.asarray(st.qh), s=(p.nx, p.nx), axes=(-2, -1))
    q_np = numpy_reference_step(q0, p, 20)
    np.testing.assert_allclose(q_jax, q_np, rtol=1e-9,
                               atol=1e-12 * np.abs(q_np).max())


# ------------------------------------------------------------ integration

def test_spinup_is_stable_and_energizes():
    p = EDDY_PARAMS.replace(nx=48, dt=14400.0, precision="double")
    q0 = core.default_initial_q(p, rng=np.random.default_rng(3))
    st = core.init_state(q0, p)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(st, n):
        def body(s, _):
            return core.step(s, p), None
        return jax.lax.scan(body, st, None, length=n)[0]

    st = run(st, 3000)  # ~1.4 model years
    flds = core.fields(st.qh, p)
    assert np.isfinite(np.asarray(flds.q)).all()
    ke = float(core.total_ke(flds, p))
    assert ke > 0
    c = float(core.cfl(flds, p))
    assert 0 < c < 0.5
    # PV magnitude in a physically sensible range (q std ~ 1e-6..1e-4 s^-1)
    assert 1e-8 < float(np.asarray(flds.q).std()) < 1e-3


@pytest.mark.slow
def test_eddy_climatology_golden():
    """Statistically steady eddy climatology at 64^2 stays inside the
    envelope anchored by the published training-data checksum
    (std(q) ~ 5.7e-6 s^-1; docs/VALIDATION.md)."""
    from pyqg_generative_tpu.qg.params import EDDY_PARAMS, YEAR

    p = EDDY_PARAMS.replace(tmax=6 * YEAR, tavestart=3 * YEAR,
                            precision="double")
    from pyqg_generative_tpu.sim import run_simulation
    ds = run_simulation(p, sampling_freq=30 * p.dt)
    q = ds["q"].values
    late = q[q.shape[0] // 2:]
    assert 3e-6 < late.std() < 9e-6
    u = ds["u"].values[q.shape[0] // 2:]
    v = ds["v"].values[q.shape[0] // 2:]
    ke = 0.5 * (u ** 2 + v ** 2).mean()
    assert 1e-4 < ke < 1e-2
    # spectrum decays into the filter range
    from pyqg_generative_tpu.qg.spectral import calc_ispec
    k, sp = calc_ispec(64, ds["KEspec"].values[0])
    assert sp.max() / max(sp[-1], 1e-300) > 1e6


@pytest.mark.slow
def test_jet_configuration_stable():
    """JET_PARAMS (rek=7e-8, delta=0.1, beta=1e-11) integrates stably and
    produces a distinct climatology from the eddy configuration."""
    from pyqg_generative_tpu.qg.params import JET_PARAMS, YEAR
    from pyqg_generative_tpu.sim import run_simulation

    p = JET_PARAMS.replace(nx=48, dt=14400.0, tmax=6 * YEAR,
                           tavestart=3 * YEAR, precision="double")
    ds = run_simulation(p, sampling_freq=30 * p.dt)
    q = ds["q"].values
    assert np.isfinite(q).all()
    late = q[q.shape[0] // 2:]
    assert 1e-7 < late.std() < 1e-3
    # zonal-mean structure: jets show stronger zonal anisotropy than eddies
    u = ds["u"].values[-1, 0]
    assert np.abs(u.mean(axis=-1)).max() > 0  # nontrivial zonal-mean flow


def test_forcing_hook_changes_trajectory(rng):
    p = P64
    st = random_state(rng, p)
    forcing = jnp.asarray(rng.standard_normal((2, p.nx, p.nx)) * 1e-12)
    s1 = core.step(st, p)
    s2 = core.step(st, p, forcing=forcing)
    assert not np.allclose(np.asarray(s1.qh), np.asarray(s2.qh))
    # linearity: the first (Euler) step responds with dt * filtr * F
    g = make_grid(p.nx)
    dq = np.asarray(s2.qh - s1.qh)
    fh = np.fft.rfftn(np.asarray(forcing), axes=(-2, -1))
    np.testing.assert_allclose(dq, p.dt * g.filtr * fh, rtol=1e-10,
                               atol=1e-10 * np.abs(dq).max())
