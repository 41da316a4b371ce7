"""Exactness of the fused Pallas online-CNN kernel vs the flax/XLA path
(interpret mode on the CPU test mesh; the same code compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqg_generative_tpu.ml.nets import AndrewCNN, fold_batchnorm
from pyqg_generative_tpu.ml.pallas_conv import (fused_cnn_forward,
                                                pack_folded_params)

NX = 16
HID = (8, 8, 8)


@pytest.fixture(scope="module")
def net_and_params():
    net = AndrewCNN(n_out=2, hidden_channels=HID, kernels=(5, 5, 3, 3))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, NX, NX, 4)),
                 train=True)
    variables = {"params": v["params"],
                 "batch_stats": v.get("batch_stats", {})}
    # make BN stats non-trivial so folding is actually exercised
    bs = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.3 * np.abs(np.random.default_rng(0).normal(
            size=a.shape)).astype(a.dtype), bs)
    variables["batch_stats"] = bs
    folded = fold_batchnorm(variables)
    net_eval = AndrewCNN(n_out=2, hidden_channels=HID, kernels=(5, 5, 3, 3),
                         batch_norm=False)
    return net_eval, variables, folded


def _xla_forward(net_eval, folded, x):
    return net_eval.apply({"params": folded["params"], "batch_stats": {}},
                          x, train=False)


def test_fused_kernel_matches_xla_f32(net_and_params):
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params(folded, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (NX, NX, 4), jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x[None]))[0]
    out = np.asarray(fused_cnn_forward(x, w, b, meta,
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * np.abs(
        ref).max())


def test_fused_kernel_batched(net_and_params):
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params(folded, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, NX, NX, 4), jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x))
    out = np.asarray(fused_cnn_forward(x, w, b, meta,
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * np.abs(
        ref).max())


def test_fused_kernel_bf16_statistical(net_and_params):
    """bfloat16 matmuls with f32 accumulation: fields agree to bf16
    precision (relative RMS error < 2%)."""
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params(folded, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (NX, NX, 4), jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x[None]))[0]
    out = np.asarray(fused_cnn_forward(x, w, b, meta,
                                       compute_dtype=jnp.bfloat16,
                                       interpret=True))
    rel = np.sqrt(np.mean((out - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rel < 0.02, rel


def test_fused_kernel_dx_variant_f32(net_and_params):
    """Roll-input (dx-packed) kernel variant is exact vs the XLA path."""
    from pyqg_generative_tpu.ml.pallas_conv import pack_folded_params_dx
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params_dx(folded, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, NX, NX, 4),
                          jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x))
    out = np.asarray(fused_cnn_forward(x, w, b, meta,
                                       compute_dtype=jnp.float32,
                                       interpret=True, variant="dx"))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * np.abs(
        ref).max())


def test_make_online_cnn_dx(net_and_params):
    """Production dx path (XLA layer-1 + dx pallas kernel) matches flax."""
    from pyqg_generative_tpu.ml.pallas_conv import make_online_cnn
    net_eval, _, folded = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(8), (3, NX, NX, 4),
                          jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x))
    apply = make_online_cnn(folded, compute_dtype=jnp.float32,
                            interpret=True, variant="dx")
    out = np.asarray(apply(x))
    np.testing.assert_allclose(out, ref, rtol=2e-4,
                               atol=2e-5 * np.abs(ref).max())


def test_fold_then_pack_consistency(net_and_params):
    """Folded XLA path itself matches the BN eval path (guards the whole
    pallas input contract)."""
    net_eval, variables, folded = net_and_params
    net_bn = AndrewCNN(n_out=2, hidden_channels=HID, kernels=(5, 5, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, NX, NX, 4), jnp.float32)
    ref = np.asarray(net_bn.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, x, train=False))
    out = np.asarray(_xla_forward(net_eval, folded, x))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5 * np.abs(
        ref).max())


def test_make_online_cnn_packed(net_and_params):
    """The member-packed production path (XLA layer-1 + packed pallas
    kernel) matches the flax forward."""
    from pyqg_generative_tpu.ml.pallas_conv import make_online_cnn
    net_eval, _, folded = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (3, NX, NX, 4), jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x))
    apply = make_online_cnn(folded, compute_dtype=jnp.float32,
                            interpret=True)
    out = np.asarray(apply(x))
    np.testing.assert_allclose(out, ref, rtol=2e-4,
                               atol=2e-5 * np.abs(ref).max())
    # single-sample path
    out1 = np.asarray(apply(x[0]))
    np.testing.assert_allclose(out1, ref[0], rtol=2e-4,
                               atol=2e-5 * np.abs(ref).max())


def test_gan_pallas_backend_matches_xla(tmp_path):
    """CGANRegression(online_backend='pallas') produces the same online
    forcing as the XLA path (folded-BN generator, f32)."""
    from pyqg_generative_tpu.models import CGANRegression

    def build(backend):
        m = CGANRegression(nx=NX, folder=str(tmp_path / "none"),
                           hidden_channels=(8, 8),
                           online_backend=backend)
        key = jax.random.PRNGKey(0)
        vG = m.G.init(key, jnp.zeros((1, NX, NX, 2 + m.n_latent)),
                      train=True)
        m.vars_G = {"params": vG["params"],
                    "batch_stats": vG.get("batch_stats", {})}
        from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
        m.x_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5])
        m.y_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11])
        return m

    q = jax.random.normal(jax.random.PRNGKey(1), (2, NX, NX),
                          jnp.float32) * 1e-5
    z = jax.random.normal(jax.random.PRNGKey(2), (NX, NX, 2), jnp.float32)
    f_xla = np.asarray(build("xla").predict_snapshot(q, z))
    f_pal = np.asarray(build("pallas").predict_snapshot(q, z))
    assert f_pal.shape == f_xla.shape
    np.testing.assert_allclose(f_pal, f_xla, rtol=1e-3,
                               atol=1e-4 * np.abs(f_xla).max())


def test_gz_pallas_backend_matches_xla(tmp_path):
    """MeanVarModel(online_backend='pallas') produces the same online
    forcing as the eval-mode-BN XLA path (both CNNs folded + fused; the
    softplus variance head applied outside the kernel)."""
    from pyqg_generative_tpu.models import MeanVarModel

    def build(backend):
        m = MeanVarModel(hidden_channels=(8, 8),
                         folder=str(tmp_path / "none"),
                         online_backend=backend)
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, NX, NX, 2))
        mk = lambda t: {"params": t["params"],
                        "batch_stats": t.get("batch_stats", {})}
        m.vars_mean = mk(m.net_mean.init(key, x0, train=True))
        m.vars_var = mk(m.net_var.init(jax.random.PRNGKey(3), x0,
                                       train=True))
        from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
        m.x_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5])
        m.y_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11])
        return m

    q = jax.random.normal(jax.random.PRNGKey(1), (2, NX, NX),
                          jnp.float32) * 1e-5
    z = jax.random.normal(jax.random.PRNGKey(2), (NX, NX, 2), jnp.float32)
    f_xla = np.asarray(build("xla").predict_snapshot(q, z))
    f_pal = np.asarray(build("pallas").predict_snapshot(q, z))
    assert f_pal.shape == f_xla.shape
    np.testing.assert_allclose(f_pal, f_xla, rtol=1e-3,
                               atol=1e-4 * np.abs(f_xla).max())


def test_vae_pallas_backend_matches_xla(tmp_path):
    """CVAERegression(online_backend='pallas') produces the same online
    forcing as the eval-mode-BN XLA decoder path."""
    from pyqg_generative_tpu.models import CVAERegression

    def build(backend):
        m = CVAERegression(folder=str(tmp_path / "none"),
                           hidden_channels=(8, 8),
                           online_backend=backend)
        key = jax.random.PRNGKey(0)
        mk = lambda t: {"params": t["params"],
                        "batch_stats": t.get("batch_stats", {})}
        m.vars_dec = mk(m.decoder.init(
            key, jnp.zeros((1, NX, NX, 2 + m.n_latent)), train=True))
        from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
        m.x_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5])
        m.y_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11])
        return m

    q = jax.random.normal(jax.random.PRNGKey(1), (2, NX, NX),
                          jnp.float32) * 1e-5
    z = jax.random.normal(jax.random.PRNGKey(2), (NX, NX, 2), jnp.float32)
    f_xla = np.asarray(build("xla").predict_snapshot(q, z))
    f_pal = np.asarray(build("pallas").predict_snapshot(q, z))
    assert f_pal.shape == f_xla.shape
    np.testing.assert_allclose(f_pal, f_xla, rtol=1e-3,
                               atol=1e-4 * np.abs(f_xla).max())


def test_fused_kernel_dxb_bitcast_rolls_match_dx(net_and_params):
    """'dxb' (bf16 input rolls done on sublane-pair-packed f32 words via
    pltpu.bitcast — the round-2 recorded headroom idea, measured round 5)
    computes the IDENTICAL math to 'dx': same matmuls, same select, only
    the roll implementation differs — outputs must agree exactly."""
    from pyqg_generative_tpu.ml.pallas_conv import pack_folded_params_dx
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params_dx(folded, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, NX, NX, 4),
                          jnp.float32)
    out_dx = np.asarray(fused_cnn_forward(x, w, b, meta,
                                          compute_dtype=jnp.bfloat16,
                                          interpret=True, variant="dx"))
    out_dxb = np.asarray(fused_cnn_forward(x, w, b, meta,
                                           compute_dtype=jnp.bfloat16,
                                           interpret=True, variant="dxb"))
    np.testing.assert_array_equal(out_dx, out_dxb)


def test_make_online_cnn_dxb(net_and_params):
    """Production dxb path matches flax to bf16 statistical precision."""
    from pyqg_generative_tpu.ml.pallas_conv import make_online_cnn
    net_eval, _, folded = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(10), (3, NX, NX, 4),
                          jnp.float32)
    ref = np.asarray(_xla_forward(net_eval, folded, x))
    apply = make_online_cnn(folded, compute_dtype=jnp.bfloat16,
                            interpret=True, variant="dxb")
    out = np.asarray(apply(x))
    rel = np.sqrt(np.mean((out - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rel < 0.02, rel


def test_gz_pallas_pair_variant_matches_xla(tmp_path):
    """MeanVarModel(online_variant='dxpair') — mean+var merged into ONE
    block-diagonal program (merge_folded_pair) — matches the XLA path as
    tightly as the two-program 'dx' backend (round-5 GZ optimization)."""
    from pyqg_generative_tpu.models import MeanVarModel

    def build(backend, variant="dx"):
        m = MeanVarModel(hidden_channels=(8, 8),
                         folder=str(tmp_path / "none"),
                         online_backend=backend, online_variant=variant)
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, NX, NX, 2))
        mk = lambda t: {"params": t["params"],
                        "batch_stats": t.get("batch_stats", {})}
        m.vars_mean = mk(m.net_mean.init(key, x0, train=True))
        m.vars_var = mk(m.net_var.init(jax.random.PRNGKey(3), x0,
                                       train=True))
        from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
        m.x_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5])
        m.y_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11])
        return m

    q = jax.random.normal(jax.random.PRNGKey(1), (2, NX, NX),
                          jnp.float32) * 1e-5
    z = jax.random.normal(jax.random.PRNGKey(2), (NX, NX, 2), jnp.float32)
    f_xla = np.asarray(build("xla").predict_snapshot(q, z))
    f_pair = np.asarray(build("pallas", "dxpair").predict_snapshot(q, z))
    assert f_pair.shape == f_xla.shape
    np.testing.assert_allclose(f_pair, f_xla, rtol=1e-3,
                               atol=1e-4 * np.abs(f_xla).max())


def test_fused_kernel_dxf_matches_dx_bf16_exactly(net_and_params):
    """'dxf' (float32 rolls, cast at the matmul input) is a rewrite of 'dx'
    where the permutation (roll/select) commutes with the elementwise cast —
    outputs must be bit-identical at bf16. On real TPUs 'dx' at bf16 does
    not lower (Mosaic dynamic_rotate handles 32-bit only, round-5
    r5_dxb_check log), so 'dxf' is the on-chip bf16 roll-input path; this
    pins its semantics in interpret mode where both variants run."""
    from pyqg_generative_tpu.ml.pallas_conv import pack_folded_params_dx
    net_eval, _, folded = net_and_params
    w, b, meta = pack_folded_params_dx(folded, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, NX, NX, 4),
                          jnp.float32)
    out_dx = np.asarray(fused_cnn_forward(x, w, b, meta,
                                          compute_dtype=jnp.bfloat16,
                                          interpret=True, variant="dx"))
    out_dxf = np.asarray(fused_cnn_forward(x, w, b, meta,
                                           compute_dtype=jnp.bfloat16,
                                           interpret=True, variant="dxf"))
    np.testing.assert_array_equal(out_dx, out_dxf)


def test_bitcast_packing_probe_interpret():
    """The packing probe classifies interpret-mode pltpu.bitcast into one of
    the known layouts, and 'dxb' resolves to a packed layout or falls back
    to 'dxf' — never to an illegal configuration."""
    from pyqg_generative_tpu.ml.pallas_conv import (_bitcast_packing,
                                                    _resolve_variant)
    pack = _bitcast_packing(True)
    assert pack in ("adj_low", "adj_high", "other")
    variant, low_first = _resolve_variant("dxb", True)
    if pack == "other":
        assert variant == "dxf"
    else:
        assert variant == "dxb" and low_first == (pack == "adj_low")


def test_bitcast_packing_probe_under_trace():
    """Regression (round 5): _resolve_variant is reached from INSIDE the
    scanned online step (make_online_cnn is called during tracing), so the
    packing probe must produce a concrete answer mid-trace. Without the
    ensure_compile_time_eval guard this raised TracerArrayConversionError
    on the uint32[2,128] probe output (bench_gan_dx{f,b}_bf16 stage
    failures, data_r2/bench_rows.jsonl)."""
    from pyqg_generative_tpu.ml.pallas_conv import (_PACK_CACHE,
                                                    _resolve_variant)
    _PACK_CACHE.clear()
    try:
        resolved = {}

        @jax.jit
        def f(x):
            resolved["v"] = _resolve_variant("dxb", True)  # probe mid-trace
            return x * 2.0

        out = f(jnp.ones(3))
        np.testing.assert_array_equal(np.asarray(out), 2.0)
        variant, low_first = resolved["v"]
        assert variant in ("dxb", "dxf")
        assert isinstance(low_first, bool)
        # and the cached answer matches an eager re-probe
        eager = _resolve_variant("dxb", True)
        assert eager == (variant, low_first)
    finally:
        _PACK_CACHE.clear()


def test_pallas_cache_built_inside_trace_is_reusable(tmp_path):
    """Regression (r5, gz96 online): run_ensemble's sampler refresh calls
    predict_snapshot for the FIRST time inside a lax.cond trace, so the
    lazily-built pallas cache (BN fold + weight packing) used to capture
    tracers and the next segment's trace died with UnexpectedTracerError
    (ml/pallas_conv.py:528 leak through models/*._online_fns). The cache
    must hold concrete weights: build it inside jit, then reuse it both
    eagerly and in a SECOND fresh trace."""
    from pyqg_generative_tpu.models import MeanVarModel, CGANRegression
    from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler

    q = jax.random.normal(jax.random.PRNGKey(1), (2, NX, NX),
                          jnp.float32) * 1e-5
    z = jax.random.normal(jax.random.PRNGKey(2), (NX, NX, 2), jnp.float32)
    scales = dict(x=ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5]),
                  y=ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11]))

    def check(m):
        y_traced = np.asarray(jax.jit(m.predict_snapshot)(q, z))
        # eager reuse of the cache built inside the trace
        y_eager = np.asarray(m.predict_snapshot(q, z))
        # a second, independent trace (run_ensemble_segmented's segment 2)
        y_retrace = np.asarray(jax.jit(m.predict_snapshot)(q, z))
        # eager-vs-jit may differ in the last f32 ulp (fusion order);
        # values are ~1e-17-scale forcings, so pair rtol with a tiny atol
        tol = dict(rtol=1e-4, atol=1e-21)
        np.testing.assert_allclose(y_eager, y_traced, **tol)
        np.testing.assert_allclose(y_retrace, y_traced, **tol)

    gz = MeanVarModel(hidden_channels=(8, 8),
                      folder=str(tmp_path / "gz"), online_backend="pallas")
    x0 = jnp.zeros((1, NX, NX, 2))
    mk = lambda t: {"params": t["params"],
                    "batch_stats": t.get("batch_stats", {})}
    gz.vars_mean = mk(gz.net_mean.init(jax.random.PRNGKey(0), x0,
                                       train=True))
    gz.vars_var = mk(gz.net_var.init(jax.random.PRNGKey(3), x0, train=True))
    gz.x_scale, gz.y_scale = scales["x"], scales["y"]
    check(gz)

    gan = CGANRegression(nx=NX, folder=str(tmp_path / "gan"),
                         hidden_channels=(8, 8), online_backend="pallas")
    vG = gan.G.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, NX, NX, 2 + gan.n_latent)), train=True)
    gan.vars_G = mk(vG)
    gan.x_scale, gan.y_scale = scales["x"], scales["y"]
    check(gan)
