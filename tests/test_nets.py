import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqg_generative_tpu.ml import nets


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def roll_equivariance_error(apply_fn, x, shift=16):
    """Circular translation equivariance check, as the reference builds into
    its U-Net (tools/deep_inversion.py:96-101)."""
    y = apply_fn(x)
    y_roll = apply_fn(jnp.roll(x, shift, axis=-2))
    err = jnp.roll(y, -shift, axis=-2) - y_roll  # roll output back
    # note: apply to rolled input, compare to rolled output
    y2 = apply_fn(jnp.roll(x, shift, axis=-3))
    err2 = jnp.roll(y, shift, axis=-3) - y2
    return float((err ** 2).mean() + 0 * (err2 ** 2).mean())


def test_andrew_cnn_shapes_and_params(key):
    net = nets.AndrewCNN(n_out=2)
    x = jnp.zeros((3, 64, 64, 4))
    variables = net.init(key, x, train=True)
    y = net.apply(variables, x, train=False)
    assert y.shape == (3, 64, 64, 2)
    # parameter count matches the reference architecture:
    # convs: 4*128*25, 128*64*25, 64*32*9, 5 x 32*32*9, 32*2*9 + biases
    # + batchnorm (scale+bias) per hidden layer
    n_conv_w = 4 * 128 * 25 + 128 * 64 * 25 + 64 * 32 * 9 + 4 * 32 * 32 * 9 \
        + 32 * 2 * 9
    n_bias = 128 + 64 + 32 * 5 + 2
    n_bn = 2 * (128 + 64 + 32 * 5)
    assert nets.count_params(variables["params"]) == n_conv_w + n_bias + n_bn


def test_andrew_cnn_equivariance(key):
    net = nets.AndrewCNN(n_out=2, batch_norm=False)
    x = jax.random.normal(key, (2, 48, 48, 2))
    variables = net.init(key, x, train=True)

    def f(z):
        return net.apply(variables, z, train=False)

    y = f(x)
    for axis in (-2, -3):
        y_shift = f(jnp.roll(x, 7, axis=axis))
        np.testing.assert_allclose(np.asarray(jnp.roll(y, 7, axis=axis)),
                                   np.asarray(y_shift), atol=1e-5)


def test_var_cnn_nonnegative(key):
    net = nets.VarCNN(2)
    x = jax.random.normal(key, (2, 32, 32, 2))
    variables = net.init(key, x, train=True)
    y = net.apply(variables, x, train=False)
    assert float(y.min()) >= 0.0


def test_divergence_head(key):
    net = nets.AndrewCNN(n_out=2, div=True, batch_norm=False)
    x = jax.random.normal(key, (2, 32, 32, 4))
    variables = net.init(key, x, train=True)
    y = net.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 2)
    # a divergence field has zero spatial mean
    np.testing.assert_allclose(np.asarray(y.mean(axis=(1, 2))), 0.0, atol=1e-4)


@pytest.mark.parametrize("nx", [48, 64, 96])
def test_discriminator_output_scalar(key, nx):
    d = nets.DCGANDiscriminator(nx=nx)
    x = jax.random.normal(key, (5, nx, nx, 6))
    variables = d.init(key, x, train=True)
    y = d.apply(variables, x, train=False)
    assert y.shape == (5, 1)


def test_unet_shapes_and_equivariance(key):
    g = nets.DeepInversionGenerator(n_out=2)
    x = jax.random.normal(key, (2, 64, 64, 4))
    variables = g.init(key, x, train=True)

    def f(z):
        return g.apply(variables, z, train=False,
                       mutable=False)

    y = f(x)
    assert y.shape == (2, 64, 64, 2)
    # equivariant under shifts that are multiples of the total pooling (16)
    y_shift = f(jnp.roll(x, 16, axis=-3))
    np.testing.assert_allclose(np.asarray(jnp.roll(y, 16, axis=-3)),
                               np.asarray(y_shift), atol=1e-4)


def test_ann_scale_invariance(key):
    net = nets.ANN(n_out=1, degree=2)
    x = jax.random.normal(key, (10, 9))
    variables = net.init(key, x)
    y1 = net.apply(variables, x)
    y2 = net.apply(variables, 3.0 * x)
    np.testing.assert_allclose(np.asarray(9.0 * y1), np.asarray(y2),
                               rtol=1e-4)


def test_fold_batchnorm_exact(key):
    """BN-folded conv stack reproduces the eval-mode BN network exactly."""
    net = nets.AndrewCNN(n_out=2, hidden_channels=(8, 8))
    x = jax.random.normal(key, (3, 16, 16, 4))
    variables = net.init(key, x, train=True)
    # make running stats non-trivial
    _, upd = net.apply(variables, x * 2.0 + 1.0, train=True,
                       mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    y_bn = net.apply(variables, x, train=False)

    folded = nets.fold_batchnorm(variables)
    net_nobn = nets.AndrewCNN(n_out=2, hidden_channels=(8, 8),
                              batch_norm=False)
    y_folded = net_nobn.apply({"params": folded["params"]}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_bn),
                               rtol=2e-4, atol=1e-6)


def test_rollmm_conv_matches_xla(key):
    """Roll-matmul circular conv equals the flax CIRCULAR conv exactly."""
    from pyqg_generative_tpu.ml.nets import (apply_folded_cnn_rollmm,
                                             circular_conv_rollmm,
                                             fold_batchnorm)
    import flax.linen as nn_
    x = jax.random.normal(key, (2, 16, 16, 4))
    conv = nn_.Conv(8, (5, 5), padding="CIRCULAR")
    v = conv.init(key, x)
    y_ref = conv.apply(v, x)
    y = circular_conv_rollmm(x, v["params"]["kernel"], v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    # full folded AndrewCNN equivalence
    net = nets.AndrewCNN(n_out=2, hidden_channels=(8, 8))
    variables = net.init(key, x, train=True)
    _, upd = net.apply(variables, x * 1.5, train=True,
                       mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    folded = fold_batchnorm(variables)
    y_bn = net.apply(variables, x, train=False)
    y_mm = apply_folded_cnn_rollmm(folded["params"], x)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_bn),
                               rtol=2e-4, atol=1e-6)


def test_training_reduces_mse(key):
    """The generic trainer fits a trivial linear map with the AndrewCNN."""
    import optax
    from pyqg_generative_tpu.ml import train as T

    net = nets.AndrewCNN(n_out=2, hidden_channels=(8, 8),
                         kernels=(3, 3, 3), batch_norm=False)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((64, 16, 16, 2)), jnp.float32)
    Y = 0.5 * X
    tx = T.multistep_adam(1e-2, 20, 2)
    state = T.init_training_state(net, tx, key, X[:1])

    def loss_fn(params, batch_stats, k, batch, train):
        x, y = batch
        pred = net.apply({"params": params}, x, train=False)
        loss = jnp.mean((pred - y) ** 2)
        return loss, ({"loss": loss}, batch_stats)

    state, log = T.fit(loss_fn, state, tx, (X, Y), (X, Y),
                       num_epochs=20, batch_size=32, rng=rng,
                       verbose=False)
    assert log["loss"][-1] < 0.25 * log["loss"][0]
    assert "loss_test" in log
