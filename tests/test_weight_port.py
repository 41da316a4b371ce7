"""Published-checkpoint port verification (scripts/port_reference_weights.py).

The JAMES-2023 pretrained torch checkpoints under
/root/reference/Google-Colab/ must map tensor-by-tensor onto the flax
AndrewCNN tree with eval-mode forward agreement, and the ported model
folders must load through the framework's registry and predict.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/Google-Colab"
pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/GAN/G.pt"), reason="reference not available")


def test_gan_generator_port_forward_match():
    import jax.numpy as jnp

    from pyqg_generative_tpu.ml.nets import AndrewCNN
    from scripts.port_reference_weights import (
        layers_to_flax_vars, load_state_dict, numpy_reference_forward,
        torch_layers)
    layers = torch_layers(load_state_dict(f"{REF}/GAN/G.pt"))
    assert len(layers) == 8
    v = layers_to_flax_vars(layers)
    G = AndrewCNN(n_out=2)
    x = np.random.default_rng(7).standard_normal((2, 4, 48, 48))
    ref = numpy_reference_forward(layers, x)
    got = np.transpose(np.asarray(G.apply(
        v, jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float32),
        train=False)), (0, 3, 1, 2))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_reference_scale_parsing():
    from scripts.port_reference_weights import parse_reference_scale
    mean, std = parse_reference_scale(f"{REF}/GAN/x_scale.json")
    assert mean.shape == (2,) and std.shape == (2,)
    # published x std is the PV amplitude per layer (BASELINE.md checksums)
    assert 5e-6 < std[0] < 1e-5 and 5e-7 < std[1] < 2e-6


def test_ported_folder_loads_and_predicts(tmp_path):
    """The written folder must satisfy the framework's reload contract and
    produce forcing of physical amplitude on a PV-scale input."""
    import jax

    from scripts.port_reference_weights import port_gan
    folder = port_gan(verify=False)
    from pyqg_generative_tpu.models import load_model
    model = load_model(folder)
    q = 5e-6 * np.random.default_rng(3).standard_normal((2, 48, 48))
    noise = model.generate_latent_noise(jax.random.PRNGKey(0), 48, 48)
    S = np.asarray(model.predict_snapshot(q, noise))
    assert S.shape == (2, 48, 48)
    # forcing std should be within an order of magnitude of the published
    # y scale (7.6e-12 upper layer)
    assert 1e-13 < S[0].std() < 1e-10
