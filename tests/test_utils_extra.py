"""Profiling and plotting utilities."""
import os

import numpy as np

from pyqg_generative_tpu.utils.plot import (create_animation, default_rcParams,
                                            imshow, latex_float, set_letters)
from pyqg_generative_tpu.utils.profiling import measure_throughput, timer


def test_timer_decorator(capsys):
    @timer
    def f(x):
        return x + 1

    assert f(1) == 2
    assert "executed in" in capsys.readouterr().out


def test_measure_throughput():
    import jax.numpy as jnp

    def step(x):
        return x * 1.0001 + jnp.sin(x) * 0.0

    out = measure_throughput(step, jnp.ones((8, 8)), n_steps=20, warmup=1)
    assert out["steps_per_s"] > 0
    assert out["ms_per_step"] > 0


def test_latex_float():
    assert latex_float(1.5e-7) == r"$1.5 \times 10^{-7}$"


def test_imshow_and_letters(tmp_path, rng):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    default_rcParams()
    fig, axes = plt.subplots(1, 2)
    imshow(rng.standard_normal((16, 16)), ax=axes[0])
    imshow(rng.standard_normal((16, 16)), ax=axes[1], percentile=95)
    set_letters(axes)
    fig.savefig(str(tmp_path / "fig.png"))
    plt.close(fig)
    assert os.path.exists(str(tmp_path / "fig.png"))


def test_create_animation(tmp_path, rng):
    import matplotlib
    matplotlib.use("Agg")
    frames = rng.standard_normal((3, 8, 8))
    path = create_animation(frames, str(tmp_path / "a.gif"), fps=2)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0
