"""Native C++ fastloader: build, correctness vs python fallback."""
import numpy as np
import pytest

from pyqg_generative_tpu.utils.native import (FastLoader, build_native,
                                              write_sample_store)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("store"))
    rng = np.random.default_rng(0)
    n = 103
    arrays = {"q": rng.standard_normal((n, 2, 8, 8)).astype("float32"),
              "S": rng.standard_normal((n, 2, 8, 8)).astype("float32")}
    # tag each sample so identity is recoverable
    arrays["q"][:, 0, 0, 0] = np.arange(n)
    write_sample_store(folder, arrays)
    return folder, arrays


def test_native_builds():
    assert build_native() is not None


def test_native_loader_covers_all_samples(store):
    folder, arrays = store
    fl = FastLoader(folder, batch_size=16)
    assert fl.native, "native library should be active"
    seen = []
    for batch in fl.epoch(seed=1):
        assert batch["q"].shape == (16, 2, 8, 8)
        assert batch["S"].shape == (16, 2, 8, 8)
        seen.extend(batch["q"][:, 0, 0, 0].astype(int).tolist())
    n = arrays["q"].shape[0]
    assert set(seen) == set(range(n))
    fl.close()


def test_native_batches_match_store_content(store):
    folder, arrays = store
    fl = FastLoader(folder, batch_size=8, drop_last=True)
    for batch in fl.epoch(seed=2):
        ids = batch["q"][:, 0, 0, 0].astype(int)
        np.testing.assert_allclose(batch["S"], arrays["S"][ids], rtol=0)
        np.testing.assert_allclose(batch["q"][:, 1:], arrays["q"][ids, 1:],
                                   rtol=0)
    fl.close()


def test_python_fallback_equivalent_semantics(store):
    folder, arrays = store
    fl = FastLoader(folder, batch_size=16, force_python=True)
    assert not fl.native
    seen = []
    for batch in fl.epoch(seed=1):
        assert batch["q"].shape == (16, 2, 8, 8)
        seen.extend(batch["q"][:, 0, 0, 0].astype(int).tolist())
    assert set(seen) == set(range(arrays["q"].shape[0]))


def test_epochs_reshuffle(store):
    folder, _ = store
    fl = FastLoader(folder, batch_size=103, drop_last=True)
    e1 = next(iter(fl.epoch(seed=1)))["q"][:, 0, 0, 0]
    e2 = next(iter(fl.epoch(seed=2)))["q"][:, 0, 0, 0]
    assert not np.array_equal(e1, e2)
    fl.close()
