import numpy as np

from pyqg_generative_tpu.utils import xrlite as xr


def test_dataarray_basics(rng):
    d = xr.DataArray(rng.standard_normal((3, 4, 5)), dims=("run", "y", "x"),
                     coords={"run": np.arange(3)})
    assert d.sizes() == {"run": 3, "y": 4, "x": 5}
    m = d.mean(dim=("y", "x"))
    assert m.dims == ("run",)
    np.testing.assert_allclose(m.values, d.values.mean(axis=(1, 2)))
    sub = d.isel(run=slice(0, 2), y=1)
    assert sub.dims == ("run", "x")
    assert sub.shape == (2, 5)
    e = d.expand_dims("time", axis=1)
    assert e.dims == ("run", "time", "y", "x")


def test_arithmetic_broadcasting(rng):
    a = xr.DataArray(rng.standard_normal((2, 4, 4)), dims=("lev", "y", "x"))
    b = a.mean(dim=("y", "x"))
    out = a - b
    assert out.dims == ("lev", "y", "x")
    np.testing.assert_allclose(out.values,
                               a.values - b.values[:, None, None])
    sq = (a ** 2 + 1.0) / 2.0
    np.testing.assert_allclose(sq.values, (a.values ** 2 + 1) / 2)


def test_dataset_npz_roundtrip(tmp_path, rng):
    ds = xr.Dataset(attrs={"pyqg_params": "{'nx': 64}"})
    ds["q"] = xr.DataArray(rng.standard_normal((2, 3, 8, 8)).astype("float32"),
                           dims=("time", "lev", "y", "x"),
                           coords={"time": np.arange(2.0)})
    ds["KEspec"] = xr.DataArray(rng.standard_normal((2, 8, 5)),
                                dims=("lev", "l", "k"))
    path = str(tmp_path / "out.npz")
    ds.to_npz(path)
    back = xr.Dataset.from_npz(path)
    assert back.attrs["pyqg_params"] == ds.attrs["pyqg_params"]
    np.testing.assert_array_equal(back["q"].values, ds["q"].values)
    assert back["q"].dims == ("time", "lev", "y", "x")
    np.testing.assert_array_equal(back["q"].coords["time"], [0.0, 1.0])


def test_concat_time_and_run(rng):
    mk = lambda t: xr.Dataset({"q": xr.DataArray(
        np.full((1, 2, 4, 4), t, dtype=float), dims=("time", "lev", "y", "x"),
        coords={"time": np.array([t])})})
    ds = xr.concat([mk(0.0), mk(1.0), mk(2.0)], "time")
    assert ds["q"].shape == (3, 2, 4, 4)
    np.testing.assert_array_equal(ds["q"].coords["time"], [0, 1, 2])
    runs = xr.concat([ds, ds], "run")
    assert runs["q"].dims == ("run", "time", "lev", "y", "x")
    assert runs["q"].shape == (2, 3, 2, 4, 4)


def test_open_mfdataset(tmp_path, rng):
    for i in range(3):
        ds = xr.Dataset({"q": xr.DataArray(
            np.full((2, 4, 4), float(i)), dims=("lev", "y", "x"))})
        ds.to_npz(str(tmp_path / f"{i}.npz"))
    out = xr.open_mfdataset(str(tmp_path / "*.npz"), "run")
    assert out["q"].shape == (3, 2, 4, 4)
    np.testing.assert_array_equal(out["q"].values[:, 0, 0, 0], [0, 1, 2])


def test_sel_scalar_and_slice():
    import numpy as np
    from pyqg_generative_tpu.utils import xrlite as xr
    t = np.array([0.0, 1.0, 2.0, 3.0])
    da = xr.DataArray(np.arange(8.0).reshape(4, 2), ("time", "lev"),
                      coords={"time": t}, attrs={"units": "s"})
    # exact scalar
    s = da.sel(time=2.0)
    assert s.dims == ("lev",)
    assert np.allclose(s.values, [4.0, 5.0])
    # nearest
    s = da.sel(time=2.2, method="nearest")
    assert np.allclose(s.values, [4.0, 5.0])
    # inclusive label slice
    s = da.sel(time=slice(1.0, 2.5))
    assert s.shape == (2, 2)
    assert np.allclose(s.coords["time"], [1.0, 2.0])
    # attrs survive
    assert s.attrs["units"] == "s"
    # missing exact value raises
    import pytest
    with pytest.raises(KeyError):
        da.sel(time=2.2)


def test_dataset_sel():
    import numpy as np
    from pyqg_generative_tpu.utils import xrlite as xr
    t = np.array([0.0, 10.0, 20.0])
    ds = xr.Dataset({
        "a": xr.DataArray(np.arange(3.0), ("time",), coords={"time": t}),
        "b": xr.DataArray(np.ones(5), ("x",)),
    }, attrs={"cfg": "eddy"})
    out = ds.sel(time=10.0)
    assert out["a"].values == 1.0
    assert out["b"].shape == (5,)   # untouched var passes through
    assert out.attrs["cfg"] == "eddy"


def test_attrs_propagate_through_arithmetic():
    import numpy as np
    from pyqg_generative_tpu.utils import xrlite as xr
    da = xr.DataArray(np.arange(4.0), ("x",), attrs={"units": "m"})
    assert (da * 2).attrs["units"] == "m"
    assert (da + da).attrs["units"] == "m"
    assert da.mean("x").attrs["units"] == "m"
    assert da.isel(x=slice(0, 2)).attrs["units"] == "m"


def test_to_npz_atomic_and_suffix_exact(tmp_path):
    """np.savez appends '.npz' to bare paths, which silently defeated the
    write-tmp-then-os.replace pattern in exp.pipeline (the coarse-target
    cache never materialized and every scorer rebuilt it from the 256^2
    reference). to_npz must normalize the suffix, publish atomically, and
    leave no partial file behind."""
    import os

    import numpy as np
    from pyqg_generative_tpu.utils import xrlite as xr

    ds = xr.Dataset({"a": xr.DataArray(np.arange(4.0), ("x",))})

    bare = str(tmp_path / "cache")          # no .npz suffix
    ds.to_npz(bare)
    assert os.path.exists(bare + ".npz")
    assert not os.path.exists(bare)          # nothing under the bare name
    assert ds.from_npz(bare + ".npz")["a"].values[3] == 3.0

    exact = str(tmp_path / "cache2.npz")
    ds.to_npz(exact)
    assert os.path.exists(exact)
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".part")]
    assert leftovers == []                   # tmp was replaced, not orphaned
