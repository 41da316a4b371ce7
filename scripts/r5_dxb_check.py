"""On-chip exactness check for the bf16 roll-input kernel variants.

Round-5 finding (first version of this check): Mosaic's dynamic_rotate
lowers 32-bit element types only, so variant 'dx' at bf16 activations
fails TPU compilation outright ("tpu.dynamic_rotate ... vector<...xbf16>").
The legal bf16 paths are 'dxf' (f32 rolls, cast at the matmul input) and
'dxb' (rolls on sublane-pair-packed 32-bit words via pltpu.bitcast, odd
phase built with uint32 half-word shifts). Both compute identical math —
permutations commute with the elementwise cast — so on-chip they must be
BIT-IDENTICAL to each other; this also validates the probed bitcast
packing layout (`_bitcast_packing`), since a wrong half-order would
scramble rows, not round. A loose f32-reference comparison guards against
both being consistently wrong.

The interpret-mode tests (tests/test_pallas_conv.py) pin dx==dxf==dxb
where all three compile; this pins the Mosaic lowering.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyqg_generative_tpu.utils.cache import configure_compilation_cache

configure_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyqg_generative_tpu.ml.nets import fold_batchnorm
    from pyqg_generative_tpu.ml.pallas_conv import (_bitcast_packing,
                                                    make_online_cnn)
    from pyqg_generative_tpu.models import load_model

    folder = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/trained_models/eddy_gan_64"
    model = load_model(folder)
    folded = fold_batchnorm(model.vars_G)
    nx = model.nx if getattr(model, "nx", None) else 64
    x = jax.random.normal(jax.random.PRNGKey(0), (10, nx, nx, 4),
                          jnp.float32)

    pack = _bitcast_packing(False)
    print(f"on-chip pltpu.bitcast packing: {pack}", flush=True)

    outs = {}
    for variant, dt in (("dx", jnp.float32), ("dxf", jnp.bfloat16),
                        ("dxb", jnp.bfloat16)):
        apply = make_online_cnn(folded, compute_dtype=dt, variant=variant)
        outs[variant] = np.asarray(jax.jit(apply)(x))
        print(f"  {variant} ({jnp.dtype(dt).name}) compiled + ran", flush=True)

    if pack == "other":
        print("packing not adjacent-pair: dxb fell back to dxf "
              "(checked below as equality)")
    if not np.array_equal(outs["dxf"], outs["dxb"]):
        diff = np.abs(outs["dxf"] - outs["dxb"]).max()
        print(f"DXB MISMATCH on chip: max |dxf - dxb| = {diff:.3e}")
        sys.exit(1)
    scale = float(np.sqrt(np.mean(outs["dx"] ** 2)))
    rel = float(np.sqrt(np.mean((outs["dxf"] - outs["dx"]) ** 2))) / scale
    print(f"bf16-vs-f32 rel RMS = {rel:.2e} (bf16 rounding scale)")
    if rel > 0.02:
        print("DXF SANITY FAIL: bf16 path too far from the f32 reference")
        sys.exit(1)
    print(f"dxb on-chip exactness OK: bit-identical to dxf on "
          f"(10, {nx}, {nx}, 4) through {folder}; packing={pack}")


if __name__ == "__main__":
    main()
