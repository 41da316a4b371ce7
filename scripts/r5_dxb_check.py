"""On-chip exactness check for the 'dxb' bitcast-roll kernel variant
(round-2 recorded headroom idea, measured round 5): the interpret-mode
test (tests/test_pallas_conv.py::test_fused_kernel_dxb_bitcast_rolls_match_dx)
pins the logical semantics; this pins the Mosaic/TPU lowering — dx and
dxb must produce bit-identical outputs on the real chip.
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
    from pyqg_generative_tpu.ml.pallas_conv import make_online_cnn
    from pyqg_generative_tpu.models import load_model

    folder = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/trained_models/eddy_gan_64"
    model = load_model(folder)
    folded = fold_batchnorm(model.vars_G)
    nx = model.nx if getattr(model, "nx", None) else 64
    x = jax.random.normal(jax.random.PRNGKey(0), (10, nx, nx, 4),
                          jnp.float32)
    outs = {}
    for variant in ("dx", "dxb"):
        apply = make_online_cnn(folded, compute_dtype=jnp.bfloat16,
                                variant=variant)
        outs[variant] = np.asarray(jax.jit(apply)(x))
    if not np.array_equal(outs["dx"], outs["dxb"]):
        diff = np.abs(outs["dx"] - outs["dxb"]).max()
        print(f"DXB MISMATCH on chip: max |dx - dxb| = {diff:.3e}")
        sys.exit(1)
    print(f"dxb on-chip exactness OK: bit-identical to dx on "
          f"(10, {nx}, {nx}, 4) through {folder}")


if __name__ == "__main__":
    main()
