"""Standalone benchmark: fused Pallas online CNN vs the XLA conv path,
full AndrewCNN (128,64,32x5; kernels 5,5,3x6), 10 members at 64^2."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, jax.numpy as jnp, numpy as np
from pyqg_generative_tpu.utils.cache import configure_compilation_cache
configure_compilation_cache()
from pyqg_generative_tpu.ml.nets import AndrewCNN, fold_batchnorm
from pyqg_generative_tpu.ml.pallas_conv import (fused_cnn_forward,
                                                pack_folded_params)

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 10

net = AndrewCNN(n_out=2)
v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, NX, NX, 4)), train=True)
folded = fold_batchnorm({"params": v["params"],
                         "batch_stats": v.get("batch_stats", {})})
net_eval = AndrewCNN(n_out=2, batch_norm=False)

x = jax.random.normal(jax.random.PRNGKey(1), (B, NX, NX, 4), jnp.float32)


REPS = 200

def scanned(apply):
    """Amortize the per-dispatch axon overhead: REPS chained applications
    inside one jitted scan (matches the real in-step usage)."""
    @jax.jit
    def f(xx):
        def body(c, _):
            y = apply(c)
            # feed a function of the output back so the loop can't collapse
            c2 = c.at[..., :2].add(y * 1e-6)
            return c2, None
        c, _ = jax.lax.scan(body, xx, None, length=REPS)
        return c
    return f


def timeit(f, arg, n=5):
    y = f(arg); jax.block_until_ready(y)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); y = f(arg); jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS, y


xla_apply = lambda xx: net_eval.apply(
    {"params": folded["params"], "batch_stats": {}}, xx, train=False)
t_xla, _ = timeit(scanned(xla_apply), x)
y_ref = jax.jit(xla_apply)(x)
print(f"XLA f32 conv: {t_xla*1e6:.0f} us / {B}x{NX}^2 batch")

from pyqg_generative_tpu.ml.pallas_conv import make_online_cnn
variants = sys.argv[3].split(",") if len(sys.argv) > 3 else \
    ("packed", "tap", "dx")
for variant in variants:
    for dt in (jnp.float32, jnp.bfloat16):
        try:
            apply = make_online_cnn(folded, compute_dtype=dt,
                                    variant=variant)
            t, _ = timeit(scanned(apply), x)
            y = jax.jit(apply)(x)
        except Exception as e:
            print(f"pallas[{variant}] {jnp.dtype(dt).name}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})")
            continue
        rel = np.sqrt(np.mean((np.asarray(y) - np.asarray(y_ref))**2)) / \
            np.sqrt(np.mean(np.asarray(y_ref)**2))
        print(f"pallas[{variant}](+xla L1) {jnp.dtype(dt).name}: "
              f"{t*1e6:.0f} us (x{t_xla/t:.2f} vs XLA), "
              f"rel RMS err {rel:.2e}")
