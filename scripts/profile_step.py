import sys, os; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from pyqg_generative_tpu.utils.cache import configure_compilation_cache
configure_compilation_cache()
from pyqg_generative_tpu.qg import core
from pyqg_generative_tpu.qg.params import QGParams
from pyqg_generative_tpu.sim.simulate import make_online_step
from pyqg_generative_tpu.sim.stochastic import init_sampler
import __graft_entry__ as ge

def bench(fn, args, n=3, steps=1000):
    # fn scans `steps` steps
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps

NX, NE, STEPS = 64, 10, 1000

def make(model, dtype):
    p = QGParams(nx=NX, dt=14400.0, precision="single")
    step = make_online_step(p, model, sampling="AR1", nsteps=1, with_diags=False)
    def many(state, sstate):
        def body(c, _):
            s, ss, _ = step((c[0], c[1], None))
            return (s, ss), None
        (state, sstate), _ = jax.lax.scan(body, (state, sstate), None, length=STEPS)
        return state, sstate
    fnv = jax.jit(jax.vmap(many))
    q0 = jnp.stack([core.default_initial_q(p, rng=np.random.default_rng(j)) for j in range(NE)])
    states = jax.vmap(lambda q: core.init_state(q, p))(q0)
    if model is None:
        def many2(state):
            def body(c, _):
                s, _, _ = step((c, None, None))
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=STEPS)
            return state
        fn = jax.jit(jax.vmap(many2))
        return fn, (states,)
    sstates = jax.vmap(lambda k: init_sampler(k, model, p.ny_, p.nx, p.dtype_real))(jax.random.split(jax.random.PRNGKey(0), NE))
    return fnv, (states, sstates)

# solver only
fn, args = make(None, None)
t = bench(fn, args)
print(f"solver-only: {t*1e6:.1f} us/step ({NE/t:.0f} member-steps/s)")

for dt_name in ["float32", "bfloat16"]:
    m = ge._untrained_gan(NX)
    m._infer_dtype = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    m.G_online = type(m.G_online)(n_out=2, div=False, hidden_channels=m.hidden_channels, batch_norm=False, dtype=m._infer_dtype)
    fn, args = make(m, None)
    t = bench(fn, args)
    print(f"GAN {dt_name}: {t*1e6:.1f} us/step ({NE/t:.0f} member-steps/s)")
