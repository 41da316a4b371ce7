"""Characterize the axon TPU worker crash triggered by the two-CNN GZ
online program at 96^2 (VERDICT round-3 item 4: "mitigated, not
understood").

Round-3 observation: the GZ (MeanVarModel) 10-member online ensemble at
96^2 kills the TPU worker (JaxRuntimeError UNAVAILABLE) on its first
segment at any segmentation, while the same program at 48^2/64^2 runs
clean and the single-CNN GAN program runs clean at 96^2. This script
bisects the failure boundary over

  * backend: xla conv path vs fused pallas kernels (different programs),
  * grid size nx in {64, 80, 96},
  * ensemble width n_ens in {2, 10},
  * steps per (jit'd) segment,
  * with/without in-scan diagnostics accumulation,

running every probe in a SUBPROCESS with a hard timeout so a worker crash
or a wedged pool costs one probe, not the harness. After any failing probe
the harness re-checks backend health and stops early if the pool grant is
gone (continuing would wedge the machine for the rest of the round).

The model weights are freshly initialized — round-3 crashes were a
property of the compiled program, not of trained weights.

Writes data_r2/crash_bisect.json and prints a markdown boundary table.

Run:  python scripts/r4_crash_bisect.py [--quick]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = "/root/repo/data_r2/crash_bisect.json"

_PROBE_CODE = r"""
import sys
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pyqg_generative_tpu.utils.cache import configure_compilation_cache
configure_compilation_cache()

from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
from pyqg_generative_tpu.models.mean_var_model import MeanVarModel
from pyqg_generative_tpu.qg.params import EDDY_PARAMS
from pyqg_generative_tpu.sim import run_ensemble

nx, n_ens, steps, diags, backend = (int(sys.argv[1]), int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4] == "1",
                                    sys.argv[5])

m = MeanVarModel(folder="/nonexistent_model_folder",
                 online_backend=backend)
key = jax.random.PRNGKey(0)
vm = m.net_mean.init(key, jnp.zeros((1, nx, nx, 2)), train=True)
m.vars_mean = {"params": vm["params"],
               "batch_stats": vm.get("batch_stats", {})}
vv = m.net_var.init(key, jnp.zeros((1, nx, nx, 2)), train=True)
m.vars_var = {"params": vv["params"],
              "batch_stats": vv.get("batch_stats", {})}
m.x_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-5, 1e-5])
m.y_scale = ChannelwiseScaler.from_stats([0.0, 0.0], [1e-11, 1e-11])
m.vars_mean = jax.tree_util.tree_map(np.asarray, m.vars_mean)
m.vars_var = jax.tree_util.tree_map(np.asarray, m.vars_var)

p = EDDY_PARAMS.with_nx(nx).replace(
    tmax=steps * EDDY_PARAMS.with_nx(nx).dt, tavestart=0.0,
    precision="single")
ds = run_ensemble(p, {"self": m, "sampling": "constant", "nsteps": 1},
                  n_ens=n_ens, sampling_freq=p.tmax, with_diags=diags)
assert np.isfinite(ds["q"].values).all()
print("PROBE_OK")
"""


def run_probe(nx, n_ens, steps, diags, backend, timeout):
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE, str(nx), str(n_ens),
             str(steps), "1" if diags else "0", backend],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "seconds": round(time.time() - t0, 1)}
    status = "ok" if (r.returncode == 0 and "PROBE_OK" in r.stdout) \
        else "crash"
    rec = {"status": status, "rc": r.returncode,
           "seconds": round(time.time() - t0, 1)}
    if status == "crash":
        tail = (r.stderr or "").strip().splitlines()[-8:]
        rec["stderr_tail"] = tail
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="96^2 probes only (the known-bad cell + the pallas "
                         "escape hatch)")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--max-crashes", type=int, default=2,
                    help="stop escalating after this many crash/timeout "
                         "probes — the round-3 pool wedge followed MANY "
                         "repeated worker crashes; a couple of isolated "
                         "crashes were always survivable")
    args = ap.parse_args()

    from pyqg_generative_tpu.utils.health import backend_alive

    # probe matrix, cheapest->most aggressive so the boundary localizes
    # before anything can wedge the pool
    probes = []
    if not args.quick:
        probes += [
            (64, 10, 1000, True, "xla"),     # known-good control
            (80, 10, 1000, True, "xla"),     # intermediate grid
        ]
    probes += [
        (96, 2, 250, False, "xla"),          # minimal 96^2 program
        (96, 2, 250, True, "xla"),           # + diagnostics
        (96, 10, 250, True, "xla"),          # + full ensemble width
        (96, 10, 1000, True, "xla"),         # + round-3 segment length
        (96, 10, 1000, True, "pallas"),      # the fused-kernel escape hatch
    ]

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    n_bad = sum(1 for v in results.values() if v["status"] != "ok")
    for nx, n_ens, steps, diags, backend in probes:
        key = f"nx{nx}-ens{n_ens}-steps{steps}-" \
              f"{'diag' if diags else 'nodiag'}-{backend}"
        if key in results:
            continue
        if n_bad >= args.max_crashes and backend == "xla":
            print(f"[bisect] {n_bad} crashes recorded — skipping further "
                  f"xla escalation ({key})", flush=True)
            continue
        if not backend_alive(timeout=120):
            print(f"[bisect] backend down before {key} — stopping early "
                  f"(do not wedge the pool)", flush=True)
            break
        print(f"[bisect] {key} ...", flush=True)
        rec = run_probe(nx, n_ens, steps, diags, backend, args.timeout)
        results[key] = rec
        if rec["status"] != "ok":
            n_bad += 1
        print(f"[bisect] {key}: {rec['status']} ({rec['seconds']}s)",
              flush=True)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        if rec["status"] != "ok" and not backend_alive(timeout=120):
            print("[bisect] probe killed the pool grant — stopping",
                  flush=True)
            break

    print("\n| probe | status | seconds |")
    print("|---|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v['status']} | {v['seconds']} |")


if __name__ == "__main__":
    main()
