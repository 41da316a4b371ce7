"""Headline benchmark: online GAN-parameterized ensemble throughput.

Reference anchor (BASELINE.md): the reference stack (pyqg CPU solver + torch
GPU CNN, per-step host round-trips) sustains ~200 steps/s for a single
GAN-parameterized member at 48^2 (431.5 s for 86,400 steps,
Google-Colab/online-simulations.ipynb cell 12). North star: a 10-member
64^2 GAN ensemble fused into one XLA program at >= 10x that per member.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import sys
import time

BASELINE_MEMBER_STEPS_PER_S = 200.0  # GAN online, reference stack
# per-family reference anchors (BASELINE.md: Colab online-simulations
# cells 12-14 — GAN 431.5 s, VAE 425.1 s, GZ 747.5 s for 86,400 steps)
FAMILY_BASELINES = {"gan": 200.0, "vae": 203.0, "gz": 116.0}
PEAK_BF16_FLOPS = 197e12  # TPU v5e: 197 TFLOP/s bf16 per chip


def _conv_flops_per_apply(params, nx: int) -> float:
    """Analytic FLOPs of one forward pass of a same-resolution conv net:
    2 * kh * kw * cin * cout * nx^2 summed over every conv kernel in the
    params pytree (circular padding keeps the spatial size at nx^2 for
    every layer of AndrewCNN / the fused online path). Computed from the
    weights themselves so it is robust to architecture and backend — XLA's
    cost_analysis cannot see inside pallas custom calls."""
    import jax
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        shp = getattr(leaf, "shape", ())
        if len(shp) == 4:  # (kh, kw, cin, cout) flax conv kernel
            kh, kw, cin, cout = shp
            total += 2.0 * kh * kw * cin * cout * nx * nx
        elif len(shp) == 2:  # dense layer
            total += 2.0 * shp[0] * shp[1]
    return total


def _model_flops_per_member_step(model, nx: int) -> tuple[float, str]:
    """FLOPs of the NN work in ONE online member-step (the solver's FFT
    work is excluded — this is a strict lower bound, stated as such)."""
    nets = []
    if getattr(model, "vars_G", None) is not None:  # GAN generator
        nets.append(("G", model.vars_G["params"]))
    if getattr(model, "vars_dec", None) is not None:  # VAE decoder
        nets.append(("decoder", model.vars_dec["params"]))
    if getattr(model, "vars_mean", None) is not None:  # GZ mean net
        nets.append(("mean", model.vars_mean["params"]))
    if getattr(model, "vars_var", None) is not None:  # GZ var net
        nets.append(("var", model.vars_var["params"]))
    total = sum(_conv_flops_per_apply(p, nx) for _, p in nets)
    return total, "+".join(n for n, _ in nets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--members", type=int, default=10)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--snap-every", type=int, default=250)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model-folder",
                    default="/root/repo/trained_models/eddy_gan_64")
    ap.add_argument("--infer-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype of the online pallas kernel "
                         "(activations + matmul inputs; accumulation is "
                         "always f32). float32 is the production default "
                         "— the dtype every quality score in "
                         "docs/VALIDATION.md ran at")
    ap.add_argument("--backend", default="pallas:dx",
                    help="online generator backend: 'pallas:dx' (default — "
                         "the fused roll-input VMEM-resident kernel, 2.0x "
                         "the XLA conv path on v5e), 'pallas:tap', "
                         "'pallas:packed', or 'xla' (the flax/XLA path "
                         "used for quality validation; steps/s is "
                         "dt-independent so the 64^2 dt-table run compares "
                         "directly with the published 48^2/dt=7200 anchor)")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")

    # WEDGE-PROOFING (round-3 postmortem: BENCH_r03.json rc=124): the axon
    # TPU pool can wedge such that backend initialization hangs forever.
    # Probe in a subprocess (health.py imports no jax at module level) and
    # fail fast with a parseable JSON line instead of burning the driver's
    # whole timeout inside jax.devices().
    from pyqg_generative_tpu.utils.health import backend_alive
    platform = "cpu" if args.cpu else None
    # 3 attempts: the axon pool releases a finished client's device grant
    # lazily, so a single 90 s probe right after another process exits can
    # false-negative; a REAL wedge (round-3 postmortem) still fails fast
    # (~5 min total, vs the 25-minute in-process hang this replaces).
    alive = False
    for attempt in range(3):
        if backend_alive(timeout=90.0, platform=platform):
            alive = True
            break
        time.sleep(20.0)
    if not alive:
        # Derive a provisional family from the folder name so error rows in
        # bench_rows.jsonl are not mislabeled as GAN (round-4 advisor): the
        # r4 naming convention encodes the family in the folder name.
        import os as _os
        fname = _os.path.basename(_os.path.normpath(args.model_folder)).lower()
        prov = next((f for f in ("gan", "vae", "gz", "ann", "ols")
                     if f in fname.replace("cgan", "gan")), "unknown")
        print(json.dumps({
            "metric": f"{prov}_online_member_steps_per_s_{args.nx}sq_"
                      f"{args.members}member",
            "value": 0.0,
            "unit": "member-steps/s",
            "vs_baseline": 0.0,
            "error": "backend wedged: jax initialization did not complete "
                     "a 4x4 reduction within 90 s in a fresh subprocess",
        }))
        sys.exit(1)

    import jax
    if args.cpu:
        # must land before any backend initialization; jax.config overrides
        # the sitecustomize JAX_PLATFORMS pin (see utils/health.py)
        jax.config.update("jax_platforms", "cpu")
    from pyqg_generative_tpu.utils.cache import configure_compilation_cache
    configure_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _untrained_gan
    from pyqg_generative_tpu.qg import core
    from pyqg_generative_tpu.qg.params import QGParams
    from pyqg_generative_tpu.sim.simulate import _simulate_program
    from pyqg_generative_tpu.sim.stochastic import init_sampler

    p = QGParams(nx=args.nx, dt=14400.0,
                 tavestart=0.0, precision="single")
    # bench the SAME path used in quality validation: the trained GAN with
    # BN folded into the convs (predict_snapshot online path). Falls back to
    # a freshly initialized generator (identical FLOPs) off-repo.
    import os
    family = "gan"
    if os.path.exists(os.path.join(args.model_folder, "model_args.json")):
        from pyqg_generative_tpu.models import load_model
        model = load_model(args.model_folder)
        model_note = args.model_folder
        family = {"CGANRegression": "gan", "CVAERegression": "vae",
                  "MeanVarModel": "gz"}.get(type(model).__name__,
                                            type(model).__name__.lower())
    else:
        model = _untrained_gan(args.nx)
        model_note = "untrained (same FLOPs)"
    if args.backend.startswith("pallas"):
        model.online_backend = "pallas"
        model.online_variant = (args.backend.split(":", 1) + ["dx"])[1]
        model._infer_dtype = jnp.bfloat16 \
            if args.infer_dtype == "bfloat16" else jnp.float32
        model._pallas_cache = None
        model_note += f" [{args.backend} {args.infer_dtype}]"

    n_snaps = max(1, args.steps // args.snap_every)
    steps_per_snap = args.snap_every
    total_steps = n_snaps * steps_per_snap

    program = jax.jit(jax.vmap(_simulate_program(
        p, model, "AR1", 1, steps_per_snap, n_snaps, True)))

    q0 = jnp.stack([core.default_initial_q(p, rng=np.random.default_rng(j))
                    for j in range(args.members)])
    keys = jax.random.split(jax.random.PRNGKey(0), args.members)

    def run_once():
        snaps, diags = program(q0, keys)
        # force a real device->host synchronization (block_until_ready is
        # not a reliable barrier on every runtime): fetch a scalar that
        # depends on the final snapshots
        return float(jnp.sum(snaps["q"][:, -1]))

    # compile + warmup (excluded from timing)
    run_once()

    t0 = time.perf_counter()
    checksum = run_once()
    dt_wall = time.perf_counter() - t0
    assert np.isfinite(checksum)

    member_steps_per_s = args.members * total_steps / dt_wall
    sim_years_per_day = (member_steps_per_s * p.dt) / (360 * 86400) * 86400

    nn_flops, nn_nets = _model_flops_per_member_step(model, args.nx)
    sustained = nn_flops * member_steps_per_s
    mfu = sustained / PEAK_BF16_FLOPS
    # solver arithmetic per member-step: 12 real 2-D FFTs (fields: 6
    # irfft2, advection: 4 rfft2, forcing: 2 rfft2; qg/core.py) at
    # ~2.5 N^2 log2(N^2) FLOP each, plus O(N^2) elementwise — quantified
    # so "NN-only MFU" is shown to be, in effect, the total-program MFU
    import math
    n2 = args.nx * args.nx
    solver_flops = 12 * 2.5 * n2 * math.log2(n2)

    result = {
        "metric": f"{family}_online_member_steps_per_s_{args.nx}sq_"
                  f"{args.members}member",
        "value": round(member_steps_per_s, 1),
        "unit": "member-steps/s",
        "vs_baseline": round(
            member_steps_per_s /
            FAMILY_BASELINES.get(family, BASELINE_MEMBER_STEPS_PER_S), 2),
    }
    print(json.dumps(result))
    path_note = ("BN-folded float32 online path — the same path scored in "
                 "docs/VALIDATION.md"
                 if args.backend == "xla" else
                 f"fused Pallas kernel ({args.infer_dtype} activations/"
                 "matmuls, f32 accumulation; exactness-tested vs the XLA "
                 "path in tests/test_pallas_conv.py)")
    print(f"# wall {dt_wall:.2f}s for {args.members} members x "
          f"{total_steps} steps at {args.nx}^2 "
          f"(~{sim_years_per_day:,.0f} member-sim-years/day); "
          f"model={model_note}; {path_note}; devices={jax.devices()}",
          file=sys.stderr)
    print(f"# utilization: NN work ({nn_nets}) = "
          f"{nn_flops / 1e9:.2f} GFLOP/member-step -> sustained "
          f"{sustained / 1e12:.1f} TFLOP/s = {100 * mfu:.1f}% MFU of "
          f"{PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s v5e bf16 peak "
          f"(NN-only lower bound; the excluded solver arithmetic is "
          f"~{solver_flops / 1e6:.1f} MFLOP/member-step = "
          f"{100 * solver_flops / max(nn_flops, 1.0):.2f}% of the NN work, "
          f"so this is the total-program MFU to ~3 significant figures)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
