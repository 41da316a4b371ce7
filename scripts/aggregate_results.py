"""Aggregate round-2 campaign outputs into the docs/VALIDATION.md tables.

Reads quality_*.json files, offline_test/offline_transfer npz files, and
forecast skill tables under data_r2/, and prints markdown tables ready to
paste into docs/VALIDATION.md.

Run:  python scripts/aggregate_results.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BASE = "/root/repo/data_r2"

PUBLISHED_48 = {  # reference Google-Colab/online-simulations.ipynb cells 30-33
    "GAN": (0.0348, 0.2213),
    "VAE": (0.0414, 0.2144),
    "GZ": (0.2089, 0.4819),
    "lores": (0.1888, 0.5054),
}


def family(key):
    k = key.lower()
    if "lores" in k:
        return "lores"
    if "cgan" in k or "gan" in k:
        return "GAN"
    if "cvae" in k or "vae" in k:
        return "VAE"
    if "meanvar" in k or "_gz_" in k or k.startswith("gz"):
        return "GZ"
    if "ols" in k:
        return "OLS"
    if "ann" in k:
        return "ANN"
    return key


# Cell provenance for the committed trained_models/ folders (operator, nx)
# — data_r2 model folders carry the cell in their path; these don't.
TRAINED_CELLS = {
    "eddy_gan_48_op1": ("Operator1", 48),
    "eddy_gan_48_op1_stable": ("Operator1", 48),
    "eddy_vae_48_op1": ("Operator1", 48),
    "eddy_gan_48": ("Operator2", 48),
    "eddy_gan_48_stable": ("Operator2", 48),
    "eddy_gan_48_r3": ("Operator2", 48),
    "eddy_vae_48": ("Operator2", 48),
    "eddy_vae_48_r2": ("Operator2", 48),
    "eddy_gz_48": ("Operator2", 48),
    "colab_gan_48": ("Operator1", 48),
    "colab_vae_48": ("Operator1", 48),
    "colab_gz_48": ("Operator1", 48),
    "eddy_gan_64": ("Operator2", 64),
    "eddy_gan_64_r3": ("Operator2", 64),
    "jet_gan_48": ("Operator2", 48),
    "jet_gan_48_r1": ("Operator2", 48),
}


def trained_cell(folder):
    """(operator, nx) provenance of a trained_models/ folder name. Promoted
    round-4 folders carry it in the name: r4_{cfg}_{fam}_{nx}_op{N}_s{seed}."""
    if folder in TRAINED_CELLS:
        return TRAINED_CELLS[folder]
    if folder.startswith("r4_"):
        parts = folder.split("_")
        try:
            return (f"Operator{parts[4][2:]}", int(parts[3]))
        except (IndexError, ValueError):
            return None
    return None


def collect_metrics(cfg, op="Operator2", nx=48):
    """Merge every metrics_*.json under the config's model/lores folders."""
    results = {}
    pats = [os.path.join(BASE, cfg, f"models_{op}_{nx}", "*",
                         "metrics_*.json"),
            os.path.join(BASE, cfg, f"lores_{nx}", "metrics_*.json"),
            os.path.join("/root/repo/trained_models", "*",
                         "metrics_*.json")]
    for pat in pats:
        for f in glob.glob(pat):
            model = os.path.basename(os.path.dirname(f))
            sub = os.path.basename(f)[len("metrics_"):-len(".json")]
            if cfg == "eddy" and sub.startswith("jet"):
                continue
            if cfg == "jet" and not sub.startswith("jet"):
                continue
            try:
                results[f"{model}/{sub}"] = json.load(open(f))
            except Exception:
                pass
    return results


def online_tables():
    for cfg in ("eddy", "jet"):
        name = ("all collected runs, each scored vs its own cell's "
                "coarse-grained reference target")
        results = collect_metrics(cfg)
        if not results:
            continue
        print(f"\n### Online scores — {cfg} / {name}\n")
        print("| run | distrib | spectral |")
        print("|---|---|---|")
        for k, v in sorted(results.items(),
                           key=lambda kv: kv[1]["distrib_score"]):
            print(f"| {k} | {v['distrib_score']:.3f} | "
                  f"{v['spectral_score']:.3f} |")
        if cfg != "eddy":
            continue  # published anchors exist for the eddy config only
        best = {}
        for k, v in results.items():
            folder = k.split("/")[0]
            cell = trained_cell(folder)
            if cell is not None and cell[1] != 48:
                continue  # published anchors are 48^2
            f = family(k)
            if f not in best or v["distrib_score"] < best[f][1]:
                best[f] = (k, v["distrib_score"], v["spectral_score"])
        print("\nBest per family vs published (48^2 eddy, "
              "any operator pairing):\n")
        print("| family | this framework | published |")
        print("|---|---|---|")
        for f, (k, d, s) in sorted(best.items()):
            pub = PUBLISHED_48.get(f)
            pubs = f"{pub[0]:.3f} / {pub[1]:.3f}" if pub else "--"
            print(f"| {f} | {d:.3f} / {s:.3f} ({k}) | {pubs} |")


def matrix_status_table():
    """The reference's 18-cell online matrix ({GZ,GAN,VAE} x {Op1,Op2} x
    {48,64,96}, scripts/run_parameterized.py:38-44): best closure row per
    cell, with the per-resolution lores baseline for context."""
    print("\n### Matrix status — eddy, best row per "
          "(model x operator x resolution) cell\n")
    print("| operator | nx | GZ | GAN | VAE | lores |")
    print("|---|---|---|---|---|---|")
    for op in ("Operator1", "Operator2"):
        for nx in (48, 64, 96):
            cell = {}

            def add(key, v):
                f = family(key)
                if f not in ("GZ", "GAN", "VAE", "lores"):
                    return
                if f not in cell or v["distrib_score"] < \
                        cell[f][1]["distrib_score"]:
                    cell[f] = (key, v)

            for f in glob.glob(os.path.join(
                    BASE, "eddy", f"models_{op}_{nx}", "*",
                    "metrics_*.json")):
                model = os.path.basename(os.path.dirname(f))
                try:
                    add(model, json.load(open(f)))
                except Exception:
                    pass
            for folder, (fop, fnx) in TRAINED_CELLS.items():
                if folder.startswith("colab") or \
                        folder.startswith("jet") or \
                        (fop, fnx) != (op, nx):
                    continue
                for f in glob.glob(os.path.join(
                        "/root/repo/trained_models", folder,
                        "metrics_*.json")):
                    try:
                        add(folder, json.load(open(f)))
                    except Exception:
                        pass
            suffix = "-op1" if op == "Operator1" else ""
            lf = os.path.join(BASE, "eddy", f"lores_{nx}",
                              f"metrics_eddy-none-0{suffix}.json")
            if os.path.exists(lf):
                try:
                    add("lores", json.load(open(lf)))
                except Exception:
                    pass
            cells = []
            for fam in ("GZ", "GAN", "VAE", "lores"):
                if fam in cell:
                    k, v = cell[fam]
                    cells.append(f"{v['distrib_score']:.3f}/"
                                 f"{v['spectral_score']:.3f} ({k})")
                else:
                    cells.append("—")
            print(f"| {op} | {nx} | " + " | ".join(cells) + " |")


def breadth_table():
    """One row per (operator, resolution, model, subfolder) across the whole
    reference online matrix ({48,64,96} x {Operator1,Operator2} — reference
    scripts/run_parameterized.py:38-44)."""
    print("\n### Breadth matrix — eddy online scores by operator x "
          "resolution\n")
    print("| operator | nx | run | distrib | spectral |")
    print("|---|---|---|---|---|")
    for op in ("Operator1", "Operator2"):
        for nx in (48, 64, 96):
            rows = {}
            for f in glob.glob(os.path.join(
                    BASE, "eddy", f"models_{op}_{nx}", "*",
                    "metrics_*.json")):
                model = os.path.basename(os.path.dirname(f))
                sub = os.path.basename(f)[len("metrics_"):-len(".json")]
                try:
                    rows[f"{model}/{sub}"] = json.load(open(f))
                except Exception:
                    pass
            for f in glob.glob(os.path.join(BASE, "eddy", f"lores_{nx}",
                                            f"metrics_*{op}*.json")) + \
                    glob.glob(os.path.join(
                        BASE, "eddy", f"lores_{nx}",
                        f"metrics_*-op{op[-1]}.json")) + \
                    (glob.glob(os.path.join(BASE, "eddy", f"lores_{nx}",
                                            "metrics_eddy-none-0.json"))
                     if op == "Operator2" else []):
                sub = os.path.basename(f)[len("metrics_"):-len(".json")]
                try:
                    rows[f"lores/{sub}"] = json.load(open(f))
                except Exception:
                    pass
            for k, v in sorted(rows.items(),
                               key=lambda kv: kv[1]["distrib_score"]):
                print(f"| {op} | {nx} | {k} | {v['distrib_score']:.3f} | "
                      f"{v['spectral_score']:.3f} |")


def offline_tables():
    from pyqg_generative_tpu.utils import xrlite as xr
    rows = []
    for f in sorted(glob.glob(os.path.join(
            BASE, "*", "models_*", "*", "offline_test.npz"))):
        parts = f.split(os.sep)
        cfg, mgrid, model = parts[-4], parts[-3], parts[-2]
        ds = xr.Dataset.from_npz(f)
        row = dict(cfg=cfg, grid=mgrid, model=model,
                   L2_mean=float(ds["L2_mean"].values),
                   L2_total=float(ds["L2_total"].values),
                   L2_res=float(ds["L2_residual"].values),
                   var_ratio=float(np.mean(ds["var_ratio"].values)))
        tf = f.replace("offline_test.npz", "offline_transfer.npz")
        if os.path.exists(tf):
            dt_ = xr.Dataset.from_npz(tf)
            row["L2_total_transfer"] = float(dt_["L2_total"].values)
        rows.append(row)
    if rows:
        print("\n### Offline skill (held-out runs; transfer = other config)\n")
        print("| cfg | grid | model | L2_mean | L2_total | L2_res | "
              "var_ratio | L2_total transfer |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            tr = r.get("L2_total_transfer")
            trs = f"{tr:.3f}" if tr is not None else "--"
            print(f"| {r['cfg']} | {r['grid']} | {r['model']} | "
                  f"{r['L2_mean']:.3f} | {r['L2_total']:.3f} | "
                  f"{r['L2_res']:.3f} | {r['var_ratio']:.3f} | {trs} |")


def forecast_tables():
    for f in sorted(glob.glob(os.path.join(
            BASE, "*", "forecast_*", "skill_table.json"))):
        table = json.load(open(f))
        name = os.path.basename(os.path.dirname(f))
        print(f"\n### Forecast skill — {name} "
              "(normalized ens-mean RMSE / spread / reliability ratio)\n")
        days = sorted({int(d) for row in table.values()
                       for d in row.get("rmse", {})})
        print("| decorrelation | " +
              " | ".join(f"day {d}" for d in days) + " |")
        print("|---|" + "---|" * len(days))
        for dec, row in sorted(table.items(), key=lambda kv: int(kv[0])):
            cells = []
            for d in days:
                r = row.get("rmse", {}).get(str(d)) or \
                    row.get("rmse", {}).get(d)
                s = row.get("spread", {}).get(str(d)) or \
                    row.get("spread", {}).get(d)
                rat = row.get("ratio", {}).get(str(d)) or \
                    row.get("ratio", {}).get(d)
                cells.append(f"{r:.3f}/{s:.3f}/{rat:.2f}"
                             if r is not None else "--")
            print(f"| {dec} h | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    online_tables()
    matrix_status_table()
    breadth_table()
    offline_tables()
    forecast_tables()
