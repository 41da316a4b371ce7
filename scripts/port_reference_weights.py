"""Port the published Google-Colab checkpoints (torch) into this framework.

The reference ships the paper's pretrained models under
/root/reference/Google-Colab/{GAN,VAE,GZ}/ as torch state dicts
(G.pt, encoder/decoder.pt, net_mean/net_var.pt) plus x_scale.json /
y_scale.json (reference tools/cnn_tools.py:543-553 JSON format: str() of a
nested NCHW (1,C,1,1) list) and model_args.json. All nets are AndrewCNN
stacks (reference tools/cnn_tools.py:125-182): torch Sequential indices
conv.{3i} = Conv2d (circular padding), conv.{3i+1} = ReLU,
conv.{3i+2} = BatchNorm2d, final conv.21 = output Conv2d; net_var adds a
softplus head (reference models/mean_var_model.py:14-17).

This script maps each state dict tensor-by-tensor onto the flax AndrewCNN
param tree (OIHW -> HWIO), verifies the port with a forward diff against an
eval-mode torch functional re-implementation built here (max rel err must be
< 1e-5 on random inputs), and writes framework-native model folders under
trained_models/colab_{gan,vae,gz}_48/ that exp-pipeline tooling can load.

Purpose (VERDICT round-2, next-round #1): running the *published weights*
online in this framework at the published configuration (48^2, dt=7200,
20 yr, white AR1 noise, 10 members) cleanly splits solver/coupling
discrepancies from training-dynamics discrepancies in the eddy-GAN
online-stability investigation.

Usage: python scripts/port_reference_weights.py [--no-verify]
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/Google-Colab"
OUT = os.path.join(os.path.dirname(__file__), "..", "trained_models")


# ---------------------------------------------------------------- torch side
def load_state_dict(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    return {k: np.asarray(v.detach().numpy(), dtype=np.float64)
            for k, v in sd.items() if k.endswith(
                ("weight", "bias", "running_mean", "running_var"))}


def torch_layers(sd: dict):
    """Group a reference AndrewCNN state dict into per-layer records:
    [{'W': OIHW, 'b': O, 'bn': (gamma, beta, mean, var) | None}, ...]."""
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.endswith(".weight") and sd[k].ndim == 4})
    layers = []
    for j, ci in enumerate(conv_idx):
        rec = {"W": sd[f"conv.{ci}.weight"], "b": sd[f"conv.{ci}.bias"],
               "bn": None}
        bi = ci + 2
        if f"conv.{bi}.running_mean" in sd:
            rec["bn"] = (sd[f"conv.{bi}.weight"], sd[f"conv.{bi}.bias"],
                         sd[f"conv.{bi}.running_mean"],
                         sd[f"conv.{bi}.running_var"])
        layers.append(rec)
    return layers


def numpy_reference_forward(layers, x_nchw: np.ndarray,
                            final_activation: str = "None",
                            eps: float = 1e-5) -> np.ndarray:
    """Eval-mode forward of the reference AndrewCNN, implemented here from
    scratch in numpy (circular pad + correlate): conv -> ReLU -> BN(eval) for
    hidden layers, plain conv for the head. Ground truth for the port."""
    x = np.asarray(x_nchw, np.float64)
    n = len(layers)
    for i, rec in enumerate(layers):
        W, b = rec["W"], rec["b"]
        kh, kw = W.shape[2], W.shape[3]
        ph, pw = kh // 2, kw // 2
        xp = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="wrap")
        B, C, H, Wd = x.shape
        O = W.shape[0]
        out = np.zeros((B, O, H, Wd))
        # im2col-free direct correlation (tiny sizes; clarity over speed)
        for dy in range(kh):
            for dx in range(kw):
                patch = xp[:, :, dy:dy + H, dx:dx + Wd]
                out += np.einsum("bchw,oc->bohw", patch, W[:, :, dy, dx])
        out += b[None, :, None, None]
        if i < n - 1:
            out = np.maximum(out, 0.0)
            g, be, mu, var = rec["bn"]
            out = (out - mu[None, :, None, None]) / \
                np.sqrt(var[None, :, None, None] + eps) * \
                g[None, :, None, None] + be[None, :, None, None]
        x = out
    if final_activation == "softplus":
        x = np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)
    return x


# ----------------------------------------------------------------- flax side
def layers_to_flax_vars(layers) -> dict:
    """Map per-layer torch records to the flax AndrewCNN variable tree
    (params: Conv_i kernel HWIO + bias, BatchNorm_i scale/bias;
    batch_stats: BatchNorm_i mean/var)."""
    params, stats = {}, {}
    for i, rec in enumerate(layers):
        params[f"Conv_{i}"] = {
            "kernel": np.transpose(rec["W"], (2, 3, 1, 0)).astype(np.float32),
            "bias": rec["b"].astype(np.float32)}
        if rec["bn"] is not None:
            g, be, mu, var = rec["bn"]
            params[f"BatchNorm_{i}"] = {"scale": g.astype(np.float32),
                                        "bias": be.astype(np.float32)}
            stats[f"BatchNorm_{i}"] = {"mean": mu.astype(np.float32),
                                       "var": var.astype(np.float32)}
    return {"params": params, "batch_stats": stats}


def parse_reference_scale(path: str):
    """The reference writes {'mean': str(list(NCHW (1,C,1,1))), 'std': ...}
    (tools/cnn_tools.py:543-553). Return flat per-channel (mean, std)."""
    with open(path) as f:
        d = json.load(f)
    mean = np.asarray(ast.literal_eval(d["mean"]), np.float64).ravel()
    std = np.asarray(ast.literal_eval(d["std"]), np.float64).ravel()
    return mean, std


def verify_port(name: str, layers, flax_module, flax_vars, n_in: int,
                nx: int = 48, seed: int = 0, tol: float = 1e-5) -> float:
    """Forward-diff the flax port against the numpy reference forward."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, n_in, nx, nx))
    ref = numpy_reference_forward(
        layers, x, final_activation=flax_module.final_activation)
    got = np.asarray(flax_module.apply(
        flax_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float32),
        train=False))
    got = np.transpose(got, (0, 3, 1, 2))
    scale = np.abs(ref).max() + 1e-30
    err = np.abs(got - ref).max() / scale
    status = "OK" if err < tol else "FAIL"
    print(f"  {name}: max rel fwd diff = {err:.3e} [{status}]")
    if err >= tol:
        raise SystemExit(f"port verification failed for {name}")
    return float(err)


def write_scalers(src_dir: str, dst_dir: str):
    from pyqg_generative_tpu.ml.scalers import ChannelwiseScaler
    for name in ("x_scale.json", "y_scale.json"):
        mean, std = parse_reference_scale(os.path.join(src_dir, name))
        ChannelwiseScaler.from_stats(mean, std).write(name, dst_dir)


# ------------------------------------------------------------------- porters
def port_gan(verify: bool = True):
    """GAN/G.pt -> trained_models/colab_gan_48 (published model_args:
    nx=48, generator Andrew, regression None, div false)."""
    import jax
    import jax.numpy as jnp

    from pyqg_generative_tpu.ml.nets import AndrewCNN, DCGANDiscriminator
    from pyqg_generative_tpu.models.base import (save_model_args,
                                                 save_variables)
    src, dst = f"{REF}/GAN", os.path.join(OUT, "colab_gan_48")
    os.makedirs(dst, exist_ok=True)
    layers = torch_layers(load_state_dict(f"{src}/G.pt"))
    vars_G = layers_to_flax_vars(layers)
    G = AndrewCNN(n_out=2)
    if verify:
        verify_port("GAN generator", layers, G, vars_G, n_in=4)
    save_variables(vars_G, f"{dst}/G.msgpack")
    # The critic is not part of the online path; store a fresh init so the
    # folder satisfies the load contract (models/cgan_regression.py:131-150).
    D = DCGANDiscriminator(nx=48, bn="None")
    tD = D.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 6)), train=True)
    save_variables({"params": tD["params"],
                    "batch_stats": tD.get("batch_stats", {})},
                   f"{dst}/D.msgpack")
    write_scalers(src, dst)
    save_model_args("CGANRegression", folder=dst, regression="None",
                    nx=48, generator="Andrew", div=False)
    with open(f"{dst}/README.md", "w") as f:
        f.write("Published JAMES-2023 GAN weights ported tensor-by-tensor "
                "from /root/reference/Google-Colab/GAN (G.pt) by "
                "scripts/port_reference_weights.py. D.msgpack is a fresh "
                "init (critic is unused online).\n")
    print(f"  wrote {dst}")
    return dst


def port_vae(verify: bool = True):
    """VAE/{encoder,decoder}.pt -> trained_models/colab_vae_48."""
    from pyqg_generative_tpu.ml.nets import AndrewCNN
    from pyqg_generative_tpu.models.base import (save_model_args,
                                                 save_variables)
    src, dst = f"{REF}/VAE", os.path.join(OUT, "colab_vae_48")
    os.makedirs(dst, exist_ok=True)
    enc_layers = torch_layers(load_state_dict(f"{src}/encoder.pt"))
    dec_layers = torch_layers(load_state_dict(f"{src}/decoder.pt"))
    vars_enc = layers_to_flax_vars(enc_layers)
    vars_dec = layers_to_flax_vars(dec_layers)
    if verify:
        verify_port("VAE encoder", enc_layers, AndrewCNN(n_out=4),
                    vars_enc, n_in=4)
        verify_port("VAE decoder", dec_layers, AndrewCNN(n_out=2),
                    vars_dec, n_in=4)
    save_variables(vars_enc, f"{dst}/encoder.msgpack")
    save_variables(vars_dec, f"{dst}/decoder.msgpack")
    write_scalers(src, dst)
    save_model_args("CVAERegression", folder=dst, regression="None",
                    div=False, decoder_var="adaptive")
    with open(f"{dst}/README.md", "w") as f:
        f.write("Published JAMES-2023 VAE weights ported from "
                "/root/reference/Google-Colab/VAE by "
                "scripts/port_reference_weights.py.\n")
    print(f"  wrote {dst}")
    return dst


def port_gz(verify: bool = True):
    """GZ/net_{mean,var}.pt -> trained_models/colab_gz_48."""
    from pyqg_generative_tpu.ml.nets import AndrewCNN, VarCNN
    from pyqg_generative_tpu.models.base import (save_model_args,
                                                 save_variables)
    src, dst = f"{REF}/GZ", os.path.join(OUT, "colab_gz_48")
    os.makedirs(dst, exist_ok=True)
    mean_layers = torch_layers(load_state_dict(f"{src}/net_mean.pt"))
    var_layers = torch_layers(load_state_dict(f"{src}/net_var.pt"))
    vars_mean = layers_to_flax_vars(mean_layers)
    vars_var = layers_to_flax_vars(var_layers)
    if verify:
        verify_port("GZ mean net", mean_layers, AndrewCNN(n_out=2),
                    vars_mean, n_in=2)
        verify_port("GZ var net", var_layers, VarCNN(2), vars_var, n_in=2)
    save_variables(vars_mean, f"{dst}/net_mean.msgpack")
    save_variables(vars_var, f"{dst}/net_var.msgpack")
    write_scalers(src, dst)
    save_model_args("MeanVarModel", folder=dst)
    with open(f"{dst}/README.md", "w") as f:
        f.write("Published JAMES-2023 GZ (MeanVar) weights ported from "
                "/root/reference/Google-Colab/GZ by "
                "scripts/port_reference_weights.py.\n")
    print(f"  wrote {dst}")
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="run the flax side on CPU (the container "
                         "pre-imports jax on the TPU platform; porting "
                         "needs no TPU and CPU avoids its startup cost)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    verify = not args.no_verify
    print("Porting published Colab checkpoints (torch -> flax):")
    port_gan(verify)
    port_vae(verify)
    port_gz(verify)
    print("done.")


if __name__ == "__main__":
    main()
