"""Checkpoint/resume for simulation and training state.

The reference has no mid-run checkpointing (SURVEY §5.3-5.4: crash-restart is
at the SLURM-job level only; simulation 'resume' is an explicit q_init
array). Here the *entire* run state is one pytree — spectral PV, AB3 tendency
lags, noise-sampler memory (latent state, cached forcing, counter, PRNG key)
and diagnostic accumulators — saved to a single .npz and restored exactly, so
an interrupted run continues bit-for-bit.

Complex leaves are stored as real/imag pairs: the split happens on-device in
a jitted kernel (the TPU runtime here cannot transfer complex buffers to the
host reliably).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "device_get_safe"]


@jax.jit
def _split_complex(x):
    return jnp.real(x), jnp.imag(x)


def device_get_safe(tree):
    """device_get with complex leaves split on-device first."""
    def conv(x):
        if hasattr(x, "dtype") and jnp.issubdtype(np.asarray(x).dtype
                                                  if not isinstance(x, jax.Array)
                                                  else x.dtype, np.complexfloating):
            r, i = _split_complex(x)
            return np.asarray(jax.device_get(r)) + \
                1j * np.asarray(jax.device_get(i))
        return np.asarray(jax.device_get(x))
    return jax.tree_util.tree_map(conv, tree)


def _flatten(prefix: str, obj, out: dict):
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
    elif obj is None:
        out[f"{prefix}//none"] = np.zeros(0)
    else:
        arr = np.asarray(obj)
        if np.iscomplexobj(arr):
            out[f"{prefix}//re"] = arr.real
            out[f"{prefix}//im"] = arr.imag
        else:
            out[prefix] = arr


def save_checkpoint(path: str, tree) -> None:
    """Serialize any pytree of arrays (complex-safe) to one .npz file."""
    host = device_get_safe(tree)
    state = serialization.to_state_dict(host)
    flat: dict = {}
    _flatten("", state, flat)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    # Write-then-rename so a crash mid-save never leaves a corrupt .npz at
    # the final path (np.savez appends '.npz' unless the name already ends
    # with it, so keep the suffix on the temp name and replace atomically).
    tmp = path if path.endswith(".npz") else path + ".npz"
    tmp += ".tmp.npz"
    np.savez(tmp, **flat)
    final = path if path.endswith(".npz") else path + ".npz"
    os.replace(tmp, final)


def load_checkpoint(path: str, template):
    """Restore a checkpoint into the structure of `template` (e.g. a freshly
    built run carry from `sim.init_run_carry`)."""
    with np.load(path) as z:
        nested: dict = {}
        for key in z.files:
            if key.endswith("//none"):
                base, kind = key[:-6], "none"
            elif key.endswith("//re"):
                base, kind = key[:-4], "re"
            elif key.endswith("//im"):
                base, kind = key[:-4], "im"
            else:
                base, kind = key, "plain"
            parts = base.split("/")
            d = nested
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            leaf = parts[-1]
            if kind == "none":
                d[leaf] = None
            elif kind == "plain":
                d[leaf] = z[key]
            else:
                cur = d.get(leaf)
                if isinstance(cur, dict) and "__c" in cur:
                    other = cur["__c"]
                    d[leaf] = (other + 1j * z[key]) if kind == "im" \
                        else (z[key] + 1j * other)
                elif cur is None or not isinstance(cur, dict):
                    d[leaf] = {"__c": z[key]}
        # resolve any half-assembled complex leaves (shouldn't happen)
        def fix(d):
            for k, v in list(d.items()):
                if isinstance(v, dict):
                    if "__c" in v and len(v) == 1:
                        d[k] = v["__c"]
                    else:
                        fix(v)
        fix(nested)
    return serialization.from_state_dict(template, nested)
