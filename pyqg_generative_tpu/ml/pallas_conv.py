"""Fused Pallas TPU kernel for the online AndrewCNN forward pass.

The online hot path evaluates the (BatchNorm-folded) 8-layer circular CNN
once per solver step per ensemble member (reference hot loop
tools/simulate.py:137 + models/parameterization.py:23-34 — there a host/GPU
round-trip per step; here one VMEM-resident kernel inside the fused step).

Design (per ensemble member = one pallas program; `jax.vmap` over members
turns into the pallas grid):

* the whole 8-layer chain runs in one kernel — activations never leave VMEM
  (the XLA conv path round-trips each layer through HBM at these tiny
  spatial sizes);
* circular shifts commute with channelwise contractions, so each conv is
  computed as ONE MXU-friendly matmul per kernel row with all K shifts
  packed into the output columns,
      Y_dy = X @ W[dy]            with W[dy] of shape (Cin, K*Cout),
  followed by K cheap VPU shifted accumulations
      out += roll2d(Y_dy[:, dx-block], (dy, dx));
  this keeps the contraction dim (Cin) and the result width (K*Cout) large
  instead of issuing K^2 narrow matmuls, and rolls the *smaller* side
  (outputs, or inputs for the 4-channel first layer via im2col);
* 2-D circular shifts on the flattened (H*W, C) activation are two flat
  sublane rolls + a column-mask select (`_flat_roll2d`) — Mosaic's
  dynamic_rotate handles 32-bit data only, so activations stay float32 and
  are cast to `compute_dtype` (bfloat16 by default: 4x MXU throughput) only
  at matmul inputs; accumulation is float32 (`preferred_element_type`).

Exactness vs the XLA/flax path is enforced by tests/test_pallas_conv.py
(f32 kernel: ~1e-4; bf16 kernel: statistical tolerance).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_folded_params", "fused_cnn_forward", "make_online_cnn",
           "merge_folded_pair"]


def merge_folded_pair(folded_a: dict, folded_b: dict) -> dict:
    """Merge two BN-folded CNNs with identical layer structure into ONE
    block-diagonal network over the channel dimension, so a single fused
    kernel evaluates both (round-5 GZ optimization: the MeanVarModel online
    step is two CNN forwards; its 32/64-channel layers pad to 128 lanes, so
    two separate programs roll half-empty vectors and pay the per-program
    overhead twice — the merged net fills the lanes and runs once).

    Layer 0 (both nets read the SAME input): kernels concatenated along
    cout. Layers 1..n: block-diagonal over (cin, cout) — the zero blocks
    cost no extra MXU passes at these widths (contraction dims <= 128 pad
    to the same tile either way). Outputs concatenate [out_a | out_b]."""
    pa, pb = folded_a["params"], folded_b["params"]
    n = len([k for k in pa if k.startswith("Conv_")])
    assert n == len([k for k in pb if k.startswith("Conv_")]), \
        "pair nets must have the same depth"
    out = {}
    for i in range(n):
        ka = np.asarray(pa[f"Conv_{i}"]["kernel"])
        kb = np.asarray(pb[f"Conv_{i}"]["kernel"])
        ba = np.asarray(pa[f"Conv_{i}"].get("bias",
                                            np.zeros(ka.shape[-1])))
        bb = np.asarray(pb[f"Conv_{i}"].get("bias",
                                            np.zeros(kb.shape[-1])))
        assert ka.shape[:2] == kb.shape[:2], "pair nets must share K"
        K, _, cina, couta = ka.shape
        cinb, coutb = kb.shape[2], kb.shape[3]
        if i == 0:
            assert cina == cinb, "pair nets must share the input"
            k = np.concatenate([ka, kb], axis=3)
        else:
            k = np.zeros((K, K, cina + cinb, couta + coutb), ka.dtype)
            k[:, :, :cina, :couta] = ka
            k[:, :, cina:, couta:] = kb
        out[f"Conv_{i}"] = {"kernel": k,
                            "bias": np.concatenate([ba, bb])}
    return {"params": out}


def pack_folded_params(folded: dict, compute_dtype=jnp.bfloat16):
    """Flatten BN-folded AndrewCNN params ({'params': {'Conv_i': {kernel
    (K,K,Cin,Cout), bias (Cout,)}}}) into the kernel operand list: per layer
    a (K*K*Cin, Cout) weight in compute_dtype (sublane-sliced per tap inside
    the kernel) and a (1, Cout) float32 bias. Returns (weights, biases,
    meta) with meta = ((K, cin, cout), ...)."""
    params = folded["params"]
    n = len([k for k in params if k.startswith("Conv_")])
    weights, biases, meta = [], [], []
    for i in range(n):
        k = np.asarray(params[f"Conv_{i}"]["kernel"])
        b = np.asarray(params[f"Conv_{i}"].get("bias",
                                               np.zeros(k.shape[-1])))
        K, K2, cin, cout = k.shape
        assert K == K2, "square kernels only"
        weights.append(jnp.asarray(k.reshape(K * K * cin, cout),
                                   compute_dtype))
        biases.append(jnp.asarray(b.reshape(1, cout), jnp.float32))
        meta.append((K, cin, cout))
    return weights, biases, tuple(meta)


def _flat_roll2d(y, a, b, H, W):
    """z[h, w] = y[(h - a) % H, (w - b) % W] on the (H*W, C)-flattened field.

    One flat sublane roll covers the row shift plus the naive column shift;
    the |b| columns that wrapped into the adjacent row are patched from a
    second roll offset by one row (static shifts -> cheap tpu.rotate)."""
    M = H * W
    b = b % W
    r = (a * W + b) % M
    z0 = pltpu.roll(y, r, axis=0) if r else y
    if b == 0:
        return z0
    z1 = pltpu.roll(y, (r - W) % M, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) % W
    return jnp.where(col < b, z1, z0)


def _conv_out(act, w, K, cin, cout, H, W, cdtype, col):
    """Roll-output path: per kernel tap s, one full-width matmul
    y_s = X @ W_s (sublane-aligned weight slice, no lane slicing), then a
    shifted accumulation of y_s. `col` is the hoisted (H*W, cout) column
    index used by the wrap fix."""
    c = K // 2
    xb = act.astype(cdtype)
    acc = jnp.zeros((H * W, cout), jnp.float32)
    s = 0
    M = H * W
    for dy in range(-c, K - c):
        for dx in range(-c, K - c):
            y_s = jax.lax.dot_general(
                xb, w[s * cin:(s + 1) * cin, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s += 1
            # acc[h, w] += y_s[h + dy, w + dx] circularly, i.e. the shift
            # (a, b) = (-dy, -dx) in z[h, w] = y[h - a, w - b]
            b = (-dx) % W
            r = ((-dy) * W + b) % M
            z0 = pltpu.roll(y_s, r, axis=0) if r else y_s
            if b == 0:
                acc = acc + z0
            else:
                z1 = pltpu.roll(y_s, (r - W) % M, axis=0)
                acc = acc + jnp.where(col < b, z1, z0)
    return acc


def pack_folded_params_dx(folded: dict, compute_dtype=jnp.bfloat16):
    """dx-major packing for the roll-input kernel variant: per layer a
    (K*cin, K*cout) matrix whose row block j_dx holds the (cin, K*cout)
    matmul operand for column shift dx, with the K dy-taps packed into
    output-column blocks. Shares bias/meta conventions with
    pack_folded_params."""
    params = folded["params"]
    n = len([k for k in params if k.startswith("Conv_")])
    weights, biases, meta = [], [], []
    for i in range(n):
        k = np.asarray(params[f"Conv_{i}"]["kernel"])  # (K, K, cin, cout)
        b = np.asarray(params[f"Conv_{i}"].get("bias",
                                               np.zeros(k.shape[-1])))
        K, K2, cin, cout = k.shape
        assert K == K2, "square kernels only"
        w = np.zeros((K * cin, K * cout), k.dtype)
        for jdx in range(K):       # kernel index along x (dx = jdx - K//2)
            for jdy in range(K):   # kernel index along y
                w[jdx * cin:(jdx + 1) * cin,
                  jdy * cout:(jdy + 1) * cout] = k[jdy, jdx]
        weights.append(jnp.asarray(w, compute_dtype))
        biases.append(jnp.asarray(b.reshape(1, cout), jnp.float32))
        meta.append((K, cin, cout))
    return weights, biases, tuple(meta)


def _conv_dxf(act, w, K, cin, cout, H, W, cdtype, col):
    """Roll-input path with FLOAT32 rolls + compute_dtype matmuls: Mosaic's
    dynamic_rotate lowers 32-bit element types only, so bf16-activation
    rolls (variant 'dx' at compute_dtype=bfloat16) fail TPU compilation
    ("tpu.dynamic_rotate ... vector<...xbf16>", r5_dxb_check round-5 log).
    Rolling float32 and casting at the matmul input is bit-identical —
    rolls/selects are permutations, which commute with the elementwise
    cast — and still buys the 2x MXU rate of bf16 matmuls; only the roll
    bytes stay at f32 rate (variant 'dxb' halves those too)."""
    c = K // 2
    M = H * W
    z = None
    for jdx, dx in enumerate(range(-c, K - c)):
        b = (-dx) % W
        if b == 0:
            xs = act
        else:
            x0 = pltpu.roll(act, b, axis=0)
            x1 = pltpu.roll(act, (b - W) % M, axis=0)
            xs = jnp.where(col[:, :cin] < b, x1, x0)
        y = jax.lax.dot_general(
            xs.astype(cdtype), w[jdx * cin:(jdx + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (M, K*cout)
        z = y if z is None else z + y
    acc = None
    for jdy, dy in enumerate(range(-c, K - c)):
        blk = z[:, jdy * cout:(jdy + 1) * cout]
        r = ((-dy) * W) % M
        zb = pltpu.roll(blk, r, axis=0) if r else blk
        acc = zb if acc is None else acc + zb
    return acc


def _conv_dxb(act, w, K, cin, cout, H, W, cdtype, col, low_first=True):
    """Roll-input path with bf16-BITCAST rolls (the round-2 headroom idea):
    `pltpu.bitcast` packs adjacent sublane PAIRS of the bf16 (M, cin)
    activation into one 32-bit (M/2, cin) word, so a roll by an even r is
    a word roll by r/2 — half the VPU bytes. Odd shifts roll ONE shared
    odd-phase word array (rows (2i-1, 2i)) built with uint32 half-word
    shifts — NOT a bf16 precursor roll, which Mosaic cannot lower (32-bit
    dynamic_rotate only). `low_first` is the probed packing order
    (`_bitcast_packing`): whether row 2i sits in the low 16 bits of word i.
    Bit-identical to _conv_dxf (permutations commute with the cast)."""
    c = K // 2
    M = H * W
    if jnp.dtype(cdtype) != jnp.dtype(jnp.bfloat16) or M % 2:
        # no legal packed-roll layout — f32 rolls + cast, same math
        return _conv_dxf(act, w, K, cin, cout, H, W, cdtype, col)
    xb = act.astype(cdtype)
    xp_even = pltpu.bitcast(xb, jnp.float32)        # word i = rows (2i,2i+1)
    u = pltpu.bitcast(xb, jnp.uint32)
    up = pltpu.roll(u, 1, axis=0)                   # word i-1
    # odd-phase words: word i = rows (2i-1, 2i), same half order as `u`
    odd = ((up >> 16) | (u << 16)) if low_first \
        else ((up << 16) | (u >> 16))
    xp_odd = pltpu.bitcast(odd, jnp.float32)

    def roll_in(r):
        # rows z[j] = xb[j - r]: even r -> word roll by r/2 of the even
        # phase; odd r -> word roll by (r-1)/2 of the odd phase
        if r % 2 == 0:
            z = pltpu.roll(xp_even, r // 2, axis=0) if r else xp_even
        else:
            z = pltpu.roll(xp_odd, (r - 1) // 2, axis=0) \
                if r != 1 else xp_odd
        return pltpu.bitcast(z, cdtype)

    z = None
    for jdx, dx in enumerate(range(-c, K - c)):
        b = (-dx) % W
        if b == 0:
            xs = xb
        else:
            xs = jnp.where(col[:, :cin] < b,
                           roll_in((b - W) % M), roll_in(b))
        y = jax.lax.dot_general(
            xs, w[jdx * cin:(jdx + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (M, K*cout)
        z = y if z is None else z + y
    acc = None
    for jdy, dy in enumerate(range(-c, K - c)):
        blk = z[:, jdy * cout:(jdy + 1) * cout]
        r = ((-dy) * W) % M
        zb = pltpu.roll(blk, r, axis=0) if r else blk
        acc = zb if acc is None else acc + zb
    return acc


def _conv_dx(act, w, K, cin, cout, H, W, cdtype, col):
    """Roll-input path: K patched circular shifts of the INPUT (one per
    column offset dx, done in compute_dtype so bf16 halves the VPU bytes),
    one wide matmul per dx with all K dy-taps packed into output columns
    (MXU sees width K*cout instead of cout), a full-width sum over dx, then
    K *clean* row-rolls (multiples of W in the flattened layout need no
    wrap patch) of the dy column blocks. Replaces the K^2 patched output
    rolls of _conv_out with K patched + K clean rolls."""
    c = K // 2
    M = H * W
    xb = act.astype(cdtype)
    z = None
    for jdx, dx in enumerate(range(-c, K - c)):
        # xs[h, w] = x[h, w + dx]  (a = 0, b = -dx in _flat_roll2d terms)
        b = (-dx) % W
        if b == 0:
            xs = xb
        else:
            x0 = pltpu.roll(xb, b, axis=0)
            x1 = pltpu.roll(xb, (b - W) % M, axis=0)
            xs = jnp.where(col[:, :cin] < b, x1, x0)
        y = jax.lax.dot_general(
            xs, w[jdx * cin:(jdx + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (M, K*cout)
        z = y if z is None else z + y
    acc = None
    for jdy, dy in enumerate(range(-c, K - c)):
        blk = z[:, jdy * cout:(jdy + 1) * cout]
        r = ((-dy) * W) % M
        zb = pltpu.roll(blk, r, axis=0) if r else blk
        acc = zb if acc is None else acc + zb
    return acc


_PACK_CACHE: dict = {}


def _bitcast_packing(interpret: bool) -> str:
    """How `pltpu.bitcast` packs a (4, 128) bf16 array into (2, 128) uint32
    words — 'adj_low' (word i = rows (2i, 2i+1) with row 2i in the LOW 16
    bits), 'adj_high' (row 2i in the HIGH bits), or 'other' (e.g.
    deinterleaved halves). The dxb packed-roll identities require
    adjacent-pair packing; 'other' falls back to dxf semantics. Probed
    empirically (one tiny kernel, cached) because the layout is a property
    of the backend — Mosaic's sublane packing vs interpret-mode numpy."""
    if interpret in _PACK_CACHE:
        return _PACK_CACHE[interpret]

    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.uint32)

    # The probe must yield a CONCRETE result even when _resolve_variant is
    # reached during tracing (make_online_cnn is called from inside the
    # scanned online step): all probe inputs are constants, so
    # ensure_compile_time_eval executes the pallas_call eagerly instead of
    # binding it into the ambient trace (round-5 fix — without this,
    # `--backend pallas:dxb --infer-dtype bfloat16` died with
    # TracerArrayConversionError on the uint32[2,128] probe output).
    with jax.ensure_compile_time_eval():
        rows = jnp.asarray([1.0, 2.0, 3.0, 4.0],
                           jnp.bfloat16)  # 3F80 4000 4040 4080
        x = jnp.broadcast_to(rows[:, None], (4, 128))
        out = np.asarray(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x))
    w0, w1 = int(out[0, 0]), int(out[1, 0])
    if (w0, w1) == (0x40003F80, 0x40804040):
        pack = "adj_low"
    elif (w0, w1) == (0x3F804000, 0x40404080):
        pack = "adj_high"
    else:
        pack = "other"
    _PACK_CACHE[interpret] = pack
    return pack


def _resolve_variant(variant: str, interpret: bool):
    """Resolve 'dxb' against the backend's probed bitcast packing: returns
    (variant, low_first). Non-adjacent packing downgrades to 'dxf' (same
    math, f32-rate rolls)."""
    if variant != "dxb":
        return variant, True
    pack = _bitcast_packing(interpret)
    if pack == "other":
        return "dxf", True
    return "dxb", pack == "adj_low"


def _make_kernel(meta, H, W, compute_dtype, final_relu, variant="tap",
                 low_first=True):
    n = len(meta)

    def kernel(x_ref, *refs):
        w_refs = refs[:n]
        b_refs = refs[n:2 * n]
        out_ref = refs[2 * n]
        act = x_ref[:].reshape(H * W, meta[0][1]).astype(jnp.float32)
        # wide enough for the widest layer (merged-pair nets exceed 128)
        wmax = max(128, max(max(cin, cout) for (_, cin, cout) in meta))
        col = jax.lax.broadcasted_iota(
            jnp.int32, (H * W, wmax), 0) % W
        conv = {"dx": _conv_dx, "dxf": _conv_dxf,
                "dxb": partial(_conv_dxb, low_first=low_first)
                }.get(variant, _conv_out)
        for i, (K, cin, cout) in enumerate(meta):
            if variant in ("dx", "dxf", "dxb"):
                act = conv(act, w_refs[i][:], K, cin, cout, H, W,
                           compute_dtype, col)
            else:
                act = conv(act, w_refs[i][:], K, cin, cout, H, W,
                           compute_dtype, col[:, :cout])
            act = act + b_refs[i][:]
            if i < n - 1 or final_relu:
                act = jnp.maximum(act, 0.0)
        out_ref[:] = act.reshape(H, W, meta[-1][2]).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("meta", "compute_dtype", "interpret",
                                   "final_relu", "variant", "low_first"))
def _fused_call(x, weights, biases, meta, compute_dtype, interpret,
                final_relu=False, variant="tap", low_first=True):
    H, W = x.shape[0], x.shape[1]
    n_out = meta[-1][2]
    kernel = _make_kernel(meta, H, W, compute_dtype, final_relu, variant,
                          low_first)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W, n_out), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * len(meta)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *weights, *biases)


def fused_cnn_forward(x, weights, biases, meta,
                      compute_dtype=jnp.bfloat16, interpret=False,
                      variant="tap"):
    """Run the fused CNN on x of shape (H, W, Cin) (single sample) or
    (B, H, W, Cin) (vmapped into the pallas grid). Returns float32
    (..., H, W, n_out). `variant`: 'tap' (per-tap output rolls, weights
    from pack_folded_params) or 'dx'/'dxf'/'dxb' (roll-input, weights from
    pack_folded_params_dx)."""
    dt = jnp.dtype(compute_dtype).name  # hashable static arg
    variant, low_first = _resolve_variant(variant, interpret)
    if x.ndim == 4:
        return jax.vmap(
            lambda xx: _fused_call(xx, weights, biases, meta,
                                   dt, interpret, variant=variant,
                                   low_first=low_first))(x)
    return _fused_call(x, weights, biases, meta, dt, interpret,
                       variant=variant, low_first=low_first)


def _make_packed_kernel(meta, H, W, B, compute_dtype):
    """Member-packed kernel: activations live as (H*W, B*C) with all B
    ensemble members side by side in the lane dimension, so every VPU op
    (rolls, selects, adds) runs at full 128-lane width instead of the
    25-75% padding waste of per-member 32/64-lane arrays. Matmuls stay
    per-member (weights are shared; member lane-slices of the activation are
    tile-aligned for the 128-channel layer and cheap lane-rotates
    otherwise)."""
    n = len(meta)
    M = H * W

    def kernel(x_ref, *refs):
        w_refs = refs[:n]
        b_refs = refs[n:2 * n]   # pre-tiled (1, B*cout) biases
        out_ref = refs[2 * n]
        act = x_ref[:].astype(jnp.float32)            # (M, B*C0)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % W
        for i, (K, cin, cout) in enumerate(meta):
            w_ref = w_refs[i]
            xbs = [act[:, j * cin:(j + 1) * cin].astype(compute_dtype)
                   for j in range(B)]
            c = K // 2

            # fori over the K*K taps (traced shifts -> dynamic_rotate):
            # keeps the Mosaic program small enough to compile quickly
            def tap(s, acc):
                dy = s // K - c
                dx = s % K - c
                w_s = w_ref[pl.ds(s * cin, cin), :]
                y_s = jnp.concatenate(
                    [jax.lax.dot_general(
                        xb, w_s,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     for xb in xbs], axis=1)          # (M, B*cout)
                b = (-dx) % W
                r = ((-dy) * W + b) % M
                z0 = pltpu.roll(y_s, r, axis=0)
                z1 = pltpu.roll(y_s, (r - W) % M, axis=0)
                return acc + jnp.where(col < b, z1, z0)

            acc = jax.lax.fori_loop(
                0, K * K, tap, jnp.zeros((M, B * cout), jnp.float32))
            act = acc + b_refs[i][:]
            if i < n - 1:
                act = jnp.maximum(act, 0.0)
        out_ref[:] = act.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("meta", "B", "compute_dtype",
                                   "interpret"))
def _fused_call_packed(x, weights, biases_packed, meta, B, compute_dtype,
                       interpret):
    """x: (H*W, B*C0) member-packed activations."""
    H = W = int(np.sqrt(x.shape[0]))
    assert H * W == x.shape[0], "square grids only"
    n_out = meta[-1][2]
    kernel = _make_packed_kernel(meta, H, W, B, compute_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H * W, B * n_out), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * len(meta)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *weights, *biases_packed)


def make_online_cnn(folded: dict, compute_dtype=jnp.bfloat16,
                    interpret: bool = False, variant: str = "packed"):
    """Build the online forward for a BN-folded AndrewCNN: the 4-channel
    first layer runs as an XLA circular conv (~5% of the FLOPs; its tiny
    contraction dim suits neither the MXU slicing nor lane-concat), layers
    2..n run in a fused pallas kernel. `variant`:

    * 'packed' — member-packed lanes, one program for the whole batch;
    * 'tap'    — per-member programs (vmap -> grid), per-tap output rolls;
    * 'dx'     — per-member programs, roll-input + dx-packed matmuls
                 (K patched + K clean rolls per layer instead of K^2
                 patched; K-times-wider MXU results); rolls run in
                 compute_dtype — bf16 does NOT lower on TPU (Mosaic
                 dynamic_rotate is 32-bit only), use 'dxf' there;
    * 'dxf'    — 'dx' with float32 rolls and the cast at the matmul
                 input (bit-identical; legal at bf16 on TPU);
    * 'dxb'    — 'dxf' with the input rolls done on sublane-pair-packed
                 32-bit words via pltpu.bitcast (half the roll bytes; odd
                 shifts use a uint32 half-word-shifted odd-phase array);
                 requires adjacent-pair packing (probed, else -> 'dxf').

    Returns apply(x) for x of shape (H, W, Cin) or (B, H, W, Cin),
    producing float32 (..., H, W, n_out). Each distinct batch size compiles
    its own kernel."""
    params = folded["params"]
    k0 = jnp.asarray(np.asarray(params["Conv_0"]["kernel"]), jnp.float32)
    b0 = jnp.asarray(np.asarray(params["Conv_0"]["bias"]), jnp.float32)
    K0 = k0.shape[0]
    rest = {"params": {f"Conv_{i - 1}": params[f"Conv_{i}"]
                       for i in range(1, len(params))}}
    pack = pack_folded_params_dx if variant in ("dx", "dxf", "dxb") \
        else pack_folded_params
    weights, biases, meta = pack(rest, compute_dtype)
    dt = jnp.dtype(compute_dtype).name
    variant, low_first = _resolve_variant(variant, interpret)
    n_out = meta[-1][2]

    def first_layer(xb):
        pad = K0 // 2
        xp = jnp.pad(xb, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="wrap")
        y = jax.lax.conv_general_dilated(
            xp, k0, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y + b0, 0.0)

    def apply(x):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        act = first_layer(x.astype(jnp.float32))
        if variant in ("tap", "dx", "dxf", "dxb"):
            out = jax.vmap(
                lambda xx: _fused_call(xx, weights, biases, meta, dt,
                                       interpret, variant=variant,
                                       low_first=low_first))(act)
        else:
            # (B, H, W, C) -> member-packed (H*W, B*C)
            packed = act.reshape(B, H * W, -1).transpose(1, 0, 2) \
                .reshape(H * W, -1)
            bp = tuple(jnp.tile(b, (1, B)) for b in biases)
            out = _fused_call_packed(packed, weights, bp, meta, B, dt,
                                     interpret)
            out = out.reshape(H * W, B, n_out).transpose(1, 0, 2) \
                .reshape(B, H, W, n_out)
        return out[0] if squeeze else out

    return apply
