"""Neural network building blocks (flax.linen, NHWC, TPU-friendly dtypes).

Re-designed equivalents of the reference's PyTorch stacks
(`tools/cnn_tools.py:125-319`, `tools/deep_inversion.py`): same architectures
and receptive fields — circular padding on all translation-equivariant convs,
conv->ReLU->BatchNorm ordering, DCGAN discriminator sized for nx in
{48, 64, 96} — but NHWC layout, bf16-capable compute dtype and functional
params so they fuse into the solver's XLA program for online coupling.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..qg.grid import make_grid

__all__ = ["AndrewCNN", "VarCNN", "ANN", "DCGANDiscriminator",
           "DeepInversionGenerator", "dcgan_normal_init"]


def dcgan_normal_init(std: float = 0.02):
    """N(0, 0.02) conv init (DCGAN recipe; reference tools/cnn_tools.py:54-65)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _norm(bn: str, dtype):
    if bn == "BatchNorm":
        return nn.BatchNorm(use_running_average=None, momentum=0.9,
                            epsilon=1e-5, dtype=dtype,
                            scale_init=nn.initializers.normal(0.02, jnp.float32),
                            use_fast_variance=False)
    if bn == "LayerNorm":
        return nn.LayerNorm(dtype=dtype)
    if bn == "None":
        return None
    raise ValueError(f"unknown norm {bn}")


class AndrewCNN(nn.Module):
    """8-layer circular CNN (kernels [5,5,3x6], channels [128,64,32x5]),
    ReLU + BatchNorm after each hidden conv (reference tools/cnn_tools.py:125-182).

    `div=True` doubles the output channels, interprets them as a vector field
    (fx, fy) and returns 10000 * spectral divergence — gradients land on a
    physically meaningful flux (reference tools/cnn_tools.py:100-123,164-176).
    """
    n_out: int
    hidden_channels: Sequence[int] = (128, 64, 32, 32, 32, 32, 32)
    kernels: Sequence[int] = (5, 5, 3, 3, 3, 3, 3, 3)
    batch_norm: bool = True
    bias: bool = True
    relu: str = "ReLU"
    final_activation: str = "None"
    div: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_out = self.n_out * 2 if self.div else self.n_out
        chans = list(self.hidden_channels) + [n_out]
        for i, (c, k) in enumerate(zip(chans, self.kernels)):
            last = i == len(chans) - 1
            x = nn.Conv(c, (k, k), padding="CIRCULAR", use_bias=self.bias,
                        dtype=self.dtype,
                        kernel_init=dcgan_normal_init())(x)
            if not last:
                if self.relu == "ReLU":
                    x = nn.relu(x)
                elif self.relu == "LeakyReLU":
                    x = nn.leaky_relu(x, 0.2)
                if self.batch_norm:
                    x = _norm("BatchNorm", self.dtype)(
                        x, use_running_average=not train)
        if self.final_activation != "None":
            x = getattr(nn, self.final_activation)(x)
        if self.div:
            x = 10000.0 * spectral_divergence(x.astype(jnp.float32))
        return x


def spectral_divergence(x):
    """NHWC tensor with 2*C channels -> C channels: d/dx of the first half
    plus d/dy of the second half, via rFFT (reference tools/cnn_tools.py:100-123).
    Physical derivatives on the reference L=1e6 m domain."""
    ny, nx, c2 = x.shape[-3], x.shape[-2], x.shape[-1]
    c = c2 // 2
    g = make_grid(nx, ny, L=1e6)
    xh = jnp.fft.rfftn(jnp.moveaxis(x, -1, -3), axes=(-2, -1))
    ik = jnp.asarray(g.ik, xh.dtype)
    il = jnp.asarray(g.il, xh.dtype)
    div_h = xh[..., :c, :, :] * ik + xh[..., c:, :, :] * il
    div = jnp.fft.irfftn(div_h, s=(ny, nx), axes=(-2, -1))
    return jnp.moveaxis(div, -3, -1)


def VarCNN(n_out: int, **kw) -> AndrewCNN:
    """AndrewCNN with a softplus head: nonnegative pointwise conditional
    variance (GZ model; reference models/mean_var_model.py:14-17)."""
    kw.setdefault("final_activation", "softplus")
    return AndrewCNN(n_out=n_out, **kw)


class ANN(nn.Module):
    """Pointwise MLP on flattened stencils; optional scale-invariant form
    norm(x)^degree * f(x/norm(x)) (reference tools/cnn_tools.py:184-210)."""
    n_out: int
    hidden_channels: Sequence[int] = (24, 24)
    degree: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def mlp(z):
            for h in self.hidden_channels:
                z = nn.relu(nn.Dense(h, dtype=self.dtype)(z))
            return nn.Dense(self.n_out, dtype=self.dtype)(z)

        if self.degree is not None:
            norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
            safe = jnp.where(norm == 0, 1.0, norm)
            return safe ** self.degree * mlp(x / safe)
        return mlp(x)


class DCGANDiscriminator(nn.Module):
    """DCGAN critic: four stride-2 4x4 convs (zero padding, LeakyReLU 0.2, no
    sigmoid), final valid conv collapsing the nx/16 map to 1x1 — works for
    nx in {48, 64, 96} (reference tools/cnn_tools.py:212-244). The GAN closure
    uses bn='None' (reference models/cgan_regression.py:57)."""
    ndf: int = 64
    nx: int = 64
    bn: str = "None"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        kernel_init=dcgan_normal_init())(x)
            if i > 0:
                norm = _norm(self.bn, self.dtype)
                if norm is not None:
                    x = norm(x, use_running_average=not train) \
                        if self.bn == "BatchNorm" else norm(x)
            x = nn.leaky_relu(x, 0.2)
        kfin = int(self.nx / 64 * 4)
        x = nn.Conv(1, (kfin, kfin), padding="VALID", use_bias=False,
                    dtype=self.dtype, kernel_init=dcgan_normal_init())(x)
        return x.reshape(x.shape[0], -1)[:, :1]


class ResUnit(nn.Module):
    """Residual unit with circular 3x3 convs:
    y = norm(x); out = (leaky->conv->norm->leaky->conv)(y) + conv1x1(y)
    (reference tools/deep_inversion.py:104-124)."""
    out_ch: int
    bn: str = "BatchNorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(z):
            n = _norm(self.bn, self.dtype)
            if n is None:
                return z
            return n(z, use_running_average=not train) \
                if self.bn == "BatchNorm" else n(z)

        y = norm(x)
        h = nn.leaky_relu(y, 0.2)
        h = nn.Conv(self.out_ch, (3, 3), padding="CIRCULAR",
                    dtype=self.dtype)(h)
        h = norm(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_ch, (3, 3), padding="CIRCULAR",
                    dtype=self.dtype)(h)
        shortcut = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(y)
        return h + shortcut


class DeepInversionGenerator(nn.Module):
    """U-Net generator (arXiv 1811.05910 fig. 8): circular residual units,
    AvgPool downsampling 64->4, ConvTranspose upsampling with skip concat
    (reference tools/deep_inversion.py:44-101). Translation-equivariant under
    circular shifts by multiples of 16 (pooling factor); equivariance is
    tested like the reference's built-in `test()`."""
    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train
        x = nn.Conv(32, (3, 3), padding="CIRCULAR", dtype=self.dtype)(x)
        im64 = ResUnit(32, bn="None", dtype=self.dtype)(x, t)

        def down(z, ch):
            z = nn.avg_pool(z, (2, 2), strides=(2, 2))
            return ResUnit(ch, dtype=self.dtype)(z, t)

        im32 = down(im64, 64)
        im16 = down(im32, 128)
        im8 = down(im16, 256)
        im4 = down(im8, 512)
        im4 = ResUnit(512, dtype=self.dtype)(im4, t)

        def up(z, skip, ch):
            z = nn.ConvTranspose(z.shape[-1] // 2, (2, 2), strides=(2, 2),
                                 dtype=self.dtype)(z)
            z = jnp.concatenate([z, skip], axis=-1)
            return ResUnit(ch, dtype=self.dtype)(z, t)

        h = up(im4, im8, 256)
        h = up(h, im16, 128)
        h = up(h, im32, 64)
        h = up(h, im64, 32)
        h = ResUnit(32, bn="None", dtype=self.dtype)(h, t)
        return nn.Conv(self.n_out, (1, 1), dtype=self.dtype)(h)


class Downsampling(nn.Module):
    """Stack of stride-2 circular 3x3 convs (BN + LeakyReLU); optionally a
    final Dense head on the flattened map (reference tools/cnn_tools.py:246-279).
    Used as the CVAE-bottleneck encoder."""
    n_down: int
    n_out: int
    nx: int = 64
    hidden_dims: Sequence[int] = (32, 64, 128, 256, 512, 1024)
    flatten: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_down):
            nout = self.n_out if (i == self.n_down - 1 and not self.flatten) \
                else self.hidden_dims[i]
            x = nn.Conv(nout, (3, 3), strides=(2, 2), padding="CIRCULAR",
                        dtype=self.dtype)(x)
            x = _norm("BatchNorm", self.dtype)(x, use_running_average=not train)
            x = nn.leaky_relu(x, 0.01)
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(self.n_out, dtype=self.dtype)(x)
        return x


class Upsampling(nn.Module):
    """Dense un-flatten followed by stride-2 transposed convs (BN + LeakyReLU)
    (reference tools/cnn_tools.py:281-319). Used as the CVAE-bottleneck deep
    decoder mapping a flat latent back to an image."""
    n_up: int
    n_out: int
    nx: int = 64
    hidden_dims: Sequence[int] = (32, 64, 128, 256, 512, 1024)
    flatten: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hd = list(self.hidden_dims[:self.n_up])[::-1]
        if self.flatten:
            nxc = self.nx // 2 ** self.n_up
            x = nn.Dense(hd[0] * nxc * nxc, dtype=self.dtype)(x)
            x = x.reshape(x.shape[0], nxc, nxc, hd[0])
        for i in range(self.n_up):
            nout = self.n_out if i == self.n_up - 1 else hd[i + 1] \
                if i + 1 < len(hd) else self.n_out
            x = nn.ConvTranspose(nout, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype)(x)
            x = _norm("BatchNorm", self.dtype)(x, use_running_average=not train)
            x = nn.leaky_relu(x, 0.01)
        return x


def fold_batchnorm(variables: dict, eps: float = 1e-5) -> dict:
    """Fold eval-mode BatchNorms of an AndrewCNN into the *following* conv.

    The stack is conv_i -> relu -> bn_i -> conv_{i+1}; in eval mode
    bn_i(z) = a ⊙ z + b with a = γ/sqrt(σ²+eps), b = β − μ a. Because b is
    spatially constant and the padding is circular,
        conv_{i+1}(a ⊙ z + b) = conv'_{i+1}(z)
    exactly, with the kernel scaled per input channel by a and the bias
    shifted by Σ_{kh,kw,cin} W[..., cin, :] b[cin]. Returns params for the
    same architecture with `batch_norm=False` — identical outputs, 7 fewer
    full-activation memory passes per call on the online hot path.
    """
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    n_bn = len([k for k in params if k.startswith("BatchNorm")])
    out = {}
    for i in range(n_bn + 1):
        conv = dict(params[f"Conv_{i}"])
        if i > 0:
            bn_p = params[f"BatchNorm_{i - 1}"]
            bn_s = stats[f"BatchNorm_{i - 1}"]
            a = bn_p["scale"] / np.sqrt(bn_s["var"] + eps)
            b = bn_p["bias"] - bn_s["mean"] * a
            kernel = conv["kernel"] * a[None, None, :, None]
            bias = conv.get("bias", 0.0) + np.einsum(
                "hwio,i->o", conv["kernel"], b)
            conv = {"kernel": kernel, "bias": bias.astype(kernel.dtype)}
        out[f"Conv_{i}"] = conv
    return {"params": out, "batch_stats": {}}


def circular_conv_rollmm(x, w, bias=None):
    """Circular conv as a sum of kh*kw rolled matmuls:
        y[b,h,w,:] = sum_{dy,dx} x_rolled[b,h,w,:] @ w[dy,dx]
    Mathematically identical to a CIRCULAR-padded conv; on TPU at this
    framework's shapes (tiny spatial dims, narrow channels) the explicit
    matmul formulation feeds the MXU directly and can beat the generic conv
    lowering. Exactness is tested against lax.conv."""
    kh, kw = w.shape[0], w.shape[1]
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jnp.roll(x, (kh // 2 - dy, kw // 2 - dx), axis=(-3, -2))
            t = jnp.einsum("...c,cd->...d", xs, w[dy, dx],
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    if bias is not None:
        acc = acc + bias
    return acc


def apply_folded_cnn_rollmm(folded_params: dict, x, n_layers: int | None = None):
    """Apply a BN-folded AndrewCNN (conv->relu stack, bias on every layer)
    with the roll-matmul circular conv. Matches
    AndrewCNN(batch_norm=False).apply on the folded params exactly."""
    keys = sorted((k for k in folded_params if k.startswith("Conv_")),
                  key=lambda s: int(s.split("_")[1]))
    if n_layers is not None:
        keys = keys[:n_layers]
    for i, k in enumerate(keys):
        p = folded_params[k]
        x = circular_conv_rollmm(x, p["kernel"], p.get("bias"))
        if i < len(keys) - 1:
            x = nn.relu(x)
    return x


def count_params(variables) -> int:
    return sum(int(np.prod(np.asarray(p.shape)))
               for p in jax.tree_util.tree_leaves(variables))
