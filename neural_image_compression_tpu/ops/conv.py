"""NHWC convolution primitives.

TPU-native replacements for the reference's torch conv usage. All tensors are
NHWC (channel-last — the efficient TPU conv layout; the reference is NCHW),
kernels are HWIO. Transposed convolution reproduces torch's
``ConvTranspose2d(kernel_size=k, stride=s, padding=p, output_padding=op)``
output geometry (out = (in-1)*s - 2p + k + op) via ``lhs_dilation``, which XLA
lowers onto the MXU directly.

Reference geometry being matched (see /root/reference):
  * Components.py:10-16 — 5x5 stride-2 convs, padding 2 (encoder).
  * Components.py:39-45 — 5x5 stride-2 deconvs, padding 2, output_padding 1.
  * Layers.py:18-24    — TransposedDeconv3x3: k=3, stride=s, padding=1,
                         output_padding=s-1.
  * Layers.py:6-16     — SubpelConv3x3: 3x3 conv to out*u^2 channels + pixel
                         shuffle (dead code in the reference wiring, kept for
                         capability parity).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) — torch's Conv2d default — for HWIO kernels.

    Keeps early-training dynamics comparable to the reference without copying
    any code: bound = 1/sqrt(fan_in), fan_in = kh*kw*in_ch.
    """
    kh, kw, in_ch, _ = shape
    fan_in = kh * kw * in_ch
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_deconv_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d kernel init: same kaiming-uniform(a=sqrt(5)),
    but fan_in comes from weight.size(1) = OUT channels of its (in, out, kh,
    kw) layout — fan_in = kh*kw*out_ch, not in_ch."""
    kh, kw, _, out_ch = shape
    bound = 1.0 / np.sqrt(kh * kw * out_ch)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _conv2d_raw(x: jax.Array, kernel: jax.Array,
                stride: int, padding: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


from functools import partial as _partial  # noqa: E402  (local import group)


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_subpel_dx(x: jax.Array, kernel: jax.Array,
                      stride: int, padding: int) -> jax.Array:
    """Stride-2 conv whose VJP computes the INPUT gradient with the subpel
    deconv lowering.

    The input-grad of a stride-2 conv is exactly a stride-2 transposed conv
    of the cotangent (flipped kernel, I/O swapped) — the same computation as
    the decoder's fwd deconvs, where the subpel form measured several-x
    faster on small grids (see deconv2d_subpel). XLA's own transpose rule
    always takes the lhs_dilation form; this custom rule applies the
    per-shape A/B'd choice instead. Kernel grads keep XLA's standard
    lowering (taken via jax.vjp of the plain conv). Forward is bit-identical
    to conv2d; only selected when _deconv_lowering_auto picks subpel for the
    cotangent's shape (decided at trace time in conv2d below).
    """
    return _conv2d_raw(x, kernel, stride, padding)


def _conv2d_subpel_dx_fwd(x, kernel, stride, padding):
    return _conv2d_raw(x, kernel, stride, padding), (x, kernel)


def _conv2d_subpel_dx_bwd(stride, padding, res, g):
    x, kernel = res
    # dw: XLA's standard kernel-grad lowering via vjp of the plain conv
    _, vjp_k = jax.vjp(lambda k: _conv2d_raw(x, k, stride, padding), kernel)
    (dk,) = vjp_k(g)
    # dx: transposed conv of the cotangent — flip kernel spatially, swap I/O
    kt = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = deconv2d_subpel(g, kt, None, padding=padding, output_padding=1)
    return dx, dk


_conv2d_subpel_dx.defvjp(_conv2d_subpel_dx_fwd, _conv2d_subpel_dx_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_patches_dw(x: jax.Array, kernel: jax.Array,
                       stride: int, padding: int) -> jax.Array:
    """Strided conv whose VJP computes the KERNEL gradient as one
    patches-GEMM instead of XLA's ConvBackpropFilter lowering.

    Target: boundary convs with tiny cin (the 3->M RGB layer). The MXU is
    128 lanes wide; a filter-grad that keeps cin on the lane dimension runs
    at 3/128 lane fill, while the patches form contracts over the full
    (B*H'*W') dimension with cin*k*k = 75 rows on the sublane axis — a
    well-shaped GEMM. Input grads keep XLA's stock transpose rule (taken
    via jax.vjp of the plain conv). Forward is bit-identical to conv2d.
    Opt-in via NIC_CONV_DW (see conv2d); A/B'd on-chip before any default
    flips (the custom-dx lesson: isolated wins can be fusion mirages)."""
    return _conv2d_raw(x, kernel, stride, padding)


def _conv2d_patches_dw_fwd(x, kernel, stride, padding):
    return _conv2d_raw(x, kernel, stride, padding), (x, kernel)


def _conv2d_patches_dw_bwd(stride, padding, res, g):
    x, kernel = res
    _, vjp_x = jax.vjp(lambda xx: _conv2d_raw(xx, kernel, stride, padding), x)
    (dx,) = vjp_x(g)
    k, _, cin, cout = kernel.shape
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        _DIMENSION_NUMBERS)
    # (B, H', W', cin*k*k); feature order (cin, kh, kw) — verified in tests
    pat = jax.lax.conv_general_dilated_patches(
        x, (k, k), (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=dn)
    dk = jnp.einsum("bhwp,bhwo->po", pat, g,
                    preferred_element_type=jnp.float32)
    dk = dk.reshape(cin, k, k, cout).transpose(1, 2, 0, 3)
    return dx, dk.astype(kernel.dtype)


_conv2d_patches_dw.defvjp(_conv2d_patches_dw_fwd, _conv2d_patches_dw_bwd)


def conv2d(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None,
           stride: int = 1, padding: int = 0) -> jax.Array:
    """Plain strided conv, torch-style symmetric integer padding.

    NEGATIVE RESULT, kept as an opt-in benchmark hook: for stride-2 convs
    whose geometry admits it (k == 2p+1, even H/W — the encoder /
    hyper-encoder downsamplers) a custom-VJP twin can compute the backward
    input-grad with the subpel deconv lowering instead of XLA's stock
    lhs-dilation transpose rule. Measured on the real v5e flagship train
    step (tools/ab_conv_dx_train.py, 2026-08-19): stock 9.10 ms/step,
    per-shape heuristic mix 9.38, subpel everywhere 10.68 — the subpel
    cotangent convs don't fuse into the backward the way the stock rule
    does, the same integrated-vs-isolated inversion as the eval-side
    pallas/s2d hooks (DESIGN.md). Default is therefore the stock rule;
    NIC_CONV_DX=subpel forces the custom rule where legal, NIC_CONV_DX=auto
    applies the per-shape eval heuristic (both read at trace time)."""
    k = kernel.shape[0]
    h, w = x.shape[1], x.shape[2]
    if (stride == 2 and k == 2 * padding + 1
            and isinstance(h, int) and isinstance(w, int)
            and h % 2 == 0 and w % 2 == 0):
        import os
        force = os.environ.get("NIC_CONV_DX")
        if force == "subpel":
            use_custom = True
        elif force == "auto":
            # the cotangent has the OUTPUT's grid and cin output-channels
            use_custom = _deconv_lowering_auto(
                x.shape[0], h // 2, w // 2, x.shape[-1]) == "subpel"
        else:
            use_custom = False
        if use_custom:
            out = _conv2d_subpel_dx(x, kernel, stride, padding)
            if bias is not None:
                out = out + bias
            return out
    import os
    dw = os.environ.get("NIC_CONV_DW")
    if dw == "patches" or (dw == "auto" and kernel.shape[2] <= 16):
        # patches-GEMM kernel-grad (see _conv2d_patches_dw); read at trace
        # time like NIC_CONV_DX
        out = _conv2d_patches_dw(x, kernel, stride, padding)
        if bias is not None:
            out = out + bias
        return out
    out = _conv2d_raw(x, kernel, stride, padding)
    if bias is not None:
        out = out + bias
    return out


def deconv2d(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None,
             stride: int = 2, padding: int = 0, output_padding: int = 0) -> jax.Array:
    """Fractionally-strided conv with torch ConvTranspose2d geometry.

    Implemented as input-dilated conv: pad the s-dilated input by
    (k-1-p, k-1-p+op) per spatial dim and run a stride-1 VALID conv. The
    kernel here convolves directly (it is trained in this orientation); to
    import torch ConvTranspose2d weights, flip them spatially and swap I/O.
    """
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMENSION_NUMBERS,
    )
    if bias is not None:
        out = out + bias
    return out


def deconv2d_phased(x: jax.Array, kernel: jax.Array,
                    bias: Optional[jax.Array] = None,
                    padding: int = 0, output_padding: int = 1) -> jax.Array:
    """Stride-2 transposed conv as 4 phase convs + interleave.

    Mathematically identical to deconv2d(..., stride=2) (the zero-dilated
    input only hits kernel taps of matching parity), but expressed as dense
    convs — an alternative lowering to XLA's lhs_dilation path for A/B
    benchmarking on TPU. Requires output_padding == 1 (the only stride-2
    geometry the models use).
    """
    assert output_padding == 1, "phased deconv implemented for op=1 only"
    k = kernel.shape[0]
    lo = k - 1 - padding

    def phase_taps(a: int):
        r_sel = [r for r in range(k) if r % 2 == (lo - a) % 2]
        offs = [(a + r - lo) // 2 for r in r_sel]
        pad_lo = -offs[0]
        pad_hi = len(r_sel) - 1 - pad_lo
        return r_sel, (pad_lo, pad_hi)

    phases = {}
    for a in (0, 1):
        rs, rpad = phase_taps(a)
        for b in (0, 1):
            cs, cpad = phase_taps(b)
            ker = kernel[jnp.asarray(rs)][:, jnp.asarray(cs)]
            phases[(a, b)] = jax.lax.conv_general_dilated(
                x, ker, (1, 1), (rpad, cpad),
                dimension_numbers=_DIMENSION_NUMBERS)

    bsz, h, w, c = phases[(0, 0)].shape
    row0 = jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3).reshape(bsz, h, 2 * w, c)
    row1 = jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3).reshape(bsz, h, 2 * w, c)
    out = jnp.stack([row0, row1], axis=2).reshape(bsz, 2 * h, 2 * w, c)
    if bias is not None:
        out = out + bias
    return out


def deconv2d_subpel(x: jax.Array, kernel: jax.Array,
                    bias: Optional[jax.Array] = None,
                    padding: int = 0, output_padding: int = 1) -> jax.Array:
    """Stride-2 transposed conv as ONE dense conv + phase interleave.

    Mathematically identical to deconv2d(stride=2) — output pixel (2i+a,
    2j+b) only reads kernel taps of parity (a, b) — but lowered as a single
    stride-1 conv producing all 4 phases as 4*cout channels, then a
    pixel-shuffle-style interleave. For small cout (e.g. the final M->3 RGB
    layer) this quarters the padded MXU work AND 4x's output-lane
    utilization vs the lhs_dilation form: measured 17.9 -> ~4 ms on the
    flagship's last decoder layer (tools/ab_bench notes). Requires
    output_padding == 1 (the only stride-2 geometry the models use).
    """
    assert output_padding == 1, "subpel deconv implemented for op=1 only"
    k = kernel.shape[0]
    assert k == 2 * padding + 1, (
        "subpel lowering emits exactly 2h x 2w, which equals the torch "
        f"transposed-conv geometry only when k == 2p+1 (got k={k}, "
        f"p={padding}); use the dilated lowering")
    cin, cout = kernel.shape[2], kernel.shape[3]
    lo = k - 1 - padding

    def phase_taps(a: int):
        r_sel = [r for r in range(k) if r % 2 == (lo - a) % 2]
        offs = [(a + r - lo) // 2 for r in r_sel]
        return r_sel, offs

    # global tap-offset range across phases -> one shared conv geometry
    all_offs = sorted({o for a in (0, 1) for o in phase_taps(a)[1]})
    o_min, o_max = all_offs[0], all_offs[-1]
    kc = o_max - o_min + 1
    combined = jnp.zeros((kc, kc, cin, 4 * cout), kernel.dtype)
    for a in (0, 1):
        r_sel, r_offs = phase_taps(a)
        for b in (0, 1):
            c_sel, c_offs = phase_taps(b)
            ph = (a * 2 + b) * cout
            for r, ro in zip(r_sel, r_offs):
                for c, co in zip(c_sel, c_offs):
                    combined = combined.at[ro - o_min, co - o_min, :,
                                           ph:ph + cout].set(kernel[r, c])
    out = jax.lax.conv_general_dilated(
        x, combined, (1, 1), ((-o_min, o_max), (-o_min, o_max)),
        dimension_numbers=_DIMENSION_NUMBERS)
    b_, h, w, _ = out.shape
    out = out.reshape(b_, h, w, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias
    return out


class Conv2d(nn.Module):
    """Conv with torch-default init; NHWC in/out."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init, (k, k, in_ch, self.features))
        bias = (self.param("bias", torch_bias_init(k * k * in_ch), (self.features,))
                if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        return conv2d(x, kernel, bias, self.stride, self.padding)


def _deconv_lowering_auto(batch: int, in_h: int, in_w: int, cout: int,
                          training: bool = False) -> str:
    """Pick the faster stride-2 deconv lowering (v5e A/B at batch 48 and
    batch 1, tools notes): the subpel form wins on tiny output channels at
    ANY batch (4x the MXU lane utilization — the final M->3 RGB layer:
    14.9 -> 8.9 ms at batch 48, 1.6 -> 0.9 ms at batch 1) and on small
    grids when the batch supplies enough rows to tile (10.8 -> 3.8 ms at
    48x(32x48)); at batch 1 everything is dispatch-bound and the dilated
    form's simpler graph wins elsewhere.

    Under autodiff the economics invert: the subpel form's backward pays
    for the scatter-assembled combined kernel (gather-grads) and the
    interleave transpose over the layer's largest tensor, and the flagship
    train step measures all-dilated fastest (tools/ab_deconv_train.py,
    batch 16 @256^2: dilated 9.15 ms/step, eval-auto mix 9.89, all-subpel
    11.02) — so training programs always take the dilated form."""
    import os

    force = os.environ.get("NIC_DECONV_LOWERING")
    if force in ("subpel", "dilated"):
        # benchmark hook (tools/ab_deconv_*): force one lowering globally.
        # Read at TRACE time — set it before the jit builds a program.
        return force
    if training:
        return "dilated"
    if cout < 32:
        return "subpel"
    if not isinstance(batch, int):
        # symbolic batch (jax.export shape polymorphism): comparing the dim
        # is inconclusive, so skip the batch-gated tiling rule and take the
        # lowering that is safe at any batch (the two are math-identical)
        return "dilated"
    if batch >= 8 and in_h * in_w <= 2048:
        return "subpel"
    if (cout % 128 != 0 and batch >= 8 and in_h * in_w >= 4096
            and os.environ.get("NIC_DECONV_CHANNEL_AWARE") == "1"):
        # Lane-unaligned cout (e.g. M=192 = 1.5 MXU tiles): ISOLATED, the
        # dilated form wastes the partial lane tile on every output pixel
        # and the subpel form's 4*cout phase channels re-align the lanes
        # (tools/ab_deconv_m192.py: c=160/192 subpel wins all grids
        # >= 64x96 at batch >= 8; c=192 @128x192 b48: 20.8 vs 23.9 ms).
        # IN-MODEL the win does not survive: bench M=192 alternating A/B
        # (3 reps each) measures 296.3 img/s with this rule vs 302.4
        # without (+-0.02 run variance) — the interleave transpose breaks
        # XLA's deconv+IGDN fusion. Same lesson as the pallas and
        # custom-dx probes; opt-in only.
        return "subpel"
    return "dilated"


class Deconv2d(nn.Module):
    """Transposed conv (torch geometry) with torch-default init; NHWC in/out.

    lowering: 'dilated' (lhs_dilation), 'subpel' (phase-combined conv +
    interleave, stride-2/op-1 only), or None = auto per shape. All
    lowerings are mathematically identical.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    lowering: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        # torch ConvTranspose2d init: BOTH kernel and bias bounds use
        # fan_in = k*k*out_ch (weight.size(1) of its (in,out,kh,kw) layout)
        kernel = self.param("kernel", torch_deconv_kernel_init,
                            (k, k, in_ch, self.features))
        bias = (self.param("bias", torch_bias_init(k * k * self.features), (self.features,))
                if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        if self.lowering not in (None, "subpel", "dilated"):
            raise ValueError(f"unknown deconv lowering {self.lowering!r} "
                             "(expected 'subpel' or 'dilated')")
        subpel_ok = (self.stride == 2 and self.output_padding == 1
                     and k == 2 * self.padding + 1)
        lowering = self.lowering
        if lowering == "subpel" and not subpel_ok:
            # an explicit request the geometry can't honor must not silently
            # benchmark/run the other lowering
            raise ValueError(
                "lowering='subpel' requires stride=2, output_padding=1 and "
                f"kernel_size == 2*padding+1 (got k={k}, s={self.stride}, "
                f"p={self.padding}, op={self.output_padding})")
        if lowering is None and subpel_ok:
            lowering = _deconv_lowering_auto(x.shape[0], x.shape[1],
                                            x.shape[2], self.features,
                                            training)
        if lowering == "subpel":
            return deconv2d_subpel(x, kernel, bias, self.padding, 1)
        return deconv2d(x, kernel, bias, self.stride, self.padding, self.output_padding)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel shuffle: (B,H,W,C*r^2) -> (B,H*r,W*r,C)."""
    b, h, w, c = x.shape
    r = factor
    oc = c // (r * r)
    # channel index decomposes as c_out * r^2 + i * r + j (torch convention)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, oc)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsampler (capability parity: Layers.py:6-16)."""

    features: int
    upsample: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv2d(self.features * self.upsample ** 2, 3, 1, 1, dtype=self.dtype)(x)
        return pixel_shuffle(x, self.upsample)


class TransposedDeconv3x3(nn.Module):
    """3x3 transposed-conv upsampler (Layers.py:18-24): k=3, p=1, op=s-1."""

    features: int
    upsample: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        return Deconv2d(self.features, 3, stride=self.upsample, padding=1,
                        output_padding=self.upsample - 1,
                        dtype=self.dtype)(x, training)
