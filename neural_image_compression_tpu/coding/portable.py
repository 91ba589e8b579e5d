"""Portable (cross-machine) bitstream mode for the joint-AR codec.

The default codec derives entropy parameters through float GEMMs whose
results are only bit-stable per build (`ar_wavefront.cc` top comment) —
streams can't cross machines. This module closes that gap with a fully
INTEGER parameter path: every operation between the decoded integer latents
and the rANS frequency tables is fixed-point arithmetic with defined
rounding, so any two correct implementations (numpy here, C++ in
`ar_portable.cc`, any future port) produce bit-identical streams on any
hardware.

The deterministic artifact is a **PortableCard**, built ONCE per model (the
only place floats appear) and shipped alongside the weights:

  * int16-quantized network weights + per-layer shifts for the hyper-decoder
    (z_q -> psi), the masked-context conv, and the entropy-parameters MLP;
  * per-sigma-bin integer Gaussian CDF tables on a 1/64 sub-grid, with raw
    (pre-softplus) bin thresholds so sigma binning is an integer compare;
  * an integer exp LUT for the K>1 mixture softmax;
  * frozen z CDF tables (the default path rebuilds them on-device per run,
    which is float and machine-dependent);
  * a content hash, stamped into every portable bitstream so a mismatched
    card fails fast instead of desynchronizing.

Fixed-point conventions (the cross-implementation spec):

  * activations: F=12 fractional bits, stored int32-range (int64 math);
  * weights: per-layer int16 with shift sw; accumulate int64; requantize
    with rshift_round (round-half-up, arithmetic shift);
  * leaky-ReLU negative slope = 41/4096 (~0.0100098);
  * mu on a 1/64 sub-grid; sigma snapped to 112 geometric bins spanning
    [2^-8, 2^6]; mixture weights 16-bit after LUT softmax;
  * per-symbol alphabet: center c, span R, escape symbol last — same
    structure as the float coder (rans_core.h build_gaussian_model), but
    every count derives from integer table lookups; total mass is exactly
    2^32 (weights sum to 2^16, tables span 2^16), so frequency quantization
    is a pure integer shift.

Rate cost vs the float path comes from parameter quantization (int16
weights, sigma bins ±4.5%, mu 1/64) — measured low single-digit % (see
tests). The default per-build path remains the fast/tight one; portable
mode is for streams that must decode elsewhere.
"""

import hashlib
import math
import os
import struct
from typing import List, Tuple

import numpy as np

F_BITS = 12                 # activation fractional bits
SUB_BITS = 6                # mu sub-grid: 1/64
PROB_BITS = 16
PROB_SCALE = 1 << PROB_BITS
W_SCALE = 1 << 16           # mixture weight fixed-point scale
LEAKY_NUM = 41              # leaky slope = 41 / 4096
N_SIGMA_BINS = 112
SIGMA_LOG2_MIN = -8.0
SIGMA_LOG2_MAX = 6.0
EXP_LUT_SIZE = 2048         # exp(-i/128), i in [0, 2048)
EXP_LUT_SHIFT = 5           # F=12 -> 1/128 steps
RANS_L = 1 << 23
Y_ABS_MAX = 1 << 24         # spec bound on coded latent magnitude. Keeps
# the int64 context-GEMM accumulators exact in the worst case
# (2^24 * 2^F * 2^15 * 12M < 2^63 for M <= M_MAX) while leaving the giant-
# latent scalar-fallback path usable; an adversarial escape near +-2^31
# would otherwise overflow (UB in C++). Encode validates inputs, decode
# rejects the stream — identically in numpy and C++ (kYAbsMax). Streams
# with escapes beyond this bound were never correctly decodable (their
# context GEMMs already overflowed), so rejecting them needs no
# _CARD_VERSION bump — it formalizes the previously-UB region.
M_MAX = 330                 # with Y_ABS_MAX: 12*M*2^51 < 2^63 requires M<=341
PORT_R_MIN = 32             # minimum symbol-window half-span (card v2).
# Same rationale as rans_core.h kRMinWindow: converged models are routinely
# overconfident (tiny predicted sigma, mu off by several integers), and the
# 6-sigma window then forces 32-bit raw escapes on exactly the symbols the
# model mispredicts. A wide floor turns those into in-window symbols priced
# by the freq>=1 leak at <= 16 bits (34-45% measured rate cut on converged
# models). Per-bin CDF tables are NOT widened: edges beyond a table's
# extent clamp to its endpoints, which is exact saturation. Mirrored in
# ar_portable.cc (kPortRMin).

_CARD_VERSION = 2           # v2: PORT_R_MIN window floor (streams/cards
# from v1 code are incompatible; loading a v1 card raises)


def rshift_round(v, s: int):
    """Round-half-up arithmetic right shift (numpy int64 or python int)."""
    if s <= 0:
        return v << (-s)
    return (v + (1 << (s - 1))) >> s


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------

class QuantLayer:
    """One GEMM/conv layer: int16 weights at scale 2^sw, int64 bias at the
    accumulator scale (F_BITS + sw). Requantizing the int64 accumulator by
    rshift_round(acc, sw) returns to F_BITS."""

    def __init__(self, wq: np.ndarray, bq: np.ndarray, sw: int):
        self.wq = wq
        self.bq = bq
        self.sw = sw

    @classmethod
    def quantize(cls, w: np.ndarray, b: np.ndarray) -> "QuantLayer":
        mx = float(np.abs(w).max()) if w.size else 0.0
        sw = 15 if mx == 0 else int(math.floor(math.log2(32767.0 / mx)))
        sw = max(0, min(24, sw))
        wq = np.round(np.asarray(w, np.float64) * (1 << sw)).astype(np.int64)
        assert np.abs(wq).max(initial=0) <= 32767, "weight quantization overflow"
        bq = np.round(np.asarray(b, np.float64)
                      * (1 << (F_BITS + sw))).astype(np.int64)
        return cls(wq.astype(np.int16), bq, sw)


def _imatmul(a: np.ndarray, w: np.ndarray) -> np.ndarray:
    """EXACT integer matmul (n, k) @ (k, m) -> int64.

    Fast path: run float64 BLAS directly — every partial product
    (<= amax * 32767) and every partial sum (<= k * amax * 32767) is an
    integer, and when that bound stays below 2^53 each is exactly
    representable in float64, so dgemm is bit-identical to int64 arithmetic
    regardless of accumulation order (measured ~40x the numpy int64 matmul).
    Falls back to int64 when the bound can't guarantee exactness."""
    k = a.shape[-1]
    if a.size and float(np.abs(a).max()) * 32767.0 * k < 2.0 ** 53:
        return (a.astype(np.float64) @ w.astype(np.float64)).astype(np.int64)
    return a.astype(np.int64) @ w.astype(np.int64)


def _gemm(acts: np.ndarray, layer: QuantLayer) -> np.ndarray:
    """(n, k) int64 acts @ (k, m) weights + bias -> int64 accumulator."""
    return _imatmul(acts, layer.wq) + layer.bq


def _requant(acc: np.ndarray, layer: QuantLayer) -> np.ndarray:
    return rshift_round(acc, layer.sw)


def _lrelu(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x, rshift_round(x * LEAKY_NUM, F_BITS))


# ---------------------------------------------------------------------------
# Integer convolution (hyper-decoder)
# ---------------------------------------------------------------------------

def _int_conv2d(x: np.ndarray, layer: QuantLayer, stride: int,
                padding: int) -> np.ndarray:
    """x: (H, W, Cin) int64 F_BITS -> (H', W', Cout) int64 F_BITS."""
    kh, kw = layer.wq.shape[:2]
    xp = np.pad(x, ((padding, padding), (padding, padding), (0, 0)))
    oh = (xp.shape[0] - kh) // stride + 1
    ow = (xp.shape[1] - kw) // stride + 1
    acc = np.broadcast_to(layer.bq, (oh, ow, layer.bq.shape[0])).copy()
    for r in range(kh):
        for c in range(kw):
            patch = xp[r:r + oh * stride:stride, c:c + ow * stride:stride, :]
            acc += _imatmul(patch, layer.wq[r, c])
    return rshift_round(acc, layer.sw)


def _int_deconv2d(x: np.ndarray, layer: QuantLayer, stride: int, padding: int,
                  output_padding: int) -> np.ndarray:
    """Transposed conv, same geometry as ops/conv.py deconv2d (dilate input,
    pad (k-1-p, k-1-p+op), stride-1 VALID conv with the direct kernel) — but
    computed subpixel-style: per tap, only the output rows/cols whose dilated
    index lands on a real input sample are touched, skipping the all-zero
    dilated taps. Dropped terms are exactly zero, so the int64 sums are
    bit-identical to the dilated form at 1/stride^2 the GEMM work."""
    kh, kw = layer.wq.shape[:2]
    h, w, _ = x.shape
    hd, wd = (h - 1) * stride + 1, (w - 1) * stride + 1
    lo_r = kh - 1 - padding
    lo_c = kw - 1 - padding  # per-axis pads so non-square kernels stay exact
    oh = hd + 2 * lo_r + output_padding - kh + 1
    ow = wd + 2 * lo_c + output_padding - kw + 1
    acc = np.broadcast_to(layer.bq, (oh, ow, layer.bq.shape[0])).copy()

    def _span(tap: int, lo: int, out_len: int, in_len: int):
        # output indices oi >= 0 with dilated index d = oi + tap - lo in
        # [0, (in_len-1)*stride] and d % stride == 0 -> input index d//stride
        o0, i0 = lo - tap, 0
        while o0 < 0:
            o0 += stride
            i0 += 1
        if o0 >= out_len or i0 >= in_len:
            return None
        n = min((out_len - 1 - o0) // stride, in_len - 1 - i0) + 1
        return o0, i0, n

    for r in range(kh):
        rs = _span(r, lo_r, oh, h)
        if rs is None:
            continue
        oi0, ii0, nr = rs
        for c in range(kw):
            cs = _span(c, lo_c, ow, w)
            if cs is None:
                continue
            oj0, jj0, nc = cs
            acc[oi0:oi0 + nr * stride:stride,
                oj0:oj0 + nc * stride:stride] += _imatmul(
                    x[ii0:ii0 + nr, jj0:jj0 + nc, :], layer.wq[r, c])
    return rshift_round(acc, layer.sw)


# ---------------------------------------------------------------------------
# The card
# ---------------------------------------------------------------------------

def _inv_softplus(y: float) -> float:
    """x with softplus(x) = y, for y > 0."""
    if y > 30.0:
        return y
    return math.log(math.expm1(y))


def _integer_tables():
    """Model-independent integer Gaussian machinery shared by every card:
    (sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables, exp_lut) — the
    geometric sigma bins with raw-domain thresholds, the per-bin CDF tables
    on the 1/64 sub-grid, and the mixture-softmax exp LUT."""
    log2_step = (SIGMA_LOG2_MAX - SIGMA_LOG2_MIN) / (N_SIGMA_BINS - 1)
    sigmas = 2.0 ** (SIGMA_LOG2_MIN + log2_step * np.arange(N_SIGMA_BINS))
    edges = np.sqrt(sigmas[:-1] * sigmas[1:])
    thr = np.array([_inv_softplus(max(e - 1e-6, 1e-12)) for e in edges])
    sigma_thr = np.round(thr * (1 << F_BITS)).astype(np.int64)
    sigma_fix = np.round(sigmas * (1 << F_BITS)).astype(np.int64)
    sigma2_fix = np.round(sigmas ** 2 * (1 << (2 * F_BITS))).astype(np.int64)
    sigma_R = np.clip(np.ceil(6.0 * sigmas) + 2, 2, 254).astype(np.int64)

    try:
        from scipy.special import ndtr as _ndtr
    except ImportError:  # pragma: no cover
        _vec_erf = np.vectorize(math.erf)

        def _ndtr(x):
            return 0.5 * (1.0 + _vec_erf(x / math.sqrt(2.0)))
    tables = []
    for j in range(N_SIGMA_BINS):
        ext = int((sigma_R[j] + 2) << SUB_BITS) + 64
        arg = (np.arange(-ext, ext + 1, dtype=np.float64)
               / (1 << SUB_BITS)) / sigmas[j]
        tables.append(np.clip(np.round(_ndtr(arg) * PROB_SCALE),
                              0, PROB_SCALE).astype(np.int32))

    exp_lut = np.round(np.exp(-np.arange(EXP_LUT_SIZE) / 128.0)
                       * W_SCALE).astype(np.int64)
    return sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables, exp_lut


def _hyper_layers(model, p) -> List[Tuple[str, "QuantLayer", Tuple]]:
    """The model's hyper-decoder as a quantized integer layer list (float
    kernels in our direct-conv HWIO orientation, straight from the flax
    params), geometry tuples per _int_conv2d/_int_deconv2d."""
    hd = p["hyper_decoder"]
    transform = getattr(model, "transform", "conv5x5")
    if transform == "conv5x5":
        seq = [("deconv", hd["Deconv2d_0"], (2, 2, 1)),
               ("deconv", hd["Deconv2d_1"], (2, 2, 1)),
               ("conv", hd["Conv2d_0"], (1, 1))]
    elif transform == "res3x3":
        seq = [("conv", hd["Conv2d_0"], (1, 1)),
               ("deconv", hd["TransposedDeconv3x3_0"]["Deconv2d_0"], (2, 1, 1)),
               ("conv", hd["Conv2d_1"], (1, 1)),
               ("deconv", hd["TransposedDeconv3x3_1"]["Deconv2d_0"], (2, 1, 1)),
               ("conv", hd["Conv2d_2"], (1, 1))]
    else:
        raise ValueError(f"unsupported transform {transform}")
    return [(kind, QuantLayer.quantize(np.asarray(sub["kernel"]),
                                       np.asarray(sub["bias"])), geom)
            for kind, sub, geom in seq]


def _quantize_ep1_split(w1: np.ndarray, b1: np.ndarray, phi_dim: int):
    """Quantize the EP layer-1 weight split at row phi_dim into the phi
    (context) and psi halves with a SHARED shift: the two accumulators add
    at the same scale (a context-free split has an empty phi half — its sw
    must not drag the psi scale down). The layer-1 bias lives in the psi
    half."""
    ep1_phi = QuantLayer.quantize(w1[:phi_dim], np.zeros(w1.shape[1]))
    ep1_psi = QuantLayer.quantize(w1[phi_dim:], b1)
    sw = min(ep1_phi.sw, ep1_psi.sw) if phi_dim else ep1_psi.sw
    for lay, half, bias in ((ep1_phi, w1[:phi_dim], np.zeros(w1.shape[1])),
                            (ep1_psi, w1[phi_dim:], b1)):
        lay.sw = sw
        lay.wq = np.round(np.asarray(half, np.float64)
                          * (1 << sw)).astype(np.int16)
        lay.bq = np.round(np.asarray(bias, np.float64)
                          * (1 << (F_BITS + sw))).astype(np.int64)
    return ep1_phi, ep1_psi


class PortableCard:
    """Deterministic codec artifact for one (model, variables) pair.

    Build once with PortableCard.build(); serialize with save()/load().
    All coding-path state here is integer; the hash covers every array, so
    encoder and decoder can verify they hold the identical card.
    """

    def __init__(self, M: int, K: int, hyper: List[Tuple[str, QuantLayer, Tuple]],
                 ctx: QuantLayer, ep1_phi: QuantLayer, ep1_psi: QuantLayer,
                 ep2: QuantLayer, ep3: QuantLayer,
                 sigma_thr: np.ndarray, sigma_fix: np.ndarray,
                 sigma2_fix: np.ndarray, sigma_R: np.ndarray,
                 tables: List[np.ndarray], exp_lut: np.ndarray,
                 z_cdfs: np.ndarray, z_offsets: np.ndarray,
                 z_sizes: np.ndarray, zmin: int, zmax: int,
                 family: int = 0):
        # Validate here so build(), load(), and _from_mapping() all reject
        # out-of-spec cards identically for the numpy AND native paths (the
        # native coder sizes fixed buffers from these: K<=16 mixture scratch,
        # 2*254+2 symbol-model edges).
        if not (1 <= K <= 16):
            raise ValueError(f"portable cards support 1 <= K <= 16, got {K}")
        if not (1 <= M <= M_MAX):
            raise ValueError(
                f"portable cards support 1 <= M <= {M_MAX} (the Y_ABS_MAX "
                f"context-GEMM exactness bound), got {M}")
        if sigma_R.size and not (0 <= int(sigma_R.min())
                                 and int(sigma_R.max()) <= 254):
            raise ValueError("corrupt card: sigma_R outside [0, 254]")
        if family not in (0, 1, 2):
            raise ValueError(f"unknown card family {family}")
        self.M = M
        self.K = K
        self.family = family        # 0 = wavefront (causal ctx),
                                    # 1 = checkerboard, 2 = hyperprior (no ctx)
        self.hyper = hyper          # [(kind, layer, geometry), ...]
        self.ctx = ctx
        self.ep1_phi = ep1_phi
        self.ep1_psi = ep1_psi      # bias of ep layer 1 lives here
        self.ep2 = ep2
        self.ep3 = ep3
        self.sigma_thr = sigma_thr  # (NB-1,) int64, raw-domain thresholds, F_BITS
        self.sigma_fix = sigma_fix  # (NB,) int64, sigma at F_BITS
        self.sigma2_fix = sigma2_fix  # (NB,) int64, sigma^2 at 2*F_BITS
        self.sigma_R = sigma_R      # (NB,) int64, per-bin span
        self.tables = tables        # per bin: (len,) int32 CDF, arg64 centered
        self.exp_lut = exp_lut      # (EXP_LUT_SIZE,) int64, 2^16 scale
        self.z_cdfs = z_cdfs
        self.z_offsets = z_offsets
        self.z_sizes = z_sizes
        self.zmin = zmin
        self.zmax = zmax
        self.hash = self._compute_hash()

    # -- hashing / serialization ---------------------------------------
    def _arrays(self) -> List[Tuple[str, np.ndarray]]:
        out = [("meta", np.array([_CARD_VERSION, self.M, self.K,
                                  self.zmin, self.zmax, self.family],
                                 np.int64))]
        for i, (kind, layer, geom) in enumerate(self.hyper):
            out.append((f"hyper{i}_w", layer.wq))
            out.append((f"hyper{i}_b", layer.bq))
            out.append((f"hyper{i}_g", np.array(
                [{"conv": 0, "deconv": 1}[kind], layer.sw, *geom], np.int64)))
        for name in ("ctx", "ep1_phi", "ep1_psi", "ep2", "ep3"):
            layer = getattr(self, name)
            out.append((f"{name}_w", layer.wq))
            out.append((f"{name}_b", layer.bq))
            out.append((f"{name}_s", np.array([layer.sw], np.int64)))
        out += [("sigma_thr", self.sigma_thr), ("sigma_fix", self.sigma_fix),
                ("sigma2_fix", self.sigma2_fix), ("sigma_R", self.sigma_R),
                ("exp_lut", self.exp_lut), ("z_cdfs", self.z_cdfs),
                ("z_offsets", self.z_offsets), ("z_sizes", self.z_sizes)]
        for j, t in enumerate(self.tables):
            out.append((f"table{j}", t))
        return out

    def _compute_hash(self) -> bytes:
        h = hashlib.sha256()
        for name, arr in self._arrays():
            h.update(name.encode())
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(np.ascontiguousarray(arr).tobytes())
        return h.digest()[:8]

    def save(self, path: str) -> None:
        np.savez_compressed(path, **dict(self._arrays()))

    @classmethod
    def load(cls, path: str) -> "PortableCard":
        return cls._from_mapping(np.load(path))

    @classmethod
    def _from_mapping(cls, d) -> "PortableCard":
        """Rebuild from any mapping with `in` + `[]` over the _arrays() keys
        (an NpzFile, or a prefix-stripped dict — see load_scalable_cards)."""
        meta = d["meta"]
        version, M, K, zmin, zmax = (int(v) for v in meta[:5])
        family = int(meta[5]) if len(meta) > 5 else 0
        if version != _CARD_VERSION:
            raise ValueError(f"unsupported card version {version}")
        hyper = []
        i = 0
        while f"hyper{i}_w" in d:
            g = d[f"hyper{i}_g"]
            kind = "conv" if g[0] == 0 else "deconv"
            layer = QuantLayer(d[f"hyper{i}_w"], d[f"hyper{i}_b"], int(g[1]))
            hyper.append((kind, layer, tuple(int(v) for v in g[2:])))
            i += 1
        layers = {}
        for name in ("ctx", "ep1_phi", "ep1_psi", "ep2", "ep3"):
            layers[name] = QuantLayer(d[f"{name}_w"], d[f"{name}_b"],
                                      int(d[f"{name}_s"][0]))
        tables = []
        j = 0
        while f"table{j}" in d:
            tables.append(d[f"table{j}"])
            j += 1
        return cls(M, K, hyper, layers["ctx"], layers["ep1_phi"],
                   layers["ep1_psi"], layers["ep2"], layers["ep3"],
                   d["sigma_thr"], d["sigma_fix"], d["sigma2_fix"],
                   d["sigma_R"], tables, d["exp_lut"], d["z_cdfs"],
                   d["z_offsets"], d["z_sizes"], zmin, zmax, family)

    # -- build ----------------------------------------------------------
    @classmethod
    def build(cls, model, variables, zmin: int = -64, zmax: int = 64,
              ctx_name: str = "context_model",
              ep_name: str = "entropy_parameters",
              M: int = None, K: int = None,
              family: str = "wavefront") -> "PortableCard":
        """Quantize the model's coding-path weights and precompute all
        integer tables. The only float computation in portable mode.

        ctx_name/ep_name/M select which context + entropy-parameter pair the
        card covers — the scalable model builds one card per latent layer
        (context_model_1/entropy_parameters_1 with M=M1, etc.), each
        carrying the shared hyper-decoder and z tables.

        family: 'wavefront' quantizes the causal masked-conv context (the
        12 CTX_POSITIONS taps); 'checkerboard' quantizes the checkerboard
        model's plain 5x5 context conv restricted to its 12 live
        (odd-parity) taps, CB_CTX_POSITIONS order — the integer GEMM stack
        downstream is identical for both. 'hyperprior' has NO context at
        all (models/hyperprior.py): the EP layer-1 weight consumes psi
        alone (2M input lanes), so the card carries an empty ctx/ep1_phi
        and every position's parameters come from params_from_acc."""
        from neural_image_compression_tpu.coding.cdf_tables import factorized_tables
        from neural_image_compression_tpu.coding.codec import _HostParamNets

        fam = {"wavefront": 0, "checkerboard": 1, "hyperprior": 2}[family]
        p = variables["params"]
        M = model.latent_channels if M is None else M
        K = model.K if K is None else K
        if fam == 2:
            nets = _HostParamNets.ep_only(p[ep_name], M, K)
        elif fam == 1:
            from neural_image_compression_tpu.models.checkerboard import (
                CB_CTX_POSITIONS,
            )

            conv = p[ctx_name]["Conv2d_0"]
            # _HostParamNets handles the EP extraction + the K>1 coder-layout
            # column permutation; its causal ctx_w is discarded in favor of
            # the checkerboard tap set below (the synthetic MaskedConv2d_0
            # key only satisfies its constructor)
            nets = _HostParamNets({"MaskedConv2d_0": conv}, p[ep_name], M, K)
            kernel = np.asarray(conv["kernel"])          # (5, 5, M, 2M)
            nets.ctx_w = np.concatenate(
                [kernel[r, c] for (r, c) in CB_CTX_POSITIONS], axis=0)
            nets.ctx_bias = np.asarray(conv["bias"])
        else:
            nets = _HostParamNets(p[ctx_name], p[ep_name], M, K)

        hyper = _hyper_layers(model, p)

        ctx = QuantLayer.quantize(nets.ctx_w, nets.ctx_bias)
        (w1, b1), (w2, b2), (w3, b3) = nets.ep
        ep1_phi, ep1_psi = _quantize_ep1_split(w1, b1, nets.ctx_w.shape[1])
        ep2 = QuantLayer.quantize(w2, b2)
        ep3 = QuantLayer.quantize(w3, b3)

        (sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables,
         exp_lut) = _integer_tables()

        z_cdfs, z_offsets, z_sizes = factorized_tables(model, variables,
                                                       zmin, zmax)
        return cls(M, K, hyper, ctx, ep1_phi, ep1_psi, ep2, ep3,
                   sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables,
                   exp_lut, z_cdfs.astype(np.uint32),
                   np.asarray(z_offsets, np.int32),
                   np.asarray(z_sizes, np.int32), zmin, zmax, fam)

    # -- integer forward passes ----------------------------------------
    def hyper_forward(self, z_q: np.ndarray,
                      native: bool = None) -> np.ndarray:
        """z_q: (hz, wz, M) integer-valued -> psi (h, w, 2M) int64 F_BITS.

        Exact integer on both paths (same sums, order-free), so native (C++)
        and numpy results are identical; native defaults to the
        NIC_DISABLE_NATIVE_AR convention."""
        if native is None:
            native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
        if native:
            return _native_coder(self).hyper(np.asarray(z_q))
        x = (np.asarray(z_q).astype(np.int64)) << F_BITS
        for i, (kind, layer, geom) in enumerate(self.hyper):
            if kind == "conv":
                x = _int_conv2d(x, layer, *geom)
            else:
                x = _int_deconv2d(x, layer, *geom)
            if i < len(self.hyper) - 1:
                x = _lrelu(x)
        return x

    def psi_precompute(self, psi_fix: np.ndarray,
                       native: bool = None) -> np.ndarray:
        """(h, w, 2M) psi -> (h*w, hidden) int64 accumulators (layer-1 psi
        half + bias, NOT yet requantized). Exact integer on both paths, so
        native (C++) and numpy results are identical; native defaults to
        the NIC_DISABLE_NATIVE_AR convention."""
        flat = psi_fix.reshape(-1, psi_fix.shape[-1])
        if native is None:
            native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
        if native:
            return _native_coder(self).psi(flat)
        return _gemm(flat, self.ep1_psi)

    def wave_params(self, gathered: np.ndarray, p_acc: np.ndarray):
        """gathered: (n, 12M) int64 latent context (F_BITS); p_acc: (n, hidden)
        layer-1 psi accumulators. Returns raw h3 (n, out_dim) int64 F_BITS,
        in the model's (kind, k, m) column order."""
        phi = _requant(_gemm(gathered, self.ctx), self.ctx)
        return self.params_from_acc(_imatmul(phi, self.ep1_phi.wq) + p_acc)

    def params_from_acc(self, acc1: np.ndarray):
        """Layer-1 accumulators -> raw h3. The checkerboard ANCHOR pass
        calls this directly with acc1 = p_acc: its context is defined to be
        exactly zero, and a zero phi contributes nothing to the exact
        integer accumulator, so skipping the ctx/ep1 GEMMs is bit-identical
        to running them on zeros."""
        h = _lrelu(rshift_round(acc1, self.ep1_phi.sw))
        h = _lrelu(_requant(_gemm(h, self.ep2), self.ep2))
        return _requant(_gemm(h, self.ep3), self.ep3)

    def channel_models(self, h3_row: np.ndarray):
        """One pixel's raw EP output -> per-channel symbol-model inputs.

        Returns (mu_fix (M, K), bins (M, K), wfix (M, K)) int64 — mixture
        weights already fixed-point (2^16, summing exactly)."""
        M, K = self.M, self.K
        if K == 1:
            mu = h3_row[:M].reshape(M, 1)
            sraw = h3_row[M:].reshape(M, 1)
            bins = np.searchsorted(self.sigma_thr, sraw.reshape(-1),
                                   side="right").reshape(M, 1)
            wfix = np.full((M, 1), W_SCALE, np.int64)
            return mu, bins.astype(np.int64), wfix
        MK = M * K
        # coder layout (kind, m, k) — _HostParamNets permutes the final
        # layer's columns at init, and the card quantizes those weights
        a = h3_row[:MK].reshape(M, K)                    # (M, K) logits
        mu = h3_row[MK:2 * MK].reshape(M, K).copy()
        sraw = h3_row[2 * MK:].reshape(M, K)
        bins = np.searchsorted(self.sigma_thr, sraw.reshape(-1),
                               side="right").reshape(M, K).astype(np.int64)
        d = a.max(axis=1, keepdims=True) - a              # >= 0
        idx = np.minimum(rshift_round(d, EXP_LUT_SHIFT), EXP_LUT_SIZE - 1)
        e = self.exp_lut[idx]                             # (M, K)
        s = e.sum(axis=1, keepdims=True)
        wfix = (e << 16) // s
        rem = W_SCALE - wfix.sum(axis=1)
        am = e.argmax(axis=1)                             # first max
        wfix[np.arange(M), am] += rem
        return mu, bins, wfix


# ---------------------------------------------------------------------------
# Per-symbol model construction (the integer spec)
# ---------------------------------------------------------------------------

def build_symbol_model(card: PortableCard, mu_fix: np.ndarray,
                       bins: np.ndarray, wfix: np.ndarray):
    """One channel's K components -> (c, R, cum) with cum uint32 summing to
    2^16. Pure integer; the cross-implementation contract."""
    K = mu_fix.shape[0]
    if K == 1:
        c = int(rshift_round(int(mu_fix[0]), F_BITS))
        R = max(PORT_R_MIN, int(card.sigma_R[int(bins[0])]))
    else:
        mean_acc = int((wfix * mu_fix).sum())
        mean_fix = rshift_round(mean_acc, 16)                     # F_BITS
        m2_acc = int((wfix * (card.sigma2_fix[bins]
                              + mu_fix * mu_fix)).sum())
        m2_fix = rshift_round(m2_acc, 16)                         # 2F
        var_fix = m2_fix - mean_fix * mean_fix
        if var_fix < 1:
            var_fix = 1
        std_fix = math.isqrt(int(var_fix))                        # F_BITS
        c = int(rshift_round(mean_fix, F_BITS))
        R = (6 * std_fix + (1 << F_BITS) - 1) >> F_BITS
        R = min(254, max(PORT_R_MIN, R + 2))
    nsym = 2 * R + 2

    n_edges = nsym
    e_idx = np.arange(n_edges, dtype=np.int64)
    edge_acc = np.zeros(n_edges, np.int64)
    base = -((R << SUB_BITS) + 32)
    for k in range(K):
        mu_idx = rshift_round(int(mu_fix[k]), F_BITS - SUB_BITS)
        mu_sub = mu_idx - (c << SUB_BITS)
        tab = card.tables[int(bins[k])]
        ext = (len(tab) - 1) // 2
        arg = base + (e_idx << SUB_BITS) - mu_sub + ext
        vals = tab[np.clip(arg, 0, len(tab) - 1)]
        edge_acc += int(wfix[k]) * vals.astype(np.int64)
    pmf = np.maximum(np.diff(edge_acc), 0)
    esc = (int(edge_acc[0])
           + ((int(wfix.sum()) << PROB_BITS) - int(edge_acc[-1])))
    if esc < 0:
        esc = 0
    pmf_full = np.concatenate([pmf, [esc]])
    budget = PROB_SCALE - nsym
    freq = 1 + ((pmf_full * budget) >> 32)
    rem = PROB_SCALE - int(freq.sum())
    am = int(pmf_full.argmax())                                    # first max
    freq[am] += rem
    cum = np.zeros(nsym + 1, np.uint32)
    cum[1:] = np.cumsum(freq).astype(np.uint32)
    return c, R, cum


# ---------------------------------------------------------------------------
# Pure-python rANS (exact mirror of rans_core.h)
# ---------------------------------------------------------------------------

class PyEncoder:
    def __init__(self):
        self.x = RANS_L
        self.bytes = bytearray()

    def put(self, cum: int, freq: int) -> None:
        x_max = ((RANS_L >> PROB_BITS) << 8) * freq
        while self.x >= x_max:
            self.bytes.append(self.x & 0xFF)
            self.x >>= 8
        self.x = ((self.x // freq) << PROB_BITS) + (self.x % freq) + cum

    def put_raw16(self, v: int) -> None:
        self.put(v, 1)

    def flush(self) -> bytes:
        for shift in (0, 8, 16, 24):
            self.bytes.append((self.x >> shift) & 0xFF)
        return bytes(reversed(self.bytes))


class PyDecoder:
    def __init__(self, data: bytes):
        self.buf = data
        self.len = len(data)
        self.pos = 0
        self.x = 0
        for _ in range(min(4, self.len)):
            self.x = ((self.x << 8) | self.buf[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def peek(self) -> int:
        return self.x & (PROB_SCALE - 1)

    def advance(self, cum: int, freq: int) -> None:
        self.x = freq * (self.x >> PROB_BITS) + (self.x & (PROB_SCALE - 1)) - cum
        while self.x < RANS_L and self.pos < self.len:
            self.x = (self.x << 8) | self.buf[self.pos]
            self.pos += 1

    def get_raw16(self) -> int:
        v = self.peek()
        self.advance(v, 1)
        return v

    def ok(self) -> bool:
        return self.x == RANS_L and self.pos == self.len


def _cdf_find(cum: np.ndarray, cf: int) -> int:
    # cum is strictly increasing; find j with cum[j] <= cf < cum[j+1]
    return int(np.searchsorted(cum, cf, side="right")) - 1


# ---------------------------------------------------------------------------
# Wavefront encode/decode (numpy reference implementation)
# ---------------------------------------------------------------------------

def _gather_context(y_pad: np.ndarray, pix: np.ndarray) -> np.ndarray:
    """y_pad: (h+4, w+4, M) int64 F_BITS; pix (n, 2) -> (n, 12M)."""
    from neural_image_compression_tpu.coding.codec import CTX_POSITIONS

    pos = CTX_POSITIONS  # canonical mask-A gather order
    n = pix.shape[0]
    m = y_pad.shape[-1]
    out = np.empty((n, 12 * m), np.int64)
    for idx, (r, c) in enumerate(pos):
        out[:, idx * m:(idx + 1) * m] = y_pad[pix[:, 0] + r, pix[:, 1] + c]
    return out


def _native_coder(card: PortableCard):
    if getattr(card, "_native", None) is None:
        from neural_image_compression_tpu.coding import backend

        card._native = backend.ArPortableCoder(card)
    return card._native


def portable_ar_encode(card: PortableCard, y_q: np.ndarray,
                       psi_fix: np.ndarray, native: bool = None) -> bytes:
    """Encode one latent layer with the integer parameter path.
    y_q: (h, w, M) integer-valued; psi_fix: (h, w, 2M) int64 F_BITS.
    native selects the C++ (True) or numpy (False) implementation — both
    produce bit-identical streams; default follows NIC_DISABLE_NATIVE_AR."""
    if card.family != 0:
        raise ValueError("card is not a wavefront-family card (checkerboard "
                         "streams use portable_cb_encode/decode)")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if not (np.abs(np.asarray(y_q)).max(initial=0) <= Y_ABS_MAX):
        # `not (.. <= ..)` so NaN fails too: astype(int32) on NaN yields
        # INT_MIN — exactly the adversarial magnitude the bound excludes
        raise ValueError(f"latent magnitude exceeds the portable-spec bound "
                         f"(|y| <= {Y_ABS_MAX}) or is non-finite")
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).encode(
            np.asarray(y_q).astype(np.int32), p_acc)
    return _py_ar_encode(card, y_q, psi_fix)


def _py_ar_encode(card: PortableCard, y_q: np.ndarray,
                  psi_fix: np.ndarray) -> bytes:
    from neural_image_compression_tpu.coding.codec import wavefront_order

    h, w = y_q.shape[:2]
    M, K = card.M, card.K
    y_int = np.asarray(y_q).astype(np.int64)
    pix, wave_sizes = wavefront_order(h, w)
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    y_pad = np.zeros((h + 4, w + 4, M), np.int64)
    y_pad[2:-2, 2:-2] = y_int << F_BITS

    syms: List[int] = []
    models: List[Tuple] = []
    start = 0
    for ws in wave_sizes:
        wp = pix[start:start + ws]
        start += ws
        gathered = _gather_context(y_pad, wp)
        h3 = card.wave_params(gathered, p_acc[wp[:, 0] * w + wp[:, 1]])
        for p in range(ws):
            mu, bins, wfix = card.channel_models(h3[p])
            yrow = y_int[wp[p, 0], wp[p, 1]]
            for m in range(M):
                syms.append(int(yrow[m]))
                models.append((mu[m], bins[m], wfix[m]))
    enc = PyEncoder()
    for i in range(len(syms) - 1, -1, -1):
        c, R, cum = build_symbol_model(card, *models[i])
        d = syms[i] - c
        if -R <= d <= R:
            j = d + R
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
        else:
            v = (syms[i] + 0x80000000) & 0xFFFFFFFF
            enc.put_raw16(v & 0xFFFF)
            enc.put_raw16((v >> 16) & 0xFFFF)
            j = 2 * R + 1
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
    return enc.flush()


def portable_ar_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                       h: int, w: int, native: bool = None) -> np.ndarray:
    """Decode one latent layer; returns (h, w, M) float32 of integers."""
    if card.family != 0:
        raise ValueError("card is not a wavefront-family card (checkerboard "
                         "streams use portable_cb_encode/decode)")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).decode(data, p_acc, h, w)
    return _py_ar_decode(card, data, psi_fix, h, w)


def _py_ar_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                  h: int, w: int) -> np.ndarray:
    from neural_image_compression_tpu.coding.codec import wavefront_order

    M = card.M
    pix, wave_sizes = wavefront_order(h, w)
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    y_pad = np.zeros((h + 4, w + 4, M), np.int64)
    y_out = np.zeros((h, w, M), np.int64)
    dec = PyDecoder(data)
    start = 0
    for ws in wave_sizes:
        wp = pix[start:start + ws]
        start += ws
        gathered = _gather_context(y_pad, wp)
        h3 = card.wave_params(gathered, p_acc[wp[:, 0] * w + wp[:, 1]])
        for p in range(ws):
            mu, bins, wfix = card.channel_models(h3[p])
            i, j = int(wp[p, 0]), int(wp[p, 1])
            for m in range(M):
                c, R, cum = build_symbol_model(card, mu[m], bins[m], wfix[m])
                cf = dec.peek()
                jj = _cdf_find(cum, cf)
                dec.advance(int(cum[jj]), int(cum[jj + 1] - cum[jj]))
                if jj == 2 * R + 1:
                    hi = dec.get_raw16()
                    lo = dec.get_raw16()
                    v = ((hi << 16) | lo) - 0x80000000
                    if abs(v) > Y_ABS_MAX:  # mirror of kYAbsMax in C++
                        raise ValueError(
                            "corrupt portable AR stream (escape out of spec)")
                else:
                    v = c + (jj - R)
                y_out[i, j, m] = v
            y_pad[i + 2, j + 2] = y_out[i, j] << F_BITS
    if not dec.ok():
        raise ValueError("corrupt or truncated portable AR stream")
    return y_out.astype(np.float32)


# ---------------------------------------------------------------------------
# Checkerboard two-pass encode/decode (numpy reference implementation)
# ---------------------------------------------------------------------------

def _cb_gather(y_pad: np.ndarray, pix: np.ndarray) -> np.ndarray:
    """y_pad: (h+4, w+4, M) int64 F_BITS (ANCHOR values only, zeros at
    non-anchors); pix (n, 2) non-anchor coords -> (n, 12M) in the canonical
    CB_CTX_POSITIONS order (models/checkerboard.py)."""
    from neural_image_compression_tpu.models.checkerboard import (
        CB_CTX_POSITIONS,
    )

    n = pix.shape[0]
    m = y_pad.shape[-1]
    out = np.empty((n, 12 * m), np.int64)
    for idx, (r, c) in enumerate(CB_CTX_POSITIONS):
        out[:, idx * m:(idx + 1) * m] = y_pad[pix[:, 0] + r, pix[:, 1] + c]
    return out


def _cb_plan(card: PortableCard, h: int, w: int):
    """(anchor pix, non-anchor pix, anchor flat idx, non-anchor flat idx) —
    row-major within each block, the stream's symbol order (matches the
    float CheckerboardCodec's y_q[am] / y_q[~am] layout)."""
    from neural_image_compression_tpu.models.checkerboard import (
        checkerboard_mask,
    )

    am = checkerboard_mask(h, w)
    pix_a = np.argwhere(am).astype(np.int64)
    pix_n = np.argwhere(~am).astype(np.int64)
    return am, pix_a, pix_n


def _cb_pass_params(card: PortableCard, p_acc: np.ndarray, w: int,
                    pix: np.ndarray, y_pad=None):
    """h3 rows for one pass: anchors (y_pad None -> context exactly zero) or
    non-anchors (context GEMM over the gathered anchor taps)."""
    rows = p_acc[pix[:, 0] * w + pix[:, 1]]
    if y_pad is None:
        return card.params_from_acc(rows)
    return card.wave_params(_cb_gather(y_pad, pix), rows)


def portable_cb_encode(card: PortableCard, y_q: np.ndarray,
                       psi_fix: np.ndarray, native: bool = None) -> bytes:
    """Encode one checkerboard latent grid with the integer parameter path.
    Same stream <-> symbol conventions as portable_ar_encode; the pass
    structure is the checkerboard codec's (anchors from the hyperprior
    alone, then non-anchors from the 12-tap integer context GEMM)."""
    if card.family != 1:
        raise ValueError("card is not a checkerboard-family card")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if not (np.abs(np.asarray(y_q)).max(initial=0) <= Y_ABS_MAX):
        raise ValueError(f"latent magnitude exceeds the portable-spec bound "
                         f"(|y| <= {Y_ABS_MAX}) or is non-finite")
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).encode_cb(
            np.asarray(y_q).astype(np.int32), p_acc)
    return _py_cb_encode(card, y_q, psi_fix)


def _py_cb_encode(card: PortableCard, y_q: np.ndarray,
                  psi_fix: np.ndarray) -> bytes:
    h, w = y_q.shape[:2]
    M = card.M
    y_int = np.asarray(y_q).astype(np.int64)
    am, pix_a, pix_n = _cb_plan(card, h, w)
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    y_pad = np.zeros((h + 4, w + 4, M), np.int64)
    y_pad[2:-2, 2:-2][am] = y_int[am] << F_BITS  # anchors only (decode parity)

    h3_a = _cb_pass_params(card, p_acc, w, pix_a)
    h3_n = _cb_pass_params(card, p_acc, w, pix_n, y_pad)

    syms: List[int] = []
    models: List[Tuple] = []
    for h3, pix in ((h3_a, pix_a), (h3_n, pix_n)):
        for p in range(pix.shape[0]):
            mu, bins, wfix = card.channel_models(h3[p])
            yrow = y_int[pix[p, 0], pix[p, 1]]
            for m in range(M):
                syms.append(int(yrow[m]))
                models.append((mu[m], bins[m], wfix[m]))
    enc = PyEncoder()
    for i in range(len(syms) - 1, -1, -1):
        c, R, cum = build_symbol_model(card, *models[i])
        d = syms[i] - c
        if -R <= d <= R:
            j = d + R
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
        else:
            v = (syms[i] + 0x80000000) & 0xFFFFFFFF
            enc.put_raw16(v & 0xFFFF)
            enc.put_raw16((v >> 16) & 0xFFFF)
            j = 2 * R + 1
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
    return enc.flush()


def portable_cb_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                       h: int, w: int, native: bool = None) -> np.ndarray:
    """Decode one checkerboard latent layer; returns (h, w, M) float32."""
    if card.family != 1:
        raise ValueError("card is not a checkerboard-family card")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).decode_cb(data, p_acc, h, w)
    return _py_cb_decode(card, data, psi_fix, h, w)


def _py_cb_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                  h: int, w: int) -> np.ndarray:
    M = card.M
    am, pix_a, pix_n = _cb_plan(card, h, w)
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    y_out = np.zeros((h, w, M), np.int64)
    y_pad = np.zeros((h + 4, w + 4, M), np.int64)
    dec = PyDecoder(data)

    def _decode_block(h3, pix, fill_pad: bool):
        for p in range(pix.shape[0]):
            mu, bins, wfix = card.channel_models(h3[p])
            i, j = int(pix[p, 0]), int(pix[p, 1])
            for m in range(M):
                c, R, cum = build_symbol_model(card, mu[m], bins[m], wfix[m])
                cf = dec.peek()
                jj = _cdf_find(cum, cf)
                dec.advance(int(cum[jj]), int(cum[jj + 1] - cum[jj]))
                if jj == 2 * R + 1:
                    hi = dec.get_raw16()
                    lo = dec.get_raw16()
                    v = ((hi << 16) | lo) - 0x80000000
                    if abs(v) > Y_ABS_MAX:  # mirror of kYAbsMax in C++
                        raise ValueError(
                            "corrupt portable AR stream (escape out of spec)")
                else:
                    v = c + (jj - R)
                y_out[i, j, m] = v
            if fill_pad:
                y_pad[i + 2, j + 2] = y_out[i, j] << F_BITS

    _decode_block(_cb_pass_params(card, p_acc, w, pix_a), pix_a, True)
    _decode_block(_cb_pass_params(card, p_acc, w, pix_n, y_pad), pix_n, False)
    if not dec.ok():
        raise ValueError("corrupt or truncated portable AR stream")
    return y_out.astype(np.float32)


# ---------------------------------------------------------------------------
# Hyperprior one-pass encode/decode (numpy reference implementation)
# ---------------------------------------------------------------------------

def portable_hp_encode(card: PortableCard, y_q: np.ndarray,
                       psi_fix: np.ndarray, native: bool = None) -> bytes:
    """Encode one hyperprior latent grid with the integer parameter path.
    Same stream <-> symbol conventions as portable_ar_encode; every
    position's parameters come from the hyperprior alone (params_from_acc),
    in row-major position order, channel fastest — the float
    MeanScaleHyperpriorCodec's symbol order."""
    if card.family != 2:
        raise ValueError("card is not a hyperprior-family card")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if not (np.abs(np.asarray(y_q)).max(initial=0) <= Y_ABS_MAX):
        raise ValueError(f"latent magnitude exceeds the portable-spec bound "
                         f"(|y| <= {Y_ABS_MAX}) or is non-finite")
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).encode_hp(
            np.asarray(y_q).astype(np.int32), p_acc)
    return _py_hp_encode(card, y_q, psi_fix)


def _py_hp_encode(card: PortableCard, y_q: np.ndarray,
                  psi_fix: np.ndarray) -> bytes:
    h, w = y_q.shape[:2]
    M = card.M
    y_int = np.asarray(y_q).astype(np.int64)
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    h3 = card.params_from_acc(p_acc)           # (h*w, out_dim), all positions

    syms: List[int] = []
    models: List[Tuple] = []
    y_flat = y_int.reshape(h * w, M)
    for p in range(h * w):
        mu, bins, wfix = card.channel_models(h3[p])
        yrow = y_flat[p]
        for m in range(M):
            syms.append(int(yrow[m]))
            models.append((mu[m], bins[m], wfix[m]))
    enc = PyEncoder()
    for i in range(len(syms) - 1, -1, -1):
        c, R, cum = build_symbol_model(card, *models[i])
        d = syms[i] - c
        if -R <= d <= R:
            j = d + R
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
        else:
            v = (syms[i] + 0x80000000) & 0xFFFFFFFF
            enc.put_raw16(v & 0xFFFF)
            enc.put_raw16((v >> 16) & 0xFFFF)
            j = 2 * R + 1
            enc.put(int(cum[j]), int(cum[j + 1] - cum[j]))
    return enc.flush()


def portable_hp_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                       h: int, w: int, native: bool = None) -> np.ndarray:
    """Decode one hyperprior latent layer; returns (h, w, M) float32."""
    if card.family != 2:
        raise ValueError("card is not a hyperprior-family card")
    if native is None:
        native = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"
    if native:
        p_acc = card.psi_precompute(psi_fix, native=True)
        return _native_coder(card).decode_hp(data, p_acc, h, w)
    return _py_hp_decode(card, data, psi_fix, h, w)


def _py_hp_decode(card: PortableCard, data: bytes, psi_fix: np.ndarray,
                  h: int, w: int) -> np.ndarray:
    M = card.M
    p_acc = card.psi_precompute(psi_fix, native=False).reshape(h * w, -1)
    h3 = card.params_from_acc(p_acc)
    y_out = np.zeros((h * w, M), np.int64)
    dec = PyDecoder(data)
    for p in range(h * w):
        mu, bins, wfix = card.channel_models(h3[p])
        for m in range(M):
            c, R, cum = build_symbol_model(card, mu[m], bins[m], wfix[m])
            cf = dec.peek()
            jj = _cdf_find(cum, cf)
            dec.advance(int(cum[jj]), int(cum[jj + 1] - cum[jj]))
            if jj == 2 * R + 1:
                hi = dec.get_raw16()
                lo = dec.get_raw16()
                v = ((hi << 16) | lo) - 0x80000000
                if abs(v) > Y_ABS_MAX:  # mirror of kYAbsMax in C++
                    raise ValueError(
                        "corrupt portable AR stream (escape out of spec)")
            else:
                v = c + (jj - R)
            y_out[p, m] = v
    if not dec.ok():
        raise ValueError("corrupt or truncated portable AR stream")
    return y_out.reshape(h, w, M).astype(np.float32)


# ---------------------------------------------------------------------------
# Channel-conditional checkerboard (channel_cb) card set — 2·G-pass portable
# ---------------------------------------------------------------------------

class ChannelCBCards:
    """Portable card SET for the channel_cb family (models/channel_cb.py):
    one checkerboard-family sub-card per channel group, coded group by
    group with the existing two-pass integer machinery.

    The composition trick: group i's entropy params depend on [spatial ctx,
    channel ctx, psi]. The spatial ctx is the group's 12 odd-parity 5x5
    taps — exactly a checkerboard card's ctx GEMM. The channel ctx is two
    dense stride-1 convs over the already-decoded groups — exactly the
    integer conv stack the card format already ships for the hyper-decoder.
    So sub-card i IS a family=1 PortableCard whose `hyper` slot carries the
    group's channel-context convs (group 0's carries the real z
    hyper-decoder) and whose per-position "psi" row is [ch_ctx || psi]
    (group 0: psi alone — its ch input is identically zero and zeros
    contribute nothing to the exact integer accumulators, so the card drops
    those EP rows). Every sub-stream then encodes/decodes through the
    AUDITED portable_cb_encode/decode paths — numpy and C++ bit-identical
    by the same exactness argument, with zero new native code.
    """

    def __init__(self, cards: List[PortableCard], groups):
        groups = tuple(int(g) for g in groups)
        if not cards or len(cards) != len(groups):
            raise ValueError("card/group count mismatch")
        for c, g in zip(cards, groups):
            if c.family != 1 or c.M != g:
                raise ValueError("corrupt channel_cb card set: sub-card "
                                 "family/width does not match its group")
        self.cards = tuple(cards)
        self.groups = groups
        self.M = sum(groups)
        self.K = cards[0].K
        self.zmin, self.zmax = cards[0].zmin, cards[0].zmax
        self.z_cdfs = cards[0].z_cdfs
        self.z_offsets = cards[0].z_offsets
        self.z_sizes = cards[0].z_sizes
        h = hashlib.sha256()
        h.update(np.asarray(groups, np.int64).tobytes())
        for c in cards:
            h.update(c.hash)
        self.hash = h.digest()[:8]

    # group 0's sub-card carries the real z hyper-decoder
    def hyper_forward(self, z_q: np.ndarray, native: bool = None) -> np.ndarray:
        return self.cards[0].hyper_forward(z_q, native=native)

    def channel_forward(self, i: int, y_prev: np.ndarray,
                        native: bool = None) -> np.ndarray:
        """Integer channel-context features for group i (> 0) from the
        decoded previous groups ((h, w, sum(groups[:i])) integer-valued):
        sub-card i's `hyper` slot holds the two dense 5x5 convs."""
        return self.cards[i].hyper_forward(y_prev, native=native)

    def save(self, path: str) -> None:
        arrs = {"groups": np.asarray(self.groups, np.int64)}
        for i, card in enumerate(self.cards):
            arrs.update({f"g{i}_{k}": v for k, v in card._arrays()})
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "ChannelCBCards":
        d = np.load(path)
        if "groups" not in d:
            raise ValueError(f"{path} is not a channel_cb card set "
                             f"(missing groups array)")
        groups = tuple(int(g) for g in d["groups"])
        cards = []
        for i in range(len(groups)):
            sub = {k[len(f"g{i}_"):]: d[k] for k in d.files
                   if k.startswith(f"g{i}_")}
            if not sub:
                raise ValueError(f"{path} is missing sub-card g{i}")
            cards.append(PortableCard._from_mapping(sub))
        return cls(cards, groups)


def build_channel_cb_cards(model, variables, zmin: int = -64,
                           zmax: int = 64) -> ChannelCBCards:
    """Quantize a ChannelCheckerboardHierarchical's coding-path weights into
    a ChannelCBCards set — the only float computation in portable mode for
    this family. Layer sources: models/channel_cb.py setup() — per group i,
    spatial_ctx_i (5x5 conv, 12 odd-parity live taps), channel_ctx_i
    (dense conv5x5 -> lrelu -> conv5x5, i > 0), entropy_parameters_i
    (1x1 MLP over [sp(2g) | ch(2g) | psi(2M)])."""
    from neural_image_compression_tpu.coding.cdf_tables import factorized_tables
    from neural_image_compression_tpu.coding.codec import _HostParamNets
    from neural_image_compression_tpu.models.channel_cb import default_groups
    from neural_image_compression_tpu.models.checkerboard import (
        CB_CTX_POSITIONS,
    )

    p = variables["params"]
    M = model.latent_channels
    K = model.K
    groups = (tuple(model.groups) if model.groups is not None
              else default_groups(M))
    (sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables,
     exp_lut) = _integer_tables()
    z_cdfs, z_offsets, z_sizes = factorized_tables(model, variables,
                                                   zmin, zmax)
    z_cdfs = z_cdfs.astype(np.uint32)
    z_offsets = np.asarray(z_offsets, np.int32)
    z_sizes = np.asarray(z_sizes, np.int32)

    cards = []
    off = 0
    for i, gi in enumerate(groups):
        nets = _HostParamNets.ep_only(p[f"entropy_parameters_{i}"], gi, K)
        sp = p[f"spatial_ctx_{i}"]
        kernel = np.asarray(sp["kernel"])            # (5, 5, gi, 2gi)
        ctx_w = np.concatenate([kernel[r, c] for (r, c) in CB_CTX_POSITIONS],
                               axis=0)
        ctx = QuantLayer.quantize(ctx_w, np.asarray(sp["bias"]))
        (w1, b1), (w2, b2), (w3, b3) = nets.ep
        # EP layer-1 rows: [0:2g) spatial, [2g:4g) channel, [4g:) psi.
        # Group 0 has no channel context (those rows see exact zeros), so
        # its psi half is the psi rows alone.
        psi_lo = 2 * gi if i > 0 else 4 * gi
        ep1_phi, ep1_psi = _quantize_ep1_split(
            np.vstack([w1[:2 * gi], w1[psi_lo:]]), b1, 2 * gi)
        if i == 0:
            hyper = _hyper_layers(model, p)
        else:
            # First-conv exactness bound, mirroring the ctx GEMM's
            # Y_ABS_MAX argument: 25 taps x `off` input channels of
            # (|y| << F) * w int64 terms must stay below 2^63.
            if 25 * off * (Y_ABS_MAX << F_BITS) * 32767 >= 2 ** 63:
                raise ValueError(
                    f"channel-context conv over {off} decoded channels "
                    f"exceeds the int64 exactness bound — reduce the "
                    f"prefix-group widths (sum(groups[:-1]) <= 163)")
            ch = p[f"channel_ctx_{i}"]
            hyper = [("conv",
                      QuantLayer.quantize(np.asarray(ch["Conv2d_0"]["kernel"]),
                                          np.asarray(ch["Conv2d_0"]["bias"])),
                      (1, 2)),
                     ("conv",
                      QuantLayer.quantize(np.asarray(ch["Conv2d_1"]["kernel"]),
                                          np.asarray(ch["Conv2d_1"]["bias"])),
                      (1, 2))]
        cards.append(PortableCard(
            gi, K, hyper, ctx, ep1_phi, ep1_psi,
            QuantLayer.quantize(w2, b2), QuantLayer.quantize(w3, b3),
            sigma_thr, sigma_fix, sigma2_fix, sigma_R, tables, exp_lut,
            z_cdfs, z_offsets, z_sizes, zmin, zmax, family=1))
        off += gi
    return ChannelCBCards(cards, groups)


def portable_ccb_encode(cards: ChannelCBCards, y_q: np.ndarray,
                        psi_fix: np.ndarray, native: bool = None) -> bytes:
    """Encode a channel_cb latent grid with the integer parameter path:
    per group, the checkerboard two-pass coder over the group's channels
    with the augmented hyper row [ch_ctx || psi]; groups chain on the exact
    quantized latents (= what decode reconstructs, so parameters are
    bit-identical on both sides). Payload: G uint32 block lengths + the
    concatenated per-group portable_cb streams."""
    y_int = np.asarray(y_q)
    blocks = []
    off = 0
    for i, gi in enumerate(cards.groups):
        if i == 0:
            psi_i = psi_fix
        else:
            ch = cards.channel_forward(i, y_int[..., :off], native=native)
            psi_i = np.concatenate([ch, psi_fix], axis=-1)
        blocks.append(portable_cb_encode(cards.cards[i],
                                         y_int[..., off:off + gi], psi_i,
                                         native=native))
        off += gi
    table = struct.pack(f"<{len(blocks)}I", *[len(b) for b in blocks])
    return table + b"".join(blocks)


def portable_ccb_decode(cards: ChannelCBCards, data: bytes,
                        psi_fix: np.ndarray, h: int, w: int,
                        native: bool = None) -> np.ndarray:
    """Decode a channel_cb latent grid; returns (h, w, M) float32 of
    integers. Decoded escapes are Y_ABS_MAX-bounded inside
    portable_cb_decode, so every channel_forward input stays in spec."""
    G = len(cards.groups)
    if len(data) < 4 * G:
        raise ValueError("corrupt or truncated portable channel_cb stream")
    lens = struct.unpack(f"<{G}I", data[:4 * G])
    if 4 * G + sum(lens) != len(data):
        raise ValueError("corrupt portable channel_cb stream: block table "
                         "does not cover the payload")
    y_out = np.zeros((h, w, cards.M), np.float32)
    off_b = 4 * G
    off = 0
    for i, gi in enumerate(cards.groups):
        if i == 0:
            psi_i = psi_fix
        else:
            ch = cards.channel_forward(i, y_out[..., :off], native=native)
            psi_i = np.concatenate([ch, psi_fix], axis=-1)
        y_out[..., off:off + gi] = portable_cb_decode(
            cards.cards[i], data[off_b:off_b + lens[i]], psi_i, h, w,
            native=native)
        off += gi
        off_b += lens[i]
    return y_out


# ---------------------------------------------------------------------------
# Factorized-prior portable card (frozen tables only — no AR path)
# ---------------------------------------------------------------------------

class FactorizedCard:
    """Portable artifact for FactorizedPrior: the per-channel CDF tables are
    normally rebuilt on-device per range (float, machine-dependent); freezing
    them over a fixed symbol range makes the stream decodable anywhere — the
    indexed rANS coder itself is exact integer code."""

    def __init__(self, cdfs: np.ndarray, offsets: np.ndarray,
                 sizes: np.ndarray, ymin: int, ymax: int):
        self.cdfs = cdfs.astype(np.uint32)
        self.offsets = np.asarray(offsets, np.int32)
        self.sizes = np.asarray(sizes, np.int32)
        self.ymin = ymin
        self.ymax = ymax
        h = hashlib.sha256()
        for arr in (np.array([ymin, ymax], np.int64), self.cdfs,
                    self.offsets, self.sizes):
            h.update(np.ascontiguousarray(arr).tobytes())
        self.hash = h.digest()[:8]

    @classmethod
    def build(cls, model, variables, ymin: int = -256, ymax: int = 256
              ) -> "FactorizedCard":
        from neural_image_compression_tpu.coding.cdf_tables import factorized_tables

        cdfs, offsets, sizes = factorized_tables(model, variables, ymin, ymax)
        return cls(cdfs, offsets, sizes, ymin, ymax)

    def save(self, path: str) -> None:
        np.savez_compressed(path, cdfs=self.cdfs, offsets=self.offsets,
                            sizes=self.sizes,
                            meta=np.array([self.ymin, self.ymax], np.int64))

    @classmethod
    def load(cls, path: str) -> "FactorizedCard":
        d = np.load(path)
        ymin, ymax = (int(v) for v in d["meta"])
        return cls(d["cdfs"], d["offsets"], d["sizes"], ymin, ymax)


def save_scalable_cards(path: str, cards) -> None:
    """One card file for ScalableCodec's two latent layers (base,
    enhancement): the layers' arrays are namespaced l1_/l2_ in a single
    npz so a scalable portable card travels as one artifact, like the
    joint-AR and factorized ones."""
    card1, card2 = cards
    arrs = {}
    for prefix, card in (("l1_", card1), ("l2_", card2)):
        arrs.update({prefix + k: v for k, v in card._arrays()})
    np.savez_compressed(path, **arrs)


def load_scalable_cards(path: str):
    d = np.load(path)
    out = []
    for prefix in ("l1_", "l2_"):
        sub = {k[len(prefix):]: d[k] for k in d.files if k.startswith(prefix)}
        if not sub:
            raise ValueError(f"{path} is not a scalable card pair "
                             f"(missing {prefix}* arrays)")
        out.append(PortableCard._from_mapping(sub))
    return tuple(out)
