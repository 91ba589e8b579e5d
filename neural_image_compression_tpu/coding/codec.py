"""Model-level bitstream codecs: real compress()/decompress().

The reference never serializes a bitstream — its "decoding" is the parallel
eval forward (Models.py:63-90; see SURVEY §3.2). Here compression is real:

  * z (hyper-latents): coded with per-channel quantized CDF tables built on
    device from the factorized bottleneck (cdf_tables.factorized_tables) and
    an indexed rANS stream.
  * y (latents), JointAutoregressiveHierarchical: coded under the per-symbol
    mean-scale Gaussian / GMM predicted by hyper + masked-conv context. Real
    decoding is autoregressive: pixel (i,j)'s parameters depend on already
    decoded neighbors. We schedule it as a **wavefront**: for the 5x5 mask-A
    context, waves t = 3*i + j are dependency-safe (row i-1 contributes
    columns <= j+2, and 3(i-1) + (j+2) = t - 1 < t), giving 3*(H-1)+W waves
    with ~W/3 pixels decoded in parallel per wave.

Determinism contract: the entropy parameters that feed the coder MUST be
bit-identical at encode and decode time. The TPU's parallel context conv and
a host wavefront recompute would disagree in f32 low bits, so BOTH sides
derive the coding parameters through the same host wave loop (numpy f32,
identical chunk shapes); the TPU still does everything heavy — analysis/synthesis
transforms and the hyper-decoder (psi), which are shared inputs computed by
the same jitted program on both sides.

Bitstream layout (version 1):
  header: magic 'NIC1', model kind, K, M, H, W, zmin, zmax, len_z, len_y
  then the z stream, then the y stream.
"""

import os
import struct
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.coding import backend
from neural_image_compression_tpu.coding.cdf_tables import factorized_tables
from neural_image_compression_tpu.models.checkerboard import checkerboard_mask

_MAGIC = b"NIC1"
_KIND_JOINT = 1
_KIND_FACTORIZED = 2
_KIND_SCALABLE = 3
_KIND_JOINT_PORTABLE = 4       # integer-deterministic paths (coding/portable.py)
_KIND_FACTORIZED_PORTABLE = 5
_KIND_SCALABLE_PORTABLE = 6
_KIND_CHECKERBOARD = 7         # two-pass parallel decode (models/checkerboard.py)
_KIND_CHECKERBOARD_PORTABLE = 8
_KIND_HYPERPRIOR = 9           # one-pass parallel decode (models/hyperprior.py)
_KIND_HYPERPRIOR_PORTABLE = 10
_KIND_CHANNEL_CB = 11          # 2G-pass group decode (models/channel_cb.py)
_KIND_CHANNEL_CB_PORTABLE = 12

LEAKY_SLOPE = 0.01

# The native (C++) wavefront codec runs the whole per-wave loop in one call
# per image/tile (~10x faster than the numpy wave loop). Both paths are
# self-consistent (encode and decode share one code path), but their
# bitstreams are NOT interchangeable: a stream must be decoded with the same
# path that encoded it. Set NIC_DISABLE_NATIVE_AR=1 to force the numpy path.
NATIVE_AR = os.environ.get("NIC_DISABLE_NATIVE_AR", "") != "1"

# Entropy-parameter fetch dtype for the one/two/2·G-pass float codecs
# (hyperprior, checkerboard, channel_cb). Their per-image host<->device
# traffic is dominated by the GMM parameter rows (~7 MB/image f32 at
# M=128, K=3 on 768x512) over a ~25-30 ms-RTT tunnel; fetching f16 halves
# it at ~0 rate cost (σ's f16 relative step is 2^-11 — far finer than the
# portable pipeline's σ-bin grid, which is already rate-neutral on
# converged models). Determinism is unaffected: encode and decode derive
# parameters through the SAME jitted program, so both sides see identical
# f16 values and upcast identically (f16->f32 is exact). Float streams
# remain self-consistent per device/build/config — NIC_CODEC_PARAM_FETCH
# is part of that config (set "f32" to decode pre-round-5 streams).
_PARAM_FETCH = (jnp.float32
                if os.environ.get("NIC_CODEC_PARAM_FETCH", "f16") == "f32"
                else jnp.float16)


def _round_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _pad_input(x, mult: int) -> np.ndarray:
    """Pad-code-crop rule for arbitrary image sizes (SURVEY §7.3): the input
    is edge-replicate-padded so H, W divide the model's total downsampling,
    latents are coded over the PADDED grid, the header records the TRUE size,
    and decompress crops the synthesis output back. bpp is reported per true
    pixel (the padding cost is real bits and is charged to the image).

    uint8 inputs stay uint8 (the codecs ship them to the device as-is and
    divide by 255 on-device — 4x less upload traffic, see _make_analysis);
    anything else is coerced to float32 in [0,1]."""
    from neural_image_compression_tpu.data.datasets import pad_to_multiple
    arr = np.asarray(x)
    if arr.dtype != np.uint8:
        arr = np.asarray(arr, np.float32)
    return pad_to_multiple(arr, mult)


def _make_analysis(model, with_hyper: bool):
    """Fused encode program x -> integer latents, compiled per input dtype.

    uint8 inputs are converted to f32/255 ON DEVICE: over a bandwidth- or
    latency-limited host->device link the 4x smaller upload dominates the
    single-image encode latency (measured on the tunneled v5e: the
    analysis stage drops ~2.5x, /tmp/ab_upload data in DESIGN.md). u8/255
    is computed in f32 exactly as a host-side conversion would, so the
    latents are the same quantity; streams remain self-consistent either
    way because decode never recomputes y_q/z_q (they are in the stream)
    and psi always derives from z_q through the standalone hyper-synthesis
    program. jit compiles one executable per input dtype on first use.

    The quantized y latents come back as int16 — half the download of f32,
    and the values are exact small integers. Overflow beyond int16 (never
    seen in practice, but correctness must not depend on that) is signalled
    IN-BAND so the host needs no extra scalar round-trip over a
    latency-bound link: legitimate values saturate to ±32767, and if any
    |y| exceeded that the whole buffer is poisoned with -32768 (a value
    saturation can never produce); the host then refetches through the f32
    program — see _fetch_y16. z stays f32: it is tiny AND it feeds the
    standalone hyper-synthesis program on device, whose input dtype is
    part of the psi determinism contract (encode and decode must hit the
    same executable)."""
    def body(mdl, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        # z derives from the UNROUNDED y — same as the model's eval forward
        # (joint_ar.py __call__: z = hyper_encoder(y), z_in = round(z);
        # reference Models.py:49-66) — so decoded z_q equals the model's
        # z_in bit-exactly, not just self-consistently.
        y_c = mdl.encoder(x).astype(jnp.float32)
        y = jnp.round(y_c)
        y16 = jnp.clip(y, -32767.0, 32767.0).astype(jnp.int16)
        y16 = jnp.where(jnp.max(jnp.abs(y)) > 32767.0,
                        jnp.full_like(y16, -32768), y16)
        if not with_hyper:
            return (y16,)
        return (y16, jnp.round(mdl.hyper_encoder(y_c).astype(jnp.float32)))
    return jax.jit(lambda v, x: model.apply(v, x, method=body))


def _make_analysis_f32(model, with_hyper: bool):
    """Full-precision y fallback for the (never-seen-in-practice) case of
    latents beyond int16 range; built lazily on first overflow."""
    def body(mdl, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        y_c = mdl.encoder(x).astype(jnp.float32)
        y = jnp.round(y_c)
        if not with_hyper:
            return (y,)
        return (y, jnp.round(mdl.hyper_encoder(y_c).astype(jnp.float32)))
    return jax.jit(lambda v, x: model.apply(v, x, method=body))


def _fetch_y16(y16_dev, refetch_f32) -> np.ndarray:
    """Host fetch of the analysis program's int16 y latents -> (B,h,w,M)
    f32, in ONE device round-trip. -32768 anywhere is the in-band overflow
    poison (_make_analysis): the integer latents did not fit int16, so
    refetch through the f32 program (refetch_f32: () -> (B,h,w,M) f32)."""
    arr = np.asarray(y16_dev)
    if arr.size == 0 or int(arr.min()) != -32768:
        return arr.astype(np.float32)
    return refetch_f32()


def _latents_to_device(y: np.ndarray):
    """Upload integer latents for synthesis: int16 when every value fits
    (half the f32 upload), f32 otherwise. The synthesis programs cast to
    f32 at entry, so both dtypes hit identical math."""
    if y.size and float(np.abs(y).max()) <= 32767.0:
        return jnp.asarray(np.asarray(y, np.float32).astype(np.int16))
    return jnp.asarray(y, jnp.float32)


def _as_latent_grids(y_q, z_q, img_h, img_w, M, mult: int = 64):
    """Validate/normalize caller-supplied integer latent grids (the
    compress_latents entry points, e.g. refined latents from
    coding/refine.py): accepts (h, w, M) or (1, h, w, M); shapes must match
    the padded img_h x img_w geometry (x16 transform, x4 hyper); values must
    be integral — these ARE the coded symbols, not something to quantize."""
    ph, pw = _round_up(img_h, mult), _round_up(img_w, mult)
    h, w = ph // 16, pw // 16
    y_q = np.asarray(y_q, np.float32)
    if y_q.ndim == 4:
        assert y_q.shape[0] == 1, "one image at a time"
        y_q = y_q[0]
    if y_q.shape != (h, w, M):
        raise ValueError(f"y_q shape {y_q.shape} does not match the padded "
                         f"{img_h}x{img_w} image's latent grid ({h},{w},{M})")
    backend._require_integral_latents(y_q)
    if z_q is None:
        return y_q, None
    hz, wz = ph // 64, pw // 64
    z_q = np.asarray(z_q, np.float32)
    if z_q.ndim == 4:
        assert z_q.shape[0] == 1, "one image at a time"
        z_q = z_q[0]
    if z_q.shape != (hz, wz, M):
        raise ValueError(f"z_q shape {z_q.shape} does not match the padded "
                         f"{img_h}x{img_w} image's hyper grid "
                         f"({hz},{wz},{M})")
    backend._require_integral_latents(z_q)
    return y_q, z_q


def _make_synthesis_u8(model):
    """Decoder program with on-device clip+round+*255: only uint8 pixels
    cross the host<->device link (vs the full float reconstruction). The
    default f32 synthesis program is untouched; this is a separate opt-in
    executable (decompress(..., as_uint8=True)), compiled on first use."""
    def body(mdl, yq):
        x_hat = mdl.decoder(yq.astype(jnp.float32)).astype(jnp.float32)
        x_hat = jnp.clip(x_hat, 0.0, 1.0)
        return (jnp.round(x_hat * 255.0).astype(jnp.uint8),)
    return jax.jit(lambda v, yq: model.apply(v, yq, method=body))


def stream_size(data: bytes) -> Tuple[int, int]:
    """True (unpadded) image size from a bitstream header (common prefix
    across all kinds: magic, kind, K, M, img_h, img_w, ...)."""
    _, _, _, _, img_h, img_w = struct.unpack("<4sBBHHH", data[:12])
    return img_h, img_w


_stream_size = stream_size  # internal alias


# ---------------------------------------------------------------------------
# Host-side (numpy) re-implementations of the tiny per-pixel nets.
# Encode and decode call these with IDENTICAL chunk shapes so BLAS
# accumulation order matches bit-for-bit.
# ---------------------------------------------------------------------------

class _HostParamNets:
    """Masked-context conv + entropy-parameters MLP on host.

    ctx_params: the MaskedConv2d param subtree; ep_params: the
    EntropyParameters subtree ({Conv2d_0..2}); M: this layer's latent
    channels; K: mixture components.
    """

    # Host math runs in float32: encode and decode execute the IDENTICAL
    # code on identical inputs, so determinism holds at any precision, and
    # f32 BLAS halves the wavefront-decode latency.
    DTYPE = np.float32

    def __init__(self, ctx_params: Dict, ep_params: Dict, M: int, K: int):
        ctx = ctx_params["MaskedConv2d_0"]
        kernel = np.asarray(ctx["kernel"], self.DTYPE)  # (5, 5, M, 2M)
        self.ctx_bias = np.asarray(ctx["bias"], self.DTYPE)
        pos = CTX_POSITIONS
        self.positions = pos
        self.ctx_w = np.concatenate([kernel[r, c] for (r, c) in pos], axis=0)
        # (12*M, 2M)
        self._init_ep(ep_params, M, K)

    @classmethod
    def ep_only(cls, ep_params: Dict, M: int, K: int) -> "_HostParamNets":
        """Context-free variant (hyperprior family): no ctx conv at all;
        the EP layer-1 weight consumes psi alone, so ctx_w is empty and
        phi_dim (= ctx_w.shape[1]) is 0."""
        self = cls.__new__(cls)
        self.positions = ()
        self.ctx_w = np.zeros((0, 0), cls.DTYPE)
        self.ctx_bias = np.zeros((0,), cls.DTYPE)
        self._init_ep(ep_params, M, K)
        return self

    def _init_ep(self, ep_params: Dict, M: int, K: int) -> None:
        ep = ep_params
        self.ep = []
        for name in ("Conv2d_0", "Conv2d_1", "Conv2d_2"):
            k = np.asarray(ep[name]["kernel"], self.DTYPE)
            self.ep.append((k.reshape(k.shape[2], k.shape[3]),
                            np.asarray(ep[name]["bias"], self.DTYPE)))
        self.M = M
        self.K = K
        if K > 1:
            # Permute the final layer's output columns from the model's
            # (kind, k, m) order to coder-friendly (kind, m, k) so mixture
            # params come out (n, M, K)-contiguous — no per-wave transpose
            # copies. Column dot-products are independent, and encode/decode
            # share this object, so determinism is unaffected.
            t_idx, k_idx, m_idx = np.meshgrid(np.arange(3), np.arange(K),
                                              np.arange(M), indexing="ij")
            src = (t_idx * K * M + k_idx * M + m_idx)          # (3, K, M)
            perm = src.transpose(0, 2, 1).reshape(-1)          # (3, M, K) order
            w3, b3 = self.ep[2]
            self.ep[2] = (np.ascontiguousarray(w3[:, perm]),
                          np.ascontiguousarray(b3[perm]))
        self._native = None

    def native_coder(self) -> "backend.ArWaveCoder":
        """The C++ wavefront codec over these same (coder-layout) weights."""
        if self._native is None:
            (w1, b1), (w2, b2), (w3, b3) = self.ep
            self._native = backend.ArWaveCoder(
                self.ctx_w, self.ctx_bias, w1, b1, w2, b2, w3, b3,
                self.M, self.K)
        return self._native

    def context_features(self, y_pad: np.ndarray, pix: np.ndarray) -> np.ndarray:
        """y_pad: (H+4, W+4, M) zero-padded decoded latents;
        pix: (n, 2) (i, j) coords. Returns (n, 2M)."""
        n = pix.shape[0]
        gathered = np.empty((n, len(self.positions), self.M), self.DTYPE)
        for idx, (r, c) in enumerate(self.positions):
            gathered[:, idx, :] = y_pad[pix[:, 0] + r, pix[:, 1] + c]
        flat = gathered.reshape(n, -1)
        return flat @ self.ctx_w + self.ctx_bias

    def entropy_params(self, phi: np.ndarray, psi: np.ndarray):
        """phi, psi: (n, 2M). Returns mean-scale (mu, sigma) each (n, M) for
        K==1, or (weights, mus, sigmas) each (n, M, K) — coder layout, the
        final layer's columns having been permuted at init."""
        h = np.concatenate([phi, psi], axis=1)
        for li, (w, b) in enumerate(self.ep):
            h = h @ w + b
            if li < 2:
                h = np.where(h >= 0, h, LEAKY_SLOPE * h)
        m, k = self.M, self.K
        if k == 1:
            mu, sraw = h[:, :m], h[:, m:]
            sigma = np.logaddexp(0.0, sraw) + 1e-6  # softplus
            return mu, sigma
        n = h.shape[0]
        w_raw = h[:, :k * m].reshape(n, m, k)
        mus = h[:, k * m:2 * k * m].reshape(n, m, k)
        s_raw = h[:, 2 * k * m:].reshape(n, m, k)
        w_exp = np.exp(w_raw - w_raw.max(axis=-1, keepdims=True))
        weights = w_exp / w_exp.sum(axis=-1, keepdims=True)
        sigmas = np.logaddexp(0.0, s_raw) + 1e-6
        return weights, mus, sigmas


def _pack_gmm(params, K):
    """(n, M, K) host params (coder layout) -> per-symbol (n*M, K) f32 rows —
    a contiguous reshape, no copies."""
    weights, mus, sigmas = params
    return (weights.reshape(-1, K), mus.reshape(-1, K), sigmas.reshape(-1, K))


def _decode_indexed_checked(data: bytes, index, cdfs, offsets, sizes):
    """One-shot indexed rANS decode with the complete-decode check: a
    truncated/corrupt stream raises instead of yielding garbage symbols."""
    dec = backend.RansDecoder(data)
    sym = dec.decode_indexed(index, cdfs, offsets, sizes)
    dec.finish()
    return sym


def _ar_encode_latents(nets: _HostParamNets, y_q: np.ndarray,
                       psi: np.ndarray) -> bytes:
    """Encode one latent layer under its masked-context AR model.

    Default path: the native (C++) wavefront codec — one call per layer.
    Numpy fallback (NIC_DISABLE_NATIVE_AR=1): the encoder walks the SAME
    per-wave loop as the decoder, with identical chunk shapes: BLAS
    accumulation order can depend on the GEMM's m-dim, so batching all
    pixels into one matmul could flip low bits vs the decoder's per-wave
    matmuls and desynchronize the arithmetic coder. The full y_q is a valid
    context at every wave because the mask only reads already-coded
    positions."""
    if NATIVE_AR:
        return nets.native_coder().encode(y_q, psi)
    backend._require_integral_latents(np.asarray(y_q, np.float32))
    h, w = y_q.shape[:2]
    M, K = nets.M, nets.K
    pix, wave_sizes = wavefront_order(h, w)
    y_pad = np.zeros((h + 4, w + 4, M), _HostParamNets.DTYPE)
    y_pad[2:-2, 2:-2] = y_q
    sym_parts, mu_parts, sig_parts, w_parts = [], [], [], []
    start = 0
    for ws in wave_sizes:
        wave_pix = pix[start:start + ws]
        start += ws
        phi = nets.context_features(y_pad, wave_pix)
        psi_pix = psi[wave_pix[:, 0], wave_pix[:, 1]].astype(_HostParamNets.DTYPE)
        params = nets.entropy_params(phi, psi_pix)
        sym_parts.append(y_q[wave_pix[:, 0], wave_pix[:, 1]]
                         .astype(np.int32).reshape(-1))
        if K == 1:
            mu, sigma = params
            mu_parts.append(mu.reshape(-1).astype(np.float32))
            sig_parts.append(sigma.reshape(-1).astype(np.float32))
        else:
            wt, mt, st = _pack_gmm(params, K)
            w_parts.append(wt)
            mu_parts.append(mt)
            sig_parts.append(st)
    sym = np.concatenate(sym_parts)
    if K == 1:
        return backend.encode_gaussian(sym, np.concatenate(mu_parts),
                                       np.concatenate(sig_parts))
    return backend.encode_gaussian(sym, np.concatenate(mu_parts),
                                   np.concatenate(sig_parts),
                                   np.concatenate(w_parts))


def _ar_decode_latents(nets: _HostParamNets, data: bytes,
                       psi: np.ndarray, h: int, w: int) -> np.ndarray:
    """Wavefront-decode one latent layer; returns (h, w, M) float."""
    if NATIVE_AR:
        return nets.native_coder().decode(data, psi, h, w)
    dec = backend.RansDecoder(data)
    M, K = nets.M, nets.K
    pix, wave_sizes = wavefront_order(h, w)
    y_hat = np.zeros((h, w, M), _HostParamNets.DTYPE)
    y_pad = np.zeros((h + 4, w + 4, M), _HostParamNets.DTYPE)
    start = 0
    for ws in wave_sizes:
        wave_pix = pix[start:start + ws]
        start += ws
        phi = nets.context_features(y_pad, wave_pix)
        psi_pix = psi[wave_pix[:, 0], wave_pix[:, 1]].astype(_HostParamNets.DTYPE)
        params = nets.entropy_params(phi, psi_pix)
        if K == 1:
            mu, sigma = params
            vals = dec.decode_gaussian(mu.reshape(-1).astype(np.float32),
                                       sigma.reshape(-1).astype(np.float32))
        else:
            wt, mt, st = _pack_gmm(params, K)
            vals = dec.decode_gaussian(mt, st, wt)
        vals = vals.reshape(ws, M)
        y_hat[wave_pix[:, 0], wave_pix[:, 1]] = vals
        y_pad[wave_pix[:, 0] + 2, wave_pix[:, 1] + 2] = vals
    dec.finish()  # truncated/corrupt stream -> error, not garbage latents
    return y_hat


# Causal context of the 5x5 mask-A conv, DERIVED from the model's own mask
# (raster order): the host float nets, the portable integer coder
# (_gather_context), and the hard-coded gather offsets in
# rans/ar_wavefront.cc + rans/ar_portable.cc all follow this order.
from neural_image_compression_tpu.ops.masked_conv import causal_positions

CTX_POSITIONS = tuple(causal_positions(5, "A"))
assert CTX_POSITIONS == tuple(
    [(r, c) for r in range(2) for c in range(5)] + [(2, 0), (2, 1)]), \
    "mask changed: the native coders' hard-coded gather offsets must follow"


def wavefront_order(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (pix (h*w, 2) int32 in decode order, wave_sizes list)."""
    waves: Dict[int, list] = {}
    for i in range(h):
        for j in range(w):
            waves.setdefault(3 * i + j, []).append((i, j))
    order = []
    sizes = []
    for t in sorted(waves):
        row = waves[t]
        order.extend(row)
        sizes.append(len(row))
    return np.asarray(order, np.int32), np.asarray(sizes, np.int32)


# ---------------------------------------------------------------------------
# Codec for JointAutoregressiveHierarchical / HierarchicalMixtureResidual
# ---------------------------------------------------------------------------

class JointARCodec:
    """Real encode/decode for the joint autoregressive hierarchical model.

    model: JointAutoregressiveHierarchical (any transform variant);
    variables: its {'params': ...} pytree.
    """

    def __init__(self, model, variables, portable_card=None):
        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self.K = model.K
        p = variables["params"]
        self._host_nets = _HostParamNets(p["context_model"],
                                         p["entropy_parameters"], self.M, self.K)
        self._z_cache = {}
        self._portable_card = portable_card

        # Jitted device pieces.
        # Encode-only fusion: one program for x -> (round(y), round(z)).
        # Only the INTEGER latents leave this program, and decode never
        # recomputes them (z_q is in the stream; psi derives from z_q through
        # the same standalone hyper_synthesis program on both sides), so
        # fusing cannot break the determinism contract. Saves one device
        # round-trip + the full-precision y/z result transfers per image.
        # uint8 inputs compile a second executable with the /255 on device
        # (see _make_analysis).
        self._analysis_q = _make_analysis(model, with_hyper=True)
        # psi crosses the link in _PARAM_FETCH (f16 default — halves the
        # (h, w, 2M) download); both directions run this same program and
        # upcast identically, so the host param path stays bit-identical.
        self._hyper_synthesis = jax.jit(lambda v, zq: model.apply(
            v, zq, method=lambda mdl, z: (
                mdl.hyper_decoder(z).astype(_PARAM_FETCH),)))
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)
        self._analysis_f32 = None  # int16-overflow fallback, built lazily

    # -- helpers --------------------------------------------------------
    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=True)
        return self._analysis_f32

    def _z_tables(self, zmin: int, zmax: int):
        # cached: encode AND decode of every image rebuild the same tables
        key = (zmin, zmax)
        if key not in self._z_cache:
            self._z_cache[key] = factorized_tables(self.model, self.variables,
                                                   zmin, zmax)
        return self._z_cache[key]

    @staticmethod
    def _tile_bounds(n: int, parts: int):
        edges = np.linspace(0, n, parts + 1).astype(int)
        return list(zip(edges[:-1], edges[1:]))

    # -- portable mode ---------------------------------------------------
    def portable_card(self):
        """The deterministic codec artifact for portable streams (built
        lazily; save it with .save(path) and load it on the decode machine —
        a card built there from the same weights is NOT guaranteed
        bit-identical, because card building itself uses floats)."""
        if self._portable_card is None:
            from neural_image_compression_tpu.coding.portable import PortableCard

            self._portable_card = PortableCard.build(self.model, self.variables)
        return self._portable_card

    def compress_portable(self, x: np.ndarray) -> bytes:
        """Encode with the cross-machine deterministic integer path
        (coding/portable.py): the stream decodes bit-exactly on ANY machine
        and implementation holding the same portable card. Rate cost vs
        compress() is the card's parameter quantization (~1%-level)."""
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, x)
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def compress_latents_portable(self, y_q, z_q, img_h: int,
                                  img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py) as a PORTABLE cross-machine stream. Stream-
        compatible with compress_portable(): every entropy parameter
        derives from z_q (through the card's integer hyper path) and the
        coded-y context — never from how y_q was produced. z_q is clipped
        to the card's [zmin, zmax] symbol range (refinement can push z
        outside the range the card's z tables cover; the clipped grid is
        what decode reconstructs, so both sides stay bit-identical)."""
        card = self.portable_card()
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        z_q = np.clip(z_q, card.zmin, card.zmax)
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, z_q: np.ndarray,
                              img_h: int, img_w: int) -> bytes:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         card.z_cdfs, card.z_offsets,
                                         card.z_sizes)
        psi_fix = card.hyper_forward(z_q)
        y_payload = P.portable_ar_encode(card, y_q, psi_fix)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_JOINT_PORTABLE,
                             self.K, self.M, img_h, img_w, (1 << 8) | 1,
                             card.zmin, card.zmax, len(z_bytes),
                             len(y_payload))
        return header + card.hash + z_bytes + y_payload

    def _decode_latents_portable(self, data: bytes, header) -> Tuple[np.ndarray, np.ndarray]:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        _, _, K, M, img_h, img_w, layout, zmin, zmax, len_z, len_y = header
        assert K == self.K and M == self.M
        stream_hash = data[hs:hs + 8]
        if stream_hash != card.hash:
            raise ValueError(
                "portable stream was encoded with a different card — load "
                "the encoder's card file (PortableCard.load) and pass it "
                "via JointARCodec(portable_card=...)")
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        z_bytes = data[hs + 8:hs + 8 + len_z]
        y_payload = data[hs + 8 + len_z:hs + 8 + len_z + len_y]
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(
            z_bytes, z_index, card.z_cdfs, card.z_offsets, card.z_sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)
        psi_fix = card.hyper_forward(z_q)
        y_hat = P.portable_ar_decode(card, y_payload, psi_fix, h, w)
        return y_hat, z_q

    # -- encode ---------------------------------------------------------
    def compress(self, x: np.ndarray, tiles=None, n_streams: int = 1) -> bytes:
        """x: (1, H, W, 3) float32 in [0,1] OR uint8, any size (padded
        internally to multiples of 64 and cropped back at decompress).
        uint8 uploads 4x less and divides by 255 on device — prefer it for
        serving; the stream is equally self-consistent either way.

        n_streams=N (N>1): N-way INTERLEAVED rANS — symbol s goes to stream
        s % N with UNCHANGED entropy params/context, so the rate cost is
        ~4*(N-1) bytes per image and a multicore decoder pulls the streams
        concurrently inside each wavefront (exact context; one thread per
        stream). This is the rate-neutral way to parallelize single-image
        decode. Requires the native coder.

        tiles=(a, b): split the latent grid into a x b INDEPENDENT AR tiles
        (context resets at tile borders) so each tile's stream decodes in
        parallel AND offers spatial random access. Latency/rate trade-off:
        measured +40% rate at 2x2 on a trained flagship (border pixels lose
        their causal context; exact-context rectangular tiles are impossible
        — the 5x5 mask-A halo creates cyclic left/right inter-tile deps).
        Prefer n_streams for parallel decode; tiles only for random access.

        For throughput over many images prefer compress_batch, which
        parallelizes across images at no rate cost.
        """
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        assert n_streams == 1 or tiles is None, "n_streams and tiles are exclusive"
        assert 1 <= n_streams <= 255
        if n_streams > 1 and not NATIVE_AR:
            raise RuntimeError("n_streams > 1 requires the native coder "
                               "(unset NIC_DISABLE_NATIVE_AR)")
        if tiles is not None:
            ta, tb = tiles
            # the layout word packs (ta << 8) | tb; bit 15 flags interleaved
            assert 1 <= ta <= 127 and 1 <= tb <= 255, \
                "tiles limited to 127 x 255"
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))

        outs = self._analysis_q(self.variables, x)
        # Enqueue hyper-synthesis on the DEVICE z_q before touching host
        # copies: the integer z_q values are identical either way and psi
        # still comes from the same standalone program as decode (the
        # determinism contract — z stays f32 for exactly this reason), but
        # skipping the host round-trip removes one upload and lets both
        # programs pipeline over the tunnel.
        (psi_dev,) = self._hyper_synthesis(self.variables, outs[1])
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]  # (h, w, M)
        z_q = np.asarray(outs[1])[0]  # (hz, wz, M)
        return self._encode_from(y_q, z_q, np.asarray(psi_dev,
                                                      np.float32)[0],
                                 img_h, img_w, tiles, n_streams)

    def compress_latents(self, y_q, z_q, img_h: int, img_w: int,
                         tiles=None, n_streams: int = 1) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py) for an img_h x img_w image. The stream is
        indistinguishable from compress()'s to any decoder: entropy
        parameters derive only from z_q (hyper) and the coded-y context,
        never from how y_q was produced. psi comes from the SAME jitted
        hyper-synthesis program decode uses, on the same integer z_q."""
        assert n_streams == 1 or tiles is None, \
            "n_streams and tiles are exclusive"
        assert 1 <= n_streams <= 255
        if n_streams > 1 and not NATIVE_AR:
            raise RuntimeError("n_streams > 1 requires the native coder "
                               "(unset NIC_DISABLE_NATIVE_AR)")
        if tiles is not None:
            assert 1 <= tiles[0] <= 127 and 1 <= tiles[1] <= 255, \
                "tiles limited to 127 x 255"
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        (psi_dev,) = self._hyper_synthesis(self.variables,
                                           jnp.asarray(z_q)[None])
        return self._encode_from(y_q, z_q, np.asarray(psi_dev,
                                                      np.float32)[0],
                                 img_h, img_w, tiles, n_streams)

    def _encode_from(self, y_q: np.ndarray, z_q: np.ndarray,
                     psi: np.ndarray, img_h: int, img_w: int,
                     tiles, n_streams: int) -> bytes:
        """Shared coding stage: z stream + wavefront-ordered AR y stream(s)
        from host latent grids and the (h, w, 2M) psi rows."""
        # --- z stream: per-channel factorized tables -------------------
        zmin = int(z_q.min())
        zmax = int(z_q.max())
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         cdfs, offsets, sizes)

        # --- y stream(s): wavefront-ordered AR coding -------------------
        h, w = y_q.shape[:2]
        if n_streams > 1:
            y_payload = self._host_nets.native_coder().encode_n(
                y_q, psi, n_streams)
            layout = 0x8000 | n_streams
        else:
            ta, tb = tiles if tiles else (1, 1)
            layout = (ta << 8) | tb
            streams = []
            for (r0, r1) in self._tile_bounds(h, ta):
                for (c0, c1) in self._tile_bounds(w, tb):
                    streams.append(_ar_encode_latents(
                        self._host_nets, y_q[r0:r1, c0:c1], psi[r0:r1, c0:c1]))
            if len(streams) == 1:
                y_payload = streams[0]
            else:
                table = struct.pack(f"<{len(streams)}I",
                                    *[len(s) for s in streams])
                y_payload = table + b"".join(streams)

        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_JOINT, self.K,
                             self.M, img_h, img_w, layout, zmin, zmax,
                             len(z_bytes), len(y_payload))
        return header + z_bytes + y_payload

    # -- decode ---------------------------------------------------------
    def decode_latents(self, data: bytes) -> Tuple[np.ndarray, np.ndarray]:
        """Decode (y_q, z_q) from a bitstream (single or tiled)."""
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        header = struct.unpack(fmt, data[:hs])
        magic, kind, K, M, img_h, img_w, tiles, zmin, zmax, len_z, len_y = header
        assert magic == _MAGIC
        if kind == _KIND_JOINT_PORTABLE:
            return self._decode_latents_portable(data, header)
        assert kind == _KIND_JOINT
        assert K == self.K and M == self.M
        z_bytes = data[hs:hs + len_z]
        y_payload = data[hs + len_z:hs + len_z + len_y]

        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)  # coded grid
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64

        # --- z ---------------------------------------------------------
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(z_bytes, z_index, cdfs, offsets,
                                        sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)

        # --- y: wavefront AR decode (per independent tile) ---------------
        (psi_dev,) = self._hyper_synthesis(self.variables, jnp.asarray(z_q)[None])
        psi = np.asarray(psi_dev, np.float32)[0]

        if tiles & 0x8000:  # N-way interleaved rANS (exact context)
            n = tiles & 0xFF
            if n < 1:
                raise ValueError("corrupt header: interleaved stream count 0")
            y_hat = self._host_nets.native_coder().decode_n(
                y_payload, psi, h, w, n)
            return np.asarray(y_hat, np.float32), z_q
        ta, tb = max(1, tiles >> 8), max(1, tiles & 0xFF)
        if ta == 1 and tb == 1:
            y_hat = _ar_decode_latents(self._host_nets, y_payload, psi, h, w)
        else:
            n = ta * tb
            lens = struct.unpack(f"<{n}I", y_payload[:4 * n])
            off = 4 * n
            y_hat = np.zeros((h, w, self.M), np.float32)
            jobs = []
            i = 0
            for (r0, r1) in self._tile_bounds(h, ta):
                for (c0, c1) in self._tile_bounds(w, tb):
                    tile = y_payload[off:off + lens[i]]
                    off += lens[i]
                    i += 1
                    jobs.append((r0, r1, c0, c1, tile))
            # tiles are independent streams, and the native decoder releases
            # the GIL — decode them concurrently on a multicore host
            def _one(job):
                r0, r1, c0, c1, tile = job
                return r0, r1, c0, c1, _ar_decode_latents(
                    self._host_nets, tile,
                    np.ascontiguousarray(psi[r0:r1, c0:c1]), r1 - r0, c1 - c0)
            with ThreadPoolExecutor(max_workers=min(len(jobs),
                                                    os.cpu_count() or 1)) as ex:
                for r0, r1, c0, c1, block in ex.map(_one, jobs):
                    y_hat[r0:r1, c0:c1] = block
        return y_hat.astype(np.float32), z_q

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        """Reconstruct (1, H, W, 3). as_uint8=True runs the clip/round/*255
        on device and downloads uint8 pixels — 4x less link traffic, the
        right output for serving (values equal round(clip(f32_output)*255)
        up to the synthesis program's bf16 epsilon)."""
        y_hat, _ = self.decode_latents(data)
        img_h, img_w = _stream_size(data)
        y_dev = _latents_to_device(y_hat[None])
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]

    # -- batched serving path --------------------------------------------
    def compress_batch(self, xs: np.ndarray, workers: int = None) -> list:
        """Encode a batch at serving throughput: the host AR stage (the
        dominant cost, ~0.4s/img) runs per-image in parallel threads (the
        native coder is reentrant and releases the GIL). Streams are
        byte-identical to per-image compress(): every device program on the
        coding path (analysis, hyper-synthesis) runs batch-1 per image, the
        same programs compress() uses — a B-batched program is not
        guaranteed bit-identical to batch-1 at round() boundaries, and the
        entropy params feed the deterministic coding path. xs: (B, H, W, 3),
        any size (padded internally); returns B bitstreams."""
        assert xs.ndim == 4
        img_h, img_w = xs.shape[1], xs.shape[2]
        xp = _pad_input(xs, 64)
        per = [self._analysis_q(self.variables, jnp.asarray(xp[b:b + 1]))
               for b in range(xp.shape[0])]
        # batch-1 hyper-synthesis per image from the DEVICE z_q (identical
        # integer values, same standalone program as decode — see compress());
        # everything is enqueued before the first host fetch so the tunnel
        # pipelines all 2B programs.
        psi_dev = [self._hyper_synthesis(self.variables, p[1])[0] for p in per]
        y_q = np.concatenate([
            _fetch_y16(p[0], lambda b=b: np.asarray(self._analysis_full()(
                self.variables, jnp.asarray(xp[b:b + 1]))[0]))
            for b, p in enumerate(per)])  # (B, h, w, M)
        z_q = np.concatenate([np.asarray(p[1]) for p in per])  # (B, hz, wz, M)
        psi = np.concatenate([np.asarray(pd, np.float32)
                              for pd in psi_dev])  # (B, h, w, 2M)

        def _one(b):
            zb = z_q[b]
            zmin, zmax = int(zb.min()), int(zb.max())
            cdfs, offsets, sizes = self._z_tables(zmin, zmax)
            z_sym = zb.reshape(-1, self.M).astype(np.int32)
            z_index = np.tile(np.arange(self.M, dtype=np.int32),
                              z_sym.shape[0])
            z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                             cdfs, offsets, sizes)
            y_payload = _ar_encode_latents(self._host_nets, y_q[b], psi[b])
            header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_JOINT, self.K,
                                 self.M, img_h, img_w, (1 << 8) | 1,
                                 zmin, zmax, len(z_bytes), len(y_payload))
            return header + z_bytes + y_payload

        n = xs.shape[0]
        # warm the z-table cache serially (it's a jitted device call)
        for b in range(n):
            zb = z_q[b]
            self._z_tables(int(zb.min()), int(zb.max()))
        with ThreadPoolExecutor(
                max_workers=workers or min(n, os.cpu_count() or 1)) as ex:
            return list(ex.map(_one, range(n)))

    def decompress_batch(self, datas: list, workers: int = None,
                         as_uint8: bool = False) -> np.ndarray:
        """Decode B same-shape bitstreams: z streams + AR wavefronts decode
        per-image in parallel threads; hyper-synthesis and synthesis run as
        single batched TPU programs. Returns (B, H, W, 3); as_uint8 downloads
        uint8 pixels (see decompress)."""
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        heads = [struct.unpack(fmt, d[:hs]) for d in datas]
        for head in heads:
            if head[0] != _MAGIC or head[1] != _KIND_JOINT:
                raise ValueError("not a joint-AR bitstream")
            if head[2] != self.K or head[3] != self.M:
                raise ValueError(
                    f"bitstream is for K={head[2]}, M={head[3]}; this codec "
                    f"has K={self.K}, M={self.M}")
        img_h, img_w = heads[0][4], heads[0][5]
        assert all(h[4] == img_h and h[5] == img_w for h in heads), \
            "decompress_batch requires same-shape bitstreams"
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64

        # z decode (cheap, serial — warms/uses the table cache safely)
        z_all = np.empty((len(datas), hz, wz, self.M), np.float32)
        for b, (head, d) in enumerate(zip(heads, datas)):
            zmin, zmax, len_z = head[7], head[8], head[9]
            cdfs, offsets, sizes = self._z_tables(zmin, zmax)
            z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
            z_sym = _decode_indexed_checked(d[hs:hs + len_z], z_index, cdfs,
                                            offsets, sizes)
            z_all[b] = z_sym.reshape(hz, wz, self.M).astype(np.float32)

        # batch-1 hyper-synthesis per image: see compress_batch determinism note
        psi = np.concatenate([
            np.asarray(self._hyper_synthesis(self.variables,
                                             jnp.asarray(z_all[b])[None])[0],
                       np.float32)
            for b in range(z_all.shape[0])])

        def _one(b):
            head, d = heads[b], datas[b]
            len_z, len_y = head[9], head[10]
            payload = d[hs + len_z:hs + len_z + len_y]
            layout = head[6]
            if layout & 0x8000:  # interleaved rANS (see compress n_streams)
                n = layout & 0xFF
                if n < 1:
                    raise ValueError("corrupt header: stream count 0")
                return self._host_nets.native_coder().decode_n(
                    payload, psi[b], h, w, n)
            assert layout == (1 << 8) | 1, \
                "decompress_batch handles untiled streams (decode tiled " \
                "bitstreams via decompress)"
            return _ar_decode_latents(self._host_nets, payload, psi[b], h, w)
        with ThreadPoolExecutor(
                max_workers=workers or min(len(datas),
                                           os.cpu_count() or 1)) as ex:
            y_all = np.stack(list(ex.map(_one, range(len(datas)))))
        y_dev = _latents_to_device(y_all)
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


# ---------------------------------------------------------------------------
# Codec for FactorizedPrior (fully parallel both directions)
# ---------------------------------------------------------------------------

class CheckerboardCodec:
    """Two-pass parallel codec for models.CheckerboardHierarchical.

    No host wavefront: decoding a latent grid is exactly TWO jitted device
    programs — anchor entropy params from the hyperprior alone
    (model.anchor_pass), then non-anchor params from ONE conv over the
    decoded anchors (model.nonanchor_pass) — plus two chunked
    decode_gaussian calls on a single rANS stream. The entire entropy-
    parameter computation is parallel device work, so decode latency is
    O(TPU forward), not O(h + w) serial waves on the host.

    Determinism contract: unlike the wavefront codec (whose parameters are
    derived through a shared HOST path), both sides here derive ALL entropy
    parameters through the SAME jitted device programs on the SAME integer
    inputs (z_q; the anchor-filled latent grid), so the f32 parameters are
    bit-identical at encode and decode. Streams are self-consistent per
    device/build; cross-machine portability remains the portable card's job.

    Stream layout: common header (kind 7, layout word 0) + z stream
    (factorized tables, identical to JointARCodec) + ONE y stream holding
    anchors in row-major order followed by non-anchors (channel fastest),
    the order checkerboard_mask defines.
    """

    def __init__(self, model, variables, portable_card=None):
        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self.K = model.K
        self._z_cache = {}
        self._prog_cache = {}
        self._portable_card = portable_card
        self._analysis_q = _make_analysis(model, with_hyper=True)
        self._analysis_f32 = None
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)

    # -- helpers ----------------------------------------------------------
    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=True)
        return self._analysis_f32

    def _z_tables(self, zmin: int, zmax: int):
        key = (zmin, zmax)
        if key not in self._z_cache:
            self._z_cache[key] = factorized_tables(self.model, self.variables,
                                                   zmin, zmax)
        return self._z_cache[key]

    def _programs(self, h: int, w: int):
        """Per-latent-shape jitted pass programs with ON-DEVICE row gather.

        Only the coder-needed rows cross the host<->device link: each pass
        gathers its mask half (anchor flat indices are jit constants) and
        pre-transposes K>1 grids to the coder's (n*M, K) row layout on the
        TPU, so the download is half the grid per pass instead of the full
        (h, w, [K,] M) parameter tensors twice — on the tunneled dev chip
        the f32 grid downloads dominate decode latency. Encode and decode
        share these exact programs, so parameters stay bit-identical on
        both sides (the determinism contract).
        """
        key = (h, w)
        if key in self._prog_cache:
            return self._prog_cache[key]
        am = checkerboard_mask(h, w)
        idx_a = np.flatnonzero(am.ravel())
        idx_n = np.flatnonzero(~am.ravel())
        model, K, M = self.model, self.K, self.M

        def rows(p, idx):
            flat = p.astype(jnp.float32).reshape((h * w,) + p.shape[3:])[idx]
            if K == 1:                       # (n, M) -> (n*M,)
                return flat.reshape(-1).astype(_PARAM_FETCH)
            # (n, K, M) -> (n, M, K) -> (n*M, K)
            return jnp.swapaxes(flat, 1, 2).reshape(-1, K).astype(_PARAM_FETCH)

        @jax.jit
        def anchor_prog(v, zq):
            out = model.apply(v, zq,
                              method=lambda mdl, z: mdl.anchor_pass(z))
            psi, params = out[0], out[1:]
            return (psi,) + tuple(rows(p, idx_a) for p in params)

        @jax.jit
        def nonanchor_prog(v, psi, ya):
            params = model.apply(
                v, psi, ya.astype(jnp.float32),
                method=lambda mdl, p, y: mdl.nonanchor_pass(p, y))
            return tuple(rows(p, idx_n) for p in params)

        self._prog_cache[key] = (anchor_prog, nonanchor_prog)
        return self._prog_cache[key]

    def _coder_rows(self, rows_t):
        """Downloaded row tensors -> f32 (mus, sigmas, weights) coder args.

        Rows arrive in _PARAM_FETCH (f16 by default — half the tunnel
        bytes); the f16->f32 upcast here is exact, so encode and decode
        still hand the coder bit-identical values."""
        if self.K == 1:
            mu, sigma = rows_t
            return (np.asarray(mu, np.float32),
                    np.asarray(sigma, np.float32), None)
        w, mus, sig = rows_t
        return (np.asarray(mus, np.float32), np.asarray(sig, np.float32),
                np.asarray(w, np.float32))

    # -- portable mode ------------------------------------------------------
    def portable_card(self):
        """The deterministic codec artifact for cross-machine checkerboard
        streams (family=1: the 12 odd-parity taps of the plain 5x5 context
        conv replace the wavefront card's causal taps; everything downstream
        — integer hyper-decoder, EP MLP, sigma-bin CDF tables — is the same
        spec). Built lazily; ship with .save(path)."""
        if self._portable_card is None:
            from neural_image_compression_tpu.coding.portable import PortableCard

            self._portable_card = PortableCard.build(self.model, self.variables,
                                                     family="checkerboard")
        return self._portable_card

    def compress_portable(self, x: np.ndarray) -> bytes:
        """Encode with the cross-machine deterministic integer path: decode
        is two integer GEMM passes on ANY machine/implementation holding the
        same card — no device in the loop at all (unlike compress(), whose
        pass programs are per-build jitted device code)."""
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, x)
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def compress_latents_portable(self, y_q, z_q, img_h: int,
                                  img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py) as a PORTABLE cross-machine stream. Stream-
        compatible with compress_portable(); z_q is clipped to the card's
        [zmin, zmax] range (see JointARCodec equivalent)."""
        card = self.portable_card()
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        z_q = np.clip(z_q, card.zmin, card.zmax)
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, z_q: np.ndarray,
                              img_h: int, img_w: int) -> bytes:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         card.z_cdfs, card.z_offsets,
                                         card.z_sizes)
        psi_fix = card.hyper_forward(z_q)
        y_payload = P.portable_cb_encode(card, y_q, psi_fix)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC,
                             _KIND_CHECKERBOARD_PORTABLE, self.K, self.M,
                             img_h, img_w, 0, card.zmin, card.zmax,
                             len(z_bytes), len(y_payload))
        return header + card.hash + z_bytes + y_payload

    def _decode_latents_portable(self, data: bytes
                                 ) -> Tuple[np.ndarray, np.ndarray]:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        _, _, K, M, img_h, img_w, _, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if K != self.K or M != self.M:
            raise ValueError(f"stream is K={K} M={M}, codec model is "
                             f"K={self.K} M={self.M}")
        if data[hs:hs + 8] != card.hash:
            raise ValueError(
                "portable stream was encoded with a different card — load "
                "the encoder's card file (PortableCard.load) and pass it "
                "via CheckerboardCodec(portable_card=...)")
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        z_bytes = data[hs + 8:hs + 8 + len_z]
        y_payload = data[hs + 8 + len_z:hs + 8 + len_z + len_y]
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(
            z_bytes, z_index, card.z_cdfs, card.z_offsets, card.z_sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)
        psi_fix = card.hyper_forward(z_q)
        y_hat = P.portable_cb_decode(card, y_payload, psi_fix, h, w)
        return y_hat, z_q

    # -- interleaved-lane helpers ------------------------------------------
    @staticmethod
    def _encode_lanes(sym, mus, sigmas, weights, n_a: int, n: int,
                      workers=None) -> bytes:
        """N-way interleaved rANS for the two-block (anchors || non-anchors)
        symbol sequence: within EACH block, symbol s goes to lane s % N, so
        pass-1 decode needs only the anchor prefix of every lane and pass-2
        continues the same lanes. Entropy params are untouched (the lanes
        are a pure partition), so the rate cost is the ~4-byte rANS tail +
        4-byte length word per extra lane. Payload: N uint32 lane lengths +
        concatenated lanes."""
        def _one(i):
            pick = np.concatenate([np.arange(i, n_a, n),
                                   np.arange(n_a + i, len(sym), n)])
            return backend.encode_gaussian(
                sym[pick], mus[pick], sigmas[pick],
                None if weights is None else weights[pick])
        with ThreadPoolExecutor(
                max_workers=workers or min(n, os.cpu_count() or 1)) as ex:
            lanes = list(ex.map(_one, range(n)))
        table = struct.pack(f"<{n}I", *[len(s) for s in lanes])
        return table + b"".join(lanes)

    @staticmethod
    def _open_lanes(payload: bytes, n: int):
        """Payload -> N RansDecoder lane decoders."""
        table = struct.unpack(f"<{n}I", payload[:4 * n])
        if 4 * n + sum(table) != len(payload):
            raise ValueError("corrupt checkerboard stream: lane table does "
                             "not cover the payload")
        decs, off = [], 4 * n
        for ln in table:
            decs.append(backend.RansDecoder(payload[off:off + ln]))
            off += ln
        return decs

    @staticmethod
    def _decode_block_lanes(decs, mus, sigmas, weights, workers=None
                            ) -> np.ndarray:
        """Decode one block (anchors or non-anchors) across the lanes: lane
        i holds symbols i, i+N, ... of the block. Lanes are independent
        streams and the native decoder releases the GIL, so they decode
        concurrently on a multicore host."""
        n = len(decs)
        out = np.empty(mus.shape[0], np.int32)

        def _one(i):
            out[i::n] = decs[i].decode_gaussian(
                mus[i::n], sigmas[i::n],
                None if weights is None else weights[i::n])
        with ThreadPoolExecutor(
                max_workers=workers or min(n, os.cpu_count() or 1)) as ex:
            list(ex.map(_one, range(n)))
        return out

    # -- encode -----------------------------------------------------------
    def compress(self, x: np.ndarray, n_streams: int = 1) -> bytes:
        """x: (1, H, W, 3) float32 in [0,1] OR uint8, any size (padded to
        multiples of 64, cropped back at decompress).

        n_streams=N (N>1): N-way INTERLEAVED rANS with unchanged entropy
        params — anchors and non-anchors are fully parallel within their
        pass, so (unlike the wavefront codec's interleaving) the lanes are a
        trivial partition: rate-neutral up to the ~8-byte/lane framing, and
        a multicore decoder pulls the lanes concurrently inside each pass.
        """
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        assert 1 <= n_streams <= 255
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))

        outs = self._analysis_q(self.variables, x)
        h, w = outs[0].shape[1], outs[0].shape[2]
        anchor_prog, _ = self._programs(h, w)
        # pass 1 enqueues on the DEVICE z_q before any host fetch: psi and
        # the anchor rows pipeline with the y/z downloads over the link
        out_a = anchor_prog(self.variables, outs[1])
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]  # (h, w, M)
        z_q = np.asarray(outs[1])[0]
        backend._require_integral_latents(y_q)
        return self._encode_from(y_q, z_q, out_a, img_h, img_w, n_streams)

    def compress_latents(self, y_q, z_q, img_h: int, img_w: int,
                         n_streams: int = 1) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py). Stream-compatible with compress(): entropy
        parameters derive only from z_q and the coded anchors, through the
        SAME jitted pass programs decode runs."""
        assert 1 <= n_streams <= 255
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        anchor_prog, _ = self._programs(y_q.shape[0], y_q.shape[1])
        out_a = anchor_prog(self.variables, jnp.asarray(z_q)[None])
        return self._encode_from(y_q, z_q, out_a, img_h, img_w, n_streams)

    def _encode_from(self, y_q: np.ndarray, z_q: np.ndarray, out_a,
                     img_h: int, img_w: int, n_streams: int) -> bytes:
        """Shared coding stage from host latent grids and the anchor-pass
        program output (psi + anchor parameter rows)."""
        h, w = y_q.shape[:2]
        psi_dev, pa = out_a[0], out_a[1:]
        _, nonanchor_prog = self._programs(h, w)
        am = checkerboard_mask(h, w)
        y_anchor = np.where(am[..., None], y_q, 0.0).astype(np.float32)
        pna = nonanchor_prog(self.variables, psi_dev,
                             _latents_to_device(y_anchor[None]))

        # --- z stream ---------------------------------------------------
        zmin, zmax = int(z_q.min()), int(z_q.max())
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         cdfs, offsets, sizes)

        # --- y stream(s): anchors then non-anchors -----------------------
        sym = np.concatenate([y_q[am], y_q[~am]]).astype(np.int32).reshape(-1)
        mu_a, sig_a, w_a = self._coder_rows(pa)
        mu_n, sig_n, w_n = self._coder_rows(pna)
        mus = np.concatenate([mu_a, mu_n])
        sigmas = np.concatenate([sig_a, sig_n])
        weights = None if self.K == 1 else np.concatenate([w_a, w_n])
        if n_streams == 1:
            y_bytes = backend.encode_gaussian(sym, mus, sigmas, weights)
            layout = 0
        else:
            y_bytes = self._encode_lanes(sym, mus, sigmas, weights,
                                         mu_a.shape[0], n_streams)
            layout = 0x8000 | n_streams

        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_CHECKERBOARD,
                             self.K, self.M, img_h, img_w, layout, zmin, zmax,
                             len(z_bytes), len(y_bytes))
        return header + z_bytes + y_bytes

    def compress_batch(self, xs: np.ndarray, workers: int = None,
                       n_streams: int = 1) -> list:
        """Encode B images with every device pass enqueued before the first
        host fetch (the tunnel pipelines all the programs) and the host rANS
        threaded per image. Streams are byte-identical to per-image
        compress(): the pass programs run batch-1 per image — the entropy
        params feed the deterministic coding path, and a B-batched program
        is not guaranteed bit-identical to batch-1 (same contract as
        JointARCodec.compress_batch). xs: (B, H, W, 3); returns B streams."""
        assert xs.ndim == 4
        assert 1 <= n_streams <= 255
        img_h, img_w = xs.shape[1], xs.shape[2]
        xp = _pad_input(xs, 64)
        B = xp.shape[0]
        outs = [self._analysis_q(self.variables, jnp.asarray(xp[b:b + 1]))
                for b in range(B)]
        h, w = outs[0][0].shape[1], outs[0][0].shape[2]
        anchor_prog, nonanchor_prog = self._programs(h, w)
        outs_a = [anchor_prog(self.variables, o[1]) for o in outs]
        am = checkerboard_mask(h, w)
        pnas = []
        y_qs, z_qs = [], []
        for b in range(B):
            y_q = _fetch_y16(outs[b][0], lambda b=b: np.asarray(
                self._analysis_full()(self.variables,
                                      jnp.asarray(xp[b:b + 1]))[0]))[0]
            backend._require_integral_latents(y_q)
            y_qs.append(y_q)
            z_qs.append(np.asarray(outs[b][1])[0])
            y_anchor = np.where(am[..., None], y_q, 0.0).astype(np.float32)
            pnas.append(nonanchor_prog(self.variables, outs_a[b][0],
                                       _latents_to_device(y_anchor[None])))
        # warm the z-table cache serially (it's a jitted device call)
        for z_q in z_qs:
            self._z_tables(int(z_q.min()), int(z_q.max()))

        def _one(b):
            y_q, z_q = y_qs[b], z_qs[b]
            zmin, zmax = int(z_q.min()), int(z_q.max())
            cdfs, offsets, sizes = self._z_tables(zmin, zmax)
            z_sym = z_q.reshape(-1, self.M).astype(np.int32)
            z_index = np.tile(np.arange(self.M, dtype=np.int32),
                              z_sym.shape[0])
            z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                             cdfs, offsets, sizes)
            sym = np.concatenate([y_q[am], y_q[~am]]).astype(
                np.int32).reshape(-1)
            mu_a, sig_a, w_a = self._coder_rows(outs_a[b][1:])
            mu_n, sig_n, w_n = self._coder_rows(pnas[b])
            mus = np.concatenate([mu_a, mu_n])
            sigmas = np.concatenate([sig_a, sig_n])
            weights = None if self.K == 1 else np.concatenate([w_a, w_n])
            if n_streams == 1:
                y_bytes = backend.encode_gaussian(sym, mus, sigmas, weights)
                layout = 0
            else:
                y_bytes = self._encode_lanes(sym, mus, sigmas, weights,
                                             mu_a.shape[0], n_streams,
                                             workers=1)
                layout = 0x8000 | n_streams
            header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_CHECKERBOARD,
                                 self.K, self.M, img_h, img_w, layout,
                                 zmin, zmax, len(z_bytes), len(y_bytes))
            return header + z_bytes + y_bytes
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            return list(ex.map(_one, range(B)))

    # -- decode -----------------------------------------------------------
    def _parse_header(self, data: bytes):
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        magic, kind, K, M, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if magic != _MAGIC or kind not in (_KIND_CHECKERBOARD,
                                           _KIND_CHECKERBOARD_PORTABLE):
            raise ValueError("not a checkerboard bitstream")
        if K != self.K or M != self.M:
            raise ValueError(f"stream is K={K} M={M}, codec model is "
                             f"K={self.K} M={self.M}")
        return hs, img_h, img_w, layout, zmin, zmax, len_z, len_y

    @staticmethod
    def _is_portable(data: bytes) -> bool:
        return len(data) > 5 and data[4] == _KIND_CHECKERBOARD_PORTABLE

    def _decode_z(self, z_bytes: bytes, zmin: int, zmax: int, hz: int,
                  wz: int) -> np.ndarray:
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(z_bytes, z_index, cdfs, offsets,
                                        sizes)
        return z_sym.reshape(hz, wz, self.M).astype(np.float32)

    def _open_y(self, payload: bytes, layout: int):
        """Lane decoders for a y payload (single stream = one lane)."""
        if layout & 0x8000:
            n = layout & 0xFF
            if n < 1:
                raise ValueError("corrupt header: interleaved stream count 0")
            return self._open_lanes(payload, n)
        if layout != 0:
            raise ValueError(f"unknown checkerboard stream layout {layout}")
        return [backend.RansDecoder(payload)]

    def decode_latents(self, data: bytes) -> Tuple[np.ndarray, np.ndarray]:
        """Decode (y_q, z_q) from a checkerboard bitstream (float or
        portable kind)."""
        if self._is_portable(data):
            self._parse_header(data)  # magic/K/M validation
            return self._decode_latents_portable(data)
        hs, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            self._parse_header(data)
        z_bytes = data[hs:hs + len_z]
        y_payload = data[hs + len_z:hs + len_z + len_y]

        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64

        z_q = self._decode_z(z_bytes, zmin, zmax, hz, wz)

        # --- pass 1: anchors from the hyperprior --------------------------
        anchor_prog, nonanchor_prog = self._programs(h, w)
        out_a = anchor_prog(self.variables, jnp.asarray(z_q)[None])
        psi_dev, pa = out_a[0], out_a[1:]
        am = checkerboard_mask(h, w)
        mu_a, sig_a, w_a = self._coder_rows(pa)
        decs = self._open_y(y_payload, layout)
        vals_a = self._decode_block_lanes(decs, mu_a, sig_a, w_a)
        y_hat = np.zeros((h, w, self.M), np.float32)
        y_hat[am] = vals_a.reshape(-1, self.M).astype(np.float32)

        # --- pass 2: non-anchors from one conv over the anchors -----------
        pna = nonanchor_prog(self.variables, psi_dev,
                             _latents_to_device(y_hat[None]))
        mu_n, sig_n, w_n = self._coder_rows(pna)
        vals_n = self._decode_block_lanes(decs, mu_n, sig_n, w_n)
        for dec in decs:
            dec.finish()  # truncated/corrupt stream -> error, not garbage
        y_hat[~am] = vals_n.reshape(-1, self.M).astype(np.float32)
        return y_hat, z_q

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        """Reconstruct (1, H, W, 3); as_uint8 downloads uint8 pixels (4x
        less link traffic — the serving output)."""
        y_hat, _ = self.decode_latents(data)
        img_h, img_w = _stream_size(data)
        y_dev = _latents_to_device(y_hat[None])
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]

    def decompress_batch(self, datas: list, workers: int = None,
                         as_uint8: bool = False) -> np.ndarray:
        """Decode B same-shape bitstreams as two PIPELINED pass waves: all
        pass-1 programs are enqueued before any host fetch (the tunnel
        round-trips overlap across images), anchors rANS-decode in parallel
        threads, then the same for pass 2, and ONE batched synthesis program
        reconstructs the whole batch (synthesis never feeds the coder, so
        batching it is determinism-safe; the pass programs stay batch-1 —
        the same contract as compress_batch). Returns (B, H, W, 3)."""
        if any(self._is_portable(d) for d in datas):
            # portable decode has no device pass to pipeline; keep it simple
            return np.concatenate([self.decompress(d, as_uint8=as_uint8)
                                   for d in datas])
        parsed = [self._parse_header(d) for d in datas]
        img_h, img_w = parsed[0][1], parsed[0][2]
        assert all(p[1] == img_h and p[2] == img_w for p in parsed), \
            "decompress_batch requires same-shape bitstreams"
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        B = len(datas)
        am = checkerboard_mask(h, w)
        anchor_prog, nonanchor_prog = self._programs(h, w)

        # z decode (serial — warms/uses the jitted z-table cache safely)
        z_all = [self._decode_z(datas[b][parsed[b][0]:
                                         parsed[b][0] + parsed[b][6]],
                                parsed[b][4], parsed[b][5], hz, wz)
                 for b in range(B)]

        # --- pass-1 wave: enqueue all programs, then fetch + decode -------
        outs_a = [anchor_prog(self.variables, jnp.asarray(z_all[b])[None])
                  for b in range(B)]
        y_hats = [np.zeros((h, w, self.M), np.float32) for _ in range(B)]
        all_decs = [None] * B

        def _pass1(b):
            hs, _, _, layout, _, _, len_z, len_y = parsed[b]
            payload = datas[b][hs + len_z:hs + len_z + len_y]
            decs = self._open_y(payload, layout)
            mu_a, sig_a, w_a = self._coder_rows(outs_a[b][1:])
            vals = self._decode_block_lanes(decs, mu_a, sig_a, w_a,
                                            workers=1)
            y_hats[b][am] = vals.reshape(-1, self.M).astype(np.float32)
            all_decs[b] = decs
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            list(ex.map(_pass1, range(B)))

        # --- pass-2 wave --------------------------------------------------
        pnas = [nonanchor_prog(self.variables, outs_a[b][0],
                               _latents_to_device(y_hats[b][None]))
                for b in range(B)]

        def _pass2(b):
            mu_n, sig_n, w_n = self._coder_rows(pnas[b])
            vals = self._decode_block_lanes(all_decs[b], mu_n, sig_n, w_n,
                                            workers=1)
            for dec in all_decs[b]:
                dec.finish()
            y_hats[b][~am] = vals.reshape(-1, self.M).astype(np.float32)
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            list(ex.map(_pass2, range(B)))

        # --- one batched synthesis over the whole batch -------------------
        y_dev = _latents_to_device(np.stack(y_hats))
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


class ChannelCheckerboardCodec:
    """2·G-pass parallel codec for models.ChannelCheckerboardHierarchical
    (the ELIC-style unevenly-grouped space-channel context family).

    Decode is a short, fixed chain of jitted device programs — per channel
    group: one pass for the group's ANCHORS (hyper + channel context over
    the already-decoded groups) and one for its NON-ANCHORS (+ one conv
    over the group's decoded anchors) — 2·G passes total (G = 4 by
    default), each a fully-parallel conv/GEMM program. Like
    CheckerboardCodec there is NO serial host AR stage; unlike it, groups
    chain sequentially (group i's context needs groups < i decoded), which
    is the He-2022 rate-for-latency trade in the other direction.

    Determinism contract (same as CheckerboardCodec): encode and decode
    derive ALL entropy parameters through the SAME jitted programs on the
    SAME integer inputs — at encode time the "decoded" groups are exactly
    the quantized latents, so the f32 parameters are bit-identical on both
    sides. Streams are self-consistent per device/build; cross-machine
    streams use the portable card SET (kind 12, coding/portable.py
    ChannelCBCards — one integer sub-card per group).

    Stream layout: common header (kind 11, layout word 0 or 0x8000|lanes)
    + z stream (factorized tables, identical to JointARCodec) + ONE y
    payload holding, per group in order, the group's anchors (row-major,
    channel fastest) then its non-anchors — 2·G blocks. With n_streams=N
    the blocks are lane-partitioned exactly like CheckerboardCodec
    (within each block symbol s -> lane s % N): rate-neutral, exact
    context, N-core parallel decode inside every block.
    """

    def __init__(self, model, variables, portable_card=None):
        from neural_image_compression_tpu.models.channel_cb import (
            default_groups,
        )

        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self.K = model.K
        self.groups = (tuple(model.groups) if model.groups is not None
                       else default_groups(self.M))
        self._portable_card = portable_card
        self._z_cache = {}
        self._prog_cache = {}
        self._analysis_q = _make_analysis(model, with_hyper=True)
        self._analysis_f32 = None
        self._psi_prog = jax.jit(lambda v, zq: model.apply(
            v, zq, method=lambda mdl, z: mdl.hyper_features(z)))
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)

    # -- helpers ----------------------------------------------------------
    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=True)
        return self._analysis_f32

    def _z_tables(self, zmin: int, zmax: int):
        key = (zmin, zmax)
        if key not in self._z_cache:
            self._z_cache[key] = factorized_tables(self.model, self.variables,
                                                   zmin, zmax)
        return self._z_cache[key]

    def _programs(self, h: int, w: int):
        """Per-latent-shape jitted pass programs, one (anchor, non-anchor)
        pair per group, with ON-DEVICE row gather (only the coder-needed
        mask-half rows of the group's params cross the link — the same
        link-traffic rule as CheckerboardCodec._programs). The group-i
        anchor program also computes and RETURNS the group's channel-context
        features so the non-anchor program reuses them without recomputing
        the context stack."""
        key = (h, w)
        if key in self._prog_cache:
            return self._prog_cache[key]
        am = checkerboard_mask(h, w)
        idx_a = np.flatnonzero(am.ravel())
        idx_n = np.flatnonzero(~am.ravel())
        model, K = self.model, self.K

        def rows(p, idx):
            flat = p.astype(jnp.float32).reshape((h * w,) + p.shape[3:])[idx]
            if K == 1:
                return flat.reshape(-1).astype(_PARAM_FETCH)
            return jnp.swapaxes(flat, 1, 2).reshape(-1, K).astype(_PARAM_FETCH)

        def make(i):
            if i == 0:
                @jax.jit
                def aprog(v, psi):
                    params = model.apply(
                        v, psi, method=lambda mdl, p:
                        mdl.group_params(0, p, None, None))
                    return tuple(rows(p, idx_a) for p in params)

                @jax.jit
                def nprog(v, psi, ya):
                    params = model.apply(
                        v, psi, ya.astype(jnp.float32),
                        method=lambda mdl, p, y:
                        mdl.group_params(0, p, None, y))
                    return tuple(rows(p, idx_n) for p in params)
                return aprog, nprog

            @jax.jit
            def aprog(v, psi, y_prev):
                def body(mdl, p, yp):
                    ch = mdl.group_channel_ctx(i, yp.astype(jnp.float32))
                    return (ch,) + tuple(mdl.group_params(i, p, ch, None))
                out = model.apply(v, psi, y_prev, method=body)
                return (out[0],) + tuple(rows(p, idx_a) for p in out[1:])

            @jax.jit
            def nprog(v, psi, ch, ya):
                params = model.apply(
                    v, psi, ch, ya.astype(jnp.float32),
                    method=lambda mdl, p, c, y:
                    mdl.group_params(i, p, c, y))
                return tuple(rows(p, idx_n) for p in params)
            return aprog, nprog

        self._prog_cache[key] = tuple(make(i) for i in range(len(self.groups)))
        return self._prog_cache[key]

    # lane machinery is shared with (and layout-compatible with) the
    # two-block checkerboard codec; only the encode side generalizes to
    # 2·G blocks (_encode_lanes_blocks below)
    _coder_rows = CheckerboardCodec._coder_rows
    _open_lanes = staticmethod(CheckerboardCodec._open_lanes)
    _decode_block_lanes = staticmethod(CheckerboardCodec._decode_block_lanes)
    _open_y = CheckerboardCodec._open_y

    def _encode_lanes_blocks(self, sym, mus, sigmas, weights, bounds,
                             n: int, workers=None) -> bytes:
        """N-way interleaved rANS over 2·G blocks: within EACH block symbol
        s goes to lane s % N, so every pass's decode touches only its own
        block slice of every lane. Payload: N uint32 lane lengths +
        concatenated lanes (CheckerboardCodec layout, more blocks)."""
        def _one(i):
            pick = np.concatenate([np.arange(b0 + i, b1, n)
                                   for b0, b1 in zip(bounds[:-1], bounds[1:])])
            return backend.encode_gaussian(
                sym[pick], mus[pick], sigmas[pick],
                None if weights is None else weights[pick])
        with ThreadPoolExecutor(
                max_workers=workers or min(n, os.cpu_count() or 1)) as ex:
            lanes = list(ex.map(_one, range(n)))
        table = struct.pack(f"<{n}I", *[len(s) for s in lanes])
        return table + b"".join(lanes)

    def _group_passes_encode(self, y_q: np.ndarray, psi_dev, am: np.ndarray):
        """Enqueue all 2·G pass programs for one image's exact latents (at
        encode the 'decoded' groups ARE the quantized latents) and return
        the per-pass device row tensors in stream order."""
        h, w = y_q.shape[0], y_q.shape[1]
        progs = self._programs(h, w)
        rows_t = []
        off = 0
        for i, gi in enumerate(self.groups):
            y_g = y_q[..., off:off + gi]
            ya = np.where(am[..., None], y_g, 0.0).astype(np.float32)
            if i == 0:
                pa = progs[0][0](self.variables, psi_dev)
                pna = progs[0][1](self.variables, psi_dev,
                                  _latents_to_device(ya[None]))
            else:
                y_prev = y_q[..., :off].astype(np.float32)
                out = progs[i][0](self.variables, psi_dev,
                                  _latents_to_device(y_prev[None]))
                ch_dev, pa = out[0], out[1:]
                pna = progs[i][1](self.variables, psi_dev, ch_dev,
                                  _latents_to_device(ya[None]))
            rows_t.append((pa, pna))
            off += gi
        return rows_t

    def _y_stream(self, y_q: np.ndarray, rows_t, am: np.ndarray,
                  n_streams: int, workers=None):
        """Assemble the per-group (anchors || non-anchors) symbol sequence +
        coder rows and encode it (single stream or N lanes)."""
        syms, mus_l, sig_l, w_l, bounds = [], [], [], [], [0]
        off = 0
        for i, gi in enumerate(self.groups):
            y_g = y_q[..., off:off + gi]
            pa, pna = rows_t[i]
            for sel, p in ((am, pa), (~am, pna)):
                syms.append(y_g[sel].astype(np.int32).reshape(-1))
                mu, sig, wts = self._coder_rows(p)
                mus_l.append(mu)
                sig_l.append(sig)
                if wts is not None:
                    w_l.append(wts)
                bounds.append(bounds[-1] + syms[-1].size)
            off += gi
        sym = np.concatenate(syms)
        mus = np.concatenate(mus_l)
        sigmas = np.concatenate(sig_l)
        weights = None if self.K == 1 else np.concatenate(w_l)
        if n_streams == 1:
            return backend.encode_gaussian(sym, mus, sigmas, weights), 0
        return (self._encode_lanes_blocks(sym, mus, sigmas, weights, bounds,
                                          n_streams, workers=workers),
                0x8000 | n_streams)

    # -- encode -----------------------------------------------------------
    def compress(self, x: np.ndarray, n_streams: int = 1) -> bytes:
        """x: (1, H, W, 3) float32 in [0,1] OR uint8, any size (padded to
        multiples of 64, cropped back at decompress)."""
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        assert 1 <= n_streams <= 255
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))

        outs = self._analysis_q(self.variables, x)
        psi_dev = self._psi_prog(self.variables, outs[1])
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]  # (h, w, M)
        z_q = np.asarray(outs[1])[0]
        backend._require_integral_latents(y_q)
        return self._encode_from(y_q, z_q, psi_dev, img_h, img_w, n_streams)

    def compress_latents(self, y_q, z_q, img_h: int, img_w: int,
                         n_streams: int = 1) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py). Stream-compatible with compress(): entropy
        parameters derive only from z_q and the coded groups/anchors,
        through the SAME jitted pass programs decode runs."""
        assert 1 <= n_streams <= 255
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        psi_dev = self._psi_prog(self.variables, jnp.asarray(z_q)[None])
        return self._encode_from(y_q, z_q, psi_dev, img_h, img_w, n_streams)

    def _encode_from(self, y_q: np.ndarray, z_q: np.ndarray, psi_dev,
                     img_h: int, img_w: int, n_streams: int) -> bytes:
        """Shared coding stage from host latent grids and the device psi."""
        am = checkerboard_mask(y_q.shape[0], y_q.shape[1])
        rows_t = self._group_passes_encode(y_q, psi_dev, am)

        zmin, zmax = int(z_q.min()), int(z_q.max())
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         cdfs, offsets, sizes)
        y_bytes, layout = self._y_stream(y_q, rows_t, am, n_streams)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_CHANNEL_CB,
                             self.K, self.M, img_h, img_w, layout, zmin, zmax,
                             len(z_bytes), len(y_bytes))
        return header + z_bytes + y_bytes

    def compress_batch(self, xs: np.ndarray, workers: int = None,
                       n_streams: int = 1) -> list:
        """Encode B images: all analysis programs enqueue before the first
        host fetch, every image's 2·G pass programs enqueue as soon as its
        latents land, and the host rANS assembly threads per image. Streams
        are byte-identical to per-image compress() (batch-1 pass programs —
        the same determinism contract as CheckerboardCodec.compress_batch)."""
        assert xs.ndim == 4
        assert 1 <= n_streams <= 255
        img_h, img_w = xs.shape[1], xs.shape[2]
        xp = _pad_input(xs, 64)
        B = xp.shape[0]
        outs = [self._analysis_q(self.variables, jnp.asarray(xp[b:b + 1]))
                for b in range(B)]
        psis = [self._psi_prog(self.variables, o[1]) for o in outs]
        h, w = outs[0][0].shape[1], outs[0][0].shape[2]
        am = checkerboard_mask(h, w)
        y_qs, z_qs, rows_t = [], [], []
        for b in range(B):
            y_q = _fetch_y16(outs[b][0], lambda b=b: np.asarray(
                self._analysis_full()(self.variables,
                                      jnp.asarray(xp[b:b + 1]))[0]))[0]
            backend._require_integral_latents(y_q)
            y_qs.append(y_q)
            z_qs.append(np.asarray(outs[b][1])[0])
            rows_t.append(self._group_passes_encode(y_q, psis[b], am))
        for z_q in z_qs:  # warm the jitted z-table cache serially
            self._z_tables(int(z_q.min()), int(z_q.max()))

        def _one(b):
            y_q, z_q = y_qs[b], z_qs[b]
            zmin, zmax = int(z_q.min()), int(z_q.max())
            cdfs, offsets, sizes = self._z_tables(zmin, zmax)
            z_sym = z_q.reshape(-1, self.M).astype(np.int32)
            z_index = np.tile(np.arange(self.M, dtype=np.int32),
                              z_sym.shape[0])
            z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                             cdfs, offsets, sizes)
            y_bytes, layout = self._y_stream(y_q, rows_t[b], am, n_streams,
                                             workers=1)
            return struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_CHANNEL_CB,
                               self.K, self.M, img_h, img_w, layout,
                               zmin, zmax, len(z_bytes), len(y_bytes)
                               ) + z_bytes + y_bytes
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            return list(ex.map(_one, range(B)))

    # -- portable (cross-machine) path --------------------------------------
    def portable_card(self):
        """The deterministic codec artifact for cross-machine channel_cb
        streams: a ChannelCBCards SET — per group, a checkerboard-family
        integer sub-card whose `hyper` slot carries the group's
        channel-context convs (coding/portable.py). Built lazily; ship with
        .save(path)."""
        if self._portable_card is None:
            from neural_image_compression_tpu.coding.portable import (
                build_channel_cb_cards,
            )

            self._portable_card = build_channel_cb_cards(self.model,
                                                         self.variables)
        if tuple(self._portable_card.groups) != self.groups:
            raise ValueError(
                f"portable card set is for groups "
                f"{tuple(self._portable_card.groups)}, codec model has "
                f"{self.groups}")
        return self._portable_card

    def compress_portable(self, x: np.ndarray) -> bytes:
        """Encode with the cross-machine deterministic integer path: decode
        is 2·G integer GEMM/conv passes on ANY machine/implementation
        holding the same card set — no device in the loop at all (unlike
        compress(), whose pass programs are per-build jitted device code)."""
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, x)
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def compress_latents_portable(self, y_q, z_q, img_h: int,
                                  img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py) as a PORTABLE cross-machine stream. Stream-
        compatible with compress_portable(); z_q is clipped to the card
        set's [zmin, zmax] range (see JointARCodec equivalent)."""
        card = self.portable_card()
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        z_q = np.clip(z_q, card.zmin, card.zmax)
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, z_q: np.ndarray,
                              img_h: int, img_w: int) -> bytes:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         card.z_cdfs, card.z_offsets,
                                         card.z_sizes)
        psi_fix = card.hyper_forward(z_q)
        y_payload = P.portable_ccb_encode(card, y_q, psi_fix)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC,
                             _KIND_CHANNEL_CB_PORTABLE, self.K, self.M,
                             img_h, img_w, 0, card.zmin, card.zmax,
                             len(z_bytes), len(y_payload))
        return header + card.hash + z_bytes + y_payload

    def _decode_latents_portable(self, data: bytes
                                 ) -> Tuple[np.ndarray, np.ndarray]:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        _, _, K, M, img_h, img_w, _, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if K != self.K or M != self.M:
            raise ValueError(f"stream is K={K} M={M}, codec model is "
                             f"K={self.K} M={self.M}")
        if data[hs:hs + 8] != card.hash:
            raise ValueError(
                "portable stream was encoded with a different card set — "
                "load the encoder's card file (ChannelCBCards.load) and "
                "pass it via ChannelCheckerboardCodec(portable_card=...)")
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        z_bytes = data[hs + 8:hs + 8 + len_z]
        y_payload = data[hs + 8 + len_z:hs + 8 + len_z + len_y]
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(
            z_bytes, z_index, card.z_cdfs, card.z_offsets, card.z_sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)
        psi_fix = card.hyper_forward(z_q)
        y_hat = P.portable_ccb_decode(card, y_payload, psi_fix, h, w)
        return y_hat, z_q

    @staticmethod
    def _is_portable(data: bytes) -> bool:
        return len(data) > 5 and data[4] == _KIND_CHANNEL_CB_PORTABLE

    # -- decode -----------------------------------------------------------
    def _parse_header(self, data: bytes):
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        magic, kind, K, M, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if magic != _MAGIC or kind not in (_KIND_CHANNEL_CB,
                                           _KIND_CHANNEL_CB_PORTABLE):
            raise ValueError("not a channel-checkerboard bitstream")
        if K != self.K or M != self.M:
            raise ValueError(f"stream is K={K} M={M}, codec model is "
                             f"K={self.K} M={self.M}")
        return hs, img_h, img_w, layout, zmin, zmax, len_z, len_y

    def _decode_z(self, z_bytes: bytes, zmin: int, zmax: int, hz: int,
                  wz: int) -> np.ndarray:
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(z_bytes, z_index, cdfs, offsets,
                                        sizes)
        return z_sym.reshape(hz, wz, self.M).astype(np.float32)

    def _decode_groups(self, decs, psi_dev, h: int, w: int,
                       workers=None) -> np.ndarray:
        """Run the 2·G pass chain against open lane decoders -> (h, w, M)."""
        am = checkerboard_mask(h, w)
        progs = self._programs(h, w)
        y_hat = np.zeros((h, w, self.M), np.float32)
        off = 0
        for i, gi in enumerate(self.groups):
            if i == 0:
                pa = progs[0][0](self.variables, psi_dev)
                ch_dev = None
            else:
                out = progs[i][0](self.variables, psi_dev,
                                  _latents_to_device(y_hat[None, ..., :off]))
                ch_dev, pa = out[0], out[1:]
            mu_a, sig_a, w_a = self._coder_rows(pa)
            vals_a = self._decode_block_lanes(decs, mu_a, sig_a, w_a,
                                              workers=workers)
            y_hat[am, off:off + gi] = vals_a.reshape(-1, gi)

            ya = np.where(am[..., None], y_hat[..., off:off + gi],
                          0.0).astype(np.float32)
            if i == 0:
                pna = progs[0][1](self.variables, psi_dev,
                                  _latents_to_device(ya[None]))
            else:
                pna = progs[i][1](self.variables, psi_dev, ch_dev,
                                  _latents_to_device(ya[None]))
            mu_n, sig_n, w_n = self._coder_rows(pna)
            vals_n = self._decode_block_lanes(decs, mu_n, sig_n, w_n,
                                              workers=workers)
            y_hat[~am, off:off + gi] = vals_n.reshape(-1, gi)
            off += gi
        for dec in decs:
            dec.finish()  # truncated/corrupt stream -> error, not garbage
        return y_hat

    def decode_latents(self, data: bytes) -> Tuple[np.ndarray, np.ndarray]:
        """Decode (y_q, z_q) from a channel-checkerboard bitstream (float
        or portable kind)."""
        if self._is_portable(data):
            self._parse_header(data)  # magic/K/M validation
            return self._decode_latents_portable(data)
        hs, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            self._parse_header(data)
        z_bytes = data[hs:hs + len_z]
        y_payload = data[hs + len_z:hs + len_z + len_y]
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        z_q = self._decode_z(z_bytes, zmin, zmax, hz, wz)
        psi_dev = self._psi_prog(self.variables, jnp.asarray(z_q)[None])
        decs = self._open_y(y_payload, layout)
        y_hat = self._decode_groups(decs, psi_dev, h, w)
        return y_hat, z_q

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        y_hat, _ = self.decode_latents(data)
        img_h, img_w = _stream_size(data)
        y_dev = _latents_to_device(y_hat[None])
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]

    def decompress_batch(self, datas: list, workers: int = None,
                         as_uint8: bool = False) -> np.ndarray:
        """Decode B same-shape bitstreams as 2·G pipelined pass WAVES: within
        each (group, pass) wave all images' programs enqueue before any host
        fetch (tunnel round-trips overlap across images) and the rANS block
        decodes thread per image; ONE batched synthesis program reconstructs
        the whole batch (the same wave structure as
        CheckerboardCodec.decompress_batch, G times)."""
        if any(self._is_portable(d) for d in datas):
            # portable decode has no device pass to pipeline; keep it simple
            return np.concatenate([self.decompress(d, as_uint8=as_uint8)
                                   for d in datas])
        parsed = [self._parse_header(d) for d in datas]
        img_h, img_w = parsed[0][1], parsed[0][2]
        assert all(p[1] == img_h and p[2] == img_w for p in parsed), \
            "decompress_batch requires same-shape bitstreams"
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        B = len(datas)
        am = checkerboard_mask(h, w)
        progs = self._programs(h, w)

        z_all = [self._decode_z(datas[b][parsed[b][0]:
                                         parsed[b][0] + parsed[b][6]],
                                parsed[b][4], parsed[b][5], hz, wz)
                 for b in range(B)]
        psis = [self._psi_prog(self.variables, jnp.asarray(z)[None])
                for z in z_all]
        all_decs = [self._open_y(
            datas[b][parsed[b][0] + parsed[b][6]:
                     parsed[b][0] + parsed[b][6] + parsed[b][7]],
            parsed[b][3]) for b in range(B)]
        y_hats = [np.zeros((h, w, self.M), np.float32) for _ in range(B)]

        off = 0
        for i, gi in enumerate(self.groups):
            if i == 0:
                pas = [(None, progs[0][0](self.variables, psis[b]))
                       for b in range(B)]
            else:
                outs = [progs[i][0](self.variables, psis[b],
                                    _latents_to_device(
                                        y_hats[b][None, ..., :off]))
                        for b in range(B)]
                pas = [(o[0], o[1:]) for o in outs]

            def _anchors(b, off=off, gi=gi):
                mu_a, sig_a, w_a = self._coder_rows(pas[b][1])
                vals = self._decode_block_lanes(all_decs[b], mu_a, sig_a,
                                                w_a, workers=1)
                y_hats[b][am, off:off + gi] = vals.reshape(-1, gi)
            with ThreadPoolExecutor(
                    max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
                list(ex.map(_anchors, range(B)))

            pnas = []
            for b in range(B):
                ya = np.where(am[..., None], y_hats[b][..., off:off + gi],
                              0.0).astype(np.float32)
                if i == 0:
                    pnas.append(progs[0][1](self.variables, psis[b],
                                            _latents_to_device(ya[None])))
                else:
                    pnas.append(progs[i][1](self.variables, psis[b],
                                            pas[b][0],
                                            _latents_to_device(ya[None])))

            def _nonanchors(b, off=off, gi=gi):
                mu_n, sig_n, w_n = self._coder_rows(pnas[b])
                vals = self._decode_block_lanes(all_decs[b], mu_n, sig_n,
                                                w_n, workers=1)
                y_hats[b][~am, off:off + gi] = vals.reshape(-1, gi)
            with ThreadPoolExecutor(
                    max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
                list(ex.map(_nonanchors, range(B)))
            off += gi
        for decs in all_decs:
            for dec in decs:
                dec.finish()

        y_dev = _latents_to_device(np.stack(y_hats))
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


class MeanScaleHyperpriorCodec:
    """One-pass parallel codec for models.MeanScaleHyperprior.

    The context-free family's entropy parameters depend only on z, so BOTH
    directions are a single jitted device program (hyper-decoder + EP net)
    plus one rANS call over the whole latent grid: no wavefront (JointAR),
    no anchor/non-anchor feedback (Checkerboard) — the lowest-latency decode
    in the codec ladder.

    Determinism contract (same as CheckerboardCodec): encode and decode
    derive all entropy parameters through the SAME jitted program on the
    SAME integer z_q, so the f32 parameters are bit-identical on both
    sides. Streams are self-consistent per device/build.

    Stream layout: common header (kind 9) + z stream (factorized tables,
    identical to JointARCodec) + ONE y stream in row-major position order,
    channel fastest (K>1 grids pre-transposed on device to the coder's
    (n*M, K) row layout).
    """

    def __init__(self, model, variables, portable_card=None):
        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self.K = model.K
        self._z_cache = {}
        self._portable_card = portable_card
        self._analysis_q = _make_analysis(model, with_hyper=True)
        self._analysis_f32 = None
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)

        K, M = self.K, self.M

        def _params_body(mdl, zq):
            params = mdl.entropy_params_from_hyper(zq)

            def rows(p):
                # (1, h, w, [K,] M) -> (h*w, [K,] M), batch is always 1
                flat = p.astype(jnp.float32).reshape((-1,) + p.shape[3:])
                if K == 1:                       # (n, M) -> (n*M,)
                    return flat.reshape(-1).astype(_PARAM_FETCH)
                # (n, K, M) -> (n, M, K) -> (n*M, K)
                return jnp.swapaxes(flat, 1, 2).reshape(-1, K).astype(
                    _PARAM_FETCH)
            return tuple(rows(p) for p in params)

        # jit caches one executable per z shape; no per-shape host state
        # is needed because there is no mask gather — every position codes.
        self._params_prog = jax.jit(
            lambda v, zq: model.apply(v, zq, method=_params_body))

    # lane helpers shared with the checkerboard family (pure staticmethods,
    # re-wrapped so they stay static here; the "block" is the whole grid, so
    # _encode_lanes is called with n_a = len(sym) and the second block empty)
    _encode_lanes = staticmethod(CheckerboardCodec._encode_lanes)
    _open_lanes = staticmethod(CheckerboardCodec._open_lanes)
    _decode_block_lanes = staticmethod(CheckerboardCodec._decode_block_lanes)
    _open_y = CheckerboardCodec._open_y  # regular method (takes self)

    # -- helpers ----------------------------------------------------------
    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=True)
        return self._analysis_f32

    def _z_tables(self, zmin: int, zmax: int):
        key = (zmin, zmax)
        if key not in self._z_cache:
            self._z_cache[key] = factorized_tables(self.model, self.variables,
                                                   zmin, zmax)
        return self._z_cache[key]

    def _coder_rows(self, rows_t):
        """Downloaded row tensors -> f32 (mus, sigmas, weights) coder args.

        Rows arrive in _PARAM_FETCH (f16 by default — half the tunnel
        bytes); the f16->f32 upcast here is exact, so encode and decode
        still hand the coder bit-identical values."""
        if self.K == 1:
            mu, sigma = rows_t
            return (np.asarray(mu, np.float32),
                    np.asarray(sigma, np.float32), None)
        w, mus, sig = rows_t
        return (np.asarray(mus, np.float32), np.asarray(sig, np.float32),
                np.asarray(w, np.float32))

    # -- portable mode ------------------------------------------------------
    def portable_card(self):
        """The deterministic codec artifact for cross-machine hyperprior
        streams (family=2: no context at all — the EP layer-1 weight
        consumes psi alone, and every position's parameters come from the
        integer hyper-decoder + EP MLP). Built lazily; ship with
        .save(path)."""
        if self._portable_card is None:
            from neural_image_compression_tpu.coding.portable import PortableCard

            self._portable_card = PortableCard.build(self.model, self.variables,
                                                     family="hyperprior")
        return self._portable_card

    def compress_portable(self, x: np.ndarray) -> bytes:
        """Encode with the cross-machine deterministic integer path: decode
        is one integer GEMM pass on ANY machine/implementation holding the
        same card — no device in the loop at all (unlike compress(), whose
        params program is per-build jitted device code)."""
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, x)
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def compress_latents_portable(self, y_q, z_q, img_h: int,
                                  img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py) as a PORTABLE cross-machine stream. Stream-
        compatible with compress_portable(): entropy parameters derive from
        z_q alone through the card's integer hyper path. z_q is clipped to
        the card's [zmin, zmax] range (see JointARCodec equivalent)."""
        card = self.portable_card()
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        z_q = np.clip(z_q, card.zmin, card.zmax)
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, z_q: np.ndarray,
                              img_h: int, img_w: int) -> bytes:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         card.z_cdfs, card.z_offsets,
                                         card.z_sizes)
        psi_fix = card.hyper_forward(z_q)
        y_payload = P.portable_hp_encode(card, y_q, psi_fix)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC,
                             _KIND_HYPERPRIOR_PORTABLE, self.K, self.M,
                             img_h, img_w, 0, card.zmin, card.zmax,
                             len(z_bytes), len(y_payload))
        return header + card.hash + z_bytes + y_payload

    def _decode_latents_portable(self, data: bytes
                                 ) -> Tuple[np.ndarray, np.ndarray]:
        from neural_image_compression_tpu.coding import portable as P

        card = self.portable_card()
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        _, _, K, M, img_h, img_w, _, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if data[hs:hs + 8] != card.hash:
            raise ValueError(
                "portable stream was encoded with a different card — load "
                "the encoder's card file (PortableCard.load) and pass it "
                "via MeanScaleHyperpriorCodec(portable_card=...)")
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        z_bytes = data[hs + 8:hs + 8 + len_z]
        y_payload = data[hs + 8 + len_z:hs + 8 + len_z + len_y]
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(
            z_bytes, z_index, card.z_cdfs, card.z_offsets, card.z_sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)
        psi_fix = card.hyper_forward(z_q)
        y_hat = P.portable_hp_decode(card, y_payload, psi_fix, h, w)
        return y_hat, z_q

    @staticmethod
    def _is_portable(data: bytes) -> bool:
        return len(data) > 5 and data[4] == _KIND_HYPERPRIOR_PORTABLE

    def _encode_one(self, y_q, z_q, rows_t, img_h, img_w,
                    n_streams: int) -> bytes:
        zmin, zmax = int(z_q.min()), int(z_q.max())
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         cdfs, offsets, sizes)

        sym = y_q.astype(np.int32).reshape(-1)  # row-major, channel fastest
        mus, sigmas, weights = self._coder_rows(rows_t)
        if n_streams == 1:
            y_bytes = backend.encode_gaussian(sym, mus, sigmas, weights)
            layout = 0
        else:
            y_bytes = self._encode_lanes(sym, mus, sigmas, weights,
                                         len(sym), n_streams)
            layout = 0x8000 | n_streams
        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_HYPERPRIOR,
                             self.K, self.M, img_h, img_w, layout, zmin, zmax,
                             len(z_bytes), len(y_bytes))
        return header + z_bytes + y_bytes

    # -- encode -----------------------------------------------------------
    def compress(self, x: np.ndarray, n_streams: int = 1) -> bytes:
        """x: (1, H, W, 3) float32 in [0,1] OR uint8, any size (padded to
        multiples of 64, cropped back at decompress).

        n_streams=N (N>1): N-way INTERLEAVED rANS lanes (symbol s -> lane
        s % N) with unchanged entropy params — a pure partition of the one
        fully-parallel block, rate-neutral up to the ~8-byte/lane framing.
        """
        assert x.ndim == 4 and x.shape[0] == 1, "one image at a time"
        assert 1 <= n_streams <= 255
        img_h, img_w = x.shape[1], x.shape[2]
        x = jnp.asarray(_pad_input(x, 64))

        outs = self._analysis_q(self.variables, x)
        # enqueue the params program on the DEVICE z_q before any host
        # fetch: it pipelines with the y/z downloads over the link
        rows_t = self._params_prog(self.variables, outs[1])
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, x)[0]))[0]  # (h, w, M)
        z_q = np.asarray(outs[1])[0]
        backend._require_integral_latents(y_q)
        return self._encode_one(y_q, z_q, rows_t, img_h, img_w, n_streams)

    def compress_latents(self, y_q, z_q, img_h: int, img_w: int,
                         n_streams: int = 1) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py). Stream-compatible with compress(): every entropy
        parameter derives from z_q alone, through the SAME jitted params
        program decode runs."""
        assert 1 <= n_streams <= 255
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        rows_t = self._params_prog(self.variables, jnp.asarray(z_q)[None])
        return self._encode_one(y_q, z_q, rows_t, img_h, img_w, n_streams)

    def compress_batch(self, xs: np.ndarray, workers: int = None,
                       n_streams: int = 1) -> list:
        """Encode B images with every device program enqueued before the
        first host fetch and the host rANS threaded per image. Streams are
        byte-identical to per-image compress() (batch-1 device programs —
        same contract as the other codecs' batch APIs)."""
        assert xs.ndim == 4
        assert 1 <= n_streams <= 255
        img_h, img_w = xs.shape[1], xs.shape[2]
        xp = _pad_input(xs, 64)
        B = xp.shape[0]
        outs = [self._analysis_q(self.variables, jnp.asarray(xp[b:b + 1]))
                for b in range(B)]
        rows_ts = [self._params_prog(self.variables, o[1]) for o in outs]
        y_qs, z_qs = [], []
        for b in range(B):
            y_q = _fetch_y16(outs[b][0], lambda b=b: np.asarray(
                self._analysis_full()(self.variables,
                                      jnp.asarray(xp[b:b + 1]))[0]))[0]
            backend._require_integral_latents(y_q)
            y_qs.append(y_q)
            z_qs.append(np.asarray(outs[b][1])[0])
        # warm the z-table cache serially (it's a jitted device call)
        for z_q in z_qs:
            self._z_tables(int(z_q.min()), int(z_q.max()))

        def _one(b):
            return self._encode_one(y_qs[b], z_qs[b], rows_ts[b],
                                    img_h, img_w, n_streams)
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            return list(ex.map(_one, range(B)))

    # -- decode -----------------------------------------------------------
    def _parse_header(self, data: bytes):
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        magic, kind, K, M, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            struct.unpack(fmt, data[:hs])
        if magic != _MAGIC or kind not in (_KIND_HYPERPRIOR,
                                           _KIND_HYPERPRIOR_PORTABLE):
            raise ValueError("not a hyperprior bitstream")
        if K != self.K or M != self.M:
            raise ValueError(f"stream is K={K} M={M}, codec model is "
                             f"K={self.K} M={self.M}")
        return hs, img_h, img_w, layout, zmin, zmax, len_z, len_y

    def _decode_z(self, z_bytes: bytes, zmin: int, zmax: int, hz: int,
                  wz: int) -> np.ndarray:
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(z_bytes, z_index, cdfs, offsets,
                                        sizes)
        return z_sym.reshape(hz, wz, self.M).astype(np.float32)

    def decode_latents(self, data: bytes) -> Tuple[np.ndarray, np.ndarray]:
        """Decode (y_q, z_q) from a hyperprior bitstream (float or portable
        kind)."""
        if self._is_portable(data):
            self._parse_header(data)  # magic/K/M validation
            return self._decode_latents_portable(data)
        hs, img_h, img_w, layout, zmin, zmax, len_z, len_y = \
            self._parse_header(data)
        z_bytes = data[hs:hs + len_z]
        y_payload = data[hs + len_z:hs + len_z + len_y]

        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64

        z_q = self._decode_z(z_bytes, zmin, zmax, hz, wz)
        rows_t = self._params_prog(self.variables, jnp.asarray(z_q)[None])
        mus, sigmas, weights = self._coder_rows(rows_t)
        decs = self._open_y(y_payload, layout)
        vals = self._decode_block_lanes(decs, mus, sigmas, weights)
        for dec in decs:
            dec.finish()  # truncated/corrupt stream -> error, not garbage
        return vals.reshape(h, w, self.M).astype(np.float32), z_q

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        """Reconstruct (1, H, W, 3); as_uint8 downloads uint8 pixels (4x
        less link traffic — the serving output)."""
        y_hat, _ = self.decode_latents(data)
        img_h, img_w = _stream_size(data)
        y_dev = _latents_to_device(y_hat[None])
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]

    def decompress_batch(self, datas: list, workers: int = None,
                         as_uint8: bool = False) -> np.ndarray:
        """Decode B same-shape bitstreams as ONE pipelined wave: all params
        programs are enqueued before any host fetch (the link round-trips
        overlap across images), the rANS decodes run in parallel threads,
        and ONE batched synthesis program reconstructs the whole batch.
        Returns (B, H, W, 3)."""
        if any(self._is_portable(d) for d in datas):
            # portable decode has no device pass to pipeline; keep it simple
            return np.concatenate([self.decompress(d, as_uint8=as_uint8)
                                   for d in datas])
        parsed = [self._parse_header(d) for d in datas]
        img_h, img_w = parsed[0][1], parsed[0][2]
        assert all(p[1] == img_h and p[2] == img_w for p in parsed), \
            "decompress_batch requires same-shape bitstreams"
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64
        B = len(datas)

        # z decode (serial — warms/uses the jitted z-table cache safely)
        z_all = [self._decode_z(datas[b][parsed[b][0]:
                                         parsed[b][0] + parsed[b][6]],
                                parsed[b][4], parsed[b][5], hz, wz)
                 for b in range(B)]
        rows_ts = [self._params_prog(self.variables, jnp.asarray(z)[None])
                   for z in z_all]
        y_hats = [None] * B

        def _one(b):
            hs, _, _, layout, _, _, len_z, len_y = parsed[b]
            payload = datas[b][hs + len_z:hs + len_z + len_y]
            decs = self._open_y(payload, layout)
            mus, sigmas, weights = self._coder_rows(rows_ts[b])
            vals = self._decode_block_lanes(decs, mus, sigmas, weights,
                                            workers=1)
            for dec in decs:
                dec.finish()
            y_hats[b] = vals.reshape(h, w, self.M).astype(np.float32)
        with ThreadPoolExecutor(
                max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            list(ex.map(_one, range(B)))

        y_dev = _latents_to_device(np.stack(y_hats))
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


class FactorizedPriorCodec:
    def __init__(self, model, variables, portable_card=None):
        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self._analysis_q = _make_analysis(model, with_hyper=False)
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)
        self._analysis_f32 = None  # int16-overflow fallback, built lazily
        self._y_cache = {}
        self._portable_card = portable_card

    def _tables(self, ymin, ymax):
        key = (ymin, ymax)
        if key not in self._y_cache:
            self._y_cache[key] = factorized_tables(self.model, self.variables,
                                                   ymin, ymax)
        return self._y_cache[key]

    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=False)
        return self._analysis_f32

    def compress(self, x: np.ndarray) -> bytes:
        assert x.ndim == 4 and x.shape[0] == 1
        img_h, img_w = x.shape[1], x.shape[2]
        xd = jnp.asarray(_pad_input(x, 16))
        y_q = _fetch_y16(self._analysis_q(self.variables, xd)[0], lambda:
                         np.asarray(self._analysis_full()(self.variables,
                                                          xd)[0]))[0]
        return self._encode_from(y_q, img_h, img_w)

    def compress_latents(self, y_q, img_h: int, img_w: int,
                         z_q=None) -> bytes:
        """Encode a PRE-COMPUTED integer latent grid (e.g. refined by
        coding/refine.py; z_q is accepted and ignored so the factorized
        family shares the other codecs' call shape — the refiner returns an
        empty placeholder). Stream-compatible with compress()."""
        y_q, _ = _as_latent_grids(y_q, None, img_h, img_w, self.M, mult=16)
        return self._encode_from(y_q, img_h, img_w)

    def _encode_from(self, y_q: np.ndarray, img_h: int, img_w: int) -> bytes:
        ymin, ymax = int(y_q.min()), int(y_q.max())
        cdfs, offsets, sizes = self._tables(ymin, ymax)
        sym = y_q.reshape(-1, self.M).astype(np.int32)
        index = np.tile(np.arange(self.M, dtype=np.int32), sym.shape[0])
        y_bytes = backend.encode_indexed(sym.reshape(-1), index, cdfs, offsets, sizes)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_FACTORIZED, 1,
                             self.M, img_h, img_w, 0, ymin, ymax, 0, len(y_bytes))
        return header + y_bytes

    # -- portable mode (frozen tables; streams decode on any machine) ----
    def portable_card(self):
        if self._portable_card is None:
            from neural_image_compression_tpu.coding.portable import FactorizedCard

            self._portable_card = FactorizedCard.build(self.model, self.variables)
        return self._portable_card

    def compress_portable(self, x: np.ndarray) -> bytes:
        assert x.ndim == 4 and x.shape[0] == 1
        img_h, img_w = x.shape[1], x.shape[2]
        xd = jnp.asarray(_pad_input(x, 16))
        y_q = _fetch_y16(self._analysis_q(self.variables, xd)[0], lambda:
                         np.asarray(self._analysis_full()(self.variables,
                                                          xd)[0]))[0]
        return self._encode_portable_from(y_q, img_h, img_w)

    def compress_latents_portable(self, y_q, img_h: int, img_w: int,
                                  z_q=None) -> bytes:
        """Encode a PRE-COMPUTED integer latent grid as a PORTABLE stream
        (z_q accepted and ignored — shared call shape, see
        compress_latents). y_q is clipped to the card's frozen [ymin, ymax]
        table range; the clipped grid is what decode reconstructs."""
        card = self.portable_card()
        y_q, _ = _as_latent_grids(y_q, None, img_h, img_w, self.M, mult=16)
        y_q = np.clip(y_q, card.ymin, card.ymax)
        return self._encode_portable_from(y_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, img_h: int,
                              img_w: int) -> bytes:
        card = self.portable_card()
        sym = y_q.reshape(-1, self.M).astype(np.int32)
        index = np.tile(np.arange(self.M, dtype=np.int32), sym.shape[0])
        y_bytes = backend.encode_indexed(sym.reshape(-1), index, card.cdfs,
                                         card.offsets, card.sizes)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC,
                             _KIND_FACTORIZED_PORTABLE, 1, self.M, img_h,
                             img_w, 0, card.ymin, card.ymax, 0, len(y_bytes))
        return header + card.hash + y_bytes

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        magic, kind, _, M, img_h, img_w, _, ymin, ymax, _, len_y = (
            struct.unpack(fmt, data[:hs]))
        assert magic == _MAGIC and M == self.M
        if kind == _KIND_FACTORIZED_PORTABLE:
            card = self.portable_card()
            if data[hs:hs + 8] != card.hash:
                raise ValueError(
                    "portable stream was encoded with a different card — "
                    "load the encoder's card file")
            cdfs, offsets, sizes = card.cdfs, card.offsets, card.sizes
            y_bytes = data[hs + 8:]
        else:
            assert kind == _KIND_FACTORIZED
            cdfs, offsets, sizes = self._tables(ymin, ymax)
            y_bytes = data[hs:]
        h, w = _round_up(img_h, 16) // 16, _round_up(img_w, 16) // 16
        index = np.tile(np.arange(self.M, dtype=np.int32), h * w)
        sym = _decode_indexed_checked(y_bytes, index, cdfs, offsets, sizes)
        y_q = sym.reshape(1, h, w, self.M).astype(np.float32)
        y_dev = _latents_to_device(y_q)
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


# ---------------------------------------------------------------------------
# Codec for ScalableImageCoding: layered bitstream, base-layer truncation
# ---------------------------------------------------------------------------

class ScalableCodec:
    """Quality-scalable bitstream for ScalableImageCoding.

    Layout: header | z stream | y1 stream | y2 stream. The enhancement
    stream can be truncated (`truncate_base`): the decoder then reconstructs
    only the base latents y1 — enough for the vision task via the LST head —
    while the full stream reconstructs x_hat. (The reference's scalable
    driver notebook was a lost blob; this realises BASELINE.json's
    'quality-scalable bitstream truncation' config.)
    """

    def __init__(self, model, variables, portable_cards=None):
        self._portable_cards = portable_cards  # (base, enhancement) or None
        self.model = model
        self.variables = variables
        self.M = model.latent_channels
        self.M1 = model.base_channels
        self.M2 = self.M - self.M1
        self.K = model.K
        p = variables["params"]
        self._nets1 = _HostParamNets(p["context_model_1"],
                                     p["entropy_parameters_1"], self.M1, self.K)
        self._nets2 = _HostParamNets(p["context_model_2"],
                                     p["entropy_parameters_2"], self.M2, self.K)
        # One fused encode program (x -> integer y_q, z_q); see JointARCodec
        # for why this cannot break codec determinism.
        self._analysis_q = _make_analysis(model, with_hyper=True)
        # psi crosses the link in _PARAM_FETCH (f16 default — halves the
        # (h, w, 2M) download); both directions run this same program and
        # upcast identically, so the host param path stays bit-identical.
        self._hyper_synthesis = jax.jit(lambda v, zq: model.apply(
            v, zq, method=lambda mdl, z: (
                mdl.hyper_decoder(z).astype(_PARAM_FETCH),)))
        self._synthesis = jax.jit(lambda v, yq: model.apply(
            v, yq, method=lambda mdl, y: (
                mdl.decoder(y.astype(jnp.float32)),)))
        self._synthesis_u8 = _make_synthesis_u8(model)
        self._lst = jax.jit(lambda v, y1: model.apply(
            v, y1, method=lambda mdl, y1: (mdl.LST(y1.astype(jnp.float32)),)))
        self._analysis_f32 = None  # int16-overflow fallback, built lazily
        self._z_cache = {}

    def _analysis_full(self):
        if self._analysis_f32 is None:
            self._analysis_f32 = _make_analysis_f32(self.model,
                                                    with_hyper=True)
        return self._analysis_f32

    def _z_tables(self, zmin, zmax):
        key = (zmin, zmax)
        if key not in self._z_cache:
            self._z_cache[key] = factorized_tables(self.model, self.variables,
                                                   zmin, zmax)
        return self._z_cache[key]

    # -- portable mode: one card per latent layer (shared hyper + z) ------
    def portable_cards(self):
        if self._portable_cards is None:
            from neural_image_compression_tpu.coding.portable import PortableCard

            self._portable_cards = (
                PortableCard.build(self.model, self.variables,
                                   ctx_name="context_model_1",
                                   ep_name="entropy_parameters_1", M=self.M1),
                PortableCard.build(self.model, self.variables,
                                   ctx_name="context_model_2",
                                   ep_name="entropy_parameters_2", M=self.M2))
        return self._portable_cards

    def compress_portable(self, x: np.ndarray) -> bytes:
        """Cross-machine deterministic layered stream (kind 6): header +
        card hashes + z + y1 + y2; truncate_base still applies."""
        from neural_image_compression_tpu.coding import portable as P

        assert x.ndim == 4 and x.shape[0] == 1
        img_h, img_w = x.shape[1], x.shape[2]
        xd = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, xd)
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, xd)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def compress_latents_portable(self, y_q, z_q, img_h: int,
                                  img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py, scalable mode) as a PORTABLE layered stream.
        Stream-compatible with compress_portable() incl. truncate_base;
        z_q is clipped to the cards' [zmin, zmax] range (see JointARCodec
        equivalent)."""
        card1, _ = self.portable_cards()
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        z_q = np.clip(z_q, card1.zmin, card1.zmax)
        return self._encode_portable_from(y_q, z_q, img_h, img_w)

    def _encode_portable_from(self, y_q: np.ndarray, z_q: np.ndarray,
                              img_h: int, img_w: int) -> bytes:
        from neural_image_compression_tpu.coding import portable as P

        card1, card2 = self.portable_cards()
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         card1.z_cdfs, card1.z_offsets,
                                         card1.z_sizes)
        psi_fix = card1.hyper_forward(z_q)  # card2's hyper is identical
        y1_bytes = P.portable_ar_encode(card1, y_q[..., :self.M1], psi_fix)
        y2_bytes = P.portable_ar_encode(card2, y_q[..., self.M1:], psi_fix)
        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_SCALABLE_PORTABLE,
                             self.K, self.M, img_h, img_w, self.M1,
                             card1.zmin, card1.zmax, len(z_bytes),
                             len(y1_bytes))
        return header + card1.hash + card2.hash + z_bytes + y1_bytes + y2_bytes

    def compress(self, x: np.ndarray) -> bytes:
        assert x.ndim == 4 and x.shape[0] == 1
        img_h, img_w = x.shape[1], x.shape[2]
        xd = jnp.asarray(_pad_input(x, 64))
        outs = self._analysis_q(self.variables, xd)
        # device z_q straight into the standalone hyper-synthesis program
        # (identical integer values — see JointARCodec.compress); both
        # programs enqueue before the first host fetch.
        (psi_dev,) = self._hyper_synthesis(self.variables, outs[1])
        y_q = _fetch_y16(outs[0], lambda: np.asarray(
            self._analysis_full()(self.variables, xd)[0]))[0]
        z_q = np.asarray(outs[1])[0]
        return self._encode_from(y_q, z_q, np.asarray(psi_dev,
                                                      np.float32)[0],
                                 img_h, img_w)

    def compress_latents(self, y_q, z_q, img_h: int, img_w: int) -> bytes:
        """Encode PRE-COMPUTED integer latent grids (e.g. refined by
        coding/refine.py, scalable mode). Stream-compatible with
        compress(), incl. truncate_base: entropy parameters derive from
        z_q (hyper) and each layer's own coded-y context, never from how
        y_q was produced. psi comes from the SAME jitted hyper-synthesis
        program decode uses, on the same integer z_q."""
        y_q, z_q = _as_latent_grids(y_q, z_q, img_h, img_w, self.M)
        (psi_dev,) = self._hyper_synthesis(self.variables,
                                           jnp.asarray(z_q)[None])
        return self._encode_from(y_q, z_q, np.asarray(psi_dev,
                                                      np.float32)[0],
                                 img_h, img_w)

    def _encode_from(self, y_q: np.ndarray, z_q: np.ndarray,
                     psi: np.ndarray, img_h: int, img_w: int) -> bytes:
        zmin, zmax = int(z_q.min()), int(z_q.max())
        cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_sym = z_q.reshape(-1, self.M).astype(np.int32)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), z_sym.shape[0])
        z_bytes = backend.encode_indexed(z_sym.reshape(-1), z_index,
                                         cdfs, offsets, sizes)

        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(_ar_encode_latents, self._nets1,
                           np.ascontiguousarray(y_q[..., :self.M1]), psi)
            f2 = ex.submit(_ar_encode_latents, self._nets2,
                           np.ascontiguousarray(y_q[..., self.M1:]), psi)
            y1_bytes, y2_bytes = f1.result(), f2.result()

        header = struct.pack("<4sBBHHHHhhII", _MAGIC, _KIND_SCALABLE, self.K,
                             self.M, img_h, img_w, self.M1, zmin, zmax,
                             len(z_bytes), len(y1_bytes))
        return header + z_bytes + y1_bytes + y2_bytes

    def truncate_base(self, data: bytes) -> bytes:
        """Drop the enhancement stream; the result decodes base-only."""
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        head = struct.unpack(fmt, data[:hs])
        len_z, len_y1 = head[9], head[10]
        if head[1] == _KIND_SCALABLE_PORTABLE:
            hs += 16  # the two card hashes
        return data[:hs + len_z + len_y1]

    def _decode_common(self, data: bytes):
        fmt = "<4sBBHHHHhhII"
        hs = struct.calcsize(fmt)
        magic, kind, K, M, img_h, img_w, M1, zmin, zmax, len_z, len_y1 = (
            struct.unpack(fmt, data[:hs]))
        assert magic == _MAGIC and kind in (_KIND_SCALABLE,
                                            _KIND_SCALABLE_PORTABLE)
        assert K == self.K and M == self.M and M1 == self.M1
        portable = kind == _KIND_SCALABLE_PORTABLE
        if portable:
            card1, card2 = self.portable_cards()
            if data[hs:hs + 8] != card1.hash or \
                    data[hs + 8:hs + 16] != card2.hash:
                raise ValueError(
                    "portable stream was encoded with different cards — "
                    "load the encoder's card files")
            hs += 16
        z_bytes = data[hs:hs + len_z]
        y1_bytes = data[hs + len_z:hs + len_z + len_y1]
        y2_bytes = data[hs + len_z + len_y1:]
        ph, pw = _round_up(img_h, 64), _round_up(img_w, 64)
        h, w = ph // 16, pw // 16
        hz, wz = ph // 64, pw // 64

        if portable:
            cdfs, offsets, sizes = card1.z_cdfs, card1.z_offsets, card1.z_sizes
        else:
            cdfs, offsets, sizes = self._z_tables(zmin, zmax)
        z_index = np.tile(np.arange(self.M, dtype=np.int32), hz * wz)
        z_sym = _decode_indexed_checked(z_bytes, z_index, cdfs, offsets,
                                        sizes)
        z_q = z_sym.reshape(hz, wz, self.M).astype(np.float32)
        if portable:
            psi = card1.hyper_forward(z_q)  # int64 fixed point
        else:
            (psi_dev,) = self._hyper_synthesis(self.variables,
                                               jnp.asarray(z_q)[None])
            psi = np.asarray(psi_dev, np.float32)[0]
        return y1_bytes, y2_bytes, psi, z_q, h, w, portable

    def _decode_layer(self, layer: int, payload: bytes, psi, h: int, w: int,
                      portable: bool) -> np.ndarray:
        if portable:
            from neural_image_compression_tpu.coding import portable as P

            card = self.portable_cards()[layer - 1]
            return P.portable_ar_decode(card, payload, psi, h, w)
        nets = self._nets1 if layer == 1 else self._nets2
        return _ar_decode_latents(nets, payload, psi, h, w)

    def decompress_base(self, data: bytes):
        """Base-only decode: returns (y1, F_tilde) for the vision task.
        Both cover the PADDED latent grid when the coded image size was not
        a multiple of 64 (use coding.stream_size(data) to recover the true size)."""
        y1_bytes, _, psi, _, h, w, portable = self._decode_common(data)
        y1 = self._decode_layer(1, y1_bytes, psi, h, w, portable)
        (f_tilde,) = self._lst(self.variables,
                               _latents_to_device(np.asarray(y1)[None]))
        return y1.astype(np.float32), np.asarray(f_tilde)

    def decompress(self, data: bytes, as_uint8: bool = False) -> np.ndarray:
        """Full decode -> reconstructed image (uint8 pixels straight off the
        device with as_uint8, see JointARCodec.decompress)."""
        y1_bytes, y2_bytes, psi, _, h, w, portable = self._decode_common(data)
        if len(y2_bytes) == 0:
            raise ValueError("enhancement stream missing (truncated bitstream); "
                             "use decompress_base")
        # The two layers' AR decodes are independent (separate context models
        # and streams, shared psi) — run them concurrently; the native coder
        # is reentrant and releases the GIL.
        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(self._decode_layer, 1, y1_bytes, psi, h, w, portable)
            f2 = ex.submit(self._decode_layer, 2, y2_bytes, psi, h, w, portable)
            y1, y2 = f1.result(), f2.result()
        y_full = np.concatenate([y1, y2], axis=-1).astype(np.float32)
        img_h, img_w = _stream_size(data)
        y_dev = _latents_to_device(y_full[None])
        if as_uint8:
            (x_u8,) = self._synthesis_u8(self.variables, y_dev)
            return np.asarray(x_u8)[:, :img_h, :img_w]
        (x_hat,) = self._synthesis(self.variables, y_dev)
        return np.clip(np.asarray(x_hat), 0.0, 1.0)[:, :img_h, :img_w]


def bitstream_bpp(data: bytes, img_h: int, img_w: int) -> float:
    return len(data) * 8.0 / (img_h * img_w)
