"""Build + ctypes bindings for the native coders (coding/rans/*.cc):
the generic rANS stream coder and the autoregressive wavefront codec.

Compiled on first use with g++ -O3 -march=native into a cached shared object
next to the source (falls back to a user cache dir if the package is
read-only). The cache key hashes every source file, so editing any of them
triggers a rebuild.
"""

import ctypes
import hashlib
import os
import platform
import subprocess
import tempfile

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rans")
_SOURCES = [os.path.join(_SRC_DIR, n)
            for n in ("rans.cc", "ar_wavefront.cc", "ar_portable.cc")]
_HEADERS = [os.path.join(_SRC_DIR, "rans_core.h")]
_LIB = None

PROB_BITS = 16
PROB_SCALE = 1 << 16


def _isa_fingerprint() -> bytes:
    """Identify what -march=native resolves to on THIS host. The .so is
    compiled with -march=native, so a cached library from another machine
    (shared tmp dir, copied container layer) could use ISA extensions this
    CPU lacks (SIGILL) — fold the expanded target flags into the cache key."""
    out = b""
    try:
        out = subprocess.run(
            ["g++", "-march=native", "-Q", "--help=target"],
            capture_output=True, timeout=30).stdout
    except (subprocess.SubprocessError, OSError):
        pass
    return platform.machine().encode() + out


def _build_lib() -> str:
    h = hashlib.sha256()
    for path in _SOURCES + _HEADERS:
        with open(path, "rb") as f:
            h.update(f.read())
    h.update(_isa_fingerprint())
    digest = h.hexdigest()[:16]
    so_name = f"librans_{digest}.so"
    candidates = [os.path.join(_SRC_DIR, so_name),
                  os.path.join(tempfile.gettempdir(), so_name)]
    for so_path in candidates:
        if os.path.exists(so_path):
            return so_path
    for so_path in candidates:
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
                 "-std=c++17", *_SOURCES, "-o", so_path],
                check=True, capture_output=True)
            return so_path
        except (subprocess.CalledProcessError, OSError):
            continue
    raise RuntimeError("failed to build rANS shared library with g++")


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(_build_lib())
    i8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.rans_encode_gaussian.restype = ctypes.c_int
    lib.rans_encode_gaussian.argtypes = [i32p, f32p, f32p, f32p,
                                         ctypes.c_int, ctypes.c_int, i8p, ctypes.c_int]
    lib.rans_dec_create.restype = ctypes.c_void_p
    lib.rans_dec_create.argtypes = [i8p, ctypes.c_int]
    lib.rans_dec_destroy.argtypes = [ctypes.c_void_p]
    lib.rans_dec_ok.restype = ctypes.c_int
    lib.rans_dec_ok.argtypes = [ctypes.c_void_p]
    lib.rans_dec_gaussian.argtypes = [ctypes.c_void_p, f32p, f32p, f32p,
                                      ctypes.c_int, ctypes.c_int, i32p]
    lib.rans_encode_indexed.restype = ctypes.c_int
    lib.rans_encode_indexed.argtypes = [i32p, i32p, ctypes.c_int, u32p,
                                        ctypes.c_int, i32p, i32p, i8p, ctypes.c_int]
    lib.rans_dec_indexed.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int, u32p,
                                     ctypes.c_int, i32p, i32p, i32p]
    lib.arwave_create.restype = ctypes.c_void_p
    lib.arwave_create.argtypes = ([ctypes.c_int] * 6) + ([f32p] * 8)
    lib.arwave_destroy.argtypes = [ctypes.c_void_p]
    lib.arwave_encode.restype = ctypes.c_int
    lib.arwave_encode.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int,
                                  ctypes.c_int, i8p, ctypes.c_int]
    lib.arwave_decode.restype = ctypes.c_int
    lib.arwave_decode.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int, f32p,
                                  ctypes.c_int, ctypes.c_int, f32p]
    lib.arwave_encode_n.restype = ctypes.c_int
    lib.arwave_encode_n.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, i8p,
                                    ctypes.c_int]
    lib.nic_fastmath_eval.argtypes = [f32p, ctypes.c_int, f32p, f32p, f32p,
                                      f32p]
    lib.arwave_param_sweep.restype = ctypes.c_float
    lib.arwave_param_sweep.argtypes = [ctypes.c_void_p, f32p, f32p,
                                       ctypes.c_int, ctypes.c_int]
    lib.arwave_decode_n.restype = ctypes.c_int
    lib.arwave_decode_n.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int, f32p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    f32p]
    i16p = ctypes.POINTER(ctypes.c_int16)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.arport_create.restype = ctypes.c_void_p
    lib.arport_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,                                     # M..n_bins
        i16p, i64p, ctypes.c_int,                         # ctx
        i16p, ctypes.c_int,                               # ep1_phi
        i16p, i64p, ctypes.c_int,                         # ep2
        i16p, i64p, ctypes.c_int,                         # ep3
        i64p, i64p, i64p, i64p,                           # sigma arrays
        i32p, ctypes.c_int64, i64p, i64p,                 # tables
        i64p, ctypes.c_int]                               # exp lut
    lib.arport_destroy.argtypes = [ctypes.c_void_p]
    lib.arport_encode.restype = ctypes.c_int
    lib.arport_encode.argtypes = [ctypes.c_void_p, i32p, i64p, ctypes.c_int,
                                  ctypes.c_int, i8p, ctypes.c_int]
    lib.arport_decode.restype = ctypes.c_int
    lib.arport_decode.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int, i64p,
                                  ctypes.c_int, ctypes.c_int, i32p]
    lib.arport_encode_cb.restype = ctypes.c_int
    lib.arport_encode_cb.argtypes = [ctypes.c_void_p, i32p, i64p,
                                     ctypes.c_int, ctypes.c_int, i8p,
                                     ctypes.c_int]
    lib.arport_decode_cb.restype = ctypes.c_int
    lib.arport_decode_cb.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int,
                                     i64p, ctypes.c_int, ctypes.c_int, i32p]
    lib.arport_encode_hp.restype = ctypes.c_int
    lib.arport_encode_hp.argtypes = [ctypes.c_void_p, i32p, i64p,
                                     ctypes.c_int, ctypes.c_int, i8p,
                                     ctypes.c_int]
    lib.arport_decode_hp.restype = ctypes.c_int
    lib.arport_decode_hp.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int,
                                     i64p, ctypes.c_int, ctypes.c_int, i32p]
    lib.arport_psi.argtypes = [i16p, i64p, ctypes.c_int, ctypes.c_int, i64p,
                               ctypes.c_int, i64p]
    lib.arport_hyper_create.restype = ctypes.c_void_p
    lib.arport_hyper_create.argtypes = [ctypes.c_int, i64p, i16p, i64p, i64p,
                                        i64p]
    lib.arport_hyper_destroy.argtypes = [ctypes.c_void_p]
    lib.arport_hyper_run.restype = ctypes.c_int64
    lib.arport_hyper_run.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int,
                                     ctypes.c_int, i64p, ctypes.c_int64]
    _LIB = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def encode_gaussian(symbols: np.ndarray, mus: np.ndarray, sigmas: np.ndarray,
                    weights=None) -> bytes:
    """Encode int32 symbols under per-symbol (mixture-)Gaussians.

    symbols: (n,) int32; mus/sigmas/weights: (n, K) float32 (K=1: weights None).
    """
    lib = get_lib()
    symbols = np.ascontiguousarray(symbols, np.int32)
    mus = np.ascontiguousarray(mus, np.float32)
    sigmas = np.ascontiguousarray(sigmas, np.float32)
    n = symbols.shape[0]
    K = 1 if mus.ndim == 1 else mus.shape[1]
    wp = None
    if weights is not None:
        weights = np.ascontiguousarray(weights, np.float32)
        wp = _ptr(weights, ctypes.c_float)
    cap = max(1024, n * 8 + 64)
    out = np.empty(cap, np.uint8)
    ln = lib.rans_encode_gaussian(_ptr(symbols, ctypes.c_int32), wp,
                                  _ptr(mus, ctypes.c_float),
                                  _ptr(sigmas, ctypes.c_float),
                                  K, n, _ptr(out, ctypes.c_uint8), cap)
    if ln < 0:
        raise RuntimeError("rANS encode overflow")
    return out[:ln].tobytes()


class RansDecoder:
    """Stateful decoder: decode in forward order, in chunks, as params
    become available (wavefront-AR friendly)."""

    def __init__(self, data: bytes):
        self._lib = get_lib()
        self._buf = np.frombuffer(data, np.uint8).copy()
        self._handle = self._lib.rans_dec_create(
            _ptr(self._buf, ctypes.c_uint8), len(self._buf))

    def decode_gaussian(self, mus: np.ndarray, sigmas: np.ndarray,
                        weights=None) -> np.ndarray:
        mus = np.ascontiguousarray(mus, np.float32)
        sigmas = np.ascontiguousarray(sigmas, np.float32)
        n = mus.shape[0]
        K = 1 if mus.ndim == 1 else mus.shape[1]
        wp = None
        if weights is not None:
            weights = np.ascontiguousarray(weights, np.float32)
            wp = _ptr(weights, ctypes.c_float)
        out = np.empty(n, np.int32)
        self._lib.rans_dec_gaussian(self._handle, wp, _ptr(mus, ctypes.c_float),
                                    _ptr(sigmas, ctypes.c_float), K, n,
                                    _ptr(out, ctypes.c_int32))
        return out

    def decode_indexed(self, index: np.ndarray, cdfs: np.ndarray,
                       offsets: np.ndarray, sizes: np.ndarray) -> np.ndarray:
        index = np.ascontiguousarray(index, np.int32)
        cdfs = np.ascontiguousarray(cdfs, np.uint32)
        offsets = np.ascontiguousarray(offsets, np.int32)
        sizes = np.ascontiguousarray(sizes, np.int32)
        n = index.shape[0]
        out = np.empty(n, np.int32)
        self._lib.rans_dec_indexed(self._handle, _ptr(index, ctypes.c_int32), n,
                                   _ptr(cdfs, ctypes.c_uint32), cdfs.shape[1],
                                   _ptr(offsets, ctypes.c_int32),
                                   _ptr(sizes, ctypes.c_int32),
                                   _ptr(out, ctypes.c_int32))
        return out

    def ok(self) -> bool:
        """True iff the stream decoded completely (state back at kRansL,
        every byte consumed). Check after the LAST decode call: a truncated
        or corrupt stream otherwise yields garbage symbols silently."""
        return bool(self._lib.rans_dec_ok(self._handle))

    def finish(self) -> None:
        if not self.ok():
            raise ValueError("corrupt or truncated rANS stream")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rans_dec_destroy(self._handle)
            self._handle = None


def encode_indexed(symbols: np.ndarray, index: np.ndarray, cdfs: np.ndarray,
                   offsets: np.ndarray, sizes: np.ndarray) -> bytes:
    """Encode symbols whose distributions are rows of a shared CDF table."""
    lib = get_lib()
    symbols = np.ascontiguousarray(symbols, np.int32)
    index = np.ascontiguousarray(index, np.int32)
    cdfs = np.ascontiguousarray(cdfs, np.uint32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    sizes = np.ascontiguousarray(sizes, np.int32)
    n = symbols.shape[0]
    cap = max(1024, n * 8 + 64)
    out = np.empty(cap, np.uint8)
    ln = lib.rans_encode_indexed(_ptr(symbols, ctypes.c_int32),
                                 _ptr(index, ctypes.c_int32), n,
                                 _ptr(cdfs, ctypes.c_uint32), cdfs.shape[1],
                                 _ptr(offsets, ctypes.c_int32),
                                 _ptr(sizes, ctypes.c_int32),
                                 _ptr(out, ctypes.c_uint8), cap)
    if ln < 0:
        raise RuntimeError("rANS encode overflow")
    return out[:ln].tobytes()




def _require_integral_latents(y_q: np.ndarray) -> None:
    """The AR coders' contract is 'float32 holding integers': encode pads
    context with the raw floats while decode reconstructs the rounded
    symbols, so a non-integral (or NaN) input silently desynchronizes the
    two sides. Validate once at the entry instead."""
    if not np.array_equal(y_q, np.rint(y_q)):  # NaN fails array_equal too
        raise ValueError("AR encode requires integer-valued finite latents "
                         "(quantize with round() first)")


class ArWaveCoder:
    """Native autoregressive wavefront codec over one latent layer.

    Runs the full wavefront loop (context gather, entropy-parameter GEMMs,
    Gaussian/GMM model build, rANS) in one native call per image/tile —
    encode and decode execute the identical machine code so the coding
    parameters are bit-identical on both sides.

    ctx_w: (12M, 2M) mask-A context weights in gather order (rows 0-1 all
    cols, row 2 cols 0-1); w1: (2M + psi_dim, hidden); w3's columns must
    already be in coder layout (kind, m, k) for K > 1 — i.e. pass the arrays
    `_HostParamNets` assembles.
    """

    def __init__(self, ctx_w, ctx_b, w1, b1, w2, b2, w3, b3, M: int, K: int):
        self._lib = get_lib()
        self.M = M
        self.K = K
        arrs = [np.ascontiguousarray(a, np.float32)
                for a in (ctx_w, ctx_b, w1, b1, w2, b2, w3, b3)]
        self._arrs = arrs  # keep alive (arwave_create copies, but be safe)
        phi_dim = arrs[0].shape[1]
        psi_dim = arrs[2].shape[0] - phi_dim
        hidden = arrs[2].shape[1]
        out_dim = arrs[6].shape[1]
        assert arrs[0].shape[0] == 12 * M and phi_dim == 2 * M
        assert out_dim == (2 * M if K == 1 else 3 * K * M)
        self._handle = self._lib.arwave_create(
            M, K, phi_dim, psi_dim, hidden, out_dim,
            *[_ptr(a, ctypes.c_float) for a in arrs])

    def encode(self, y_q: np.ndarray, psi: np.ndarray) -> bytes:
        """y_q: (H, W, M) integer-valued floats; psi: (H, W, psi_dim)."""
        y_q = np.ascontiguousarray(y_q, np.float32)
        _require_integral_latents(y_q)
        psi = np.ascontiguousarray(psi, np.float32)
        h, w = y_q.shape[:2]
        cap = max(1024, h * w * self.M * 8 + 64)
        out = np.empty(cap, np.uint8)
        ln = self._lib.arwave_encode(self._handle, _ptr(y_q, ctypes.c_float),
                                     _ptr(psi, ctypes.c_float), h, w,
                                     _ptr(out, ctypes.c_uint8), cap)
        if ln < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:ln].tobytes()

    def encode_n(self, y_q: np.ndarray, psi: np.ndarray, n_streams: int) -> bytes:
        """N-way interleaved encode (symbol s -> stream s % N): same entropy
        params and CDFs as encode(), rate cost ~4*(N-1) bytes, and decode_n
        pulls the N streams concurrently with EXACT context (no tile reset)."""
        y_q = np.ascontiguousarray(y_q, np.float32)
        _require_integral_latents(y_q)
        psi = np.ascontiguousarray(psi, np.float32)
        h, w = y_q.shape[:2]
        cap = max(1024, h * w * self.M * 8 + 64 + 8 * n_streams)
        out = np.empty(cap, np.uint8)
        ln = self._lib.arwave_encode_n(self._handle, _ptr(y_q, ctypes.c_float),
                                       _ptr(psi, ctypes.c_float), h, w,
                                       n_streams, _ptr(out, ctypes.c_uint8),
                                       cap)
        if ln < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:ln].tobytes()

    def decode_n(self, data: bytes, psi: np.ndarray, h: int, w: int,
                 n_streams: int) -> np.ndarray:
        psi = np.ascontiguousarray(psi, np.float32)
        buf = np.frombuffer(data, np.uint8)
        y_out = np.empty((h, w, self.M), np.float32)
        rc = self._lib.arwave_decode_n(self._handle, _ptr(buf, ctypes.c_uint8),
                                       len(data), _ptr(psi, ctypes.c_float),
                                       h, w, n_streams,
                                       _ptr(y_out, ctypes.c_float))
        if rc != 0:
            raise ValueError("corrupt interleaved stream")
        return y_out

    def decode(self, data: bytes, psi: np.ndarray, h: int, w: int) -> np.ndarray:
        psi = np.ascontiguousarray(psi, np.float32)
        buf = np.frombuffer(data, np.uint8)
        y_out = np.empty((h, w, self.M), np.float32)
        rc = self._lib.arwave_decode(self._handle, _ptr(buf, ctypes.c_uint8),
                                     len(data), _ptr(psi, ctypes.c_float), h, w,
                                     _ptr(y_out, ctypes.c_float))
        if rc != 0:
            raise ValueError("corrupt or truncated AR stream")
        return y_out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.arwave_destroy(self._handle)
            self._handle = None


class ArPortableCoder:
    """Native integer wavefront codec over a PortableCard (ctypes wrapper of
    ar_portable.cc). Bit-identical to coding/portable.py's numpy path by
    construction (exact integer spec); tests assert it both directions."""

    def __init__(self, card):
        self._lib = get_lib()
        self.M = card.M
        self.K = card.K
        self.hidden = card.ep2.wq.shape[0]
        tables_cat = np.ascontiguousarray(
            np.concatenate([t.astype(np.int32) for t in card.tables]))
        table_len = np.array([len(t) for t in card.tables], np.int64)
        table_off = np.concatenate([[0], np.cumsum(table_len[:-1])]).astype(np.int64)
        self.psi_dim = card.ep1_psi.wq.shape[0]
        # hyper-decoder stack (kind, kh, kw, cin, cout, stride, pad, opad, sw)
        metas, w_parts, b_parts = [], [], []
        self._hyper_geom = []
        for kind, layer, geom in card.hyper:
            kh, kw, cin, cout = layer.wq.shape
            stride, pad = geom[0], geom[1]
            opad = geom[2] if kind == "deconv" else 0
            metas.append([0 if kind == "conv" else 1, kh, kw, cin, cout,
                          stride, pad, opad, layer.sw])
            w_parts.append(np.ascontiguousarray(layer.wq, np.int16).reshape(-1))
            b_parts.append(np.ascontiguousarray(layer.bq, np.int64))
            self._hyper_geom.append((kind, kh, kw, cout, stride, pad, opad))
        hyper_meta = np.ascontiguousarray(np.array(metas, np.int64))
        w_off = np.concatenate(
            [[0], np.cumsum([p.size for p in w_parts[:-1]])]).astype(np.int64)
        b_off = np.concatenate(
            [[0], np.cumsum([p.size for p in b_parts[:-1]])]).astype(np.int64)
        self._hyper_arrs = dict(meta=hyper_meta,
                                w=np.concatenate(w_parts),
                                w_off=w_off,
                                b=np.concatenate(b_parts),
                                b_off=b_off)
        arrs = dict(
            ctx_w=np.ascontiguousarray(card.ctx.wq, np.int16),
            ctx_b=np.ascontiguousarray(card.ctx.bq, np.int64),
            ep1_psi_w=np.ascontiguousarray(card.ep1_psi.wq, np.int16),
            ep1_psi_b=np.ascontiguousarray(card.ep1_psi.bq, np.int64),
            ep1_w=np.ascontiguousarray(card.ep1_phi.wq, np.int16),
            ep2_w=np.ascontiguousarray(card.ep2.wq, np.int16),
            ep2_b=np.ascontiguousarray(card.ep2.bq, np.int64),
            ep3_w=np.ascontiguousarray(card.ep3.wq, np.int16),
            ep3_b=np.ascontiguousarray(card.ep3.bq, np.int64),
            sigma_thr=np.ascontiguousarray(card.sigma_thr, np.int64),
            sigma_fix=np.ascontiguousarray(card.sigma_fix, np.int64),
            sigma2_fix=np.ascontiguousarray(card.sigma2_fix, np.int64),
            sigma_R=np.ascontiguousarray(card.sigma_R, np.int64),
            tables_cat=tables_cat, table_off=table_off, table_len=table_len,
            exp_lut=np.ascontiguousarray(card.exp_lut, np.int64))
        self._arrs = arrs  # keep alive (create copies, but be safe)
        phi_dim = card.ctx.wq.shape[1]
        out_dim = card.ep3.wq.shape[1]
        self._handle = self._lib.arport_create(
            self.M, self.K, phi_dim, self.hidden, out_dim,
            len(card.tables),
            _ptr(arrs["ctx_w"], ctypes.c_int16),
            _ptr(arrs["ctx_b"], ctypes.c_int64), card.ctx.sw,
            _ptr(arrs["ep1_w"], ctypes.c_int16), card.ep1_phi.sw,
            _ptr(arrs["ep2_w"], ctypes.c_int16),
            _ptr(arrs["ep2_b"], ctypes.c_int64), card.ep2.sw,
            _ptr(arrs["ep3_w"], ctypes.c_int16),
            _ptr(arrs["ep3_b"], ctypes.c_int64), card.ep3.sw,
            _ptr(arrs["sigma_thr"], ctypes.c_int64),
            _ptr(arrs["sigma_fix"], ctypes.c_int64),
            _ptr(arrs["sigma2_fix"], ctypes.c_int64),
            _ptr(arrs["sigma_R"], ctypes.c_int64),
            _ptr(arrs["tables_cat"], ctypes.c_int32),
            int(tables_cat.shape[0]),
            _ptr(arrs["table_off"], ctypes.c_int64),
            _ptr(arrs["table_len"], ctypes.c_int64),
            _ptr(arrs["exp_lut"], ctypes.c_int64), len(arrs["exp_lut"]))
        if not self._handle:
            raise ValueError("native portable coder rejected the card "
                             "(K or sigma_R out of spec)")
        ha = self._hyper_arrs
        self._hyper_handle = self._lib.arport_hyper_create(
            len(card.hyper), _ptr(ha["meta"], ctypes.c_int64),
            _ptr(ha["w"], ctypes.c_int16), _ptr(ha["w_off"], ctypes.c_int64),
            _ptr(ha["b"], ctypes.c_int64), _ptr(ha["b_off"], ctypes.c_int64))

    def hyper_shape(self, h: int, w: int):
        """(oh, ow, cout) of the hyper-decoder output for a (h, w) z grid."""
        cout = None
        for kind, kh, kw, cout, stride, pad, opad in self._hyper_geom:
            if kind == "conv":
                h = (h + 2 * pad - kh) // stride + 1
                w = (w + 2 * pad - kw) // stride + 1
            else:
                # per-axis pads (kh vs kw), matching _int_deconv2d geometry
                h = (h - 1) * stride + 1 + 2 * (kh - 1 - pad) + opad - kh + 1
                w = (w - 1) * stride + 1 + 2 * (kw - 1 - pad) + opad - kw + 1
        return h, w, cout

    def hyper(self, z_q: np.ndarray) -> np.ndarray:
        """(hz, wz, M) integer z -> (oh, ow, 2M) int64 psi at F_BITS —
        native twin of card.hyper_forward."""
        z = np.ascontiguousarray(z_q, np.int32)
        h, w = z.shape[:2]
        out = np.empty(self.hyper_shape(h, w), np.int64)
        n = self._lib.arport_hyper_run(self._hyper_handle,
                                       _ptr(z, ctypes.c_int32), h, w,
                                       _ptr(out, ctypes.c_int64), out.size)
        if n != out.size:
            raise RuntimeError("hyper-decoder output size mismatch")
        return out

    def psi(self, psi_flat: np.ndarray) -> np.ndarray:
        """(n, psi_dim) int64 psi activations -> (n, hidden) int64 layer-1
        accumulators (bias included) — native twin of card.psi_precompute."""
        psi_flat = np.ascontiguousarray(psi_flat, np.int64)
        n = psi_flat.shape[0]
        out = np.empty((n, self.hidden), np.int64)
        self._lib.arport_psi(_ptr(self._arrs["ep1_psi_w"], ctypes.c_int16),
                             _ptr(self._arrs["ep1_psi_b"], ctypes.c_int64),
                             self.psi_dim, self.hidden,
                             _ptr(psi_flat, ctypes.c_int64), n,
                             _ptr(out, ctypes.c_int64))
        return out

    def encode(self, y_q: np.ndarray, p_acc: np.ndarray) -> bytes:
        """y_q: (H, W, M) integer-valued; p_acc: (H*W, hidden) int64."""
        y = np.ascontiguousarray(y_q, np.int32)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        h, w = y.shape[:2]
        cap = max(1024, h * w * self.M * 8 + 64)
        out = np.empty(cap, np.uint8)
        ln = self._lib.arport_encode(self._handle, _ptr(y, ctypes.c_int32),
                                     _ptr(p_acc, ctypes.c_int64), h, w,
                                     _ptr(out, ctypes.c_uint8), cap)
        if ln < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:ln].tobytes()

    def decode(self, data: bytes, p_acc: np.ndarray, h: int, w: int
               ) -> np.ndarray:
        buf = np.frombuffer(data, np.uint8)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        y_out = np.empty((h, w, self.M), np.int32)
        rc = self._lib.arport_decode(self._handle, _ptr(buf, ctypes.c_uint8),
                                     len(data), _ptr(p_acc, ctypes.c_int64),
                                     h, w, _ptr(y_out, ctypes.c_int32))
        if rc != 0:
            raise ValueError("corrupt or truncated portable AR stream")
        return y_out.astype(np.float32)

    def encode_cb(self, y_q: np.ndarray, p_acc: np.ndarray) -> bytes:
        """Checkerboard two-pass encode (cards with family=1)."""
        y = np.ascontiguousarray(y_q, np.int32)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        h, w = y.shape[:2]
        cap = max(1024, h * w * self.M * 8 + 64)
        out = np.empty(cap, np.uint8)
        ln = self._lib.arport_encode_cb(
            self._handle, _ptr(y, ctypes.c_int32),
            _ptr(p_acc, ctypes.c_int64), h, w, _ptr(out, ctypes.c_uint8),
            cap)
        if ln < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:ln].tobytes()

    def decode_cb(self, data: bytes, p_acc: np.ndarray, h: int, w: int
                  ) -> np.ndarray:
        buf = np.frombuffer(data, np.uint8)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        y_out = np.empty((h, w, self.M), np.int32)
        rc = self._lib.arport_decode_cb(
            self._handle, _ptr(buf, ctypes.c_uint8), len(data),
            _ptr(p_acc, ctypes.c_int64), h, w, _ptr(y_out, ctypes.c_int32))
        if rc != 0:
            raise ValueError("corrupt or truncated portable AR stream")
        return y_out.astype(np.float32)

    def encode_hp(self, y_q: np.ndarray, p_acc: np.ndarray) -> bytes:
        """Hyperprior one-pass encode (cards with family=2)."""
        y = np.ascontiguousarray(y_q, np.int32)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        h, w = y.shape[:2]
        cap = max(1024, h * w * self.M * 8 + 64)
        out = np.empty(cap, np.uint8)
        ln = self._lib.arport_encode_hp(
            self._handle, _ptr(y, ctypes.c_int32),
            _ptr(p_acc, ctypes.c_int64), h, w, _ptr(out, ctypes.c_uint8),
            cap)
        if ln < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:ln].tobytes()

    def decode_hp(self, data: bytes, p_acc: np.ndarray, h: int, w: int
                  ) -> np.ndarray:
        buf = np.frombuffer(data, np.uint8)
        p_acc = np.ascontiguousarray(p_acc, np.int64)
        y_out = np.empty((h, w, self.M), np.int32)
        rc = self._lib.arport_decode_hp(
            self._handle, _ptr(buf, ctypes.c_uint8), len(data),
            _ptr(p_acc, ctypes.c_int64), h, w, _ptr(y_out, ctypes.c_int32))
        if rc != 0:
            raise ValueError("corrupt or truncated portable AR stream")
        return y_out.astype(np.float32)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.arport_destroy(self._handle)
            self._handle = None
        if getattr(self, "_hyper_handle", None):
            self._lib.arport_hyper_destroy(self._hyper_handle)
            self._hyper_handle = None


def arwave_param_sweep_time(coder: "ArWaveCoder", y_q: np.ndarray,
                            psi: np.ndarray) -> float:
    """Profiling: run only the wavefront parameter sweep (no CDF/rANS) once;
    returns the checksum (timing is the caller's job)."""
    y_q = np.ascontiguousarray(y_q, np.float32)
    psi = np.ascontiguousarray(psi, np.float32)
    h, w = y_q.shape[:2]
    return float(coder._lib.arwave_param_sweep(
        coder._handle, _ptr(y_q, ctypes.c_float), _ptr(psi, ctypes.c_float),
        h, w))
