"""Real-bitstream round-trip tests: encode -> decode must be bit-exact on the
latents, and the measured bitstream size must track the analytic rate."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.coding import backend
from neural_image_compression_tpu.coding.cdf_tables import quantize_pmf_rows
from neural_image_compression_tpu.coding.codec import (
    FactorizedPriorCodec, JointARCodec, bitstream_bpp, wavefront_order,
)
from neural_image_compression_tpu.models import (
    FactorizedPrior, JointAutoregressiveHierarchical,
)
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)


class TestRansBackend:
    def test_gaussian_roundtrip_with_outliers(self):
        rng = np.random.RandomState(0)
        n = 20000
        mus = (rng.randn(n) * 3).astype(np.float32)
        sigmas = (np.abs(rng.randn(n)) + 0.1).astype(np.float32)
        sym = np.round(mus + sigmas * rng.randn(n)).astype(np.int32)
        sym[::500] += 100000  # escapes
        data = backend.encode_gaussian(sym, mus, sigmas)
        out = backend.RansDecoder(data).decode_gaussian(mus, sigmas)
        np.testing.assert_array_equal(sym, out)

    def test_gaussian_rate_close_to_entropy(self):
        rng = np.random.RandomState(1)
        n = 50000
        mus = np.zeros(n, np.float32)
        sigmas = np.full(n, 2.0, np.float32)
        sym = np.round(2.0 * rng.randn(n)).astype(np.int32)
        data = backend.encode_gaussian(sym, mus, sigmas)
        from scipy.stats import norm
        p = norm.cdf((sym + 0.5) / 2.0) - norm.cdf((sym - 0.5) / 2.0)
        analytic_bits = -np.log2(np.maximum(p, 1e-12)).sum()
        assert len(data) * 8 < analytic_bits * 1.01 + 64

    def test_gmm_roundtrip(self):
        rng = np.random.RandomState(2)
        n, K = 10000, 3
        mus = (rng.randn(n, K) * 4).astype(np.float32)
        sigmas = (np.abs(rng.randn(n, K)) + 0.2).astype(np.float32)
        w = rng.rand(n, K).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        sym = np.round(mus[np.arange(n), rng.randint(0, K, n)]).astype(np.int32)
        data = backend.encode_gaussian(sym, mus, sigmas, w)
        out = backend.RansDecoder(data).decode_gaussian(mus, sigmas, w)
        np.testing.assert_array_equal(sym, out)

    def test_indexed_roundtrip(self):
        rng = np.random.RandomState(3)
        C, L = 4, 11
        pmf = rng.rand(C, L)
        pmf /= pmf.sum(1, keepdims=True)
        cdfs = quantize_pmf_rows(pmf)
        assert (cdfs[:, -1] == 1 << 16).all()
        offsets = np.full(C, -5, np.int32)
        sizes = np.full(C, L, np.int32)
        idx = rng.randint(0, C, 5000).astype(np.int32)
        sym = (rng.randint(0, L - 1, 5000) - 5).astype(np.int32)
        sym[::100] = -7777
        data = backend.encode_indexed(sym, idx, cdfs, offsets, sizes)
        out = backend.RansDecoder(data).decode_indexed(idx, cdfs, offsets, sizes)
        np.testing.assert_array_equal(sym, out)

    def test_chunked_decode_matches(self):
        rng = np.random.RandomState(4)
        n = 9000
        mus = np.zeros(n, np.float32)
        sigmas = np.ones(n, np.float32)
        sym = np.round(rng.randn(n)).astype(np.int32)
        data = backend.encode_gaussian(sym, mus, sigmas)
        dec = backend.RansDecoder(data)
        parts = [dec.decode_gaussian(mus[i:i + 1234], sigmas[i:i + 1234])
                 for i in range(0, n, 1234)]
        np.testing.assert_array_equal(np.concatenate(parts), sym)


class TestWavefront:
    def test_wavefront_is_causal(self):
        h, w = 7, 9
        pix, sizes = wavefront_order(h, w)
        assert pix.shape == (h * w, 2)
        assert sizes.sum() == h * w
        decoded_at = {}
        for t, (i, j) in enumerate(map(tuple, pix)):
            decoded_at[(i, j)] = t
        # every mask-A dependency must be decoded strictly earlier
        deps = [(di, dj) for di in (-2, -1) for dj in (-2, -1, 0, 1, 2)]
        deps += [(0, -2), (0, -1)]
        wave_of = {}
        start = 0
        for widx, ws in enumerate(sizes):
            for (i, j) in map(tuple, pix[start:start + ws]):
                wave_of[(i, j)] = widx
            start += ws
        for (i, j), widx in wave_of.items():
            for (di, dj) in deps:
                p = (i + di, j + dj)
                if p in wave_of:
                    assert wave_of[p] < widx, f"{p} not before {(i, j)}"


@pytest.mark.parametrize("K", [1, 3])
def test_joint_ar_roundtrip(K):
    model = JointAutoregressiveHierarchical(latent_channels=8, K=K)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(np.asarray(x))

    # decoded latents must equal the encoder's quantized latents exactly
    out = model.apply(variables, x, training=False)
    y_dec, z_dec = codec.decode_latents(data)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])

    # full decompress reproduces the eval-forward reconstruction
    x_hat = codec.decompress(data)
    ref = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(x_hat, ref, atol=1e-5)

    # measured bits within a few % of analytic bits, plus the fixed overhead
    # (26-byte header + 2 rANS state flushes + per-stream slack)
    metrics = rd_loss(out, x, 0.005)
    analytic_bits = float(metrics["bits_total"])
    actual_bits = len(data) * 8
    assert actual_bits < analytic_bits * 1.08 + 8 * 48, (actual_bits, analytic_bits)


def test_factorized_prior_roundtrip():
    model = FactorizedPrior(latent_channels=8)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = FactorizedPriorCodec(model, variables)
    data = codec.compress(np.asarray(x))
    x_hat = codec.decompress(data)
    out = model.apply(variables, x, training=False)
    ref = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(x_hat, ref, atol=1e-5)
    metrics = rd_loss(out, x, 0.005)
    actual_bits = len(data) * 8
    assert actual_bits < float(metrics["bits_total"]) * 1.08 + 8 * 48


def test_scalable_codec_roundtrip_and_truncation():
    from neural_image_compression_tpu.coding.codec import ScalableCodec
    from neural_image_compression_tpu.models import ScalableImageCoding

    model = ScalableImageCoding(latent_channels=12, base_channels=8, K=1)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = ScalableCodec(model, variables)
    data = codec.compress(np.asarray(x))

    out = model.apply(variables, x, training=False)
    # full decode reproduces the eval-forward reconstruction
    x_hat = codec.decompress(data)
    ref = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(x_hat, ref, atol=1e-5)

    # base-only decode from the truncated stream matches y1 / F_tilde
    base = codec.truncate_base(data)
    assert len(base) < len(data)
    y1, f_tilde = codec.decompress_base(base)
    np.testing.assert_array_equal(y1, np.asarray(out["y1"])[0])
    np.testing.assert_allclose(f_tilde[0], np.asarray(out["F_tilde"])[0],
                               atol=1e-5)

    # truncated stream refuses a full decode with a clear error
    with pytest.raises(ValueError):
        codec.decompress(base)


def test_scalable_codec_gmm_roundtrip():
    """K>1 scalable path exercises the permuted-EP coder layout per layer."""
    from neural_image_compression_tpu.coding.codec import ScalableCodec
    from neural_image_compression_tpu.models import ScalableImageCoding

    model = ScalableImageCoding(latent_channels=12, base_channels=8, K=3)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = ScalableCodec(model, variables)
    data = codec.compress(np.asarray(x))
    out = model.apply(variables, x, training=False)
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1),
                               atol=1e-5)
    y1, _ = codec.decompress_base(codec.truncate_base(data))
    np.testing.assert_array_equal(y1, np.asarray(out["y1"])[0])


class TestArWaveCoderFuzz:
    """Direct fuzz of the native wavefront coder with raw random weights —
    no model involved. Exercises odd channel counts (GEMM remainders),
    degenerate 1-row/1-col latent grids, outlier escapes, and weights that
    produce extreme sigmas (R clamped at 254)."""

    @staticmethod
    def _coder(rng, M, K, hidden=33, psi_dim=None, scale=0.2):
        psi_dim = psi_dim if psi_dim is not None else 2 * M
        out_dim = 2 * M if K == 1 else 3 * K * M
        r = lambda *s: (rng.randn(*s) * scale).astype(np.float32)
        return backend.ArWaveCoder(
            r(12 * M, 2 * M), r(2 * M), r(2 * M + psi_dim, hidden), r(hidden),
            r(hidden, hidden), r(hidden), r(hidden, out_dim), r(out_dim), M, K)

    @pytest.mark.parametrize("K,M,h,w", [
        (1, 5, 7, 9), (3, 5, 7, 9), (3, 8, 1, 13), (1, 8, 13, 1),
        (3, 16, 2, 2), (2, 7, 3, 17),
    ])
    def test_roundtrip_shapes(self, K, M, h, w):
        rng = np.random.RandomState(M * 100 + K)
        coder = self._coder(rng, M, K)
        y_q = np.round(rng.randn(h, w, M) * 3).astype(np.float32)
        y_q[0, 0, 0] = 100000.0   # escape path
        y_q[-1, -1, -1] = -77777.0
        psi = rng.randn(h, w, 2 * M).astype(np.float32)
        data = coder.encode(y_q, psi)
        out = coder.decode(data, psi, h, w)
        np.testing.assert_array_equal(out, y_q)

    def test_roundtrip_extreme_sigma_weights(self):
        """Large-magnitude weights drive softplus sigmas huge (R caps at 254)
        and mixture means far off; round-trip must still be exact."""
        rng = np.random.RandomState(0)
        coder = self._coder(rng, M=6, K=3, scale=3.0)
        y_q = np.round(rng.randn(5, 11, 6) * 50).astype(np.float32)
        psi = (rng.randn(5, 11, 12) * 5).astype(np.float32)
        data = coder.encode(y_q, psi)
        np.testing.assert_array_equal(coder.decode(data, psi, 5, 11), y_q)


def test_compress_batch_matches_single_and_roundtrips():
    """Batched serving APIs: streams byte-identical to single-image
    compress(), cross-API decodable, batch decode == eval forward."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=3)
    x = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x[:1],
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    streams = codec.compress_batch(np.asarray(x))
    out = model.apply(variables, x, training=False)

    # byte-identical to the single-image API (shared deterministic path)
    assert streams[0] == codec.compress(np.asarray(x[:1]))
    # batch-encoded streams decode with the single-image API
    for b, s in enumerate(streams):
        y_dec, _ = codec.decode_latents(s)
        np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[b])
    # threaded batch decode reproduces the eval forward
    xb = codec.decompress_batch(streams)
    np.testing.assert_allclose(xb, np.clip(np.asarray(out["x_hat"]), 0, 1),
                               atol=1e-5)


def test_joint_ar_roundtrip_k2_nonsquare():
    """K=2 mixture + non-square image (distinct H/W latent dims) through the
    native wavefront codec; M=12 exercises the GEMM's non-multiple-of-16
    column remainder (out_dim = 3*2*12 = 72)."""
    model = JointAutoregressiveHierarchical(latent_channels=12, K=2)
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 64, 192, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(np.asarray(x))
    out = model.apply(variables, x, training=False)
    y_dec, z_dec = codec.decode_latents(data)
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])


@pytest.mark.parametrize("K", [1, 3])
def test_numpy_fallback_path_roundtrip(K, monkeypatch):
    """NIC_DISABLE_NATIVE_AR=1 must still round-trip exactly (and both paths
    must recover the same quantized latents)."""
    from neural_image_compression_tpu.coding import codec as codec_mod

    model = JointAutoregressiveHierarchical(latent_channels=8, K=K)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    out = model.apply(variables, x, training=False)
    y_ref = np.asarray(out["y_in"])[0]

    data_native = codec.compress(np.asarray(x))
    monkeypatch.setattr(codec_mod, "NATIVE_AR", False)
    data_numpy = codec.compress(np.asarray(x))
    y_np, _ = codec.decode_latents(data_numpy)
    np.testing.assert_array_equal(y_np, y_ref)
    monkeypatch.setattr(codec_mod, "NATIVE_AR", True)
    y_nat, _ = codec.decode_latents(data_native)
    np.testing.assert_array_equal(y_nat, y_ref)


def test_joint_ar_codec_bf16_model():
    """Codec must round-trip a bf16-transform model (the serving config)."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=3,
                                            dtype=jnp.bfloat16)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(np.asarray(x))
    y_dec, z_dec = codec.decode_latents(data)
    out = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])


def test_joint_ar_tiled_roundtrip():
    """Independent 2x2 latent tiles: exact round trip, small rate overhead."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=3)
    x = jax.random.uniform(KEY, (1, 128, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data_1 = codec.compress(np.asarray(x))
    data_t = codec.compress(np.asarray(x), tiles=(2, 2))

    out = model.apply(variables, x, training=False)
    y_ref = np.asarray(out["y_in"])[0]
    for data in (data_1, data_t):
        y_dec, z_dec = codec.decode_latents(data)
        np.testing.assert_array_equal(y_dec, y_ref)
        np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    x_hat = codec.decompress(data_t)
    np.testing.assert_allclose(x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1),
                               atol=1e-5)
    # tiling overhead: 3 extra rANS flushes + length table + context reset
    assert len(data_t) < len(data_1) * 1.25 + 64


class TestArbitrarySize:
    """Pad-code-crop (SURVEY §7.3): any image size round-trips; the stream is
    byte-identical (past the size header) to coding the padded image."""

    def test_joint_ar(self):
        model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
        x_init = jax.random.uniform(KEY, (1, 64, 128, 3))
        variables = {"params": model.init({"params": KEY, "noise": KEY},
                                          x_init, training=False)["params"]}
        codec = JointARCodec(model, variables)
        from neural_image_compression_tpu.coding.codec import _pad_input
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (1, 50, 100, 3)))
        data = codec.compress(x)
        x_hat = codec.decompress(data)
        assert x_hat.shape == (1, 50, 100, 3)
        # identical coded payload as the explicitly padded image
        data_pad = codec.compress(_pad_input(x, 64))
        assert data[12:] == data_pad[12:]
        np.testing.assert_array_equal(
            x_hat, codec.decompress(data_pad)[:, :50, :100])
        # batch APIs agree with the single-image path
        xs = np.concatenate([x, np.asarray(
            jax.random.uniform(jax.random.PRNGKey(8), (1, 50, 100, 3)))])
        streams = codec.compress_batch(xs)
        assert streams[0] == data
        recon = codec.decompress_batch(streams)
        assert recon.shape == (2, 50, 100, 3)
        np.testing.assert_array_equal(recon[0], x_hat[0])

    def test_factorized(self):
        model = FactorizedPrior(latent_channels=8)
        x_init = jax.random.uniform(KEY, (1, 32, 32, 3))
        variables = {"params": model.init({"params": KEY, "noise": KEY},
                                          x_init, training=False)["params"]}
        codec = FactorizedPriorCodec(model, variables)
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (1, 40, 70, 3)))
        x_hat = codec.decompress(codec.compress(x))
        assert x_hat.shape == (1, 40, 70, 3)

    def test_scalable(self):
        from neural_image_compression_tpu.coding.codec import ScalableCodec
        from neural_image_compression_tpu.models import ScalableImageCoding
        model = ScalableImageCoding(latent_channels=12, base_channels=8, K=1)
        x_init = jax.random.uniform(KEY, (1, 64, 64, 3))
        variables = {"params": model.init({"params": KEY, "noise": KEY},
                                          x_init, training=False)["params"]}
        codec = ScalableCodec(model, variables)
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(10), (1, 70, 90, 3)))
        x_hat = codec.decompress(codec.compress(x))
        assert x_hat.shape == (1, 70, 90, 3)


class TestInterleavedStreams:
    """N-way interleaved rANS (n_streams): rate-neutral parallel decode.
    Symbol s -> stream s % N with unchanged entropy params, so decoded
    latents must equal the single-stream path exactly and the overhead is
    bounded by the per-stream flush + length table (~8 bytes/stream)."""

    @pytest.mark.parametrize("K", [1, 3])
    def test_matches_single_stream(self, K):
        model = JointAutoregressiveHierarchical(latent_channels=8, K=K)
        x = jax.random.uniform(jax.random.PRNGKey(K), (1, 128, 128, 3))
        variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                          training=False)["params"]}
        codec = JointARCodec(model, variables)
        base = codec.compress(np.asarray(x))
        y_ref, z_ref = codec.decode_latents(base)
        for N in (2, 8):
            data = codec.compress(np.asarray(x), n_streams=N)
            assert len(data) - len(base) <= 8 * N
            y_dec, z_dec = codec.decode_latents(data)
            np.testing.assert_array_equal(y_dec, y_ref)
            np.testing.assert_array_equal(z_dec, z_ref)
        # full image path too
        np.testing.assert_array_equal(
            codec.decompress(codec.compress(np.asarray(x), n_streams=4)),
            codec.decompress(base))

    @pytest.mark.parametrize("K,M,h,w,N", [
        (1, 5, 7, 9, 3), (3, 7, 5, 17, 4), (3, 8, 1, 13, 8), (1, 8, 13, 1, 2),
    ])
    def test_fuzz_raw_weights_with_escapes(self, K, M, h, w, N):
        rng = np.random.RandomState(M * 10 + K + N)
        coder = TestArWaveCoderFuzz._coder(rng, M, K)
        y_q = np.round(rng.randn(h, w, M) * 3).astype(np.float32)
        y_q[0, 0, 0] = 100000.0
        y_q[-1, -1, -1] = -77777.0
        psi = rng.randn(h, w, 2 * M).astype(np.float32)
        data = coder.encode_n(y_q, psi, N)
        out = coder.decode_n(data, psi, h, w, N)
        np.testing.assert_array_equal(out, y_q)


def test_fast_math_accuracy():
    """The native coder's transcendental fast paths (fast_exp/log/softplus/
    normal-cdf) must stay within tolerances that are invisible to the 16-bit
    CDF quantizer (see rans_core.h)."""
    import ctypes

    from scipy.special import ndtr

    lib = backend.get_lib()
    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.uniform(-30, 30, 20000), rng.uniform(-0.01, 0.01, 1000),
        [0.0, 1e-6, -1e-6, 87.0, -87.0, -200.0, 5e-5]]).astype(np.float32)
    n = len(x)
    outs = [np.empty(n, np.float32) for _ in range(4)]
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.nic_fastmath_eval(fp(x), n, *[fp(o) for o in outs])
    e, lg, sp, cdf = outs

    xn = np.where(x > 0, -x, x).astype(np.float64)  # exp domain <= 0
    xn = np.maximum(xn, -87.0)  # fast_exp clamps the underflow tail
    # rel error is |x|*ulp-limited by the single-precision range reduction
    # (t = x*log2e rounds once), ~2e-6 at |x|=87 — far below what a 16-bit
    # CDF quantizer can see
    np.testing.assert_allclose(e, np.exp(xn), rtol=4e-6, atol=1e-38)
    pos = x > 0
    np.testing.assert_allclose(lg[pos], np.log(x[pos].astype(np.float64)),
                               rtol=1e-6, atol=2e-6)
    np.testing.assert_allclose(sp, np.logaddexp(0, x.astype(np.float64)),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(cdf, ndtr(x.astype(np.float64)), atol=3e-7)


def test_interleaved_streams_decompress_batch():
    """Review follow-up: batch decompress must route interleaved streams
    through decode_n (it used to assert on the layout word)."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    xs = np.asarray(jax.random.uniform(KEY, (2, 64, 64, 3)))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, xs[:1],
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    streams = [codec.compress(xs[b:b + 1], n_streams=4) for b in range(2)]
    batch = codec.decompress_batch(streams)
    for b in range(2):
        np.testing.assert_array_equal(batch[b],
                                      codec.decompress(streams[b])[0])
    with pytest.raises(AssertionError):
        codec.compress(xs[:1], tiles=(128, 2))  # would collide with the flag


def test_corrupt_and_mismatched_streams_fail_fast():
    """Integrity: a truncated/corrupted AR payload raises (the decoder's
    final rANS-state check) instead of yielding silent garbage, and
    decompress_batch rejects a bitstream from a different model config."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = np.asarray(jax.random.uniform(KEY, (1, 64, 64, 3)), np.float32)
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(x)

    with pytest.raises(ValueError):
        codec.decompress(data[:-16])           # truncated payload
    flipped = bytearray(data)
    flipped[len(flipped) // 2] ^= 0xFF         # bit-flip mid-payload
    with pytest.raises(ValueError):
        codec.decompress(bytes(flipped))

    other = JointAutoregressiveHierarchical(latent_channels=16, K=1)
    other_vars = {"params": other.init({"params": KEY, "noise": KEY}, x,
                                       training=False)["params"]}
    other_codec = JointARCodec(other, other_vars)
    with pytest.raises(ValueError, match="M=8"):
        other_codec.decompress_batch([data])


class TestUint8IO:
    """uint8 fast path: encode accepts raw uint8 (u8/255 computed on device,
    codec._make_analysis) and must emit the byte-identical stream to the
    host-side f32 conversion; decompress(as_uint8=True) runs clip/round/*255
    on device and must equal the f32 reconstruction quantized on host."""

    def _u8(self, shape, seed=7):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=shape, dtype=np.uint8)

    def test_joint_ar_stream_identical_and_u8_decode(self):
        model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
        u8 = self._u8((1, 70, 50, 3))  # odd size: pad-path must keep uint8
        f32 = u8.astype(np.float32) / 255.0
        variables = {"params": model.init(
            {"params": KEY, "noise": KEY}, jnp.zeros((1, 64, 64, 3)),
            training=False)["params"]}
        codec = JointARCodec(model, variables)
        assert codec.compress(u8) == codec.compress(f32)

        data = codec.compress(u8)
        x_f32 = codec.decompress(data)
        x_u8 = codec.decompress(data, as_uint8=True)
        assert x_u8.dtype == np.uint8 and x_u8.shape == u8.shape
        np.testing.assert_array_equal(
            x_u8, np.round(np.clip(x_f32, 0, 1) * 255).astype(np.uint8))

    def test_joint_ar_batch_u8_decode(self):
        model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
        u8 = self._u8((2, 64, 64, 3))
        f32 = u8.astype(np.float32) / 255.0
        variables = {"params": model.init(
            {"params": KEY, "noise": KEY}, jnp.asarray(f32[:1]),
            training=False)["params"]}
        codec = JointARCodec(model, variables)
        datas = codec.compress_batch(u8)
        assert datas == codec.compress_batch(f32)
        x_f32 = codec.decompress_batch(datas)
        x_u8 = codec.decompress_batch(datas, as_uint8=True)
        assert x_u8.dtype == np.uint8
        np.testing.assert_array_equal(
            x_u8, np.round(np.clip(x_f32, 0, 1) * 255).astype(np.uint8))

    def test_factorized_u8(self):
        model = FactorizedPrior(latent_channels=8)
        u8 = self._u8((1, 48, 48, 3))
        f32 = u8.astype(np.float32) / 255.0
        variables = {"params": model.init(
            {"params": KEY, "noise": KEY}, jnp.asarray(f32),
            training=False)["params"]}
        codec = FactorizedPriorCodec(model, variables)
        assert codec.compress(u8) == codec.compress(f32)
        data = codec.compress(u8)
        np.testing.assert_array_equal(
            codec.decompress(data, as_uint8=True),
            np.round(np.clip(codec.decompress(data), 0, 1) * 255
                     ).astype(np.uint8))

    def test_scalable_u8(self):
        from neural_image_compression_tpu.coding.codec import ScalableCodec
        from neural_image_compression_tpu.models import ScalableImageCoding

        model = ScalableImageCoding(latent_channels=8, base_channels=4, K=1)
        u8 = self._u8((1, 64, 64, 3))
        f32 = u8.astype(np.float32) / 255.0
        variables = {"params": model.init(
            {"params": KEY, "noise": KEY}, jnp.asarray(f32),
            training=False)["params"]}
        codec = ScalableCodec(model, variables)
        assert codec.compress(u8) == codec.compress(f32)
        data = codec.compress(u8)
        np.testing.assert_array_equal(
            codec.decompress(data, as_uint8=True),
            np.round(np.clip(codec.decompress(data), 0, 1) * 255
                     ).astype(np.uint8))


class TestInt16LatentTransfers:
    """The analysis program returns y as int16 (half the download) with an
    in-band -32768 poison on overflow; synthesis uploads int16 when values
    fit. Streams and reconstructions must be unchanged."""

    def test_fetch_and_upload_helpers(self):
        from neural_image_compression_tpu.coding.codec import (
            _fetch_y16, _latents_to_device,
        )

        ok = np.array([[-32767, 5]], np.int16)
        out = _fetch_y16(ok, lambda: (_ for _ in ()).throw(AssertionError))
        assert out.dtype == np.float32 and out[0, 0] == -32767.0
        sentinel = np.zeros((2, 2), np.float32)
        assert _fetch_y16(np.full((2, 2), -32768, np.int16),
                          lambda: sentinel) is sentinel
        assert _latents_to_device(np.array([40000.0], np.float32)
                                  ).dtype == jnp.float32
        assert _latents_to_device(np.array([3.0, -7.0], np.float32)
                                  ).dtype == jnp.int16

    def test_compress_overflow_falls_back_to_f32(self, monkeypatch):
        model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
        x = np.asarray(jax.random.uniform(KEY, (1, 64, 64, 3)))
        variables = {"params": model.init({"params": KEY, "noise": KEY},
                                          jnp.asarray(x),
                                          training=False)["params"]}
        ref = JointARCodec(model, variables).compress(x)

        codec = JointARCodec(model, variables)
        real = codec._analysis_q(codec.variables, jnp.asarray(x))
        poisoned = (jnp.full_like(real[0], -32768), real[1])
        monkeypatch.setattr(codec, "_analysis_q", lambda v, xx: poisoned)
        assert codec.compress(x) == ref  # refetched through the f32 program


def test_residual_family_roundtrip():
    """HierarchicalMixtureResidual (3x3 residual transforms) through the
    same JointARCodec path the CLI routes it to: exact latents, exact
    reconstruction vs the eval forward."""
    from neural_image_compression_tpu.models import HierarchicalMixtureResidual

    model = HierarchicalMixtureResidual(latent_channels=8, K=2)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(np.asarray(x))
    out = model.apply(variables, x, training=False)
    y_dec, z_dec = codec.decode_latents(data)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=1e-5)


def test_factorized_truncated_stream_raises():
    """Generic indexed rANS decodes now verify the complete-decode invariant:
    a truncated factorized bitstream raises instead of silently yielding
    garbage symbols."""
    model = FactorizedPrior(latent_channels=8)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = FactorizedPriorCodec(model, variables)
    data = codec.compress(np.asarray(x))
    with pytest.raises(ValueError):
        codec.decompress(data[:-8])


def test_non_integral_latents_rejected():
    """The AR coders' 'float32 holding integers' contract is enforced at the
    entry on both the native and numpy paths (a non-integral or NaN latent
    would silently desynchronize encode/decode context)."""
    import os

    from neural_image_compression_tpu.coding import backend

    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    out = model.apply(variables, x, training=False)
    psi = np.asarray(model.apply(variables, out["z_in"],
                                 method=lambda m, z: m.hyper_decoder(z)))[0]
    y_bad = np.asarray(out["y_in"])[0].copy()
    y_bad[0, 0, 0] += 0.25
    y_nan = np.asarray(out["y_in"])[0].copy()
    y_nan[0, 0, 0] = np.nan
    from neural_image_compression_tpu.coding.codec import _ar_encode_latents
    for bad in (y_bad, y_nan):
        with pytest.raises(ValueError):
            _ar_encode_latents(codec._host_nets, bad, psi)
    old = os.environ.get("NIC_DISABLE_NATIVE_AR")
    os.environ["NIC_DISABLE_NATIVE_AR"] = "1"
    try:
        import neural_image_compression_tpu.coding.codec as C
        orig = C.NATIVE_AR
        C.NATIVE_AR = False
        with pytest.raises(ValueError):
            _ar_encode_latents(codec._host_nets, y_bad, psi)
        C.NATIVE_AR = orig
    finally:
        if old is None:
            os.environ.pop("NIC_DISABLE_NATIVE_AR", None)
        else:
            os.environ["NIC_DISABLE_NATIVE_AR"] = old


def test_truncation_sweep_raises_everywhere():
    """Every truncation point of a joint-AR bitstream must raise (the
    decoder's final-state invariant), never return silently-wrong latents."""
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    codec = JointARCodec(model, variables)
    data = codec.compress(np.asarray(x))
    step = max(1, len(data) // 16)
    for cut in range(len(data) - 1, 26, -step):  # keep the 26-byte header
        with pytest.raises(ValueError):
            codec.decompress(data[:cut])
