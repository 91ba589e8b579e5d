"""Portable (cross-machine deterministic) bitstream mode (coding/portable.py
+ coding/rans/ar_portable.cc).

The determinism claim: every operation between integer latents and rANS
frequencies is fixed-point with defined rounding, so the C++ and numpy
implementations — and by extension any two machines — produce bit-identical
streams given the same PortableCard. These tests assert that claim in both
directions, plus the card lifecycle and the rate cost vs the float path.
"""

import numpy as np
import pytest

import jax

from neural_image_compression_tpu.coding.codec import (
    JointARCodec, _ar_encode_latents,
)
from neural_image_compression_tpu.coding.portable import (
    PortableCard, portable_ar_decode, portable_ar_encode,
)
from neural_image_compression_tpu.models import JointAutoregressiveHierarchical

KEY = jax.random.PRNGKey(0)


def _setup(K, M=8):
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K)
    x = jax.random.uniform(KEY, (1, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    return model, variables


@pytest.fixture(scope="module", params=[1, 3], ids=["K1", "K3"])
def rig(request):
    K = request.param
    model, variables = _setup(K)
    card = PortableCard.build(model, variables, zmin=-32, zmax=32)
    return model, variables, card, K


def test_native_and_numpy_streams_bit_identical(rig):
    """The VERDICT #2 done-criterion: a natively-encoded portable stream
    decodes bit-exactly via the numpy path, and vice versa."""
    _, _, card, _ = rig
    rng = np.random.RandomState(1)
    h, w = 6, 10
    y_q = rng.randint(-9, 10, (h, w, card.M)).astype(np.float32)
    z_q = rng.randint(-4, 5, (2, 3, card.M)).astype(np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]

    s_py = portable_ar_encode(card, y_q, psi_fix, native=False)
    s_cc = portable_ar_encode(card, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_ar_decode(card, s_cc, psi_fix, h, w, native=False), y_q)
    np.testing.assert_array_equal(
        portable_ar_decode(card, s_py, psi_fix, h, w, native=True), y_q)


def test_native_hyper_matches_numpy(rig):
    """arport_hyper is an exact mirror of the numpy integer hyper-decoder:
    identical psi (shape and values) across even/odd/degenerate z grids."""
    _, _, card, _ = rig
    rng = np.random.RandomState(7)
    for hz, wz in [(2, 3), (1, 1), (5, 2), (3, 7)]:
        z_q = rng.randint(-6, 7, (hz, wz, card.M)).astype(np.int32)
        a = card.hyper_forward(z_q, native=False)
        b = card.hyper_forward(z_q, native=True)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_native_psi_matches_numpy(rig):
    """arport_psi equals the numpy psi_precompute accumulators exactly,
    including a row count that is not a multiple of the panel size."""
    _, _, card, _ = rig
    rng = np.random.RandomState(8)
    for n in (1, 5, 64, 77):
        psi = rng.randint(-5000, 5000, (n, 2 * card.M)).astype(np.int64)
        np.testing.assert_array_equal(
            card.psi_precompute(psi, native=False),
            card.psi_precompute(psi, native=True))


def test_giant_latents_fall_back_identically(rig):
    """Latents too large for the int32 fast-GEMM window force the scalar
    fallback mid-stream; both implementations still agree byte-for-byte
    (dispatch can never affect the stream)."""
    _, _, card, _ = rig
    rng = np.random.RandomState(9)
    h, w = 4, 6
    y_q = rng.randint(-3, 4, (h, w, card.M)).astype(np.float32)
    y_q[0, 0, 0] = float(1 << 21)  # (y << F) exceeds int32
    z_q = np.zeros((1, 2, card.M), np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]
    s_py = portable_ar_encode(card, y_q, psi_fix, native=False)
    s_cc = portable_ar_encode(card, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_ar_decode(card, s_py, psi_fix, h, w, native=True), y_q)
    np.testing.assert_array_equal(
        portable_ar_decode(card, s_cc, psi_fix, h, w, native=False), y_q)


def test_escape_path_roundtrip(rig):
    """Symbols far outside the alphabet span go through the raw-16 escape on
    both implementations identically."""
    _, _, card, _ = rig
    rng = np.random.RandomState(2)
    h, w = 4, 6
    y_q = rng.randint(-3, 4, (h, w, card.M)).astype(np.float32)
    y_q[1, 2, 0] = 9000.0
    y_q[3, 5, card.M - 1] = -70000.0
    z_q = np.zeros((1, 2, card.M), np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]
    s_py = portable_ar_encode(card, y_q, psi_fix, native=False)
    s_cc = portable_ar_encode(card, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_ar_decode(card, s_py, psi_fix, h, w, native=True), y_q)


def test_codec_portable_end_to_end(rig):
    model, variables, card, _ = rig
    codec = JointARCodec(model, variables, portable_card=card)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 128, 3)))
    data = codec.compress_portable(x)
    out = codec.decompress(data)
    ref = codec.decompress(codec.compress(x))
    np.testing.assert_array_equal(out, ref)


def test_card_save_load_and_hash(tmp_path, rig):
    model, variables, card, _ = rig
    path = str(tmp_path / "card.npz")
    card.save(path)
    card2 = PortableCard.load(path)
    assert card2.hash == card.hash
    rng = np.random.RandomState(3)
    y_q = rng.randint(-5, 6, (4, 6, card.M)).astype(np.float32)
    z_q = rng.randint(-2, 3, (1, 2, card.M)).astype(np.float32)
    psi1 = card.hyper_forward(z_q)[:4, :6]
    psi2 = card2.hyper_forward(z_q)[:4, :6]
    np.testing.assert_array_equal(psi1, psi2)
    assert portable_ar_encode(card, y_q, psi1) == \
        portable_ar_encode(card2, y_q, psi2)


def test_mismatched_card_fails_fast(rig):
    model, variables, card, _ = rig
    codec = JointARCodec(model, variables, portable_card=card)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3)))
    data = codec.compress_portable(x)
    other = PortableCard.build(model, variables, zmin=-16, zmax=16)
    codec2 = JointARCodec(model, variables, portable_card=other)
    with pytest.raises(ValueError, match="different card"):
        codec2.decompress(data)


def test_corrupt_portable_stream_raises(rig):
    model, variables, card, _ = rig
    codec = JointARCodec(model, variables, portable_card=card)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3)))
    data = codec.compress_portable(x)
    with pytest.raises(ValueError):
        codec.decompress(data[:-10])


def test_rate_overhead_vs_float_path(rig):
    """Parameter quantization (int16 weights, sigma bins, mu sub-grid) costs
    rate; assert it stays small on a non-degenerate latent field."""
    model, variables, card, _ = rig
    codec = JointARCodec(model, variables)
    rng = np.random.RandomState(4)
    h, w = 8, 12
    y_q = rng.randint(-9, 10, (h, w, card.M)).astype(np.float32)
    z_q = rng.randint(-4, 5, (2, 3, card.M)).astype(np.float32)
    psi_fix = card.hyper_forward(z_q)
    portable = portable_ar_encode(card, y_q, psi_fix)
    import jax.numpy as jnp
    (psi_dev,) = codec._hyper_synthesis(variables, jnp.asarray(z_q)[None])
    std = _ar_encode_latents(codec._host_nets, y_q, np.asarray(psi_dev)[0])
    overhead = len(portable) / len(std) - 1.0
    assert overhead < 0.05, overhead


def test_factorized_portable_roundtrip(tmp_path):
    from neural_image_compression_tpu.coding.codec import FactorizedPriorCodec
    from neural_image_compression_tpu.coding.portable import FactorizedCard
    from neural_image_compression_tpu.models import FactorizedPrior

    model = FactorizedPrior(latent_channels=8)
    x = np.asarray(jax.random.uniform(KEY, (1, 64, 96, 3)))
    variables = {"params": model.init({"params": KEY, "noise": KEY},
                                      jax.numpy.asarray(x),
                                      training=False)["params"]}
    codec = FactorizedPriorCodec(model, variables)
    data = codec.compress_portable(x)
    out = codec.decompress(data)
    np.testing.assert_array_equal(out, codec.decompress(codec.compress(x)))
    # card round-trips through disk and decodes the same stream
    path = str(tmp_path / "fcard.npz")
    codec.portable_card().save(path)
    codec2 = FactorizedPriorCodec(model, variables,
                                  portable_card=FactorizedCard.load(path))
    np.testing.assert_array_equal(codec2.decompress(data), out)
    assert codec2.compress_portable(x) == data
    # mismatched card fails fast
    other = FactorizedCard.build(model, variables, ymin=-16, ymax=16)
    codec3 = FactorizedPriorCodec(model, variables, portable_card=other)
    with pytest.raises(ValueError, match="different card"):
        codec3.decompress(data)


def test_scalable_portable_roundtrip_and_truncation():
    from neural_image_compression_tpu.coding.codec import ScalableCodec
    from neural_image_compression_tpu.models import ScalableImageCoding

    model = ScalableImageCoding(latent_channels=8, base_channels=5, K=1)
    x = np.asarray(jax.random.uniform(KEY, (1, 64, 128, 3)))
    variables = {"params": model.init({"params": KEY, "noise": KEY},
                                      jax.numpy.asarray(x),
                                      training=False)["params"]}
    codec = ScalableCodec(model, variables)
    data = codec.compress_portable(x)
    out = codec.decompress(data)
    np.testing.assert_array_equal(out, codec.decompress(codec.compress(x)))
    # base-layer truncation still works on portable streams
    base = codec.truncate_base(data)
    y1, f_tilde = codec.decompress_base(base)
    y1_full, _ = codec.decompress_base(data)
    np.testing.assert_array_equal(y1, y1_full)
    with pytest.raises(ValueError, match="enhancement"):
        codec.decompress(base)


# ---------------------------------------------------------------------------
# Integer-GEMM / deconv exactness (the fast forms must be bit-identical to
# the direct int64 forms — this is what keeps the spec implementation-free)
# ---------------------------------------------------------------------------

def _direct_imatmul(a, w):
    return a.astype(np.int64) @ w.astype(np.int64)


def _dilated_deconv(x, layer, stride, padding, output_padding):
    """The literal dilate-pad-conv definition from ops/conv.py deconv2d."""
    from neural_image_compression_tpu.coding.portable import rshift_round

    kh, kw = layer.wq.shape[:2]
    h, w, cin = x.shape
    xd = np.zeros(((h - 1) * stride + 1, (w - 1) * stride + 1, cin), np.int64)
    xd[::stride, ::stride] = x
    lo = kh - 1 - padding
    hi = kh - 1 - padding + output_padding
    xp = np.pad(xd, ((lo, hi), (lo, hi), (0, 0)))
    oh = xp.shape[0] - kh + 1
    ow = xp.shape[1] - kw + 1
    acc = np.broadcast_to(layer.bq, (oh, ow, layer.bq.shape[0])).copy()
    for r in range(kh):
        for c in range(kw):
            acc += _direct_imatmul(xp[r:r + oh, c:c + ow, :], layer.wq[r, c])
    return rshift_round(acc, layer.sw)


def test_imatmul_exact_vs_int64_incl_bound_edges():
    from neural_image_compression_tpu.coding.portable import _imatmul

    rng = np.random.RandomState(0)
    # amax chosen so amax*32767*k straddles 2^53: below -> dgemm path,
    # above -> int64 fallback; both must equal direct int64 matmul
    for n, k, m, amax in [(7, 5, 3, 100), (16, 640, 48, 1 << 20),
                          (8, 256, 16, (2 ** 53 // (32767 * 256)) - 1),
                          (8, 256, 16, 2 ** 53 // (32767 * 256) + 7)]:
        a = rng.randint(-amax, amax + 1, size=(n, k)).astype(np.int64)
        a.flat[0] = amax  # pin the bound
        w = rng.randint(-32767, 32768, size=(k, m)).astype(np.int16)
        np.testing.assert_array_equal(_imatmul(a, w), _direct_imatmul(a, w))


def test_int_deconv_exact_vs_dilated_form():
    from neural_image_compression_tpu.coding.portable import (
        QuantLayer, _int_deconv2d,
    )

    rng = np.random.RandomState(1)
    for (kh, stride, pad, opad) in [(5, 2, 2, 1), (3, 2, 1, 1), (5, 1, 2, 0),
                                    (4, 2, 1, 0), (3, 3, 0, 2)]:
        for (h, w) in [(8, 12), (5, 7), (1, 1), (2, 3)]:
            cin, cout = 6, 10
            layer = QuantLayer(
                rng.randint(-32767, 32768, (kh, kh, cin, cout)).astype(np.int16),
                rng.randint(-10 ** 6, 10 ** 6, cout).astype(np.int64), 11)
            x = rng.randint(-(1 << 18), 1 << 18, (h, w, cin)).astype(np.int64)
            got = _int_deconv2d(x, layer, stride, pad, opad)
            want = _dilated_deconv(x, layer, stride, pad, opad)
            np.testing.assert_array_equal(
                got, want, err_msg=f"k={kh} s={stride} p={pad} op={opad} "
                                   f"h={h} w={w}")


def test_out_of_spec_cards_and_latents_rejected(rig):
    """Spec guards shared by both implementations: cards with K > 16 or
    sigma_R beyond the 254 alphabet cap are rejected at construction (the
    native coder sizes fixed buffers from them), and encode refuses latents
    beyond Y_ABS_MAX (the bound that keeps the int64 context GEMMs exact)."""
    import copy

    from neural_image_compression_tpu.coding.portable import Y_ABS_MAX

    _, _, card, _ = rig

    def clone_with(**overrides):
        kw = dict(M=card.M, K=card.K, hyper=card.hyper, ctx=card.ctx,
                  ep1_phi=card.ep1_phi, ep1_psi=card.ep1_psi, ep2=card.ep2,
                  ep3=card.ep3, sigma_thr=card.sigma_thr,
                  sigma_fix=card.sigma_fix, sigma2_fix=card.sigma2_fix,
                  sigma_R=card.sigma_R, tables=card.tables,
                  exp_lut=card.exp_lut, z_cdfs=card.z_cdfs,
                  z_offsets=card.z_offsets, z_sizes=card.z_sizes,
                  zmin=card.zmin, zmax=card.zmax)
        kw.update(overrides)
        return PortableCard(**kw)

    with pytest.raises(ValueError):
        clone_with(K=17)
    bad_r = copy.deepcopy(card.sigma_R)
    bad_r[0] = 300
    with pytest.raises(ValueError):
        clone_with(sigma_R=bad_r)

    h, w = 4, 6
    y_q = np.zeros((h, w, card.M), np.float32)
    y_q[0, 0, 0] = float(2 * Y_ABS_MAX)
    z_q = np.zeros((1, 2, card.M), np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]
    for native in (False, True):
        with pytest.raises(ValueError):
            portable_ar_encode(card, y_q, psi_fix, native=native)
