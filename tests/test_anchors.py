"""Classical-codec anchor RD curves (evaluation/anchors.py).

The anchors answer the standard "BD-rate vs JPEG" question the reference's
single published RD point cannot (eval_results artifact has no anchor);
everything is host-side PIL+numpy, so these tests are exact and fast.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from neural_image_compression_tpu.evaluation.anchors import (
    DEFAULT_QUALITIES, classical_rd_curve, classical_rd_point, encode_decode,
)


def _photo_like(h=128, w=160, seed=0):
    """Smooth gradients + a little texture: compressible, non-degenerate."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * xx / w),
        0.5 + 0.4 * np.cos(2 * np.pi * yy / h),
        0.5 + 0.3 * np.sin(2 * np.pi * (xx + yy) / (h + w)),
    ], axis=-1)
    tex = rng.rand(h, w, 3).astype(np.float32) * 0.05
    return np.clip(base + tex, 0.0, 1.0)


@pytest.fixture(scope="module")
def images():
    return [_photo_like(seed=s) for s in range(3)]


@pytest.mark.parametrize("codec", ["jpeg", "webp"])
def test_encode_decode_roundtrip(codec, images):
    u8 = (images[0] * 255 + 0.5).astype(np.uint8)
    n_bytes, dec = encode_decode(u8, codec, quality=90)
    assert dec.shape == u8.shape and dec.dtype == np.uint8
    assert 0 < n_bytes < u8.nbytes
    mse = np.mean((dec.astype(np.float64) - u8) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 30  # q=90 on smooth content


def test_float_and_uint8_inputs_agree(images):
    f = images[0]
    u8 = (np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8)
    a = classical_rd_point([f], "jpeg", 50)
    b = classical_rd_point([u8], "jpeg", 50)
    assert a == b
    # batch-1 NHWC (dataloader convention) also accepted
    c = classical_rd_point([f[None]], "jpeg", 50)
    assert c == a


@pytest.mark.parametrize("codec", ["jpeg", "webp"])
def test_curve_monotone_rd(codec, images):
    curve = classical_rd_curve(images, codec)
    assert len(curve) == len(DEFAULT_QUALITIES[codec])
    bpps = [p["bpp"] for p in curve]
    psnrs = [p["psnr"] for p in curve]
    assert bpps == sorted(bpps)
    # quality knob must actually trade rate for distortion end-to-end
    assert bpps[-1] > bpps[0] * 1.5
    assert psnrs[-1] > psnrs[0] + 3.0
    for p in curve:
        assert set(p) == {"bpp", "psnr", "quality"}
        assert np.isfinite(p["bpp"]) and np.isfinite(p["psnr"])


def test_curve_feeds_bdrate(images):
    from neural_image_compression_tpu.evaluation import bd_rate

    jpeg = classical_rd_curve(images, "jpeg")
    # a synthetic "model" strictly better than JPEG: same quality ladder,
    # 40% fewer bits at each point -> BD-rate ~= -40%
    model = [{"bpp": p["bpp"] * 0.6, "psnr": p["psnr"]} for p in jpeg]
    bd = bd_rate(jpeg, model)
    assert bd == pytest.approx(-40.0, abs=0.5)


def test_msssim_option():
    pt = classical_rd_point([_photo_like(176, 176)], "jpeg", 85,
                            with_msssim=True)
    assert 0.8 < pt["msssim"] <= 1.0


def test_input_validation():
    with pytest.raises(ValueError):
        encode_decode(np.zeros((16, 16, 3), np.uint8), "png")
    with pytest.raises(ValueError):
        encode_decode(np.zeros((16, 16), np.uint8), "jpeg")
    with pytest.raises(ValueError):
        encode_decode(np.zeros((2, 16, 16, 3), np.float32), "jpeg")
    with pytest.raises(ValueError):
        encode_decode(np.zeros((16, 16, 3), np.int32), "jpeg")
    with pytest.raises(ValueError):
        classical_rd_curve([np.zeros((16, 16, 3), np.uint8)], "bpg")


def test_cli_anchor_curve(tmp_path):
    from neural_image_compression_tpu.cli import main as cli_main

    d = tmp_path / "imgs"
    os.makedirs(d)
    for i in range(2):
        Image.fromarray((_photo_like(96, 96, seed=i) * 255).astype(
            np.uint8)).save(d / f"im{i}.png")
    out = tmp_path / "curve.json"
    cli_main(["anchor-curve", "--data_dir", str(d), "--codec", "jpeg",
              "--qualities", "20,60,90", "--out", str(out)])
    curve = json.loads(out.read_text())
    assert [p["quality"] for p in curve] in ([20, 60, 90], [20, 90, 60])
    bpps = [p["bpp"] for p in curve]
    assert bpps == sorted(bpps)
