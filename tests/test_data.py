"""Data pipeline tests: preprocessing semantics, datasets, batch loader."""

import numpy as np
import pytest
from PIL import Image

from neural_image_compression_tpu.data import (
    BatchLoader, ImageFolderDataset, KodakDataset, add_quantization_noise,
    is_saturated, pad_to_multiple, preprocess_images, random_downsample_crop,
)


def _save_random_images(tmp_path, n=4, size=(300, 280), ext="png", seed=0):
    rng = np.random.RandomState(seed)
    for i in range(n):
        arr = (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.{ext}")


def test_is_saturated():
    flat = Image.fromarray(np.full((10, 10, 3), 128, np.uint8))
    assert not is_saturated(flat)
    sat = np.zeros((10, 10, 3), np.uint8)
    sat[..., 0] = 255  # pure red: spread = 1 everywhere
    assert is_saturated(Image.fromarray(sat))


def test_add_quantization_noise_small():
    img = Image.fromarray(np.full((8, 8, 3), 100, np.uint8))
    noisy = np.asarray(add_quantization_noise(img))
    assert np.abs(noisy.astype(int) - 100).max() <= 1


def test_random_downsample_crop_size():
    img = Image.fromarray(np.zeros((400, 500, 3), np.uint8))
    out = random_downsample_crop(img, target_size=256, min_factor=0.75)
    assert out.size == (256, 256)


def test_random_downsample_crop_too_small():
    img = Image.fromarray(np.zeros((100, 100, 3), np.uint8))
    assert random_downsample_crop(img, target_size=256) is None


def test_preprocess_images_end_to_end(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    _save_random_images(src, n=3, size=(400, 400))
    # one saturated image that must be dropped
    sat = np.zeros((400, 400, 3), np.uint8)
    sat[..., 0] = 255
    Image.fromarray(sat).save(src / "sat.png")
    kept = preprocess_images(src, dst, target_size=256, seed=1)
    assert kept == 3
    files = sorted(dst.glob("*.png"))
    assert len(files) == 3
    for f in files:
        assert Image.open(f).size == (256, 256)


def test_image_folder_dataset(tmp_path):
    _save_random_images(tmp_path, n=3)
    ds = ImageFolderDataset(str(tmp_path))
    assert len(ds) == 3
    img = ds[0]
    assert img.shape == (280, 300, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_kodak_dataset_only_png(tmp_path):
    _save_random_images(tmp_path, n=2, ext="png")
    _save_random_images(tmp_path, n=2, ext="jpg", seed=5)
    assert len(KodakDataset(str(tmp_path))) == 2


def test_batch_loader_batches(tmp_path):
    _save_random_images(tmp_path, n=5, size=(64, 64))
    loader = BatchLoader(ImageFolderDataset(str(tmp_path)), batch_size=2)
    batches = list(loader)
    assert len(batches) == 2  # drop remainder
    assert batches[0].shape == (2, 64, 64, 3)


def test_batch_loader_cycles(tmp_path):
    _save_random_images(tmp_path, n=2, size=(32, 32))
    loader = BatchLoader(ImageFolderDataset(str(tmp_path)), batch_size=1)
    a = list(loader)
    b = list(loader)  # second pass must work (Trainer re-iterates)
    assert len(a) == len(b) == 2


def test_pad_to_multiple():
    x = np.zeros((1, 100, 130, 3), np.float32)
    out = pad_to_multiple(x, 64)
    assert out.shape == (1, 128, 192, 3)
    np.testing.assert_array_equal(out[:, :100, :130], x)
    # edge padding replicates border
    np.testing.assert_array_equal(out[:, 100:, :130], np.zeros((1, 28, 130, 3)))


def test_image_folder_dataset_cache(tmp_path):
    _save_random_images(tmp_path, n=2)
    ds = ImageFolderDataset(str(tmp_path), cache=True)
    a = ds[0]
    b = ds[0]
    assert a is b  # second access served from RAM
    np.testing.assert_array_equal(a, ImageFolderDataset(str(tmp_path))[0])
    # cached samples are frozen: in-place mutation by a consumer must not
    # silently corrupt the cache for later epochs
    assert not a.flags.writeable
    with pytest.raises(ValueError):
        a[0, 0] = 0


def test_preprocess_deterministic_per_file_and_parallel(tmp_path):
    """Same seed -> identical patches regardless of worker count (the
    per-file RNG makes output independent of scheduling order)."""
    src, d1, d2 = tmp_path / "src", tmp_path / "d1", tmp_path / "d2"
    src.mkdir()
    _save_random_images(src, n=3, size=(400, 400))
    assert preprocess_images(src, d1, target_size=256, seed=7) == 3
    assert preprocess_images(src, d2, target_size=256, seed=7, workers=3) == 3
    for f1 in sorted(d1.glob("*.png")):
        a = np.asarray(Image.open(f1))
        b = np.asarray(Image.open(d2 / f1.name))
        np.testing.assert_array_equal(a, b)


def test_download_coco_subset_mocked(tmp_path, monkeypatch):
    """data/coco.py with HTTP mocked out: annotation zip fetch + extraction,
    random image subset download, idempotent re-run."""
    import io
    import json as js
    import sys
    import types
    import zipfile as zf

    ann = {"images": [
        {"coco_url": f"http://example.com/img_{i}.jpg",
         "file_name": f"img_{i}.jpg"} for i in range(5)]}
    buf = io.BytesIO()
    with zf.ZipFile(buf, "w") as z:
        z.writestr("annotations/instances_train2017.json", js.dumps(ann))
    zip_bytes = buf.getvalue()

    calls = []

    class FakeResponse:
        def __init__(self, content):
            self.content = content
            self.status_code = 200

        def raise_for_status(self):
            pass

        def iter_content(self, n):
            for i in range(0, len(self.content), n):
                yield self.content[i:i + n]

    def fake_get(url, stream=False, timeout=None):
        calls.append(url)
        return FakeResponse(zip_bytes if url.endswith(".zip") else b"jpegdata")

    fake = types.ModuleType("requests")
    fake.get = fake_get
    monkeypatch.setitem(sys.modules, "requests", fake)

    from neural_image_compression_tpu.data.coco import download_coco_subset

    out = tmp_path / "subset"
    n = download_coco_subset(out_dir=str(out), split="train2017", n_images=3,
                             data_root=str(tmp_path / "data"), seed=0)
    assert n == 3
    assert len(list(out.glob("*.jpg"))) == 3
    # re-run: annotations and images already on disk -> zero new requests
    before = len(calls)
    assert download_coco_subset(out_dir=str(out), split="train2017",
                                n_images=3, data_root=str(tmp_path / "data"),
                                seed=0) == 3
    assert len(calls) == before
