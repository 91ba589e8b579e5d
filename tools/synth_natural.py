"""Procedural 'natural-ish' corpus: structured, noise-light images.

The original synthetic corpus (tools/train_at_scale.py make_synthetic_dataset)
mixes 5% white noise into every pixel, which (a) caps PSNR near 26 dB at
any rate (the model cannot denoise below the noise floor under an MSE
objective) and (b) swamps the context models' rate advantage with
incompressible bits. This generator builds images from compressible
structure instead — 1/f value-noise octaves, soft-edged shapes, directional
gratings, global gradients — plus only dequantization-scale noise, so
rate-distortion curves behave like natural-photo curves: PSNR rises with
rate, and context models beat context-free ones.

Deterministic per index; reusable by any tool via make_natural_dataset().
"""

import os

import numpy as np


def _upsample(arr: np.ndarray, h: int, w: int, resample) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray((np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8))
    return np.asarray(img.resize((w, h), resample), np.float32) / 255.0


def synth_natural(h: int, w: int, key: int) -> np.ndarray:
    """One (h, w, 3) uint8 image of layered compressible structure."""
    from PIL import Image

    r = np.random.RandomState(np.uint32(0x9E3779B9 ^ key))

    # 1/f value noise: octaves at 4..64 cells with amplitude ~ 1/scale
    acc = np.zeros((h, w, 3), np.float32)
    amp_total = 0.0
    for cells, amp in ((4, 1.0), (8, 0.55), (16, 0.3), (32, 0.16),
                       (64, 0.08)):
        grid = r.rand(max(2, h * cells // max(h, w)) + 2,
                      max(2, w * cells // max(h, w)) + 2, 3)
        acc += amp * _upsample(grid, h, w, Image.BICUBIC)
        amp_total += amp
    img = acc / amp_total

    # global illumination gradient (random direction / strength)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gdir = r.rand() * 2 * np.pi
    g = (np.cos(gdir) * xx / w + np.sin(gdir) * yy / h)
    g = (g - g.min()) / max(g.max() - g.min(), 1e-6)
    img = img * (0.75 + 0.5 * g[..., None] * r.rand(3))

    # soft-edged elliptical shapes: sharp-but-antialiased boundaries
    for _ in range(r.randint(3, 9)):
        cy, cx = r.rand() * h, r.rand() * w
        ry, rx = (0.05 + 0.2 * r.rand()) * h, (0.05 + 0.2 * r.rand()) * w
        theta = r.rand() * np.pi
        dy, dx = (yy - cy), (xx - cx)
        u = (np.cos(theta) * dx + np.sin(theta) * dy) / rx
        v = (-np.sin(theta) * dx + np.cos(theta) * dy) / ry
        dist = u * u + v * v
        mask = np.clip((1.2 - dist) / 0.2, 0.0, 1.0)[..., None]
        color = r.rand(3).astype(np.float32)
        alpha = 0.35 + 0.45 * r.rand()
        img = img * (1 - alpha * mask) + color * alpha * mask

    # one or two directional gratings (texture) in random soft windows
    for _ in range(r.randint(1, 3)):
        freq = 2 * np.pi * (2 + 10 * r.rand()) / min(h, w)
        ang = r.rand() * np.pi
        phase = r.rand() * 2 * np.pi
        wave = 0.5 + 0.5 * np.sin(
            freq * (np.cos(ang) * xx + np.sin(ang) * yy) + phase)
        cy, cx = r.rand() * h, r.rand() * w
        rr = (0.15 + 0.25 * r.rand()) * min(h, w)
        win = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rr * rr)))
        depth = 0.15 + 0.2 * r.rand()
        img = img * (1 - depth * win[..., None]) \
            + depth * win[..., None] * wave[..., None]

    # dequantization-scale noise only (matches data/preprocess.py semantics)
    img = img + (r.rand(h, w, 3).astype(np.float32) - 0.5) / 256.0
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def make_natural_dataset(root: str, n_train: int = 2048, n_val: int = 24):
    """Build (train 256^2 patches, val 768x512) folders; idempotent.

    n_train default raised 160 -> 2048 (round-5): at 30k steps x batch 16
    the old 160-patch corpus was ~3,000 epochs of memorization, a regime
    where a static factorized prior could out-fit the conditional families
    on val (inverting the literature ordering). 2048 unique patches is
    ~230 epochs at the same schedule. Images are deterministic per index,
    so growing n_train extends the corpus without changing existing files
    (per-file skip below).
    """
    from PIL import Image

    tr = os.path.join(root, "train")
    va = os.path.join(root, "val")
    os.makedirs(tr, exist_ok=True)
    os.makedirs(va, exist_ok=True)
    for i in range(n_train):
        p = os.path.join(tr, f"p{i:04d}.png")
        if not os.path.exists(p):
            Image.fromarray(synth_natural(256, 256, i)).save(p)
    for i in range(n_val):
        p = os.path.join(va, f"v{i}.png")
        if not os.path.exists(p):
            Image.fromarray(synth_natural(512, 768, 50_000 + i)).save(p)
    return tr, va


if __name__ == "__main__":
    import io

    tr, va = make_natural_dataset("/tmp/nic_natural/data")
    # compressibility probe: PNG bytes/pixel (noise ~4+, photos ~1-3)
    from PIL import Image

    for d in (tr, va):
        names = sorted(os.listdir(d))[:3]
        for n in names:
            p = os.path.join(d, n)
            im = Image.open(p)
            buf = io.BytesIO()
            im.save(buf, "PNG", optimize=True)
            px = im.size[0] * im.size[1]
            print(f"{d}/{n}: {len(buf.getvalue()) / px:.2f} PNG bytes/px")
