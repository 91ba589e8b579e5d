"""Offline dataset preprocessing (capability parity with preprocess.py:1-97).

Pipeline per image: drop over-saturated images (>5% of pixels with channel
spread > threshold, preprocess.py:18-21), drop too-small images, add
U(-0.5/256, 0.5/256) dequantization noise (preprocess.py:12-16), random
bicubic downsample by U(min_factor, 1) + random target_size^2 crop
(preprocess.py:23-33). Pure PIL/numpy — host-side, one-time, no torch.
"""

import argparse
import random
from pathlib import Path

import numpy as np


def add_quantization_noise(img, levels: int = 256, rng=None):
    """PIL Image -> PIL Image with dequantization noise."""
    from PIL import Image

    rng = rng or np.random
    arr = np.asarray(img).astype(np.float32) / 255.0
    noise = rng.uniform(-0.5 / levels, 0.5 / levels, arr.shape)
    arr = np.clip(arr + noise, 0.0, 1.0)
    return Image.fromarray((arr * 255).astype(np.uint8))


def is_saturated(img, threshold: float = 0.95) -> bool:
    arr = np.asarray(img).astype(np.float32) / 255.0
    saturation = arr.max(axis=2) - arr.min(axis=2)
    return (saturation > threshold).mean() > 0.05


def random_downsample_crop(img, target_size: int = 256, min_factor: float = 0.75,
                           rng=None):
    from PIL import Image

    rng = rng or random
    w, h = img.size
    factor = rng.uniform(min_factor, 1.0)
    new_w, new_h = int(w * factor), int(h * factor)
    if new_w < target_size or new_h < target_size:
        return None
    resized = img.resize((new_w, new_h), Image.BICUBIC)
    left = rng.randint(0, new_w - target_size)
    top = rng.randint(0, new_h - target_size)
    return resized.crop((left, top, left + target_size, top + target_size))


def preprocess_images(input_dir, output_dir, target_size: int = 256,
                      min_factor: float = 0.75, saturation_thresh: float = 0.95,
                      seed=None, overwrite: bool = False) -> int:
    """Process all jpg/png in input_dir into output_dir; returns count kept."""
    from PIL import Image, UnidentifiedImageError

    if seed is not None:
        random.seed(seed)
        np.random.seed(seed)

    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    all_images = sorted(list(input_dir.glob("*.jpg")) + list(input_dir.glob("*.png")))
    kept = 0
    for img_path in all_images:
        try:
            img = Image.open(img_path).convert("RGB")
        except (UnidentifiedImageError, OSError):
            print(f"[WARN] Skipping corrupted file: {img_path}")
            continue
        if is_saturated(img, threshold=saturation_thresh):
            continue
        if min(img.size) * min_factor < target_size:
            continue
        img = add_quantization_noise(img)
        cropped = random_downsample_crop(img, target_size=target_size,
                                         min_factor=min_factor)
        if cropped is None:
            continue
        save_path = output_dir / img_path.name
        if save_path.exists() and not overwrite:
            kept += 1
            continue
        cropped.save(save_path)
        kept += 1
    return kept


def main(argv=None):
    parser = argparse.ArgumentParser(description="Preprocess images for dataset.")
    parser.add_argument("--input_dir", type=str, default="./data/coco_val2017")
    parser.add_argument("--output_dir", type=str, default="./data/coco_preprocessed")
    parser.add_argument("--target_size", type=int, default=256)
    parser.add_argument("--min_factor", type=float, default=0.75)
    parser.add_argument("--saturation_thresh", type=float, default=0.95)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)
    n = preprocess_images(args.input_dir, args.output_dir, args.target_size,
                          args.min_factor, args.saturation_thresh, args.seed,
                          args.overwrite)
    print(f"Preprocessed {n} images -> {args.output_dir}")


if __name__ == "__main__":
    main()
