"""Image datasets + batch loaders, NHWC float32 in [0, 1].

Capability parity with Dataloader.py:11-43 (PreprocessedDataset / KodakDataset
+ torch DataLoader usage) — TPU-first: images decode on host into pinned
numpy batches (NHWC, the TPU layout), with a background-thread prefetcher so
host decode overlaps device compute (the torch DataLoader-worker analogue
without forking).
"""

import glob
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


def load_image(path: str, dtype=np.float32) -> np.ndarray:
    """Decode one image file -> (H, W, 3); float32 in [0,1] (default) or raw
    uint8 (dtype=np.uint8 — 4x less host->device traffic; the jitted train
    step normalizes on device)."""
    from PIL import Image

    with Image.open(path) as img:
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
    if dtype == np.uint8:
        return arr
    return arr.astype(np.float32) / 255.0


class ImageFolderDataset:
    """Folder of jpg/jpeg/png images (Dataloader.py:11-27 analogue).

    cache=True keeps decoded arrays in RAM after first use — for patch-sized
    training sets the working set is tiny (1k 256-square uint8 patches are
    ~200 MB) while repeated PIL decodes can bottleneck a step-based trainer
    that cycles the dataset many times (Trainer.py:133-138 semantics)."""

    EXTS = ("*.jpg", "*.jpeg", "*.png")

    def __init__(self, root_dir: str, dtype=np.float32, cache: bool = False):
        images = []
        for ext in self.EXTS:
            images.extend(glob.glob(os.path.join(root_dir, ext)))
        self.images = sorted(images)
        self.dtype = dtype
        self._cache = {} if cache else None

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None:
            arr = self._cache.get(idx)
            if arr is None:
                arr = load_image(self.images[idx], self.dtype)
                # cached samples are returned by reference; freeze them so an
                # in-place mutation (e.g. future augmentation) can't silently
                # corrupt the cache for every later epoch
                arr.setflags(write=False)
                self._cache[idx] = arr
            return arr
        return load_image(self.images[idx], self.dtype)


# The reference names this PreprocessedDataset (Dataloader.py:11).
PreprocessedDataset = ImageFolderDataset


class KodakDataset(ImageFolderDataset):
    """Kodak eval set: 24 768x512 PNGs (Dataloader.py:31-43 analogue)."""

    EXTS = ("*.png",)


class BatchLoader:
    """Batches a dataset into NHWC arrays.

    One pass per __iter__ (the Trainer cycles it, matching the reference's
    infinite-iterator semantics, Trainer.py:133-138). All images in a batch
    must share a shape (true for preprocessed patches and for Kodak).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_remainder: bool = True, seed: int = 0,
                 prefetch: int = 2, pad_multiple: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.pad_multiple = pad_multiple
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> Sequence[int]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batch(self, idxs) -> np.ndarray:
        imgs = [self.dataset[int(i)] for i in idxs]
        batch = np.stack(imgs, axis=0)
        if self.pad_multiple:
            batch = pad_to_multiple(batch, self.pad_multiple)
        return batch

    def _batch_indices(self):
        idx = self._indices()
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        for s in range(0, stop, self.batch_size):
            yield idx[s:s + self.batch_size]

    def __iter__(self) -> Iterator[np.ndarray]:
        if self.prefetch <= 0:
            for b in self._batch_indices():
                yield self._make_batch(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()  # consumer gone (GeneratorExit / break)

        def producer():
            try:
                for b in self._batch_indices():
                    batch = self._make_batch(b)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer, not the
                error.append(e)         # thread's excepthook — a swallowed
            finally:                    # decode error would silently truncate
                while not stop.is_set():  # every epoch at the failing batch
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            # an abandoned iterator (e.g. Trainer stops at max_steps mid-
            # epoch) must not leave the producer blocked on a full queue
            # forever, leaking the thread + prefetched batches
            stop.set()


def pad_to_multiple(batch: np.ndarray, multiple: int) -> np.ndarray:
    """Replicate-pad H and W up to the next multiple (for the x64 total
    downsampling constraint of the hyperprior models)."""
    _, h, w, _ = batch.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return batch
    return np.pad(batch, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")


def center_crop(batch: np.ndarray, h: int, w: int) -> np.ndarray:
    return batch[:, :h, :w, :]


def shard_for_process(items, process_index=None, process_count=None):
    """Deterministic per-process shard of a sequence (file list, dataset) for
    multi-host training: strided split items[i::p] so every process sees the
    same per-shard size (within 1) and ordering statistics. Pair with
    Trainer._shard_batch, which assembles the global batch from these
    per-process shards via jax.make_array_from_process_local_data."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for {pc} processes")
    if isinstance(items, (list, tuple, np.ndarray)):
        return items[pi::pc]
    return _Subset(items, range(pi, len(items), pc))  # lazy dataset view


class _Subset:
    """Lazy index view over a dataset (datasets don't support slicing, and
    eager indexing would decode every image up front)."""

    def __init__(self, dataset, indices):
        self._dataset = dataset
        self._indices = list(indices)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._dataset[self._indices[i]]
