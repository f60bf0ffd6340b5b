"""ImageFolder-style dataset + threaded batch loader.

Capability parity with the reference eval pipeline
(``torchvision.datasets.ImageFolder`` + ``DataLoader`` in
examples/imagenet_eval.py:118-127): class-per-subdirectory layout, a
transform per sample, and a threaded prefetching loader that emits stacked
numpy batches ready for device transfer. Decode/preprocess runs on host
threads so the TPU stays busy (the fused device-side pipeline in
``transforms.fused`` moves normalize/crop on-device).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = ('.jpg', '.jpeg', '.png', '.ppm', '.bmp', '.webp')


class ImageFolder:
    """class-per-subdir image dataset; items are (transformed_img, label)."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        self.classes = sorted(d.name for d in os.scandir(root) if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for dirpath, _, files in sorted(os.walk(cdir)):
                for fname in sorted(files):
                    if fname.lower().endswith(IMG_EXTENSIONS):
                        self.samples.append((os.path.join(dirpath, fname),
                                             self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, label = self.samples[idx]
        with open(path, 'rb') as f:
            img = Image.open(f).convert('RGB')
        if self.transform is not None:
            img = self.transform(img)
        return img, label


def batch_iterator(dataset, batch_size: int, shuffle: bool = False,
                   num_workers: int = 8, drop_last: bool = False,
                   seed: int = 0, prefetch: int = 2
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Threaded loader yielding (stacked images, labels) numpy batches."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    batches = [order[i:i + batch_size]
               for i in range(0, len(order), batch_size)]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()

    def load_batch(idxs):
        with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as ex:
            items = list(ex.map(dataset.__getitem__, idxs))
        imgs = np.stack([np.asarray(x) for x, _ in items])
        labels = np.asarray([y for _, y in items], np.int64)
        return imgs, labels

    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = object()

    def producer():
        for idxs in batches:
            q.put(load_batch(idxs))
        q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
