"""Double-buffered host -> HBM input pipeline (SURVEY.md §7 stage 3/8).

The reference decodes one image at a time on a single core; at TPU
throughput the host codec path must not starve the device (SURVEY "hard
parts": codec throughput). This loader decodes on a host thread pool,
letterboxes every image to a common shape, and prefetches the next
device batch while the current one is being consumed.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading

import numpy as np

__all__ = ["BatchLoader", "load_image_batch"]


def _decode_one(path, shape, interpolation):
    from .codecs import load_array
    from .enums import Interpolation
    from .image import Image

    arr = load_array(path)
    img = Image.from_numpy(arr)
    if img._space != "rgb":
        img = img.convert(__import__("zignal_tpu").Rgb)
    if shape is not None and (img.rows, img.cols) != shape:
        img = img.letterbox(shape, interpolation or Interpolation.BILINEAR)
    return np.asarray(img._host())


def load_image_batch(paths, shape=None, interpolation=None, workers=8):
    """Decode `paths` in parallel -> one device array [B, H, W, 3] u8."""
    import jax

    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        arrays = list(pool.map(lambda p: _decode_one(p, shape, interpolation),
                               paths))
    return jax.device_put(np.stack(arrays))


class BatchLoader:
    """Iterator of device batches with one-batch prefetch overlap.

    >>> for batch in BatchLoader(paths, batch_size=16, shape=(512, 512)):
    ...     out = pipeline(batch)   # decode of the next batch overlaps
    """

    def __init__(self, paths, batch_size=16, shape=None, interpolation=None,
                 workers=8, drop_remainder=False):
        self.paths = list(paths)
        self.batch_size = int(batch_size)
        self.shape = shape
        self.interpolation = interpolation
        self.workers = workers
        self.drop_remainder = drop_remainder

    def __len__(self):
        n = len(self.paths) // self.batch_size
        if not self.drop_remainder and len(self.paths) % self.batch_size:
            n += 1
        return n

    def _batches(self):
        for i in range(0, len(self.paths), self.batch_size):
            chunk = self.paths[i:i + self.batch_size]
            if self.drop_remainder and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        error = []

        def producer():
            try:
                for chunk in self._batches():
                    q.put(load_image_batch(chunk, self.shape,
                                           self.interpolation, self.workers))
            except Exception as e:  # propagate to the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
