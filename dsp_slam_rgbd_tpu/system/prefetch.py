"""Async host→device image prefetcher — the TPU-native data-loader stage.

The reference reads and converts images on the tracking thread
(`dsp_slam.cc:62-77` loads the stereo pair right before `TrackStereo`).
On a remote TPU the host→device transfer itself is the cost (~37 MB/s
through the tunnel: a KITTI uint8 stereo pair ≈ 50 ms, f32 ≈ 125 ms), so
a background thread uploads the NEXT frame while the device computes the
current one — the transfer rides under the frame's compute instead of
serializing with it.  This is the device-side sibling of the native
double-buffered file prefetcher (`native/src/runtime.cc`).

Usage::

    for dev_tuple in ImagePrefetcher(host_frame_iter, depth=2):
        system.track_stereo(*dev_tuple)

Items are tuples; numpy arrays upload via `jnp.asarray` (uint8 stays
uint8 in flight — `Tracker._upload_image` casts on device); non-array
elements pass through unchanged.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

_END = object()


class ImagePrefetcher:
    def __init__(self, source, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._thread = threading.Thread(
            target=self._worker, args=(iter(source),), daemon=True)
        self._err = None
        self._thread.start()

    def _worker(self, it):
        import jax.numpy as jnp

        try:
            for item in it:
                if not isinstance(item, tuple):
                    item = (item,)
                dev = tuple(
                    jnp.asarray(x) if isinstance(x, np.ndarray) else x
                    for x in item
                )
                self._q.put(dev)
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            self._q.put(_END)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _END:
                if self._err is not None:
                    raise self._err
                return
            yield item
