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
        self._stop = threading.Event()
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
                # bounded put with a stop check: if the consumer abandons
                # iteration (exception in the tracking loop), close() lets
                # the worker exit instead of blocking forever holding
                # `depth` uploaded frames alive
                while not self._stop.is_set():
                    try:
                        self._q.put(dev, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            # the sentinel must never be dropped: a full queue here would
            # leave the consumer blocked on get() after draining the frames
            while not self._stop.is_set():
                try:
                    self._q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Stop the worker and release buffered frames (idempotent)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is _END:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()


class FramePrefetcher:
    """Upload + ORB extraction one frame AHEAD of tracking.

    The worker thread calls `tracker.make_frame` on each item, so frame
    N+1's extraction/stereo-matching programs are dispatched while the host
    is still blocked on frame N's tracking-stats fetch — the device works
    through them back-to-back instead of idling a full tunnel round trip
    between frames.  This is the overlap the reference gets from running
    ORB extraction inside the tracking thread while mapping runs elsewhere
    (`src/Tracking.cc` + `dsp_slam.cc:62-77`).

    `source` yields image tuples: (left, right) stereo, (img, depth) rgbd,
    (img,) mono.  Timestamps default to i / fps; pass `timestamps` for
    explicit ones.  JAX jit dispatch is thread-safe; the worker only READS
    tracker config.

    Usage::

        for frame in FramePrefetcher(tracker, seq_iter, sensor="stereo"):
            system.track_frame(frame, detections=...)
    """

    def __init__(self, tracker, source, sensor: str = "stereo",
                 timestamps=None, fps: float = 10.0, depth: int = 2):
        self._tracker = tracker
        self._sensor = sensor
        self._timestamps = timestamps
        self._fps = fps
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._err = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(source),), daemon=True)
        self._thread.start()

    def _make(self, i, item):
        if not isinstance(item, tuple):
            item = (item,)
        ts = self._timestamps[i] if self._timestamps is not None \
            else i / self._fps
        if self._sensor == "stereo":
            return self._tracker.make_frame(item[0], img_right=item[1],
                                            timestamp=ts)
        if self._sensor == "rgbd":
            return self._tracker.make_frame(item[0], depth_map=item[1],
                                            timestamp=ts)
        return self._tracker.make_frame(item[0], timestamp=ts)

    def _worker(self, it):
        try:
            for i, item in enumerate(it):
                frame = self._make(i, item)   # dispatches device programs
                while not self._stop.is_set():
                    try:
                        self._q.put(frame, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:
            self._err = e
        finally:
            # the sentinel must never be dropped: a full queue here would
            # leave the consumer blocked on get() after draining the frames
            while not self._stop.is_set():
                try:
                    self._q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is _END:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()
