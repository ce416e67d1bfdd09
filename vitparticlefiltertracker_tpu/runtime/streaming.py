"""Streaming decode→track pipeline (component B12).

BASELINE.json:12: "streaming 4K@60fps, ViT-L, 16k particles, fused
decode->track pipeline". Host-side decode runs in a producer thread feeding
a bounded queue; frames are shipped to the device asynchronously
(`jax.device_put` returns before the copy completes) so H2D transfer of
frame t+1 overlaps the device step of frame t — double buffering without
any manual buffer management, courtesy of JAX's async dispatch.

The consumer never blocks on device results mid-stream: step outputs are
device arrays whose readback is deferred to a small trailing window,
keeping the device queue full (SURVEY.md §1.2 "double-buffered H2D").
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np


class FramePump:
    """Producer thread: decode/generate frames into a bounded queue.

    The queue bound provides backpressure so a fast decoder can't overrun
    host memory; `depth` ~ 2-4 is enough to hide decode jitter (classic
    double/triple buffering).

    The pump is its own (thread-safe) iterator: `__next__` is a single
    atomic `queue.get`, so multiple consumer threads may drain one pump
    concurrently and partition the stream exactly. (A plain generator here
    would raise "generator already executing" under concurrent `next()` —
    round-1 ADVICE finding.) The end-of-stream sentinel is re-enqueued on
    observation so every consumer, not just the first, sees StopIteration.
    """

    _SENTINEL = object()

    def __init__(self, source: Iterable[np.ndarray], depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._run, args=(source,), daemon=True)
        self._err: BaseException | None = None
        self._err_raised = False
        self._err_lock = threading.Lock()
        self._thread.start()

    def _run(self, source) -> None:
        try:
            for frame in source:
                self._q.put(frame)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        item = self._q.get()
        if item is self._SENTINEL:
            # Put the sentinel back so every other concurrent consumer also
            # terminates (the queue has room: producer is done).
            self._q.put(self._SENTINEL)
            if self._err is not None:
                with self._err_lock:
                    if not self._err_raised:  # raise once, not per consumer
                        self._err_raised = True
                        raise self._err
            raise StopIteration
        return item


def stream_track(
    tracker,
    source: Iterable[np.ndarray],
    init_bbox,
    on_record: Callable[[dict[str, Any]], None] | None = None,
    readback_window: int = 4,
    pump_depth: int = 3,
) -> dict[str, Any]:
    """Run the fused decode→track pipeline over a source.

    tracker: Tracker or MultiTracker (duck-typed: init / step_device).
    Returns summary stats (fps, frames, per-stage breakdown). Per-frame
    records stream to on_record with `readback_window` frames of latency —
    the device is never drained mid-stream.

    Stage accounting (all measured in THIS run, not stitched):
      * ingest_wait_s — time the consumer blocked on the decode pump
        (decode-bound time; ~0 when the producer keeps up)
      * submit_s      — host time in device_put + step dispatch (async: this
        is submission cost, not device compute)
      * readback_s    — time draining trailing result windows
    The end-to-end fps is the pipeline's sustained rate with every stage
    live; `drain_s` is the final flush of in-flight work (device compute
    and transfers that overlapped the loop).
    """
    pump = FramePump(source, depth=pump_depth)
    it = iter(pump)
    frame0 = next(it)
    tracker.init(frame0, init_bbox)

    pending: list[tuple[int, Any]] = []
    n = 0
    ingest_wait = submit = readback = 0.0
    t0 = time.perf_counter()
    while True:
        t = time.perf_counter()
        frame = next(it, None)
        ingest_wait += time.perf_counter() - t
        if frame is None:
            break
        t = time.perf_counter()
        dev = jax.device_put(frame)  # async H2D; overlaps previous step
        out = tracker.step_device(dev)
        submit += time.perf_counter() - t
        n += 1
        pending.append((n, out))
        if len(pending) > readback_window:
            idx, old = pending.pop(0)
            t = time.perf_counter()
            _emit(idx, old, on_record)
            readback += time.perf_counter() - t
    t = time.perf_counter()
    for idx, out in pending:
        _emit(idx, out, on_record)
    # Force full completion with a real readback (block_until_ready is
    # unreliable on this rig's tunneled platform — see runtime/benchmark.py).
    state = getattr(tracker, "state")
    np.asarray(jax.tree_util.tree_leaves(state)[0])
    drain = time.perf_counter() - t
    wall = time.perf_counter() - t0
    return {
        "frames": n,
        "wall_s": wall,
        "fps": n / wall if wall > 0 else 0.0,
        "ingest_wait_s": round(ingest_wait, 3),
        "submit_s": round(submit, 3),
        "readback_s": round(readback, 3),
        "drain_s": round(drain, 3),
    }


def _emit(idx: int, out, on_record) -> None:
    if on_record is None:
        return
    rec = {
        "frame": idx,
        "position": np.asarray(out.position).tolist(),
        "box": np.asarray(out.box).tolist(),
        "conf": np.asarray(out.conf).tolist(),
        "ess": np.asarray(out.ess).tolist(),
        "lost": np.asarray(out.lost).tolist(),
    }
    on_record(rec)
