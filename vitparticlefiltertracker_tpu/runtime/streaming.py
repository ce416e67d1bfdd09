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
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.ops.image import FrameView, StreamFrame


class OutputPacker:
    """Pack a TrackOutput pytree into ONE flat f32 device array per frame.

    On this rig the device sits behind a relay with ~30-60 ms RTT per
    readback; fetching a record's 7 fields as 7 separate D2H transfers cost
    ~370 ms/frame (measured, round 3) and capped the ROI streaming pipeline
    at ~2.6 fps regardless of device speed. One packed array per frame +
    chunked stacking makes the whole readback path one RTT per CHUNK of
    frames.
    """

    def __init__(self, out_example):
        leaves, self._treedef = jax.tree_util.tree_flatten(out_example)
        self._shapes = [tuple(x.shape) for x in leaves]
        self._sizes = [int(np.prod(s)) if s else 1 for s in self._shapes]
        self._pack = jax.jit(
            lambda o: jnp.concatenate(
                [
                    jnp.ravel(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(o)
                ]
            )
        )

    def pack(self, out) -> jax.Array:
        return self._pack(out)

    def unpack(self, row: np.ndarray):
        arrs, off = [], 0
        for shape, size in zip(self._shapes, self._sizes):
            arrs.append(np.asarray(row[off : off + size]).reshape(shape))
            off += size
        return jax.tree_util.tree_unflatten(self._treedef, arrs)


class RoiShipper:
    """Host-side ROI extraction for the streaming pipeline (component B12).

    The device step only ever *samples* a search window of a few hundred px
    around the target, yet the naive pipeline ships the entire frame every
    frame — 24.9 MB at 4K, which is what capped the measured eval-5 e2e at
    0.66 fps on this rig's relay (round-2 VERDICT missing #1). This shipper
    crops a static-size ROI around the PREDICTED target center (last
    read-back position advanced by its velocity — records trail the stream
    by the readback window) and ships only that, plus a decimated whole
    frame every `glob_every` frames for global re-detection. The decimated
    view is re-used from device memory in between, so steady-state H2D is
    roi² + glob/glob_every bytes: ~0.5 MB/frame at 4K instead of 24.9.

    Fidelity: the device step is numerically identical to the full-frame
    step whenever the search window lies inside the ROI (ops/image.py
    FrameView); if the target escapes the ROI the confidence collapses, the
    lost gate fires, and global re-detection on the decimated view re-seeds
    — the same recovery path as a full occlusion.
    """

    def __init__(
        self,
        frame_hw: tuple[int, int],
        roi_px: int,
        init_center,
        roi_stride: int = 1,
        glob_stride: int = 8,
        glob_every: int = 4,
        roi_out: int = 0,
    ):
        h, w = int(frame_hw[0]), int(frame_hw[1])
        s = max(1, int(roi_stride))
        # roi_out > 0: resampled-view mode (native sources only) — the ROI
        # span ships as a roi_out² bilinear view at FRACTIONAL stride
        # span/roi_out, i.e. exactly the grid the device window-resample
        # reads. H2D becomes resolution-independent: ~3*roi_out² bytes at 4K
        # as at 480p, vs the strided-slice mode's (span/stride)².
        self._out = int(roi_out)
        if self._out > 0:
            span = min(int(roi_px), h, w)
            self._sv = span / self._out  # fractional view stride (static)
        else:
            # Static ROI span (frame px), clamped to the frame and rounded
            # to a stride multiple so the strided slice has a static shape.
            span = min(int(roi_px), h, w) // s * s
        if span <= 0:
            raise ValueError(f"stream ROI {roi_px}px too small for stride {s}")
        self._h, self._w = h, w
        self._span, self._s = span, s
        self._gs = max(1, int(glob_stride))
        self._glob_every = max(1, int(glob_every))
        self._glob_dev = None
        self._zero2 = jax.device_put(np.zeros(2, np.float32))
        self._last_pos = np.asarray(init_center, np.float32)
        self._last_vel = np.zeros(2, np.float32)
        self._last_idx = 0
        self._last_lost = False
        self._idx = 0
        # Two steer workers call observe() concurrently with main-thread
        # prediction reads: snapshot/update the (pos, vel, idx) triple under
        # a lock so an older record can never interleave-overwrite a newer
        # one and predictions never mix fields from two records.
        self._obs_lock = threading.Lock()

    def _predict(self, idx: int) -> np.ndarray:
        """Dead-reckoned target center at frame `idx` from the newest
        steered observation (consistent snapshot)."""
        with self._obs_lock:
            pos, vel, last = self._last_pos, self._last_vel, self._last_idx
        return pos + vel * max(0, idx - last)

    @property
    def shipped_bytes_per_frame(self) -> float:
        """Steady-state H2D payload per frame (bytes), for benchmarks."""
        roi = (self._out if self._out else self._span // self._s) ** 2 * 3
        gh, gw = -(-self._h // self._gs), -(-self._w // self._gs)
        return roi + gh * gw * 3 / self._glob_every

    def ship(self, frame: np.ndarray, idx: int | None = None) -> StreamFrame:
        """Ship one frame's ROI. `idx` is the RECORD frame index (what
        observe() will later see for this frame); without it an internal
        counter is used — callers that number records should pass it, or
        dead reckoning runs one frame short."""
        if idx is None:
            idx = self._idx
        self._idx = idx + 1
        pred = self._predict(idx)
        span, s = self._span, self._s
        ox = int(np.clip(round(pred[0] - span / 2), 0, self._w - span))
        oy = int(np.clip(round(pred[1] - span / 2), 0, self._h - span))
        roi = np.ascontiguousarray(frame[oy : oy + span : s, ox : ox + span : s])
        if self._glob_dev is None or idx % self._glob_every == 0:
            gs = self._gs
            self._glob_dev = jax.device_put(
                np.ascontiguousarray(frame[::gs, ::gs])
            )
        return StreamFrame(
            track=FrameView(
                pixels=jax.device_put(roi),
                origin=jax.device_put(np.asarray([ox, oy], np.float32)),
                stride=float(s),
            ),
            glob=FrameView(
                pixels=self._glob_dev, origin=self._zero2, stride=float(self._gs)
            ),
        )

    def ship_native(self, reader, frame_idx: int) -> StreamFrame:
        """ROI ingest straight from a native source (io/native.py
        read_rect): the ingestion runtime composites/gathers only the search
        window, so the full frame NEVER reaches Python — at 4K this is the
        difference between touching ~0.3 MB and 24.9 MB per frame on the
        one-core host."""
        self._idx = frame_idx  # keep glob cadence aligned with real indices
        pred = self._predict(frame_idx)
        span, s = self._span, self._s
        ox = int(np.clip(round(pred[0] - span / 2), 0, self._w - span))
        oy = int(np.clip(round(pred[1] - span / 2), 0, self._h - span))
        if self._out:
            # Resampled-view mode: sample centers inset half a stride so the
            # out² grid covers exactly [o, o + span] per axis.
            sv = self._sv
            vx, vy = ox + 0.5 * sv, oy + 0.5 * sv
            roi = reader.read_view(frame_idx, vx, vy, sv, self._out)
            track = FrameView(
                pixels=jax.device_put(roi),
                origin=jax.device_put(np.asarray([vx, vy], np.float32)),
                stride=sv,
            )
        else:
            roi = reader.read_rect(frame_idx, ox, oy, span, span, s)
            track = FrameView(
                pixels=jax.device_put(roi),
                origin=jax.device_put(np.asarray([ox, oy], np.float32)),
                stride=float(s),
            )
        if self._glob_dev is None or frame_idx % self._glob_every == 0:
            self._glob_dev = jax.device_put(
                reader.read_rect(frame_idx, 0, 0, self._w, self._h, self._gs)
            )
        return StreamFrame(
            track=track,
            glob=FrameView(
                pixels=self._glob_dev, origin=self._zero2, stride=float(self._gs)
            ),
        )

    def _chunk_views(self, idxs, read_one) -> StreamFrame:
        """Stack C ROI reads into ONE StreamFrame with leading-C pixels and
        origins — one H2D for the crops, one for the origins, one dispatch
        (Tracker.step_chunk_device). All C centers extrapolate from the same
        last observation (predictions for idx..idx+C-1), which is exactly
        what the per-frame path does between steering updates."""
        pxs, orgs = [], []
        span, s = self._span, self._s
        for idx in idxs:
            pred = self._predict(idx)
            ox = int(np.clip(round(pred[0] - span / 2), 0, self._w - span))
            oy = int(np.clip(round(pred[1] - span / 2), 0, self._h - span))
            px, org, sv = read_one(idx, ox, oy)
            pxs.append(px)
            orgs.append(org)
        track = FrameView(
            pixels=jax.device_put(np.stack(pxs)),
            origin=jax.device_put(np.stack(orgs).astype(np.float32)),
            stride=sv,
        )
        return StreamFrame(
            track=track,
            glob=FrameView(
                pixels=self._glob_dev, origin=self._zero2, stride=float(self._gs)
            ),
        )

    def ship_native_chunk(self, reader, idxs) -> StreamFrame:
        """Chunked ship_native: C native ROI reads, one stacked H2D."""
        self._idx = idxs[-1]
        if self._glob_dev is None or any(
            i % self._glob_every == 0 for i in idxs
        ):
            self._glob_dev = jax.device_put(
                reader.read_rect(idxs[0], 0, 0, self._w, self._h, self._gs)
            )

        def read_one(idx, ox, oy):
            if self._out:
                sv = self._sv
                vx, vy = ox + 0.5 * sv, oy + 0.5 * sv
                return (
                    reader.read_view(idx, vx, vy, sv, self._out),
                    np.asarray([vx, vy], np.float32),
                    sv,
                )
            px = reader.read_rect(idx, ox, oy, self._span, self._span, self._s)
            return px, np.asarray([ox, oy], np.float32), float(self._s)

        return self._chunk_views(idxs, read_one)

    def ship_chunk(self, frames, idxs) -> StreamFrame:
        """Chunked ship() for numpy-frame sources: C host crops, one H2D."""
        self._idx = idxs[-1]
        if self._glob_dev is None or any(
            i % self._glob_every == 0 for i in idxs
        ):
            gs = self._gs
            self._glob_dev = jax.device_put(
                np.ascontiguousarray(frames[-1][::gs, ::gs])
            )
        frame_of = dict(zip(idxs, frames))

        def read_one(idx, ox, oy):
            f = frame_of[idx]
            px = np.ascontiguousarray(
                f[oy : oy + self._span : self._s, ox : ox + self._span : self._s]
            )
            return px, np.asarray([ox, oy], np.float32), float(self._s)

        return self._chunk_views(idxs, read_one)

    def observe(self, rec: dict) -> None:
        """Feed a read-back record (trails the stream) to steer the ROI.
        Out-of-order records (concurrent steer fetchers) are ignored —
        only the newest estimate steers. Check-and-set is atomic under
        _obs_lock: without it a stale record racing a newer one could
        pass the staleness check and then overwrite the newer fields."""
        with self._obs_lock:
            if int(rec["frame"]) < self._last_idx:
                return
            self._last_pos = np.asarray(rec["position"], np.float32)
            self._last_vel = np.asarray(
                rec.get("velocity", (0.0, 0.0)), np.float32
            )
            self._last_idx = int(rec["frame"])
            if "lost" in rec:
                self._last_lost = bool(rec["lost"])

    @property
    def observed_idx(self) -> int:
        """Newest frame index whose estimate has steered the ROI."""
        return self._last_idx

    @property
    def lost_seen(self) -> bool:
        """True while the newest steered record reports the tracker lost —
        the stream loop's signal to tighten the submit-ahead cap so a
        re-detection jump re-aims the shipped crop within ~one chunk
        (runtime.stream_lost_throttle)."""
        return self._last_lost


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
    roi_px: int = 0,
    roi_stride: int = 1,
    glob_stride: int = 8,
    glob_every: int = 4,
    roi_out: int = 0,
    steer_lag: int = 16,
    chunk: int = 1,
    steer_workers: int = 2,
    chunk_max: int = 0,
    fps_target: float = 60.0,
    lost_throttle: bool = True,
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

    chunk > 1 (requires roi_px > 0): track `chunk` frames per device
    dispatch (Tracker.step_chunk_device) — C crops stack into one H2D and
    one jitted scan, amortizing the per-dispatch submission cost that binds
    this pipeline when the device step is fast (measured round 3: ~11 ms
    host time per dispatch over this rig's relay capped eval5-roi at
    44 fps). Steering granularity becomes C frames; ROI prediction already
    extrapolates per frame, so the crops stay centered as long as
    steer_lag-frame dead reckoning holds — same trade as chunk=1.

    chunk_max > chunk: ADAPTIVE dispatch sizing — when the rolling pipeline
    rate falls below fps_target, the dispatch size doubles (chunk, 2*chunk,
    ... up to chunk_max) to halve the per-dispatch overhead that congestion
    inflates, and steps back down once the rate clears the target with
    margin. Any split of the frame stream into chunks yields the same
    trajectory (the chunked scan == sequential steps; tests assert), so
    switching is semantically free. Pending record windows flush on a
    switch so each drained window stays shape-homogeneous.

    lost_throttle: while the newest steered record reports LOST, the
    submit-ahead cap tightens from steer_lag to one chunk, so a global
    re-detection's jump re-aims the shipped ROI within ~a chunk instead of
    a steer-lag of misaimed frames (runtime.stream_lost_throttle).
    """
    # Native ROI fast path: when the source is the native ingestion runtime
    # (io/native.py) AND ROI shipping is on, frames are never materialized —
    # each step reads exactly the search window (+ periodic decimated view)
    # via vpt_read_rect. The prefetch ring is pointless there (ingest is
    # ~rect bytes); only the init frame is read in full.
    native_roi = roi_px > 0 and hasattr(source, "read_rect")
    if native_roi:
        frame0 = source.read(0)
        it = iter(range(1, len(source)))
    else:
        pump = FramePump(source, depth=pump_depth)
        it = iter(pump)
        frame0 = next(it)
    tracker.init(frame0, init_bbox)
    shipper = None
    if roi_px > 0:
        bbox = np.asarray(init_bbox, np.float32)
        if bbox.ndim != 1:
            raise ValueError("ROI streaming supports a single tracker/stream")
        if roi_out > 0 and not native_roi:
            raise ValueError(
                "roi_out (resampled-view ROI) requires a native source "
                "(io/native.py read_view)"
            )
        shipper = RoiShipper(
            frame0.shape[:2],
            roi_px,
            bbox[:2] + bbox[2:] / 2.0,
            roi_stride=roi_stride,
            glob_stride=glob_stride,
            glob_every=glob_every,
            roi_out=roi_out,
        )

    # Record entries are (frame_idx, packed_row, dispatch_size): the size
    # keys the OutputPacker layout — adaptive sizing means rows of several
    # shapes coexist in flight.
    pending: list[tuple[int, Any, int]] = []
    packers: dict[int, OutputPacker] = {}
    want_records = on_record is not None or shipper is not None
    # Fused step+pack entry points (optional — banked trackers may not have
    # them; pack_track_output's layout == OutputPacker's, tests assert).
    step_packed = getattr(tracker, "step_packed", None)
    chunk_packed = getattr(tracker, "step_chunk_packed", None)

    # Two independent readback paths, neither on the submit thread:
    #
    # * STEERING (shipper set): a dedicated thread fetches the NEWEST packed
    #   record (one tiny D2H, ~RTT) in a loop and feeds shipper.observe —
    #   ROI steering lag is then ~the device pipeline depth, independent of
    #   how records are batched. Tying steering to the record windows forced
    #   a trade-off between drain amortization (big windows) and steering
    #   lag (small ones): window 8 throttled the pipeline to the drain
    #   cadence, window 24*3 let the crop drift off the target (RMSE 90 px).
    # * RECORDS (on_record set): a drainer thread reads whole windows in one
    #   packed D2H per window. Queue depth 2: records tolerate lag; the
    #   bound only caps memory.
    drain_q: queue.Queue = queue.Queue(maxsize=2)
    drain_err: list[BaseException] = []
    hist: list[tuple[int, Any, int]] = []  # recent packed records (main appends)
    steer_stop = False

    def steer_margin(size: int) -> int:
        # Margin is in HIST ENTRIES (one per dispatch = `size` frames): aim
        # the fetch ~steer_lag/2 frames behind the newest submission, and
        # keep at least one claimable entry per steer worker so none of
        # them starve.
        return max(1, steer_workers, steer_lag // (2 * max(1, size)))

    def _drain_worker() -> None:
        # Runs until the None sentinel EVEN after an error: a dead consumer
        # with windows still queued (maxsize 2) would deadlock the producer's
        # drain_q.put / put(None) — so on error, keep consuming and discard.
        while True:
            item = drain_q.get()
            if item is None:
                return
            if drain_err:
                continue
            try:
                _drain(item, packers, on_record)
            except BaseException as e:  # surfaced after the loop
                drain_err.append(e)

    steer_lock = threading.Lock()
    steer_claimed = [0]

    def _steer_worker() -> None:
        # Fetch a record a few frames BEHIND the newest submission: it has
        # (nearly) completed, so the D2H costs ~one RTT instead of waiting
        # out the whole in-flight backlog (fetching the head measured
        # ~700 ms/fetch and throttled the pipeline to steer_lag per fetch).
        # TWO workers pipeline that RTT (the relay inflates it to ~200 ms
        # under H2D load); the claim counter keeps them on distinct frames
        # and observe() drops out-of-order arrivals.
        while not steer_stop:
            # Oldest UNCLAIMED entry in the margin window. (Taking only
            # recent[0] deadlocked: when the main loop blocks on the
            # steer-lag flow control, hist freezes, and if recent[0] was
            # already claimed no worker ever fetched anything — the two
            # sides waited on each other forever.)
            recent = hist[-(steer_margin(hist[-1][2] if hist else chunk) + 1) :]
            item = None
            with steer_lock:
                for e in recent:
                    if e[0] > steer_claimed[0]:
                        item = e
                        steer_claimed[0] = e[0]
                        break
            if item is None:
                time.sleep(0.001)
                continue
            idx, packed, size = item
            try:
                out = packers[size].unpack(np.asarray(packed))  # ~one RTT
            except BaseException as e:
                drain_err.append(e)
                return
            pos = np.asarray(out.position, np.float32)
            vel = np.asarray(out.velocity, np.float32)
            lost = np.asarray(out.lost)
            if size > 1:  # chunked record: steer on its newest frame
                pos, vel, lost = pos[-1], vel[-1], lost[-1]
            shipper.observe(
                {
                    "frame": idx,
                    "position": pos.tolist(),
                    "velocity": vel.tolist(),
                    "lost": bool(np.any(lost)),
                }
            )

    if chunk > 1 and shipper is None:
        raise ValueError("stream chunking (chunk > 1) requires roi_px > 0")

    drainer = None
    steerers: list[threading.Thread] = []
    if on_record is not None:
        drainer = threading.Thread(target=_drain_worker, daemon=True)
        drainer.start()
    if shipper is not None:
        # Each steer fetch costs ~one relay RTT and advances the steered
        # index by `chunk` frames; N workers pipeline that RTT (see
        # config.py runtime.stream_steer_workers). The claim counter keeps
        # them on distinct entries.
        steerers = [
            threading.Thread(target=_steer_worker, daemon=True)
            for _ in range(max(1, steer_workers))
        ]
        for th in steerers:
            th.start()

    def _finish_drainer() -> None:
        """Flush queued windows and join the drainer (idempotent). Safe
        even after a drain error: the worker discards items until the
        None sentinel, so the puts can never deadlock on the bounded
        queue."""
        nonlocal drainer, pending
        if drainer is None:
            return
        if pending and not drain_err:
            drain_q.put(pending)
        pending = []
        drain_q.put(None)
        drainer.join()
        drainer = None

    n = 0
    ingest_wait = submit = readback = 0.0
    # Adaptive dispatch sizing (chunk_max > chunk): the usable sizes are
    # doublings of `chunk` capped at chunk_max; the loop starts at `chunk`
    # and moves along `sizes` with the rolling pipeline rate (see the
    # switch block at the bottom of the chunked loop).
    sizes = [chunk]
    while chunk_max and chunk > 1 and sizes[-1] * 2 <= chunk_max:
        sizes.append(sizes[-1] * 2)
    cur_i = 0
    rate_marks: list[tuple[float, int]] = []  # (wall time, frames submitted)
    last_switch_n = 0
    pending_frames = 0
    t0 = time.perf_counter()
    t = t0
    try:
        while chunk > 1:  # chunked ROI loop: C frames per H2D + dispatch
            cur = sizes[cur_i]
            t = time.perf_counter()
            if native_roi:
                idxs, frames = [], None
                for _ in range(cur):
                    i = next(it, None)
                    if i is None:
                        break
                    idxs.append(i)
            else:
                frames = []
                while len(frames) < cur:
                    f = next(it, None)
                    if f is None:
                        break
                    frames.append(f)
                idxs = list(range(n + 1, n + 1 + len(frames)))
            ingest_wait += time.perf_counter() - t
            if not idxs:
                break
            t = time.perf_counter()
            if len(idxs) < cur:
                # Tail shorter than a chunk: per-frame path (separate compile),
                # records read back synchronously — it's the end of the
                # stream. Flush queued windows + join the drainer FIRST so
                # tail records emit in frame order from a single thread
                # (on_record consumers are not synchronized).
                _finish_drainer()
                for j, idx in enumerate(idxs):
                    dev = (
                        shipper.ship_native(source, idx)
                        if native_roi
                        else shipper.ship(frames[j], idx)
                    )
                    out = tracker.step_device(dev)
                    if on_record is not None:
                        out_h = jax.device_get(out)
                        on_record(
                            {
                                "frame": idx,
                                "position": np.asarray(out_h.position).tolist(),
                                "box": np.asarray(out_h.box).tolist(),
                                "velocity": np.asarray(out_h.velocity).tolist(),
                                "conf": float(out_h.conf),
                                "ess": float(out_h.ess),
                                "lost": bool(out_h.lost),
                            }
                        )
                    n += 1
                submit += time.perf_counter() - t
                break
            dev = (
                shipper.ship_native_chunk(source, idxs)
                if native_roi
                else shipper.ship_chunk(frames, idxs)
            )
            # Once this size's packer layout is known (its first chunk),
            # track + pack in ONE executable (Tracker.step_chunk_packed):
            # one dispatch per chunk instead of step + separate pack.
            if want_records and cur in packers and chunk_packed is not None:
                packed = chunk_packed(dev)
            else:
                out = tracker.step_chunk_device(dev)
                packed = None
                if want_records:
                    if cur not in packers:
                        packers[cur] = OutputPacker(out)
                    packed = packers[cur].pack(out)
            if want_records:
                hist.append((idxs[-1], packed, cur))
                if len(hist) > 64:
                    del hist[:-64]
                if on_record is not None:
                    pending.append((idxs[-1], packed, cur))
                    pending_frames += len(idxs)
            submit += time.perf_counter() - t
            n += len(idxs)
            if pending_frames > readback_window and not drain_err:
                done, pending = pending, []
                pending_frames = 0
                t = time.perf_counter()
                drain_q.put(done)
                readback += time.perf_counter() - t
            if steer_lag > 0:
                # Lost-aware throttle: while the newest steered record says
                # LOST, cap submit-ahead at one chunk so a re-detection jump
                # re-aims the next shipped crop almost immediately.
                lag_now = (
                    cur if (lost_throttle and shipper.lost_seen) else steer_lag
                )
                t = time.perf_counter()
                while n - shipper.observed_idx > lag_now and not drain_err:
                    time.sleep(0.0005)
                readback += time.perf_counter() - t
            if len(sizes) > 1:
                # Rolling rate over the last ~2 s (>= 2 marks): switch up
                # when it can't hold fps_target, back down when it clears
                # the target with 60% margin; cooldown of 4 dispatches
                # between switches; flush pending so drained windows stay
                # shape-homogeneous.
                now = time.perf_counter()
                rate_marks.append((now, n))
                while len(rate_marks) > 2 and now - rate_marks[0][0] > 2.0:
                    rate_marks.pop(0)
                span = now - rate_marks[0][0]
                if len(rate_marks) >= 3 and span > 0.5 and (
                    n - last_switch_n >= 4 * cur
                ):
                    rate = (n - rate_marks[0][1]) / span
                    new_i = cur_i
                    if rate < fps_target and cur_i + 1 < len(sizes):
                        new_i = cur_i + 1
                    elif rate > 1.6 * fps_target and cur_i > 0:
                        new_i = cur_i - 1
                    if new_i != cur_i:
                        if pending and not drain_err:
                            drain_q.put(pending)
                            pending, pending_frames = [], 0
                        cur_i = new_i
                        last_switch_n = n
                        rate_marks.clear()
        while chunk == 1:
            t = time.perf_counter()
            frame = next(it, None)
            ingest_wait += time.perf_counter() - t
            if frame is None:
                break
            t = time.perf_counter()
            if native_roi:
                dev = shipper.ship_native(source, frame)  # frame is an index
            elif shipper is not None:
                # Record frames are 1-based (frame 0 is the init frame);
                # passing the index keeps dead reckoning exact.
                dev = shipper.ship(frame, n + 1)
            else:
                dev = jax.device_put(frame)  # async H2D; overlaps previous step
            # Pack each record into one flat device array (the readback
            # threads fetch packed rows — one transfer, not 7 fields); once
            # the layout is known, packing happens INSIDE the step executable
            # (Tracker.step_packed) — one dispatch per frame, not two.
            if want_records and 1 in packers and step_packed is not None:
                packed = step_packed(dev)
            else:
                out = tracker.step_device(dev)
                packed = None
                if want_records:
                    if 1 not in packers:
                        packers[1] = OutputPacker(out)
                    packed = packers[1].pack(out)
            if want_records:
                hist.append((n + 1, packed, 1))
                if len(hist) > 64:
                    del hist[:-64]
                if on_record is not None:
                    pending.append((n + 1, packed, 1))
            submit += time.perf_counter() - t
            n += 1
            if len(pending) > readback_window and not drain_err:
                done, pending = pending, []
                t = time.perf_counter()
                drain_q.put(done)  # blocks only on drainer backpressure
                readback += time.perf_counter() - t
            if shipper is not None and steer_lag > 0:
                # Flow control: cap the submit-ahead distance over the newest
                # STEERED estimate. Without it, submission outpaces the
                # device+relay backlog, the steer fetch chases an ever-staler
                # head, and the predicted ROI walks off the target (measured:
                # 49.7 fps but RMSE 109 px / 80 lost frames on the 4K run).
                # The cap bounds both the steering lag and in-flight memory.
                lag_now = (
                    1 if (lost_throttle and shipper.lost_seen) else steer_lag
                )
                t = time.perf_counter()
                while n - shipper.observed_idx > lag_now and not drain_err:
                    time.sleep(0.0005)
                readback += time.perf_counter() - t
        t = time.perf_counter()
        _finish_drainer()
    finally:
        # Teardown on EVERY exit (success or raise): without it, an
        # exception mid-stream leaks two busy-polling steer workers and a
        # blocked drainer per call for the process lifetime. The drainer
        # discards queued items after an error, so put(None) cannot block.
        steer_stop = True
        if drainer is not None:
            drain_q.put(None)
            drainer.join()
            drainer = None
        for th in steerers:
            th.join()
    if drain_err:
        raise drain_err[0]
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


def _drain(pending, packers: dict[int, OutputPacker], on_record) -> None:
    """Read back a window of packed records in one D2H transfer and emit.

    Entries are (frame_idx, packed_row, dispatch_size); a window is
    shape-homogeneous by construction (the submit loop flushes pending on
    an adaptive size switch), so one jnp.stack covers it."""
    import os

    t0 = time.perf_counter()
    stacked = jnp.stack([p for _, p, _ in pending])
    t1 = time.perf_counter()
    buf = np.asarray(stacked)
    if os.environ.get("VPT_STREAM_DEBUG"):
        print(
            f"drain[{pending[0][0]}..{pending[-1][0]}]: stack "
            f"{(t1 - t0) * 1e3:.0f} ms, fetch "
            f"{(time.perf_counter() - t1) * 1e3:.0f} ms",
            flush=True,
        )
    for (idx, _, size), row in zip(pending, buf):
        out = packers[size].unpack(row)
        pos = np.asarray(out.position)
        # Explicit chunk flag, NOT ndim: banked multistream records are ALSO
        # 2-D ([K streams, 2]) and must pass through whole (cli.py fans them
        # out per stream).
        if size > 1:  # chunked row: C per-frame records, idx is LAST
            c = pos.shape[0]
            for j in range(c):
                on_record(
                    {
                        "frame": idx - c + 1 + j,
                        "position": pos[j].tolist(),
                        "box": np.asarray(out.box)[j].tolist(),
                        "velocity": np.asarray(out.velocity)[j].tolist(),
                        "conf": float(np.asarray(out.conf)[j]),
                        "ess": float(np.asarray(out.ess)[j]),
                        "lost": bool(np.asarray(out.lost)[j]),
                    }
                )
            continue
        on_record(
            {
                "frame": idx,
                "position": out.position.tolist(),
                "box": out.box.tolist(),
                "velocity": out.velocity.tolist(),
                "conf": out.conf.tolist(),
                "ess": out.ess.tolist(),
                "lost": out.lost.astype(bool).tolist(),
            }
        )
