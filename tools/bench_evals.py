#!/usr/bin/env python
"""Run every BASELINE.md eval config on the attached device and record
results in docs/BENCH_RESULTS.md (+ JSONL). SURVEY.md §6 / component B14.

Eval 5's full streaming form (4K decode->track at 60 fps) is transport-bound
on this rig (the chip sits behind a ~1 MB/s relay, so ONE 4K frame takes
~24 s to ship); it is benchmarked here in device-staged form — the same
per-frame compute with frames pre-staged in HBM — which is the number the
chip itself is responsible for. The host-side pipeline half is covered by
the native ring producer benchmark (tools/bench_native_io.py).

Usage: python tools/bench_evals.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vitparticlefiltertracker_tpu.config import load_config
from vitparticlefiltertracker_tpu.runtime.benchmark import run_benchmark
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# (config file, stage_frames, measure_frames, notes)
EVALS = [
    ("configs/eval1-cpu-synthetic.yaml", 16, 64,
     "spec'd for CPU; run here on the attached device"),
    ("configs/eval2-tpu-occlusion.yaml", 32, 128, ""),
    ("configs/eval3-tpu-needle-1080p.yaml", 8, 64,
     "1080p frames; staging H2D excluded from timing"),
    ("configs/eval4-tpu-multiobject-720p.yaml", 16, 64,
     "8 banks x 1k particles, single chip (banks vmapped)"),
    ("configs/eval5-tpu-streaming-4k.yaml", 4, 32,
     "device-staged form of the streaming config (see header)"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer frames")
    ap.add_argument("--only", type=int, default=0, help="run only eval N")
    ap.add_argument(
        "--backend", default="",
        help="force a JAX platform (e.g. 'cpu' for eval 1, which "
        "BASELINE.json pins to CPU; env JAX_PLATFORMS is overridden by the "
        "axon plugin on this rig, so the flag sets jax_platforms directly)",
    )
    ap.add_argument(
        "--render-only", action="store_true",
        help="regenerate BENCH_RESULTS.md from the recorded JSONLs "
        "(docs/bench_evals_*.jsonl, docs/bench_stream_e2e.jsonl) without "
        "running anything",
    )
    args = ap.parse_args()

    if args.render_only:
        render_md("tpu")
        return 0

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    enable_compilation_cache()

    backend = jax.default_backend()
    results = []
    for i, (cfg_path, stage, measure, notes) in enumerate(EVALS, start=1):
        if args.only and i != args.only:
            continue
        if args.quick:
            stage, measure = min(stage, 8), min(measure, 32)
        cfg = load_config(os.path.join(REPO, cfg_path))
        print(f"=== eval {i}: {cfg_path} ===", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            r = run_benchmark(
                cfg, warmup=4, measure_frames=measure, latency_frames=8,
                stage_frames=stage,
            )
            r["eval"] = i
            r["config_file"] = cfg_path
            r["notes"] = notes
            r["wall_s"] = round(time.perf_counter() - t0, 1)
            results.append(r)
            print(json.dumps({k: r[k] for k in
                              ("eval", "fps", "fps_serving", "p50_ms",
                               "p50_device_ms")}),
                  file=sys.stderr, flush=True)
        except Exception as e:  # record the failure, keep going
            results.append({"eval": i, "config_file": cfg_path,
                            "error": repr(e)[:500], "notes": notes})
            print(f"eval {i} FAILED: {e!r}", file=sys.stderr, flush=True)

    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    jsonl = os.path.join(REPO, "docs", f"bench_evals_{backend}.jsonl")
    with open(jsonl, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")

    # The rendered table is ALWAYS anchored on the TPU sweep; CPU runs
    # only refresh the backend-pinned extra rows (a cpu-primary render once
    # wiped the TPU table and attached its notes to the wrong rows).
    render_md("tpu")
    print(f"wrote BENCH_RESULTS.md and {jsonl}")
    return 0


def _read_jsonl(name: str) -> list[dict]:
    path = os.path.join(REPO, "docs", name)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def render_md(primary_backend: str) -> None:
    """BENCH_RESULTS.md from every recorded JSONL: the device eval sweep,
    backend-pinned extra rows (eval 1 on CPU, per BASELINE.json), and the
    measured end-to-end streaming pipeline runs."""
    md = os.path.join(REPO, "docs", "BENCH_RESULTS.md")
    rows = _read_jsonl(f"bench_evals_{primary_backend}.jsonl")
    with open(md, "w") as f:
        f.write(
            "# BASELINE.md eval-config results\n\n"
            f"Backend: **{primary_backend}** — one TPU v5e chip behind this "
            "rig's ~30 ms host<->device relay. All timings are bounded by "
            "real position readbacks (`jax.block_until_ready` is a no-op on "
            "this platform); `fps` is the offline whole-clip scan "
            "(`track_clip_device`), `fps_serving` the chunked per-step path, "
            "`p50_device_ms` the per-step latency net of the relay RTT.\n\n"
            "| eval | config | backend | fps (offline) | fps (serving) "
            "| p50 ms | p50 device ms | notes |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )

        def write_row(r, backend, notes=None):
            if "error" in r:
                f.write(f"| {r['eval']} | `{r['config_file']}` | {backend} "
                        f"| FAILED | | | | {r['error'][:80]} |\n")
                return
            f.write(
                f"| {r['eval']} | `{r['config_file']}` | {backend} "
                f"| {r['fps']:.1f} | {r['fps_serving']:.1f} "
                f"| {r['p50_ms']:.1f} | {r['p50_device_ms']:.2f} "
                f"| {notes if notes is not None else r.get('notes', '')} |\n"
            )

        cpu_rows = {r["eval"]: r for r in _read_jsonl("bench_evals_cpu.jsonl")}
        for r in rows:
            write_row(r, primary_backend)
            if r["eval"] in cpu_rows:  # BASELINE.json pins eval 1 to CPU
                write_row(cpu_rows[r["eval"]], "cpu",
                          "the backend BASELINE.json:7 specifies "
                          "(this rig's host: ONE CPU core)")
        f.write(
            "\nTargets (BASELINE.md): >=60 fps/chip at ViT-B/16 + 1k "
            "particles (eval 2 config), p50 < 16 ms.\n\n"
            "`p50_device_ms` is independently witnessed by hardware "
            "counters: `docs/PROFILE.md` (tools/profile_step.py) reads the "
            "per-step device execution span off the jax.profiler XPlane "
            "dump.\n\n"
            "Eval 5's device-staged row amortizes the relay RTT over only 4 "
            "staged 4K frames (staging more is transport-prohibitive here); "
            "see p50_device_ms for the on-chip step rate.\n"
        )
        stream = _read_jsonl("bench_stream_e2e.jsonl")
        if stream:
            f.write(
                "\n## Measured end-to-end streaming pipeline "
                "(tools/bench_stream_e2e.py)\n\n"
                "ONE live fused decode->track run per row; nothing "
                "stitched. `-roi` rows run the ROI-only ingest path "
                "(runtime/streaming.py): the native runtime reads ONLY the "
                "search window (vpt_read_rect / bilinear vpt_read_view) so "
                "the full frame never reaches Python, a steering thread "
                "feeds positions back to aim the next crop, and records "
                "drain in packed windows off-thread — `shipped MB` is the "
                "actual per-frame H2D payload (~0.3 MB at 4K instead of "
                "24.9). Plain rows ship the full frame. All rows cross this "
                "rig's relay (measured `H2D MB/s`, swings 2-3x with "
                "congestion); on a co-located host the same pipeline rides "
                "PCIe/DMA.\n\n"
                "`chunk` = frames per device dispatch (`-c4` rows: "
                "stacked-crop H2D + one jitted scan per 4 frames, "
                "amortizing the ~11 ms/dispatch relay submission cost "
                "that binds the chunk-1 ROI rows).\n\n"
                "RMSE vs resolution: dense-mode localization noise scales "
                "with the search window's 224-grid sample spacing, and the "
                "window spans scale with the target (search_scale x box), "
                "so pixel RMSE grows with resolution at constant RELATIVE "
                "accuracy — 4K's ~8 px at 5.5 px/sample and 1080p's 4.0 px "
                "at 2.75 px/sample are both ~1.5 samples. Shrinking the 4K "
                "window to buy finer sampling was measured and rejected "
                "(`eval5-roi-c4-ss25`: search_scale 2.5 -> RMSE 11.4 — the "
                "lost window slack costs more than the sampling gains); "
                "in-chunk crop centers already dead-reckon per frame "
                "(RoiShipper._predict per idx).\n\n"
                "`eval5-roi-teleport-c4` drives ROI-escape recovery at 4K: "
                "the target re-enters in a different quadrant, far outside "
                "the shipped crop, so recovery must ride the decimated "
                "global view's re-detection. Its whole-run RMSE is "
                "dominated by the hidden span (no tracker can score a "
                "hidden target); the row's metric is `recover_err_px` — "
                "mean error once the target has been visible again for 10 "
                "frames. fps is decode-bound (Python procedural source; "
                "the native ring is moving-square only).\n\n"
                "| variant | model/particles | frame | chunk | fps (e2e) "
                "| shipped MB | track RMSE px | ingest wait s | submit s "
                "| readback s | H2D MB/s |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
            for r in stream:
                rmse = r.get("track_rmse_px", "")
                if r.get("recover_err_px") is not None:
                    rmse = f"{rmse} (recover {r['recover_err_px']})"
                f.write(
                    f"| {r['variant']} | {r['model']}/{r['particles']} "
                    f"| {r['frame'][0]}x{r['frame'][1]} "
                    f"| {r.get('chunk', 1)} | {r['fps']} "
                    f"| {r.get('shipped_MB_per_frame', r['frame_MB'])} "
                    f"| {rmse} | {r['ingest_wait_s']} | {r['submit_s']} "
                    f"| {r.get('readback_s', '')} | {r['h2d_MBps']} |\n"
                )
            repeated = [r for r in stream if r.get("runs", 1) > 1]
            if repeated:
                f.write(
                    "\nRepeated variants (fps column = median run; the full "
                    "distribution is the evidence against relay-congestion "
                    "luck):\n\n"
                )
                for r in repeated:
                    runs = ", ".join(f"{v}" for v in r["fps_runs"])
                    f.write(
                        f"- `{r['variant']}`: {r['runs']} back-to-back runs "
                        f"— fps min/median/max = {r['fps_min']}/"
                        f"{r['fps_median']}/{r['fps_max']} "
                        f"(runs: {runs}); RMSE "
                        # Repeat runs lacking track_rmse_px store None
                        # (bench_stream_e2e.py); drop them before sorting.
                        f"{'-'.join(str(v) for v in sorted({v for v in r.get('rmse_runs', []) if v is not None}))} px.\n"
                    )
    print(f"wrote {md}")


if __name__ == "__main__":
    sys.exit(main())
