#!/usr/bin/env python
"""Flash-attention vs XLA attention at the framework's REAL shapes.

Round-1 VERDICT: the flash kernel never dispatched on any shipped config,
and the gate couldn't see vmapped bank/stream axes. This benchmark measures
both lowerings at every production shape — dense single, banked K=8,
multistream K=16, crop mode, and global-frame encodes (720p/1080p/4K) — and
writes docs/bench_attention.jsonl. The dispatch threshold
(ops/attention.py:FLASH_MIN_LOGITS_ELEMS) and the DESIGN.md record of where
each lowering wins are maintained against this data.

Timing forces a real D2H readback per repetition (this rig's
block_until_ready is unreliable — see runtime/benchmark.py).

Usage: python tools/bench_attention.py [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.ops.attention import (
    flash_attention,
    reference_attention,
)
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# (label, B, H, T, d) — executed shapes (vmap axes already folded into B).
SHAPES = [
    ("dense-single ViT-B window224", 1, 12, 196, 64),
    ("banked-8 ViT-B window224", 8, 12, 196, 64),
    ("multistream-16 ViT-B window224", 16, 12, 196, 64),
    ("multistream-64 ViT-B window224", 64, 12, 196, 64),
    ("crop-1k ViT-B crop32", 1024, 12, 4, 64),
    ("global-encode ViT-B 720p", 1, 12, 3600, 64),
    ("global-encode ViT-B 1080p", 1, 12, 8160, 64),
    ("global-encode ViT-L 1080p", 1, 16, 8160, 64),
    ("global-encode ViT-B 4K", 1, 12, 32640, 64),
]


def time_fn(fn, *args, reps: int, inner: int = 16) -> float:
    """Per-call ms by TWO-LENGTH DIFFERENCING: time a jitted scan of the
    kernel at `inner` and `2*inner` data-dependent iterations and take the
    slope ((t2 - t1) / inner). The relay RTT, dispatch overhead, and any
    per-call constant cancel exactly — absolute netting against a separately
    measured RTT floor proved fragile on this rig (the RTT varies 27-200 ms
    between calm and congested windows, which once produced a physically
    impossible 0.0 ms for a kernel with a >=1 ms MXU floor). The scan output
    feeds back into the input so XLA cannot elide iterations."""
    import jax

    def make(length):
        def loop(q, k, v):
            def body(qc, _):
                o = fn(qc, k, v)
                return (o * 1e-3 + qc).astype(qc.dtype), ()

            out, _ = jax.lax.scan(body, q, None, length=length)
            return out

        return jax.jit(loop)

    looped1, looped2 = make(inner), make(2 * inner)
    for lp in (looped1, looped2):
        out = lp(*args)
        np.asarray(out[0, 0, 0])  # compile + drain
    t1s, t2s = [], []
    for _ in range(reps):
        for lp, acc in ((looped1, t1s), (looped2, t2s)):
            t0 = time.perf_counter()
            out = lp(*args)
            np.asarray(out[0, 0, 0])  # force completion via readback
            acc.append(time.perf_counter() - t0)
    per_call = (float(np.median(t2s)) - float(np.median(t1s))) / inner
    return max(per_call, 0.0) * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    backend = jax.default_backend()

    ref_jit = jax.jit(reference_attention)
    rows = []
    for label, b, h, t, d in SHAPES:
        key = jax.random.key(0)
        q, k, v = (
            jax.random.normal(jax.random.fold_in(key, i), (b, h, t, d), dtype)
            for i in range(3)
        )
        jax.block_until_ready((q, k, v))
        logits_elems = b * h * t * t
        row = {
            "label": label,
            "b": b, "h": h, "t": t, "d": d,
            "logits_elems": logits_elems,
            "dtype": args.dtype,
            "backend": backend,
        }
        # Loop length targeting ~0.3 s of device work per timed sample, so
        # the sub-ms kernels at production shapes don't vanish into the
        # ~30 ms relay RTT (a flat inner=16 measured 0.0 everywhere).
        flops = 4.0 * b * h * t * t * d
        est_s = max(flops / 5e13, 3e-5)  # ~50 TFLOPs effective, 30us floor
        inner = int(min(4096, max(8, 0.3 / est_s)))
        try:
            row["xla_ms"] = round(
                time_fn(ref_jit, q, k, v, reps=args.reps, inner=inner), 3
            )
        except Exception as e:  # OOM at huge T is itself a datapoint
            row["xla_ms"] = None
            row["xla_error"] = type(e).__name__
        if backend == "tpu":
            try:
                row["flash_ms"] = round(
                    time_fn(
                        functools.partial(flash_attention), q, k, v,
                        reps=args.reps, inner=inner,
                    ),
                    3,
                )
            except Exception as e:
                row["flash_ms"] = None
                row["flash_error"] = type(e).__name__
        if row.get("xla_ms") and row.get("flash_ms"):
            row["flash_speedup"] = round(row["xla_ms"] / row["flash_ms"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "docs", "bench_attention.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
