"""Multi-object tracking: K independent filter banks (component B10).

The reference's surveillance use case (/root/reference/README.md:50) implies
multiple tracked objects; BASELINE.json:10 pins the eval config at "8 filter
banks x 1k particles". TPU-natively this is just `jax.vmap` of the
single-object tracker step over a leading bank axis — one batched ViT
forward serves all banks — optionally sharded over a ("bank", "particle")
mesh (parallel/mesh.py) so banks and particle batches spread across chips
with XLA inserting the collectives.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.parallel.mesh import (
    banked_state_sharding,
    check_tp_divisibility,
    make_mesh,
    replicated,
    vit_param_sharding,
)
from vitparticlefiltertracker_tpu.runtime.tracker import build_tracker_fns


def _packed_step_jit(step_fn, mesh, param_sh, packed_shardings, don):
    """Jit `step_fn` with its TrackOutput flattened on-device (one f32 row,
    runtime/tracker.py pack_track_output == streaming.OutputPacker layout).
    The streaming pipeline then pays ONE dispatch per step instead of a step
    dispatch plus a separate pack dispatch — material on relay-attached
    devices where each submission costs ~ms of host latency."""
    from vitparticlefiltertracker_tpu.runtime.tracker import pack_track_output

    def fn(prm, state, frame):
        st, out = step_fn(prm, state, frame)
        return st, pack_track_output(out)

    if mesh is not None:
        state_sh, frame_sh = packed_shardings
        return jax.jit(
            fn,
            in_shardings=(param_sh, state_sh, frame_sh),
            out_shardings=(state_sh, None),
            donate_argnums=don,
        )
    return jax.jit(fn, donate_argnums=don)


def banked_bboxes(init_bbox, banks: int) -> np.ndarray:
    """[K, 4] bboxes for K banks: tile a single box; pass through (and
    validate) per-target boxes a multi-object source already provides."""
    b = np.asarray(init_bbox, np.float32)
    if b.ndim == 1:
        return np.tile(b, (banks, 1))
    if b.shape != (banks, 4):
        raise ValueError(
            f"source provides {b.shape[0]} init bboxes but runtime.banks="
            f"{banks}; set runtime.banks to match the source's target count"
        )
    return b


def build_banked_fns(cfg: Config):
    """(init, step) over banked state: leading axis K on every state leaf.

    init(params, frame, bboxes [K,4], seeds [K]) -> BankedState
    step(params, state, frame) -> (BankedState, TrackOutput[K])

    ViT params broadcast across banks (in_axes=None) — one weight copy in
    HBM serves all K filters; vmap batches the K ViT forwards into one.
    """
    return _build_vmapped_fns(cfg, frame_axis=None, width=cfg.runtime.banks)


def build_multistream_fns(cfg: Config, num_streams: int = 1):
    """Multi-STREAM serving: K independent videos, one batched device step.

    Unlike the banked fns (K filters on ONE shared frame), every bank here
    gets its own frame — the production serving-farm shape (frame vmap axis
    0 instead of broadcast). Batching K search-window ViT forwards into one
    [K, T_tokens, D] encoder call is also where the MXU finally saturates
    (batch-1 196-token forwards leave it mostly idle).

    init(params, frames [K,H,W,3], bboxes [K,4], seeds [K]) -> State[K]
    step(params, state, frames [K,H,W,3]) -> (State[K], TrackOutput[K])
    clip(params, state, clips [T,K,H,W,3]) -> (State[K], TrackOutput[T,K])
    """
    return _build_vmapped_fns(cfg, frame_axis=0, width=num_streams)


def _build_vmapped_fns(cfg: Config, frame_axis, width: int = 1):
    """Shared vmap wiring for banked (frame_axis=None, one shared frame)
    and multi-stream (frame_axis=0, per-bank frames) trackers. `width` is
    the vmapped K — threaded into the flash-attention dispatch gate, which
    must see executed (not per-example) batch sizes."""
    fns = build_tracker_fns(cfg, batch_hint=width)
    init_v = jax.vmap(fns.init, in_axes=(None, frame_axis, 0, 0))
    step_v = jax.vmap(fns.step, in_axes=(None, 0, frame_axis))

    def clip_v(prm, state, frames):
        return jax.lax.scan(lambda s, f: step_v(prm, s, f), state, frames)

    return init_v, step_v, clip_v


class MultiStreamTracker:
    """K independent video streams served by one chip in lockstep.

    Same per-stream semantics as K separate Trackers with the same seeds
    (tested); one jitted call per frame-batch.
    """

    def __init__(self, cfg: Config, num_streams: int, vit_params=None, mesh=None):
        cfg.resolve()
        self.cfg = cfg
        self.k = num_streams
        from vitparticlefiltertracker_tpu.models.params import resolve_vit_params

        vit_params = resolve_vit_params(cfg, vit_params)
        init_m, step_m, clip_m = build_multistream_fns(cfg, num_streams)
        don = (1,) if cfg.runtime.donate_state else ()

        # runtime.mesh_*: streams ride the "bank" axis (each stream's state
        # AND frame shard to its chips), particle/model axes as in
        # MultiTracker. One serve process then drives a whole mesh.
        r = cfg.runtime
        if mesh is None and r.mesh_banks * r.mesh_particles * r.mesh_model > 1:
            mesh = make_mesh(r.mesh_banks, r.mesh_particles, r.mesh_model)
        self.mesh = mesh
        if mesh is not None:
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                check_tp_divisibility(
                    cfg.model.heads, cfg.model.mlp_dim, mesh.shape["model"]
                )
            self._param_sh = vit_param_sharding(mesh, vit_params)
            self.vit_params = jax.device_put(vit_params, self._param_sh)
            self._init_jit = jax.jit(init_m)
            self._step_jit = None  # built lazily once state sharding is known
            self._clip_jit = None
        else:
            self.vit_params = jax.device_put(vit_params)
            self._init_jit = jax.jit(init_m)
            self._step_jit = jax.jit(step_m, donate_argnums=don)
            self._clip_jit = jax.jit(clip_m, donate_argnums=don)
        self._step_m = step_m
        self._clip_m = clip_m
        self._don = don
        self._step_packed_jit = None  # fused step+pack (see step_packed)
        self._packed_shardings = None  # mesh: (state_sh, frame_sh) from init
        self.state = None

    def init(self, frames: np.ndarray, bboxes, seeds=None) -> None:
        """frames: [K, H, W, 3]; bboxes: [K, 4]; seeds: [K] (default seed+i)."""
        bboxes = jnp.asarray(np.asarray(bboxes, np.float32)).reshape(self.k, 4)
        if seeds is None:
            seeds = np.arange(self.k, dtype=np.int32) + self.cfg.filter.seed
        state = self._init_jit(
            self.vit_params, jnp.asarray(frames), bboxes,
            jnp.asarray(seeds, jnp.int32),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shardings = banked_state_sharding(self.mesh, state)
            state = jax.device_put(state, shardings)
            self._packed_shardings = (
                shardings,
                NamedSharding(self.mesh, P("bank")),
            )
            if self._step_jit is None:
                # Frames [K, H, W, 3] shard their stream axis over "bank":
                # each stream's pixels live with its filter state.
                frame_sh = NamedSharding(self.mesh, P("bank"))
                self._step_jit = jax.jit(
                    self._step_m,
                    in_shardings=(self._param_sh, shardings, frame_sh),
                    out_shardings=(shardings, None),
                    donate_argnums=self._don,
                )
                # Clips [T, K, ...]: stream axis is dim 1.
                clip_sh = NamedSharding(self.mesh, P(None, "bank"))
                self._clip_jit = jax.jit(
                    self._clip_m,
                    in_shardings=(self._param_sh, shardings, clip_sh),
                    out_shardings=(shardings, None),
                    donate_argnums=self._don,
                )
        self.state = state

    def step_device(self, frames_dev: jax.Array):
        """frames_dev: [K, H, W, 3] -> TrackOutput with leading K axis."""
        self.state, out = self._step_jit(self.vit_params, self.state, frames_dev)
        return out

    def step_packed(self, frames_dev: jax.Array) -> jax.Array:
        """step_device with the K-stream TrackOutput packed on-device into
        one flat f32 row: one dispatch per frame-batch in `serve` instead of
        step + a separate pack call (see _packed_step_jit)."""
        if self._step_packed_jit is None:
            self._step_packed_jit = _packed_step_jit(
                self._step_m, self.mesh, getattr(self, "_param_sh", None),
                self._packed_shardings, self._don,
            )
        self.state, packed = self._step_packed_jit(
            self.vit_params, self.state, frames_dev
        )
        return packed

    def track_clips_device(self, clips_dev: jax.Array):
        """clips_dev: [T, K, H, W, 3] -> TrackOutput [T, K] in one dispatch."""
        self.state, outs = self._clip_jit(self.vit_params, self.state, clips_dev)
        return outs


class MultiTracker:
    """K-object tracker over one shared frame stream.

    With runtime.mesh_banks/mesh_particles > 1, state is laid out on a
    ("bank", "particle") mesh and the jitted step runs SPMD across chips.
    """

    def __init__(self, cfg: Config, vit_params=None, mesh=None):
        cfg.resolve()
        self.cfg = cfg
        self.banks = cfg.runtime.banks
        from vitparticlefiltertracker_tpu.models.params import resolve_vit_params

        vit_params = resolve_vit_params(cfg, vit_params)
        init_b, step_b, clip_b = build_banked_fns(cfg)

        r = cfg.runtime
        if mesh is None and r.mesh_banks * r.mesh_particles * r.mesh_model > 1:
            mesh = make_mesh(r.mesh_banks, r.mesh_particles, r.mesh_model)
        self.mesh = mesh

        if mesh is not None:
            # Weights tensor-parallel over the "model" axis when it exists
            # (replicated otherwise); state sharded after init.
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                check_tp_divisibility(
                    cfg.model.heads, cfg.model.mlp_dim, mesh.shape["model"]
                )
            self._param_sh = vit_param_sharding(mesh, vit_params)
            self.vit_params = jax.device_put(vit_params, self._param_sh)
            self._init_jit = jax.jit(init_b)  # sharding applied post-init
            self._step_jit = None  # built lazily once state sharding is known
            self._clip_jit = None
        else:
            self.vit_params = jax.device_put(vit_params)
            self._init_jit = jax.jit(init_b)
            self._step_jit = jax.jit(
                step_b, donate_argnums=(1,) if cfg.runtime.donate_state else ()
            )
            self._clip_jit = jax.jit(
                clip_b, donate_argnums=(1,) if cfg.runtime.donate_state else ()
            )
        self._step_b = step_b
        self._clip_b = clip_b
        self._don = (1,) if cfg.runtime.donate_state else ()
        self._step_packed_jit = None  # fused step+pack (see step_packed)
        self._packed_shardings = None  # mesh: (state_sh, rep) from init
        self.state = None

    def init(self, frame: np.ndarray, bboxes) -> None:
        bboxes = jnp.asarray(np.asarray(bboxes, np.float32)).reshape(self.banks, 4)
        seeds = jnp.arange(self.banks, dtype=jnp.int32) + jnp.int32(self.cfg.filter.seed)
        state = self._init_jit(self.vit_params, jnp.asarray(frame), bboxes, seeds)
        if self.mesh is not None:
            shardings = banked_state_sharding(self.mesh, state)
            state = jax.device_put(state, shardings)
            self._packed_shardings = (shardings, replicated(self.mesh))
            if self._step_jit is None:
                # Pin the output state to the same layout as the input state
                # so step N+1's in_shardings match and donation is in-place.
                rep = replicated(self.mesh)
                param_sh = self._param_sh
                don = self._don
                self._step_jit = jax.jit(
                    self._step_b,
                    in_shardings=(param_sh, shardings, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=don,
                )
                self._clip_jit = jax.jit(
                    self._clip_b,
                    in_shardings=(param_sh, shardings, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=don,
                )
        self.state = state

    def step(self, frame: np.ndarray) -> list[dict[str, Any]]:
        assert self.state is not None, "call init() first"
        t0 = time.perf_counter()
        self.state, out = self._step_jit(self.vit_params, self.state, jnp.asarray(frame))
        ms = (time.perf_counter() - t0) * 1e3
        pos = np.asarray(out.position)
        box = np.asarray(out.box)
        conf = np.asarray(out.conf)
        ess = np.asarray(out.ess)
        lost = np.asarray(out.lost)
        res = np.asarray(out.resampled)
        return [
            {
                "bank": k,
                "position": pos[k].tolist(),
                "box": box[k].tolist(),
                "conf": float(conf[k]),
                "ess": float(ess[k]),
                "resampled": bool(res[k]),
                "lost": bool(lost[k]),
                "step_ms": ms,
            }
            for k in range(self.banks)
        ]

    def reinit_bank(self, k: int, frame: np.ndarray, bbox, seed: int | None = None) -> None:
        """Re-target bank k mid-stream (surveillance: objects enter/leave).

        Builds a fresh single-object state from (frame, bbox) and scatters it
        into the banked state at index k — the other banks' posteriors are
        untouched. Use together with the per-bank `lost` flag to recycle
        banks whose targets left the scene.
        """
        assert self.state is not None, "call init() first"
        if not 0 <= k < self.banks:
            raise IndexError(f"bank {k} out of range [0, {self.banks})")
        bbox1 = jnp.asarray(np.asarray(bbox, np.float32)).reshape(1, 4)
        seed1 = jnp.asarray(
            [self.cfg.filter.seed + k if seed is None else seed], jnp.int32
        )
        fresh = self._init_jit(self.vit_params, jnp.asarray(frame), bbox1, seed1)
        state = jax.tree.map(
            lambda banked, new: banked.at[k].set(new[0]), self.state, fresh
        )
        if self.mesh is not None:
            state = jax.device_put(state, banked_state_sharding(self.mesh, state))
        self.state = state

    def step_device(self, frame_dev: jax.Array):
        self.state, out = self._step_jit(self.vit_params, self.state, frame_dev)
        return out

    def step_packed(self, frame_dev: jax.Array) -> jax.Array:
        """step_device with the K-bank TrackOutput packed on-device into one
        flat f32 row: one dispatch per frame in the banked streaming path
        instead of step + pack (see _packed_step_jit)."""
        if self._step_packed_jit is None:
            self._step_packed_jit = _packed_step_jit(
                self._step_b, self.mesh, getattr(self, "_param_sh", None),
                self._packed_shardings, self._don,
            )
        self.state, packed = self._step_packed_jit(
            self.vit_params, self.state, frame_dev
        )
        return packed

    def track_clip_device(self, frames_dev: jax.Array):
        """Track a staged clip [T, H, W, 3] for all K banks in ONE dispatch
        (lax.scan over frames of the vmapped bank step)."""
        assert self.state is not None, "call init() first"
        self.state, outs = self._clip_jit(self.vit_params, self.state, frames_dev)
        return outs
