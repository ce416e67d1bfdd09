"""Jitted feature-training loop (optax AdamW, on-device data, donated state).

One train step = generate a scene batch on device (training/data.py), run
the localization InfoNCE (training/objective.py) through the dense inference
embedder, and apply AdamW. The step is ONE jitted, state-donating device
program keyed by a counter — zero per-step host->device transfers, so the
slow relay in this rig never sits on the training path.

Checkpoints are written with models/params.py (versioned format), so
`model.checkpoint: <path>` in any tracker config picks them up directly.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitparticlefiltertracker_tpu.models.embedder import DenseEmbedSpec
from vitparticlefiltertracker_tpu.models.params import save_params
from vitparticlefiltertracker_tpu.models.vit import init_vit_params
from vitparticlefiltertracker_tpu.training.data import make_pair_batch
from vitparticlefiltertracker_tpu.training.objective import batch_loss

_DECAY_LEAVES = {"wqkv", "wo", "w1", "w2", "kernel"}  # matmul weights only


def _decay_mask(params) -> dict:
    """AdamW decay on matmul kernels only (biases/LN/pos-embed excluded)."""
    def rec(tree):
        if isinstance(tree, dict):
            return {k: (k in _DECAY_LEAVES) if not isinstance(v, dict) else rec(v)
                    for k, v in tree.items()}
        return False

    return rec(params)


def build_optimizer(tr) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tr.lr,
        warmup_steps=tr.warmup,
        decay_steps=max(tr.steps, tr.warmup + 1),
        end_value=tr.lr * 0.05,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=tr.weight_decay, mask=_decay_mask),
    )


def _train_embed_spec(cfg) -> DenseEmbedSpec:
    """The inference embedder spec, with training overrides: optional smaller
    window (features are resolution-agnostic — no pos-embed in dense mode),
    XLA attention (the Pallas flash kernel has no backward), and the
    training compute dtype."""
    tr = cfg.train
    es = DenseEmbedSpec.from_config(cfg)
    window = tr.window or es.s_img
    vit = es.vit._replace(
        image_size=window,
        use_flash_attention=False,
        dtype=jnp.bfloat16 if tr.dtype == "bfloat16" else jnp.float32,
    )
    return es._replace(vit=vit, s_img=window)


def build_train_step(cfg, mesh=None):
    """Returns (init_fn() -> (params, opt_state), step_fn(params, opt, i)).

    mesh: optional jax.sharding.Mesh with a "data" axis — the scene batch is
    sharded over it (pure data parallelism: params/optimizer replicated, the
    gradient AllReduce is inserted by GSPMD from the sharding annotations;
    no hand-written collectives). Data generation itself runs sharded: each
    device synthesizes only its batch shard.
    """
    tr = cfg.train
    es = _train_embed_spec(cfg)
    tx = build_optimizer(tr)
    base_key = jax.random.key(tr.seed ^ 0x7A11)
    kw = dict(
        tau=tr.tau,
        search_scale=cfg.tracker.search_scale,
        num_random=tr.num_random_negatives,
        template_jitter=tr.template_jitter,
        cloud_weight=tr.cloud_weight,
        cloud_particles=tr.cloud_particles,
        cloud_sigma=tr.cloud_sigma,
        cloud_zscale=tr.cloud_zscale,
        distractor_margin=tr.distractor_margin,
        distractor_weight=tr.distractor_weight,
        distractor_centered_weight=tr.distractor_centered_weight,
        distractor_absent_weight=tr.distractor_absent_weight,
    )
    if mesh is not None and tr.batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"train.batch_size {tr.batch_size} must divide by the data-"
            f"parallel axis {mesh.shape['data']}"
        )

    def _shard_batch(tree):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            return tree
        sh = NamedSharding(mesh, P("data"))  # dim 0 sharded, rest replicated
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, sh), tree
        )

    def init_fn():
        params = init_vit_params(jax.random.key(cfg.filter.seed ^ 0x5EED), es.vit)
        return params, tx.init(params)

    def loss_fn(params, step):
        k = jax.random.fold_in(base_key, step)
        batch = _shard_batch(
            make_pair_batch(
                jax.random.fold_in(k, 0),
                tr.batch_size,
                tr.canvas,
                tr.lookalike_frac,
                tr.blur_prob,
                tr.blur_sigma,
            )
        )
        # Keys stay replicated (key arrays + sharding constraints are
        # version-sensitive); the vmapped loss follows the batch's sharding.
        keys = jax.random.split(jax.random.fold_in(k, 1), tr.batch_size)
        return batch_loss(params, es, batch, keys, **kw)

    freeze = _freeze_mask_fn(cfg)

    def step_fn(params, opt_state, step):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, step
        )
        if freeze is not None:
            # Before the chain: frozen grads must not inflate the global-
            # norm clip and bleed into the trainable layers' step size.
            grads = freeze(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        if freeze is not None:
            # After the chain: AdamW's DECOUPLED weight decay writes
            # nonzero updates even for zero grads — frozen slices must not
            # shrink toward 0 (they ARE the random-basis matched filter
            # being preserved).
            updates = freeze(updates)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return params, opt_state, metrics

    return init_fn, step_fn


def _freeze_mask_fn(cfg):
    """train.freeze_prefix > 0: zero the update for patch_embed, pos_embed
    and the first N scan-stacked transformer blocks, training only the top
    depth-N blocks (+ final LN).

    Round-3 diagnosis (docs/QUALITY.md): full-backbone fine-tuning on this
    domain consistently LOSES to seeded random init — the z-normed
    likelihood consumes the cosine landscape, which random projections
    already preserve near-optimally, and gradient pressure on the early
    layers erodes that landscape faster than the margin losses add
    discrimination. Freezing the early layers keeps the matched-filter
    front end and lets the trained top layers add ONLY the pattern-level
    discrimination the lookalike gates need. Blocks are scan-stacked
    ([L, ...] leaves), so the block mask is a per-layer 0/1 vector
    broadcast over the leading depth axis, not an optax leaf mask."""
    if cfg.model.head_depth > 0:
        # RESIDUAL HEAD TRAINING (models/vit.py:VitSpec.head_depth): the
        # whole trunk — patch embed, every trunk block, final LN — IS the
        # seeded random-init matched filter the blended score's first half
        # rides on; only params["head"] trains. This is what guarantees
        # "trained can't lose to random": at head_blend=0 the tracker is
        # bit-identical to random init, and every blend>0 only ever ADDS
        # the head's discrimination on top of an untouched trunk landscape.
        def freeze_head_only(tree):
            out = jax.tree.map(jnp.zeros_like, tree)
            return dict(out, head=tree["head"])

        return freeze_head_only
    n = cfg.train.freeze_prefix
    if n <= 0:
        return None
    import numpy as onp

    depth = _train_embed_spec(cfg).vit.depth
    if n >= depth:
        raise ValueError(
            f"train.freeze_prefix {n} must be < model depth {depth}"
        )
    mvec = jnp.asarray(onp.r_[onp.zeros(n), onp.ones(depth - n)])

    def freeze(tree):
        blocks = jax.tree.map(
            lambda g: g * mvec.astype(g.dtype).reshape((depth,) + (1,) * (g.ndim - 1)),
            tree["blocks"],
        )
        zeros = jax.tree.map(jnp.zeros_like, (tree["patch_embed"], tree["pos_embed"]))
        return dict(
            tree, blocks=blocks, patch_embed=zeros[0], pos_embed=zeros[1]
        )

    return freeze


def make_data_mesh(n_devices: int):
    """One-axis ("data",) mesh over the first n devices."""
    import numpy as np_

    from jax.sharding import Mesh

    devs = np_.asarray(jax.devices()[:n_devices])
    return Mesh(devs, ("data",))


def train_features(cfg, log=None) -> dict:
    """Run the training loop; returns the trained param pytree.

    Writes the checkpoint to cfg.train.checkpoint_out (versioned npz/orbax
    via models/params.py) and per-log-interval metrics JSONL to
    cfg.train.metrics_out (or stderr)."""
    tr = cfg.train
    if log is None:
        log = lambda s: print(s, file=sys.stderr)
    # Data-parallel over every visible device (VERDICT r2 #6): the batch
    # shards over a ("data",) mesh, params/optimizer replicate, GSPMD
    # inserts the gradient AllReduce. Single device (this rig's one chip)
    # -> no mesh, identical program to before.
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and tr.batch_size % n_dev == 0:
        mesh = make_data_mesh(n_dev)
        log(f"data-parallel training over {n_dev} devices")
    elif n_dev > 1:
        log(
            f"train.batch_size {tr.batch_size} not divisible by {n_dev} "
            "devices; running single-device"
        )
    init_fn, step_fn = build_train_step(cfg, mesh=mesh)
    init_jit = jax.jit(init_fn)
    step_jit = jax.jit(step_fn, donate_argnums=(0, 1))

    probe = None
    if tr.eval_every > 0:
        from vitparticlefiltertracker_tpu.training.probe import make_probe

        probe = make_probe(
            cfg,
            clips=tuple(tr.eval_clips),
            frames=tr.eval_frames,
            num_particles=tr.eval_particles,
        )
    best = {"rmse": float("inf"), "params": None, "step": 0}

    def run_probe(step_i: int) -> dict:
        pm = probe(params)
        if pm["probe_rmse"] < best["rmse"]:
            best.update(
                rmse=pm["probe_rmse"], params=jax.device_get(params), step=step_i
            )
        return pm

    params, opt_state = init_jit()
    # model.checkpoint in a TRAIN config: initialize from existing weights
    # instead of random init — continue a previous run, or train the
    # residual head ON TOP OF an imported pretrained trunk (e.g. a
    # tools/import_vit.py HF checkpoint: real-video deployments want the
    # pretrained features AND the in-repo discriminative head). The loaded
    # trunk replaces the random one (cast to f32 masters); a fresh head
    # from init_fn is kept when the file has none. AdamW state needs no
    # rebuild — its mu/nu are zeros regardless of the params' values.
    trunk_from_seed = True
    if cfg.model.checkpoint:
        from vitparticlefiltertracker_tpu.models.params import load_params
        from vitparticlefiltertracker_tpu.models.vit import init_vit_params

        ck = load_params(cfg.model.checkpoint)
        ck_seed = ck.pop("__trunk_seed__", None) if isinstance(ck, dict) else None
        if ck_seed is not None:
            # head-only file: regenerate its frozen trunk (models/params.py)
            es_full = _train_embed_spec(cfg)
            trunk = jax.jit(init_vit_params, static_argnames="spec")(
                jax.random.key(int(ck_seed) ^ 0x5EED), es_full.vit
            )
            ck = dict(trunk, head=ck["head"])
        ck = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), ck)
        if cfg.model.head_depth > 0 and "head" not in ck:
            ck = dict(ck, head=params["head"])  # fresh head on loaded trunk
        params = jax.device_put(ck)
        # Head-only SAVING stays valid only if the trunk is still exactly
        # the seeded random init this config would regenerate at load.
        trunk_from_seed = ck_seed is not None and int(ck_seed) == cfg.filter.seed
        log(
            f"initialized from {cfg.model.checkpoint}"
            + (" (head-only: trunk regenerated)" if ck_seed is not None else "")
        )
    if probe is not None:
        # Step-0 probe: the random-init baseline under IDENTICAL probe
        # settings — the apples-to-apples reference every later probe is
        # judged against. Logged only; NOT eligible for checkpoint
        # selection ("trained" must mean trained).
        log(json.dumps({k: round(v, 2) for k, v in probe(params).items()}
                       | {"step": 0}))
    if tr.metrics_out:
        os.makedirs(os.path.dirname(tr.metrics_out) or ".", exist_ok=True)
    metrics_f = open(tr.metrics_out, "w") if tr.metrics_out else None
    t0 = time.perf_counter()
    try:
        for i in range(tr.steps):
            params, opt_state, metrics = step_jit(params, opt_state, jnp.int32(i))
            logging = (i + 1) % tr.log_every == 0 or i + 1 == tr.steps
            probing = probe is not None and (
                (i + 1) % tr.eval_every == 0 or i + 1 == tr.steps
            )
            if logging or probing:
                # The only host sync of the loop (readback forces completion
                # of every dispatched step — this rig's block_until_ready is
                # a no-op, see runtime/benchmark.py).
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                if probing:
                    m.update({k: round(v, 2) for k, v in run_probe(i + 1).items()})
                m["step"] = i + 1
                m["wall_s"] = round(time.perf_counter() - t0, 2)
                line = json.dumps(m)
                log(line)
                if metrics_f:
                    metrics_f.write(line + "\n")
                    metrics_f.flush()
    finally:
        if metrics_f:
            metrics_f.close()
        # Save inside finally: a killed/interrupted run (this rig's relay
        # stalls for 10+ min at a time and long runs ride a `timeout`)
        # still keeps its probe-selected best checkpoint instead of
        # losing the whole run. The device params may be unreachable when
        # the relay is wedged — but best["params"] is already host-side
        # (device_get at probe time), so the save never touches the device.
        if best["params"] is not None:
            log(
                f"checkpoint selection: step {best['step']} "
                f"(probe_rmse {best['rmse']:.2f}px) of {tr.steps}"
            )
            params = best["params"]
        elif tr.checkpoint_out:
            params = jax.device_get(params)  # last step (no probe configured)
        if tr.checkpoint_out:
            os.makedirs(os.path.dirname(tr.checkpoint_out) or ".", exist_ok=True)
            to_save = jax.device_get(params)
            if tr.checkpoint_dtype == "bfloat16":
                to_save = jax.tree.map(lambda x: x.astype(jnp.bfloat16), to_save)
            # Residual-head runs: the trunk is byte-frozen random init
            # (freeze_head_only), so store ONLY the head + the seed that
            # regenerates the trunk (save_params trunk_seed) — a ViT-L f32
            # checkpoint shrinks ~1.25 GB -> ~50 MB. checkpoint_dtype only
            # quantizes the stored head leaves; the trunk is regenerated in
            # pristine f32 either way.
            if cfg.model.head_depth > 0 and trunk_from_seed:
                save_params(
                    tr.checkpoint_out, to_save, trunk_seed=cfg.filter.seed
                )
            else:
                # Imported/non-seeded trunk: the full tree must be stored
                # (a trunk_seed marker would regenerate the WRONG trunk).
                save_params(tr.checkpoint_out, to_save)
            log(f"saved {tr.checkpoint_out}")
    return params
