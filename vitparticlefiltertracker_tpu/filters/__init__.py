from vitparticlefiltertracker_tpu.filters.particle import (
    MotionParams,
    PFParams,
    PFState,
    draw_step_noise,
    effective_sample_size,
    estimate_state,
    init_state,
    pf_step,
    pf_update,
    propagate,
)

__all__ = [
    "MotionParams",
    "PFParams",
    "PFState",
    "draw_step_noise",
    "effective_sample_size",
    "estimate_state",
    "init_state",
    "pf_step",
    "pf_update",
    "propagate",
]
