from vitparticlefiltertracker_tpu.oracle.numpy_filter import (
    OracleParams,
    OracleState,
    effective_sample_size,
    estimate_state,
    init_state,
    normalize_log_weights,
    propagate,
    step,
    systematic_resample_indices,
)

__all__ = [
    "OracleParams",
    "OracleState",
    "effective_sample_size",
    "estimate_state",
    "init_state",
    "normalize_log_weights",
    "propagate",
    "step",
    "systematic_resample_indices",
]
