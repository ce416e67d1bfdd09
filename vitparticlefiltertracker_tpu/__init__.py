"""TPU-native visual object tracking: ViT appearance model + particle filter.

A from-scratch, TPU-first framework with the capabilities described by the
reference project ViTParticleFilterTracker (/root/reference/README.md:1-63):
a config.yaml-driven tracker that consumes a video feed or image sequence and
emits per-frame object positions in real time, combining a Vision Transformer
appearance model (README.md:7) with a particle filter for state estimation
(README.md:8).

Design (see SURVEY.md §1.2): the per-frame step is ONE jitted on-device
function — preprocess -> propagate -> feature extraction -> likelihood ->
estimate -> resample — with no host round-trips; scale comes from vmap over
particles and filter banks and jax.sharding over a TPU mesh.
"""

__version__ = "0.1.0"

from vitparticlefiltertracker_tpu.config import Config, load_config

# Heavier entry points resolve lazily (PEP 562) so `import
# vitparticlefiltertracker_tpu` stays cheap and jax-free until used:
# Tracker / MultiTracker / MultiStreamTracker, stream_track, open_source.
_LAZY = {
    "Tracker": ("vitparticlefiltertracker_tpu.runtime.tracker", "Tracker"),
    "MultiTracker": ("vitparticlefiltertracker_tpu.runtime.banked", "MultiTracker"),
    "MultiStreamTracker": (
        "vitparticlefiltertracker_tpu.runtime.banked",
        "MultiStreamTracker",
    ),
    "stream_track": (
        "vitparticlefiltertracker_tpu.runtime.streaming",
        "stream_track",
    ),
    "open_source": ("vitparticlefiltertracker_tpu.io.video", "open_source"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Config", "load_config", "__version__", *sorted(_LAZY)]
