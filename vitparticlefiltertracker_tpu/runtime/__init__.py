from vitparticlefiltertracker_tpu.runtime.tracker import Tracker, TrackerState

__all__ = ["Tracker", "TrackerState"]
