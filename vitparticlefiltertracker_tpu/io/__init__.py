from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.io.sink import JsonlSink, make_sink

__all__ = ["open_source", "JsonlSink", "make_sink"]
