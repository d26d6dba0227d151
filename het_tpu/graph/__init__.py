from .structures import CompactInfo, HeteroGraph, Segments  # noqa: F401
from .build import build_heterograph, build_segments, reverse_heterograph  # noqa: F401
from .synth import random_heterograph  # noqa: F401
