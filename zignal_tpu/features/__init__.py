"""Vision features: FAST, ORB, binary descriptors, matching, tracing
(reference: src/features/)."""

from .descriptor import BinaryDescriptor
from .fast import Fast, KeyPoint
from .matcher import BruteForceMatcher, Match
from .orb import Orb
from .tracer import Tracer

__all__ = ["KeyPoint", "Fast", "Orb", "BinaryDescriptor",
           "BruteForceMatcher", "Match", "Tracer"]
