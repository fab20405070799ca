"""Host IO: native shm ring bindings, async device feed, file formats."""

from .feed import FrameAssembler, RingFeed
from .ring import RingError, RingShutdown, RingTimeout, SymbolRing
from .state import load_estimate, save_estimate

__all__ = [
    "FrameAssembler",
    "RingError",
    "RingFeed",
    "RingShutdown",
    "RingTimeout",
    "SymbolRing",
    "load_estimate",
    "save_estimate",
]
