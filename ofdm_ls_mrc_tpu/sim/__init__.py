"""Synthetic channel, constellations, and PN frame-sync (hardware stand-ins)."""

from .channel import (
    CONSTELLATIONS,
    ChannelModel,
    demap_symbols,
    evm_db,
    make_tx_frame,
    map_symbols,
    random_symbols,
)
from .pn import correlate_frame_start, frame_start_payload, max_len_sequence
from .sync import StreamSynchronizer

__all__ = [
    "CONSTELLATIONS",
    "ChannelModel",
    "correlate_frame_start",
    "demap_symbols",
    "evm_db",
    "frame_start_payload",
    "make_tx_frame",
    "map_symbols",
    "max_len_sequence",
    "random_symbols",
    "StreamSynchronizer",
]
