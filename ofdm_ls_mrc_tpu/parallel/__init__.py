"""Sharding layer: (ant, time) mesh, psum-based MRC, multi-host helpers."""

from .mesh import (
    ANT_AXIS,
    TIME_AXIS,
    frame_sharding,
    make_mesh,
    output_sharding,
    pilot_sharding,
)
from .multihost import (
    global_from_antenna_blocks,
    global_from_host_blocks,
    initialize,
    make_multihost_mesh,
)
from .sharded import ShardedUplinkReceiver
from .sharded_downlink import ShardedDownlinkTransmitter
from .streaming import ShardedStreamingDemodulator

__all__ = [
    "ANT_AXIS",
    "TIME_AXIS",
    "ShardedDownlinkTransmitter",
    "ShardedStreamingDemodulator",
    "ShardedUplinkReceiver",
    "frame_sharding",
    "global_from_antenna_blocks",
    "global_from_host_blocks",
    "initialize",
    "make_multihost_mesh",
    "make_mesh",
    "output_sharding",
    "pilot_sharding",
]
