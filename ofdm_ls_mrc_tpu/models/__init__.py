"""Receiver/transmitter pipelines (the framework's 'model' families)."""

from .downlink import DownlinkTransmitter
from .streaming import StreamingDemodulator
from .uplink import UplinkReceiver

__all__ = ["DownlinkTransmitter", "StreamingDemodulator", "UplinkReceiver"]
