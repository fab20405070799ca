"""Receiver/transmitter pipelines (the framework's 'model' families)."""

from .downlink import DownlinkTransmitter
from .uplink import UplinkReceiver

__all__ = ["DownlinkTransmitter", "UplinkReceiver"]
