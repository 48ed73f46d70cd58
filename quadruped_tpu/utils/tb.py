"""Minimal dependency-free TensorBoard scalar writer.

The reference logs scalars through SB3's TensorBoard writer; round-1 used
torch.utils.tensorboard, whose libtensorflow_framework backend segfaulted
mid-training (observed at iteration 4 of the first 5M-step run, dmesg:
"segfault ... in libtensorflow_framework.so.2").  Scalar events are tiny
and the formats are stable, so this encodes them directly:

  * tfevents file = sequence of TFRecords: len(u64 LE) | masked crc32c of
    len | payload | masked crc32c of payload
  * payload = Event proto: wall_time(1, double), step(2, varint),
    summary(5) { value(1) { tag(1, string), simple_value(2, float) } }

Readable by TensorBoard and tensorboard.backend event accumulators.
"""

from __future__ import annotations

import struct
import time
from pathlib import Path

_CRC_TABLE = []
_POLY = 0x82F63B78  # Castagnoli, reflected


def _crc32c(data: bytes) -> int:
    if not _CRC_TABLE:
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ _POLY if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _event_proto(tag: str, value: float, step: int, wall: float) -> bytes:
    tag_b = tag.encode()
    val = (
        _field(1, 2) + _varint(len(tag_b)) + tag_b
        + _field(2, 5) + struct.pack("<f", float(value))
    )
    summary = _field(1, 2) + _varint(len(val)) + val
    return (
        _field(1, 1) + struct.pack("<d", wall)
        + _field(2, 0) + _varint(int(step))
        + _field(5, 2) + _varint(len(summary)) + summary
    )


class SummaryWriter:
    """add_scalar/close-compatible subset of torch's SummaryWriter."""

    def __init__(self, log_dir: str):
        d = Path(log_dir)
        d.mkdir(parents=True, exist_ok=True)
        import socket

        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.qtpu"
        )
        self._f = open(d / fname, "ab")
        # file-version header event expected by readers
        self._write(
            _field(1, 1) + struct.pack("<d", time.time())
            + _field(3, 2) + _varint(len(b"brain.Event:2")) + b"brain.Event:2"
        )

    def _write(self, payload: bytes):
        hdr = struct.pack("<Q", len(payload))
        self._f.write(
            hdr + struct.pack("<I", _masked_crc(hdr))
            + payload + struct.pack("<I", _masked_crc(payload))
        )

    def add_scalar(self, tag: str, value, step: int):
        self._write(_event_proto(tag, float(value), step, time.time()))
        self._f.flush()

    def close(self):
        self._f.close()
