"""Dependency-free TensorBoard event-file writer.

The reference trains with ``--report_to tensorboard``
(``finetune_hyperlora.sh:92``); this provides the same observability
without pulling tensorflow/tensorboardX into the runtime. It emits
standard TFRecord-framed Event protos (scalars), hand-encoded:

  record  = len(u64 LE) + masked_crc32c(len) + data + masked_crc32c(data)
  Event   = {1: wall_time (double), 2: step (varint),
             3: file_version (string) | 5: Summary}
  Summary = {1: repeated Value{1: tag (string), 2: simple_value (float)}}

Verified round-trip against TensorFlow's own summary_iterator in
tests/test_tools.py.
"""

from __future__ import annotations

import os
import struct
import time
from typing import Optional

# crc32c (Castagnoli, reflected poly 0x82F63B78) — table-driven
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _string_field(num: int, s: bytes) -> bytes:
    return _field(num, 2) + _varint(len(s)) + s


def _event(wall_time: float, step: int, *, file_version: Optional[str] = None,
           summary: Optional[bytes] = None) -> bytes:
    msg = _field(1, 1) + struct.pack("<d", wall_time)
    msg += _field(2, 0) + _varint(step)
    if file_version is not None:
        msg += _string_field(3, file_version.encode())
    if summary is not None:
        msg += _string_field(5, summary)
    return msg


class TBWriter:
    """Minimal SummaryWriter: scalars only (the reference logs loss/lr)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.crab_tpu"
        self._f = open(os.path.join(log_dir, fname), "wb")
        self._write(_event(time.time(), 0, file_version="brain.Event:2"))

    def _write(self, data: bytes):
        hdr = struct.pack("<Q", len(data))
        self._f.write(hdr)
        self._f.write(struct.pack("<I", _masked_crc(hdr)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int):
        val = _string_field(1, tag.encode()) + _field(2, 5) + struct.pack(
            "<f", float(value)
        )
        summary = _string_field(1, val)
        self._write(_event(time.time(), int(step), summary=summary))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()
