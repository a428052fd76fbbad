"""TensorBoard event writer: CRC vectors, framing, scalar round-trip.

The writer replaces the reference's TF1 summary logging
(training/sb_helper.py:40-53 TensorboardCallback) without a TF dependency;
read_events verifies records exactly as TensorBoard's RecordReader does.
"""

import os
import struct

from deep_rl_grasping_tpu.utils import tb_events as tb


def test_crc32c_vectors():
    # RFC 3720 / standard test vectors
    assert tb.crc32c(b"") == 0x00000000
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masked_crc_matches_tfrecord_convention():
    data = b"hello world"
    crc = tb.crc32c(data)
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert tb.masked_crc32c(data) == expect


def test_varint_framing_roundtrip(tmp_path):
    w = tb.TensorBoardWriter(str(tmp_path))
    w.add_scalars(10, {"success_rate": 0.5, "lambda": 0.25})
    w.add_scalars(2_000_000, {"loss": -123.5})
    w.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out.tfevents.")]
    assert len(files) == 1
    events = list(tb.read_events(os.path.join(tmp_path, files[0])))
    # First record is the brain.Event:2 file header.
    assert events[0][2] == {}
    step, wall, scalars = events[1]
    assert step == 10
    assert abs(scalars["success_rate"] - 0.5) < 1e-6
    assert abs(scalars["lambda"] - 0.25) < 1e-6
    step2, _, scalars2 = events[2]
    assert step2 == 2_000_000  # multi-byte varint step
    assert abs(scalars2["loss"] + 123.5) < 1e-4


def test_corruption_detected(tmp_path):
    w = tb.TensorBoardWriter(str(tmp_path))
    w.add_scalars(1, {"x": 1.0})
    w.close()
    fname = [f for f in os.listdir(tmp_path)][0]
    path = os.path.join(tmp_path, fname)
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF  # flip a payload byte in the last record
    open(path, "wb").write(bytes(blob))
    try:
        list(tb.read_events(path))
        raised = False
    except ValueError:
        raised = True
    assert raised
