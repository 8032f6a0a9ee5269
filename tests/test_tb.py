"""TensorBoard event-file writer (utils/tb.py): TFRecord framing, CRC32C
masking, and Event/Summary proto wire format — round-tripped through our
own CRC-validating reader and, when the real tensorboard package exists,
through its loader too."""
import struct

import pytest

from vln_goat_tpu.utils.tb import (TensorBoardWriter, _crc32c, _masked_crc,
                                   read_events)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_writer_roundtrip(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as w:
        w.add_scalar("loss", 1.5, step=10)
        w.add_scalar("train/sr", 0.25, step=10, wall_time=123.0)
        w.add_scalars({"a": 1.0, "b": 2.0}, step=11)
        path = w.path
    events = read_events(path)
    # first event is the file_version header
    assert events[0][2] == {}
    scal = [(e[1], e[2]) for e in events[1:]]
    assert scal[0] == (10, {"loss": 1.5})
    assert scal[1][1] == {"train/sr": 0.25}
    assert events[2][0] == 123.0
    assert scal[2] == (11, {"a": 1.0})
    assert scal[3] == (11, {"b": 2.0})


def test_framing_and_crc(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as w:
        w.add_scalar("x", 3.0, step=1)
        path = w.path
    raw = open(path, "rb").read()
    (n,) = struct.unpack("<Q", raw[:8])
    (hc,) = struct.unpack("<I", raw[8:12])
    assert hc == _masked_crc(raw[:8])
    payload = raw[12:12 + n]
    (pc,) = struct.unpack("<I", raw[12 + n:16 + n])
    assert pc == _masked_crc(payload)
    # corrupting a payload byte must trip the reader's CRC check
    bad = tmp_path / "bad"
    bad.write_bytes(raw[:13] + bytes([raw[13] ^ 0xFF]) + raw[14:])
    with pytest.raises(AssertionError):
        read_events(str(bad))


def test_real_tensorboard_can_read(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing"
                             ".event_file_loader")
    with TensorBoardWriter(str(tmp_path)) as w:
        w.add_scalar("loss", 0.5, step=7)
        path = w.path
    events = list(tb.EventFileLoader(path).Load())
    # modern tensorboard auto-upgrades simple_value into a DT_FLOAT tensor
    # proto on load; accept either representation
    tags = []
    for e in events:
        if not e.HasField("summary"):
            continue
        for v in e.summary.value:
            val = (v.simple_value if v.HasField("simple_value")
                   else v.tensor.float_val[0])
            tags.append((v.tag, val, e.step))
    assert ("loss", 0.5, 7) in tags
