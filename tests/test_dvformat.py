"""Delta deletion-vector format (dvformat.py): Z85 against the ZeroMQ spec
vector, portable RoaringBitmapArray round-trips across container shapes,
run-container PARSING (real writers emit runs; our writer never does), the
on-disk framing (version byte, big-endian size, CRC-32), and descriptor
integrity checks. No Spark needed."""

from __future__ import annotations

import zlib
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_cdc_engine import dvformat as dv


# ---------------------------------------------------------------------- Z85


def test_z85_spec_vector():
    # rfc.zeromq.org/spec/32 reference test case
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError, match="aligned"):
        dv.z85_encode(b"abc")
    with pytest.raises(ValueError, match="aligned"):
        dv.z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid"):
        dv.z85_decode('abcd"')  # '"' is not in the Z85 alphabet (by design)


@given(st.binary(min_size=0, max_size=64).map(lambda b: b + b"\x00" * (-len(b) % 4)))
def test_z85_round_trips(data):
    assert dv.z85_decode(dv.z85_encode(data)) == data


# ------------------------------------------------------------ roaring array


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 2**16),          # array containers
            st.integers(0, 2**33),          # multiple 32-bit bitmaps
            st.integers(2**32 - 3, 2**32 + 3),  # key boundary
        ),
        max_size=300,
    )
)
def test_roaring_array_round_trips(positions):
    assert dv.parse_roaring_array(
        dv.serialize_roaring_array(positions)
    ) == sorted(set(positions))


def test_roaring_bitmap_container_round_trips():
    # >4096 values under one 16-bit key forces a bitmap container
    vals = list(range(0, 60000, 7)) + [2**32 + 5]
    assert dv.parse_roaring_array(dv.serialize_roaring_array(vals)) == sorted(
        set(vals)
    )


def test_roaring_run_container_parses():
    """Hand-craft a SERIAL_COOKIE (12347) bitmap with one run container —
    the shape RoaringBitmap's runOptimize() writes for dense deletes, which
    our serializer never produces but real DV files contain."""
    n = 1
    cookie = (12347 | ((n - 1) << 16)).to_bytes(4, "little")
    run_flags = bytes([0b1])              # container 0 is a run
    desc = (5).to_bytes(2, "little") + (11 - 1).to_bytes(2, "little")  # key=5
    # no offset header: has_run and n < 4
    body = (2).to_bytes(2, "little")      # two runs
    body += (10).to_bytes(2, "little") + (3).to_bytes(2, "little")   # 10..13
    body += (100).to_bytes(2, "little") + (6).to_bytes(2, "little")  # 100..106
    bitmap32 = cookie + run_flags + desc + body
    payload = (
        dv.MAGIC_NUMBER.to_bytes(4, "little")
        + (1).to_bytes(8, "little")
        + (2).to_bytes(4, "little")       # high key 2 -> +2**33
        + bitmap32
    )
    want = [(2 << 32) | (5 << 16) | v for v in
            list(range(10, 14)) + list(range(100, 107))]
    assert dv.parse_roaring_array(payload) == want


def test_roaring_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        dv.parse_roaring_array(b"\x00" * 16)
    with pytest.raises(ValueError, match="cookie"):
        payload = dv.MAGIC_NUMBER.to_bytes(4, "little") + (1).to_bytes(
            8, "little"
        ) + (0).to_bytes(4, "little") + (999).to_bytes(4, "little")
        dv.parse_roaring_array(payload)


# ------------------------------------------------------- files + descriptors


def test_dv_file_framing_and_descriptor(tmp_path):
    desc = dv.write_dv_file(tmp_path, [1, 5, 2**34], random_prefix="xy")
    assert desc["storageType"] == "u" and desc["cardinality"] == 3
    fp = dv.dv_file_path(desc, tmp_path)
    assert fp.parent.name == "xy" and fp.name.startswith("deletion_vector_")
    blob = fp.read_bytes()
    assert blob[0] == dv.DV_FILE_FORMAT_VERSION
    size = int.from_bytes(blob[1:5], "big")
    assert size == desc["sizeInBytes"]
    payload = blob[5 : 5 + size]
    assert int.from_bytes(blob[5 + size : 9 + size], "big") == (
        zlib.crc32(payload) & 0xFFFFFFFF
    )
    assert dv.dv_positions(desc, tmp_path) == [1, 5, 2**34]


def test_inline_descriptor_round_trips_odd_lengths(tmp_path):
    # single 2-byte array value makes the payload non-4-byte-aligned: the
    # encoder zero-pads, sizeInBytes records the truth
    for vals in ([7], [7, 9], [7, 9, 11], list(range(5))):
        d = dv.inline_descriptor(vals)
        assert dv.dv_positions(d, tmp_path) == sorted(vals)


def test_descriptor_integrity_failures(tmp_path):
    desc = dv.write_dv_file(tmp_path, list(range(20)))
    fp = dv.dv_file_path(desc, tmp_path)
    blob = bytearray(fp.read_bytes())
    blob[10] ^= 0xFF
    fp.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        dv.dv_positions(desc, tmp_path)
    with pytest.raises(ValueError, match="sizeInBytes"):
        dv.dv_positions({**desc, "sizeInBytes": 5}, tmp_path)
    fp.unlink()
    with pytest.raises(ValueError, match="missing"):
        dv.dv_positions(desc, tmp_path)
    good = dv.write_dv_file(tmp_path, [1, 2, 3])
    with pytest.raises(ValueError, match="cardinality"):
        dv.dv_positions({**good, "cardinality": 99}, tmp_path)
    with pytest.raises(ValueError, match="storageType"):
        dv.dv_positions({"storageType": "z", "pathOrInlineDv": ""}, tmp_path)


def test_p_storage_type_absolute_path(tmp_path):
    desc = dv.write_dv_file(tmp_path, [4, 8])
    abs_desc = {
        **desc,
        "storageType": "p",
        "pathOrInlineDv": str(dv.dv_file_path(desc, tmp_path)),
    }
    assert dv.dv_positions(abs_desc, Path("/nonexistent")) == [4, 8]
