"""Delta Lake deletion-vector (DV) format: Z85, portable RoaringBitmapArray,
and the on-disk DV file framing — pure Python (stdlib only).

Everything here implements PUBLIC specifications:

- delta.io PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format":
  the descriptor (``storageType``/``pathOrInlineDv``/``offset``/
  ``sizeInBytes``/``cardinality``), the Z85 encoding of inline data and of
  the UUID in on-disk paths, the DV file framing (1-byte format version,
  then per-DV ``<dataSize: 4-byte big-endian><bitmap bytes><CRC-32 of the
  bitmap bytes: 4-byte big-endian>``), and the "portable" 64-bit
  RoaringBitmapArray serialization (magic 1681511377 little-endian, 8-byte
  little-endian bitmap count, then per bitmap a 4-byte little-endian high
  key followed by a standard 32-bit RoaringBitmap).
- RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec): the
  standard 32-bit serialization — cookies 12346 (no run containers; 4-byte
  container count follows) and 12347 (run containers; count-1 in the
  cookie's high 16 bits, then a run-flag bitset), the descriptive header of
  ``(key, cardinality-1)`` pairs, the optional offset header, and array
  (2-byte values) / bitmap (8 KiB) / run (count + start,length pairs)
  containers.
- Z85 (ZeroMQ spec 32, rfc.zeromq.org/spec/32): 4 bytes -> 5 chars over the
  85-character alphabet below. NOT Python's ``base64.b85*`` (RFC 1924 uses a
  different alphabet).

Why a from-scratch implementation: modern delta-spark (3.4+) enables DVs by
default for DELETE/UPDATE, so most real Delta tables in the wild carry them;
:func:`pyspark_cdc_engine.delta_export.read_delta_snapshot` needs to apply
them without delta jars. The writer half exists so local tests (and the
realjars lane's cross-check) can fabricate byte-exact DV files and verify
the reader against independently-constructed position sets.

The deserialized form used throughout is a sorted list of 64-bit row
indexes (Delta DV semantics: the positions WITHIN the data file whose rows
are deleted).
"""

from __future__ import annotations

import uuid as _uuid
import zlib
from pathlib import Path

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

MAGIC_NUMBER = 1681511377  # RoaringBitmapArray portable format (PROTOCOL.md)
_SERIAL_COOKIE_NO_RUN = 12346  # RoaringFormatSpec
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # containers above this cardinality serialize as bitmaps
DV_FILE_FORMAT_VERSION = 1


# ------------------------------------------------------------------- Z85


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input must be 5-char aligned, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("Z85 quintet overflows 32 bits")
        out += n.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------- 32-bit RoaringBitmap (standard)


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard 32-bit RoaringBitmap starting at ``pos``; returns
    (sorted values, next offset). Handles both cookies and all three
    container types; the offset header, when present, is skipped (containers
    are read sequentially)."""
    cookie = int.from_bytes(buf[pos : pos + 4], "little")
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = int.from_bytes(buf[pos : pos + 4], "little")
        pos += 4
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"not a RoaringBitmap: cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        keys.append(int.from_bytes(buf[pos : pos + 2], "little"))
        cards.append(int.from_bytes(buf[pos + 2 : pos + 4], "little") + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # sequential read; offsets not needed
    values: list[int] = []
    for i in range(n):
        hi = keys[i] << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            n_runs = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
            for _ in range(n_runs):
                start = int.from_bytes(buf[pos : pos + 2], "little")
                length = int.from_bytes(buf[pos + 2 : pos + 4], "little")
                pos += 4
                values.extend(hi | v for v in range(start, start + length + 1))
        elif cards[i] <= _ARRAY_MAX:
            for _ in range(cards[i]):
                values.append(hi | int.from_bytes(buf[pos : pos + 2], "little"))
                pos += 2
        else:
            words = buf[pos : pos + 8192]
            pos += 8192
            base = 0
            for byte in words:
                while byte:
                    low = byte & -byte
                    values.append(hi | (base + low.bit_length() - 1))
                    byte ^= low
                base += 8
    return values, pos


def _serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted 32-bit values with cookie 12346 (array/bitmap
    containers only — the no-run format every reader must accept)."""
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if not containers or containers[-1][0] != key:
            containers.append((key, []))
        containers[-1][1].append(low)
    n = len(containers)
    head = _SERIAL_COOKIE_NO_RUN.to_bytes(4, "little") + n.to_bytes(4, "little")
    desc = b"".join(
        k.to_bytes(2, "little") + (len(lows) - 1).to_bytes(2, "little")
        for k, lows in containers
    )
    bodies: list[bytes] = []
    for _, lows in containers:
        if len(lows) <= _ARRAY_MAX:
            bodies.append(b"".join(v.to_bytes(2, "little") for v in lows))
        else:
            bits = bytearray(8192)
            for v in lows:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
    # offset header: from the start of this bitmap's serialization
    offsets = []
    base = len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(base)
        base += len(b)
    off = b"".join(o.to_bytes(4, "little") for o in offsets)
    return head + desc + off + b"".join(bodies)


# -------------------------------------------- 64-bit RoaringBitmapArray


def serialize_roaring_array(positions) -> bytes:
    """Portable-format RoaringBitmapArray bytes for a set of 64-bit row
    indexes — what a DV file's framed payload (or an inline descriptor's
    Z85 text) contains."""
    ordered = sorted(set(int(p) for p in positions))
    if ordered and ordered[0] < 0:
        raise ValueError("row indexes must be non-negative")
    groups: list[tuple[int, list[int]]] = []
    for p in ordered:
        hi, lo = p >> 32, p & 0xFFFFFFFF
        if not groups or groups[-1][0] != hi:
            groups.append((hi, []))
        groups[-1][1].append(lo)
    out = bytearray()
    out += MAGIC_NUMBER.to_bytes(4, "little")
    out += len(groups).to_bytes(8, "little")
    for hi, lows in groups:
        out += hi.to_bytes(4, "little")
        out += _serialize_roaring32(lows)
    return bytes(out)


def parse_roaring_array(data: bytes) -> list[int]:
    """Sorted 64-bit row indexes from portable RoaringBitmapArray bytes."""
    if len(data) < 12:
        raise ValueError(f"RoaringBitmapArray too short ({len(data)} bytes)")
    magic = int.from_bytes(data[0:4], "little")
    if magic != MAGIC_NUMBER:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC_NUMBER})"
        )
    n_bitmaps = int.from_bytes(data[4:12], "little")
    pos = 12
    values: list[int] = []
    for _ in range(n_bitmaps):
        hi = int.from_bytes(data[pos : pos + 4], "little") << 32
        pos += 4
        vals32, pos = _parse_roaring32(data, pos)
        values.extend(hi | v for v in vals32)
    if pos > len(data):
        raise ValueError("RoaringBitmapArray truncated")
    return values


# --------------------------------------------------- descriptors + files


def dv_file_path(descriptor: dict, table_root: Path) -> Path:
    """Absolute path of an on-disk DV ('u': table-relative with the optional
    random prefix directory; 'p': absolute/relative path as written)."""
    st = descriptor["storageType"]
    pod = descriptor["pathOrInlineDv"]
    if st == "u":
        prefix, enc = pod[:-20], pod[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        name = f"deletion_vector_{u}.bin"
        return (table_root / prefix / name) if prefix else (table_root / name)
    if st == "p":
        p = Path(pod)
        return p if p.is_absolute() else table_root / p
    raise ValueError(f"storageType {st!r} has no file path")


def dv_positions(descriptor: dict, table_root: Path) -> list[int]:
    """Deleted row indexes for one descriptor: resolve inline ('i') or
    on-disk ('u'/'p') storage, verify the file framing (size + CRC-32)
    against the descriptor, parse the bitmap, and cross-check
    ``cardinality``. Every integrity failure raises — silently resurrecting
    or over-deleting rows is the failure mode this file exists to prevent."""
    st = descriptor["storageType"]
    if st == "i":
        payload = z85_decode(descriptor["pathOrInlineDv"])
        declared = descriptor.get("sizeInBytes")
        if declared is not None:
            # Z85 is 4-byte aligned; the true payload may be shorter (the
            # encoder zero-pads) — sizeInBytes records the real length
            if int(declared) > len(payload):
                raise ValueError(
                    f"inline DV sizeInBytes={declared} > {len(payload)} decoded"
                )
            payload = payload[: int(declared)]
    elif st in ("u", "p"):
        fp = dv_file_path(descriptor, table_root)
        if not fp.is_file():
            raise ValueError(f"deletion vector file missing: {fp}")
        blob = fp.read_bytes()
        off = int(descriptor["offset"])
        size = int(descriptor["sizeInBytes"])
        data_size = int.from_bytes(blob[off : off + 4], "big")
        if data_size != size:
            raise ValueError(
                f"DV framing mismatch at {fp}:{off}: stored size "
                f"{data_size} != descriptor sizeInBytes {size}"
            )
        payload = blob[off + 4 : off + 4 + size]
        if len(payload) != size:
            raise ValueError(f"DV file truncated: {fp}")
        want_crc = int.from_bytes(blob[off + 4 + size : off + 8 + size], "big")
        got_crc = zlib.crc32(payload) & 0xFFFFFFFF
        if want_crc != got_crc:
            raise ValueError(
                f"DV checksum mismatch at {fp}:{off}: {got_crc} != {want_crc}"
            )
    else:
        raise ValueError(f"unsupported DV storageType {st!r}")
    positions = parse_roaring_array(payload)
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, "
            f"bitmap holds {len(positions)}"
        )
    return positions


def write_dv_file(
    table_root: Path, positions, random_prefix: str = ""
) -> dict:
    """Write an on-disk ('u') DV exactly as delta-spark's
    DeletionVectorStore does — version byte, big-endian size framing,
    CRC-32 — and return the add-action descriptor dict. Test/export
    tooling; the read path never calls this."""
    payload = serialize_roaring_array(positions)
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    target_dir = table_root / random_prefix if random_prefix else table_root
    target_dir.mkdir(parents=True, exist_ok=True)
    offset = 1  # right after the format-version byte
    blob = (
        bytes([DV_FILE_FORMAT_VERSION])
        + len(payload).to_bytes(4, "big")
        + payload
        + (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    (target_dir / name).write_bytes(blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": f"{random_prefix}{z85_encode(u.bytes)}",
        "offset": offset,
        "sizeInBytes": len(payload),
        "cardinality": len(set(int(p) for p in positions)),
    }


def inline_descriptor(positions) -> dict:
    """An inline ('i') descriptor carrying the bitmap in the JSON itself.
    Z85 needs 4-byte alignment, so the payload is zero-padded for encoding;
    ``sizeInBytes`` records the true length (the reader truncates)."""
    payload = serialize_roaring_array(positions)
    padded = payload + b"\x00" * (-len(payload) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(payload),
        "cardinality": len(set(int(p) for p in positions)),
    }
