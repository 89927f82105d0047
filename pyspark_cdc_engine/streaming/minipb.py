"""Protobuf-free stand-in for pyspark's generated ``StateMessage_pb2``.

The transformWithStateInPandas Python worker talks to the JVM state server in
protobuf wire format via generated message classes that require the
``google.protobuf`` runtime — absent in this container. The wire format
itself, though, is a tiny public spec (varints + length-delimited fields), and
pyspark's state clients use only a narrow slice of the message API: keyword
construction, attribute get/set, ``SerializeToString``, ``ParseFromString``,
repeated-field iteration, and module-level enum constants.

This module implements exactly that slice: spec-driven message classes
(`_state_message_spec.py`, generated from the installed pyspark's own
serialized descriptor by ``scripts/gen_state_message_spec.py``) whose bytes
are parseable by the JVM's real protobuf and vice versa. ``install()`` drops
the shim into ``sys.modules`` under the generated module's name, so every
``import pyspark.sql.streaming.proto.StateMessage_pb2`` in pyspark's clients
(all function-scoped) resolves here — no pyspark file is touched.

Semantics notes (deliberate, audited against pyspark's client code):
- Explicitly-set fields always serialize, including zero-valued scalars and
  empty sub-messages (oneof arms like ``RemoveImplicitKey()`` carry their
  presence via an empty length-delimited field — required behavior).
- Reading a message-typed field auto-vivifies it INTO the parent (real
  protobuf attaches on write). The only such read in pyspark is
  ``cmd.ttl.durationMs = x``, which intends the attach.
- Unset fields read as proto3 defaults (0 / "" / b"" / False / [] / empty
  sub-message).
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark_cdc_engine.streaming._state_message_spec import ENUMS, MESSAGES, PACKAGE

# FieldDescriptorProto.Type values we need
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING = 6, 7, 8, 9
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SINT32, _T_SINT64 = 17, 18

_VARINTS = {_T_INT64, _T_UINT64, _T_INT32, _T_UINT32, _T_BOOL, _T_ENUM}
_LEN_DELIM = {_T_STRING, _T_BYTES, _T_MESSAGE}


def _enc_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, protobuf convention
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


class Message:
    """Base for spec-driven messages. Subclasses set ``_SPEC``:
    {name: (number, label, type, msg_class_or_None)}."""

    _SPEC: dict[str, tuple[int, int, int, Any]] = {}

    def __init__(self, **kwargs: Any):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- attribute protocol --------------------------------------------------

    def __setattr__(self, name: str, value: Any) -> None:
        spec = self._SPEC.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if value is None:
            self._values.pop(name, None)
            return
        num, label, ftype, sub = spec
        if label == 3:
            value = list(value)
        elif ftype == _T_STRING and isinstance(value, bytes):
            value = value.decode()
        elif ftype == _T_BYTES and isinstance(value, (bytearray, memoryview)):
            value = bytes(value)
        self._values[name] = value

    def __getattr__(self, name: str) -> Any:
        spec = type(self)._SPEC.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        num, label, ftype, sub = spec
        if label == 3:
            return values.setdefault(name, [])
        if ftype == _T_MESSAGE:
            return values.setdefault(name, sub())  # attach-on-read (see module doc)
        if ftype == _T_STRING:
            return ""
        if ftype == _T_BYTES:
            return b""
        if ftype == _T_BOOL:
            return False
        if ftype in (_T_DOUBLE, _T_FLOAT):
            return 0.0
        return 0

    # -- wire format ---------------------------------------------------------

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for name, (num, label, ftype, sub) in sorted(
            self._SPEC.items(), key=lambda kv: kv[1][0]
        ):
            if name not in self._values:
                continue
            val = self._values[name]
            items = val if label == 3 else [val]
            for item in items:
                out += self._enc_field(num, ftype, item)
        return bytes(out)

    @staticmethod
    def _enc_field(num: int, ftype: int, item: Any) -> bytes:
        if ftype in _VARINTS:
            return _enc_varint(num << 3 | 0) + _enc_varint(int(item))
        if ftype == _T_STRING:
            b = item.encode() if isinstance(item, str) else bytes(item)
            return _enc_varint(num << 3 | 2) + _enc_varint(len(b)) + b
        if ftype == _T_BYTES:
            b = bytes(item)
            return _enc_varint(num << 3 | 2) + _enc_varint(len(b)) + b
        if ftype == _T_MESSAGE:
            b = item.SerializeToString()
            return _enc_varint(num << 3 | 2) + _enc_varint(len(b)) + b
        if ftype == _T_DOUBLE:
            return _enc_varint(num << 3 | 1) + struct.pack("<d", item)
        if ftype == _T_FLOAT:
            return _enc_varint(num << 3 | 5) + struct.pack("<f", item)
        if ftype == _T_FIXED64:
            return _enc_varint(num << 3 | 1) + struct.pack("<Q", item)
        if ftype == _T_FIXED32:
            return _enc_varint(num << 3 | 5) + struct.pack("<I", item)
        raise NotImplementedError(f"field type {ftype}")

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        by_num = {
            spec[0]: (name, spec) for name, spec in self._SPEC.items()
        }
        i = 0
        data = bytes(data)
        while i < len(data):
            tag, i = _dec_varint(data, i)
            num, wt = tag >> 3, tag & 7
            if wt == 0:
                raw, i = _dec_varint(data, i)
            elif wt == 2:
                ln, i = _dec_varint(data, i)
                raw = data[i : i + ln]
                i += ln
            elif wt == 1:
                raw = data[i : i + 8]
                i += 8
            elif wt == 5:
                raw = data[i : i + 4]
                i += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            entry = by_num.get(num)
            if entry is None:
                continue  # unknown field: skip
            name, (num_, label, ftype, sub) = entry
            val = self._dec_field(ftype, wt, raw, sub)
            if label == 3:
                if isinstance(val, list):  # packed repeated varints
                    self._values.setdefault(name, []).extend(val)
                else:
                    self._values.setdefault(name, []).append(val)
            else:
                self._values[name] = val
        return len(data)

    @staticmethod
    def _dec_field(ftype: int, wt: int, raw: Any, sub: Any) -> Any:
        if ftype in _VARINTS:
            if wt == 2:  # packed repeated scalars
                out, j = [], 0
                while j < len(raw):
                    v, j = _dec_varint(raw, j)
                    out.append(Message._coerce_varint(ftype, v))
                return out
            return Message._coerce_varint(ftype, raw)
        if ftype == _T_STRING:
            return raw.decode()
        if ftype == _T_BYTES:
            return bytes(raw)
        if ftype == _T_MESSAGE:
            m = sub()
            m.ParseFromString(raw)
            return m
        if ftype == _T_DOUBLE:
            return struct.unpack("<d", raw)[0]
        if ftype == _T_FLOAT:
            return struct.unpack("<f", raw)[0]
        if ftype == _T_FIXED64:
            return struct.unpack("<Q", raw)[0]
        if ftype == _T_FIXED32:
            return struct.unpack("<I", raw)[0]
        raise NotImplementedError(f"field type {ftype}")

    @staticmethod
    def _coerce_varint(ftype: int, v: int) -> Any:
        if ftype == _T_BOOL:
            return bool(v)
        if ftype in (_T_INT32, _T_INT64, _T_ENUM):
            return _signed64(v)
        return v

    def __repr__(self) -> str:  # debugging aid
        return f"{type(self).__name__}({self._values!r})"


def build_module() -> Any:
    """Materialize a module object exposing the StateMessage message classes
    and top-level enum values, API-compatible with the generated pb2."""
    import types

    mod = types.ModuleType("pyspark.sql.streaming.proto.StateMessage_pb2")
    mod.__dict__["__minipb__"] = True

    classes: dict[str, type] = {}
    short = lambda full: full[len(PACKAGE) + 1 :] if full.startswith(PACKAGE) else full

    for mname in MESSAGES:
        classes[mname] = type(mname.replace(".", "_"), (Message,), {"_SPEC": {}})

    for mname, flds in MESSAGES.items():
        spec: dict[str, tuple[int, int, int, Any]] = {}
        for fname, num, label, ftype, type_name in flds:
            sub = None
            if ftype == _T_MESSAGE:
                sub = classes[short(type_name)]
            spec[fname] = (num, label, ftype, sub)
        classes[mname]._SPEC = spec

    for mname, cls in classes.items():
        if "." not in mname:
            setattr(mod, mname, cls)

    for ename, values in ENUMS.items():
        for vname, vnum in values.items():
            setattr(mod, vname, vnum)

    return mod


def install() -> bool:
    """Idempotently route ``pyspark.sql.streaming.proto.StateMessage_pb2`` to
    the shim when google.protobuf is unavailable. Returns True if the shim is
    (now) active, False if real protobuf exists and nothing was done."""
    import sys

    name = "pyspark.sql.streaming.proto.StateMessage_pb2"
    existing = sys.modules.get(name)
    if existing is not None:
        return bool(getattr(existing, "__minipb__", False))
    try:
        # find_spec is NOT enough: 'google' may exist as an empty namespace
        # package (then google.protobuf "exists" but has no runtime), or be
        # absent entirely (then find_spec raises). Probe the actual import.
        from google.protobuf import descriptor  # noqa: F401

        return False
    except Exception:
        pass
    import pyspark.sql.streaming.proto  # parent package must be initialized

    sys.modules[name] = build_module()
    return True
