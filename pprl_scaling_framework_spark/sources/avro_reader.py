"""Minimal Avro container reader + reference schema-name parameter parser.

Only what the parity tests need: the Avro 1.x object container format
(magic ``Obj\\x01``, metadata map, sync-marker-delimited blocks; null and
deflate codecs) with record schemas made of ``string``/``fixed``/primitive
fields — enough to read the reference's checked-in fixtures
(``clk_voters_{a,b}`` and the raw ``voters_{a,b}`` parts).

Also the compatibility parser for the reference's name-mangled encoding
parameters (``encoding_field_<N>_<K>_<Q>_src_<f1>_src_...`` field names and
``PPRL_Encoding_<SCHEME>_<K>_<Q>_<name>`` record names — see
``lib/encoding/BloomFilterEncoding.java:237-241`` and
``FieldBloomFilterEncoding.java:105-110``): we store params explicitly, but
read theirs for fixture tests.
"""

from __future__ import annotations

import json
import re
import zlib
from dataclasses import dataclass


class _Cursor:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def string(self) -> str:
        n = self.varint()
        return self.read(n).decode("utf-8")

    def bytes_(self) -> bytes:
        n = self.varint()
        return self.read(n)

    @property
    def eof(self) -> bool:
        return self.pos >= len(self.data)


def _read_value(cur: _Cursor, schema) -> object:
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "record":
        return {f["name"]: _read_value(cur, f["type"]) for f in schema["fields"]}
    if t == "string":
        return cur.string()
    if t == "fixed":
        return cur.read(schema["size"])
    if t == "bytes":
        return cur.bytes_()
    if t in ("int", "long"):
        return cur.varint()
    if t == "boolean":
        return cur.read(1) != b"\x00"
    if t == "float":
        import struct
        return struct.unpack("<f", cur.read(4))[0]
    if t == "double":
        import struct
        return struct.unpack("<d", cur.read(8))[0]
    raise NotImplementedError(f"avro type {t!r}")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """-> (schema dict, records) for one container file."""
    cur = _Cursor(open(path, "rb").read())
    assert cur.read(4) == b"Obj\x01", "not an avro container"
    meta: dict[str, bytes] = {}
    while True:
        n = cur.varint()
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix
            cur.varint()
            n = -n
        for _ in range(n):
            k = cur.string()
            meta[k] = cur.bytes_()
    sync = cur.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    while not cur.eof:
        count = cur.varint()
        size = cur.varint()
        block = cur.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        bc = _Cursor(block)
        for _ in range(count):
            records.append(_read_value(bc, schema))
        assert cur.read(16) == sync, "sync marker mismatch"
    return schema, records


@dataclass(frozen=True)
class ReferenceEncodingParams:
    scheme: str            # CLK | FBF | RBF
    K: int
    Q: int
    N: int                 # total bits of the encoding field
    source_fields: tuple[str, ...]
    encoding_field: str


_FIELD_RE = re.compile(r"^encoding_field_(\d+)_(\d+)_(\d+)((?:_src_.+?)+)$")
_NAME_RE = re.compile(r"^PPRL_Encoding_([A-Z]+)_(\d+)_(\d+)_(.+)$")


def parse_reference_schema(schema: dict) -> ReferenceEncodingParams:
    """Recover {scheme, N, K, Q, source fields} from the mangled names."""
    m = _NAME_RE.match(schema["name"])
    if not m:
        raise ValueError(f"not a reference encoding schema: {schema['name']}")
    scheme, k, q = m.group(1), int(m.group(2)), int(m.group(3))
    enc_fields = [f for f in schema["fields"] if f["name"].startswith("encoding_field_")]
    assert len(enc_fields) == 1, "multi-field encodings need per-field parsing"
    fm = _FIELD_RE.match(enc_fields[0]["name"])
    assert fm, enc_fields[0]["name"]
    n_bits = int(fm.group(1))
    srcs = tuple(s for s in fm.group(4).split("_src_") if s)
    return ReferenceEncodingParams(
        scheme=scheme, K=k, Q=q, N=n_bits,
        source_fields=srcs, encoding_field=enc_fields[0]["name"],
    )
