"""Minimal MaxMind DB (.mmdb) reader + fixture writer, pure Python.

Implements the PUBLIC MaxMind DB file format specification
(https://maxmind.github.io/MaxMind-DB/ -- binary search tree of IP bits +
16-byte separator + typed data section + metadata map after the
``\\xab\\xcd\\xefMaxMind.com`` marker).  The ``maxminddb`` wheel is absent
in this sandbox, so this module provides:

* :class:`MMDBReader` -- a spec-complete-enough reader (``get(ip)`` walks
  the trie and decodes the nested document; supports record sizes 24/28/32,
  all scalar types, maps, arrays and pointers) that duck-types the
  ``maxminddb.Reader.get`` contract consumed by
  :class:`..state.backends.MaxmindBackend` (the analog of the reference's
  ``GeoIP2::Database#lookup``, ``lib/fluent/plugin/filter_geoip.rb:215``).
* :func:`write_mmdb` -- a deterministic writer used to build tiny fixture
  databases for tests (exact-host entries, IPv6 tree with IPv4 addresses at
  the conventional ``::/96`` prefix -- the same start-node rule the public
  maxminddb readers use).

The writer emits record_size=32 (4-byte big-endian records) and inlines
every value (no pointer emission); the reader handles the full pointer
grammar so real GeoLite2 files decode too.
"""

from __future__ import annotations

import ipaddress
import struct

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

# data-section type numbers (spec "Output Data Section")
_T_POINTER = 1
_T_UTF8 = 2
_T_DOUBLE = 3
_T_BYTES = 4
_T_UINT16 = 5
_T_UINT32 = 6
_T_MAP = 7
_T_INT32 = 8
_T_UINT64 = 9
_T_UINT128 = 10
_T_ARRAY = 11
_T_BOOL = 14
_T_FLOAT = 15


# --------------------------------------------------------------------------
# encoder (writer side)
# --------------------------------------------------------------------------

def _ctrl(type_num: int, size: int) -> bytes:
    """Control byte (+ extended-type byte, + size bytes) for a field."""
    first3 = type_num if type_num < 8 else 0
    ext = b"" if type_num < 8 else bytes([type_num - 7])
    if size < 29:
        return bytes([(first3 << 5) | size]) + ext
    if size < 29 + 256:
        return bytes([(first3 << 5) | 29]) + ext + bytes([size - 29])
    if size < 285 + 65536:
        return bytes([(first3 << 5) | 30]) + ext + (size - 285).to_bytes(2, "big")
    return bytes([(first3 << 5) | 31]) + ext + (size - 65_821).to_bytes(3, "big")


def _uint_bytes(v: int) -> bytes:
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def encode_value(value) -> bytes:
    """Encode one value (no pointers; nested values inline)."""
    if isinstance(value, bool):
        return _ctrl(_T_BOOL, 1 if value else 0)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return _ctrl(_T_UTF8, len(raw)) + raw
    if isinstance(value, float):
        return _ctrl(_T_DOUBLE, 8) + struct.pack(">d", value)
    if isinstance(value, int):
        if value < 0:
            raw = value.to_bytes(4, "big", signed=True)
            return _ctrl(_T_INT32, 4) + raw
        raw = _uint_bytes(value)
        if value < 1 << 16:
            return _ctrl(_T_UINT16, len(raw)) + raw
        if value < 1 << 32:
            return _ctrl(_T_UINT32, len(raw)) + raw
        return _ctrl(_T_UINT64, len(raw)) + raw
    if isinstance(value, bytes):
        return _ctrl(_T_BYTES, len(value)) + value
    if isinstance(value, dict):
        out = _ctrl(_T_MAP, len(value))
        for k, v in value.items():
            out += encode_value(str(k)) + encode_value(v)
        return out
    if isinstance(value, (list, tuple)):
        out = _ctrl(_T_ARRAY, len(value))
        for v in value:
            out += encode_value(v)
        return out
    raise TypeError(f"unsupported mmdb value type: {type(value)!r}")


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

class _Node:
    __slots__ = ("left", "right")

    def __init__(self):
        self.left = None   # None | _Node | int data offset (tagged tuple)
        self.right = None


def _ip_bits(ip: str) -> list[int]:
    """128 bits for the v6 tree; IPv4 sits at the ::/96 prefix (the start
    node convention of the public readers)."""
    addr = ipaddress.ip_address(ip)
    packed = addr.packed
    if addr.version == 4:
        packed = b"\x00" * 12 + packed
    return [(byte >> (7 - i)) & 1 for byte in packed for i in range(8)]


def write_mmdb(docs: dict[str, dict], path: str,
               database_type: str = "Synthetic-GeoIP2-Fixture") -> str:
    """Write a deterministic .mmdb holding exact-host entries for ``docs``
    ({ip_string -> nested document}); non-IP keys are skipped (mmdb stores
    networks, not hostnames)."""
    # data section: dedupe identical documents by their encoded bytes
    data = bytearray()
    offsets: dict[bytes, int] = {}
    leaf_offset: dict[str, int] = {}
    for ip, doc in sorted(docs.items()):
        try:
            ipaddress.ip_address(ip)
        except ValueError:
            continue
        enc = encode_value(doc)
        if enc not in offsets:
            offsets[enc] = len(data)
            data.extend(enc)
        leaf_offset[ip] = offsets[enc]

    # build the trie (depth 128)
    root = _Node()
    for ip, off in leaf_offset.items():
        bits = _ip_bits(ip)
        node = root
        for bit in bits[:-1]:
            attr = "right" if bit else "left"
            nxt = getattr(node, attr)
            if not isinstance(nxt, _Node):
                nxt = _Node()
                setattr(node, attr, nxt)
            node = nxt
        attr = "right" if bits[-1] else "left"
        setattr(node, attr, ("data", off))

    # number nodes breadth-first
    order: list[_Node] = []
    queue = [root]
    index: dict[int, int] = {}
    while queue:
        n = queue.pop(0)
        index[id(n)] = len(order)
        order.append(n)
        for child in (n.left, n.right):
            if isinstance(child, _Node):
                queue.append(child)
    node_count = len(order)

    def record(child) -> int:
        if child is None:
            return node_count                      # miss
        if isinstance(child, _Node):
            return index[id(child)]
        return node_count + 16 + child[1]          # data pointer

    tree = bytearray()
    for n in order:  # record_size=32: two 4-byte big-endian records per node
        tree += struct.pack(">II", record(n.left), record(n.right))

    metadata = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        # fixed epoch: fixture bytes must be deterministic
        "build_epoch": 1_700_000_000,
        "database_type": database_type,
        "description": {"en": "synthetic fixture (public spec writer)"},
        "ip_version": 6,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 32,
    }
    blob = bytes(tree) + b"\x00" * 16 + bytes(data) + METADATA_MARKER + \
        encode_value(metadata)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os

    os.replace(tmp, path)
    return path


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

class MMDBReader:
    """Pure-Python reader: ``get(ip) -> dict | None`` (maxminddb-compatible
    for the lookup contract the enrich backend needs)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._buf = f.read()
        marker_at = self._buf.rfind(METADATA_MARKER)
        if marker_at < 0:
            raise ValueError(f"{path}: not an mmdb file (metadata marker missing)")
        self.metadata, _ = self._decode(marker_at + len(METADATA_MARKER))
        self.node_count = self.metadata["node_count"]
        self.record_size = self.metadata["record_size"]
        self.ip_version = self.metadata["ip_version"]
        self._tree_size = self.node_count * self.record_size * 2 // 8
        self._data_start = self._tree_size + 16

    # -- search tree -------------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        rs = self.record_size
        base = node * rs * 2 // 8
        buf = self._buf
        if rs == 32:
            off = base + side * 4
            return int.from_bytes(buf[off:off + 4], "big")
        if rs == 24:
            off = base + side * 3
            return int.from_bytes(buf[off:off + 3], "big")
        if rs == 28:
            middle = buf[base + 3]
            if side == 0:
                return ((middle >> 4) << 24) | int.from_bytes(buf[base:base + 3], "big")
            return ((middle & 0x0F) << 24) | int.from_bytes(buf[base + 4:base + 7], "big")
        raise ValueError(f"unsupported record size {rs}")

    def get(self, ip: str):
        addr = ipaddress.ip_address(ip)  # ValueError on garbage (caller gates)
        packed = addr.packed
        if addr.version == 6 and self.ip_version == 4:
            return None
        if addr.version == 4 and self.ip_version == 6:
            packed = b"\x00" * 12 + packed
        node = 0
        for byte in packed:
            for i in range(8):
                if node >= self.node_count:
                    break
                node = self._record(node, (byte >> (7 - i)) & 1)
            if node >= self.node_count:
                break
        if node == self.node_count:
            return None
        if node > self.node_count:
            value, _ = self._decode(self._tree_size + (node - self.node_count))
            return value
        return None  # ran out of bits inside the tree

    # -- data section decoder ---------------------------------------------

    def _decode(self, offset: int):
        buf = self._buf
        ctrl = buf[offset]
        offset += 1
        type_num = ctrl >> 5
        if type_num == 0:
            type_num = buf[offset] + 7
            offset += 1
        if type_num == _T_POINTER:
            ss = (ctrl >> 3) & 0x3
            vv = ctrl & 0x7
            if ss == 0:
                ptr = (vv << 8) | buf[offset]
                offset += 1
            elif ss == 1:
                ptr = ((vv << 16) | int.from_bytes(buf[offset:offset + 2], "big")) + 2048
                offset += 2
            elif ss == 2:
                ptr = ((vv << 24) | int.from_bytes(buf[offset:offset + 3], "big")) + 526_336
                offset += 3
            else:
                ptr = int.from_bytes(buf[offset:offset + 4], "big")
                offset += 4
            value, _ = self._decode(self._data_start + ptr)
            return value, offset

        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[offset:offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65_821 + int.from_bytes(buf[offset:offset + 3], "big")
            offset += 3

        if type_num == _T_UTF8:
            return buf[offset:offset + size].decode("utf-8"), offset + size
        if type_num == _T_DOUBLE:
            return struct.unpack(">d", buf[offset:offset + 8])[0], offset + 8
        if type_num == _T_BYTES:
            return bytes(buf[offset:offset + size]), offset + size
        if type_num in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
            return int.from_bytes(buf[offset:offset + size], "big"), offset + size
        if type_num == _T_INT32:
            return int.from_bytes(buf[offset:offset + size], "big", signed=True), offset + size
        if type_num == _T_MAP:
            out = {}
            for _ in range(size):
                key, offset = self._decode(offset)
                val, offset = self._decode(offset)
                out[key] = val
            return out, offset
        if type_num == _T_ARRAY:
            items = []
            for _ in range(size):
                val, offset = self._decode(offset)
                items.append(val)
            return items, offset
        if type_num == _T_BOOL:
            return bool(size), offset
        if type_num == _T_FLOAT:
            return struct.unpack(">f", buf[offset:offset + 4])[0], offset + 4
        raise ValueError(f"unsupported mmdb type {type_num} at {offset}")


def open_database(path: str) -> MMDBReader:
    """maxminddb-shaped module entry point."""
    return MMDBReader(path)
