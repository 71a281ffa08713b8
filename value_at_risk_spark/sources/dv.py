"""Deletion-vector codec for the native Delta transaction log.

Implements the open Delta protocol's deletion-vector format from the
published spec (delta-io PROTOCOL.md, "Deletion Vectors" and
"Deletion Vector Format" sections; reference tie: the reference
stores its Monte-Carlo tables in Delta, config/configure_notebook.py
:18-27 — deletion vectors are Delta's merge-on-read DELETE, the scale
path where a small DELETE writes a bitmap instead of rewriting
files):

- serialized row-index sets are **RoaringBitmapArray** bytes in the
  "portable" format: magic ``1681511377`` (4 B LE), number of 32-bit
  bitmaps (8 B LE), then per bitmap its key — the high 32 bits of the
  64-bit row index — (4 B LE) followed by the standard 32-bit roaring
  "portable" serialization (RoaringFormatSpec);
- on-disk DV files carry a 1-byte format version (``1``) followed by
  one or more framed DVs: data size (4 B **big**-endian), the data
  bytes, then a CRC-32 of the data (4 B big-endian). A descriptor's
  ``offset`` points at the size field;
- descriptors reference their data by ``storageType``: ``u`` (file
  named ``deletion_vector_<uuid>.bin`` relative to the table root,
  the UUID Z85-encoded in ``pathOrInlineDv``), ``p`` (absolute path)
  or ``i`` (the data itself Z85-encoded inline).

Everything here is driver/executor-local byte work over numpy; no
Spark imports. The scan-side application (masking row indexes out of
Arrow batches / DataFrames) lives with the readers."""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

# --- Z85 (ZeroMQ base-85, the encoding Delta uses for DV UUIDs and
# inline bitmaps) -----------------------------------------------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """4 bytes -> 5 chars, big-endian word, most significant digit
    first (ZeroMQ spec 32/Z85; its test vector is pinned in tests)."""
    if len(data) % 4:
        raise ValueError(f"z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for (word,) in struct.iter_unpack(">I", data):
        chunk = [""] * 5
        for i in range(4, -1, -1):
            word, rem = divmod(word, 85)
            chunk[i] = _Z85_CHARS[rem]
        out.append("".join(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError("z85 chunk overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# --- 32-bit roaring bitmap, "portable" wire format --------------------
# RoaringFormatSpec: cookie 12346 = no run containers (size as its own
# int32, offset header always present); cookie 12347 = run containers
# possible (size-1 packed in the cookie's upper 16 bits, run-flag
# bitset, offset header only when size >= 4).

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def serialize_roaring32(values: np.ndarray) -> bytes:
    """Sorted, unique uint32 values -> portable bytes. Always emits
    the no-run-container form (cookie 12346) — legal per spec and
    deterministic; the reader side accepts both forms."""
    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: list[bytes] = []
    desc = bytearray()
    for i, k in enumerate(uniq_keys):
        vals = lows[bounds[i] : bounds[i + 1]]
        card = len(vals)
        desc += struct.pack("<HH", int(k), card - 1)
        if card <= _ARRAY_MAX:
            containers.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[vals] = True
            containers.append(np.packbits(bits, bitorder="little").tobytes())
    n = len(uniq_keys)
    header = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n) + bytes(desc)
    # offset header: byte position of each container from stream start
    pos = len(header) + 4 * n
    offsets = bytearray()
    for c in containers:
        offsets += struct.pack("<I", pos)
        pos += len(c)
    return header + bytes(offsets) + b"".join(containers)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Portable bytes -> (sorted uint32 values, next offset). Accepts
    both cookies, including run containers."""
    # unsigned: a run-format bitmap with >= 0x8001 containers packs a
    # container count into the cookie's high 16 bits; a signed '<i'
    # read would shift-extend the sign and derive a negative count
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos),
            bitorder="little",
        )[:n].astype(bool)
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # trust the sequential layout; offsets are redundant
    parts: list[np.ndarray] = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags is not None and run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).reshape(n_runs, 2)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(s, s + ln + 1, dtype=np.uint32)
                    for s, ln in runs.astype(np.int64)
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] > _ARRAY_MAX:
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little",
            )
            pos += 8192
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(base + vals)
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, pos


# --- RoaringBitmapArray (64-bit row indexes), Delta portable format ---

MAGIC_NUMBER = 1681511377


def serialize_rbm_array(row_indexes: np.ndarray) -> bytes:
    """Sorted, unique uint64 row indexes -> Delta portable
    RoaringBitmapArray bytes (magic, bitmap count, per-bitmap key +
    32-bit portable roaring)."""
    ri = np.asarray(row_indexes, dtype=np.uint64)
    high = (ri >> np.uint64(32)).astype(np.uint32)
    low = (ri & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(high, return_index=True)
    bounds = list(starts) + [len(ri)]
    out = bytearray(struct.pack("<iq", MAGIC_NUMBER, len(uniq)))
    for i, k in enumerate(uniq):
        out += struct.pack("<I", int(k))
        out += serialize_roaring32(low[bounds[i] : bounds[i + 1]])
    return bytes(out)


def deserialize_rbm_array(data: bytes) -> np.ndarray:
    """Delta portable RoaringBitmapArray bytes -> sorted uint64 row
    indexes."""
    (magic, n_bitmaps) = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC_NUMBER:
        raise ValueError(
            f"deletion vector: bad magic {magic} (want {MAGIC_NUMBER})"
        )
    pos = 12
    parts: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = deserialize_roaring32(data, pos)
        parts.append((np.uint64(key) << np.uint64(32)) + vals.astype(np.uint64))
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )


# --- DV files + descriptors -------------------------------------------

_DV_FILE_VERSION = 1


def dv_file_name(u: _uuid.UUID, prefix: str = "") -> str:
    rel = f"deletion_vector_{u}.bin"
    return os.path.join(prefix, rel) if prefix else rel


def write_dv_file(
    table_path: str, bitmaps: list[np.ndarray]
) -> list[dict]:
    """Write ONE on-disk DV file holding one framed DV per input
    bitmap (sorted uint64 row indexes each); returns the matching
    ``deletionVector`` descriptors (storageType ``u``). One file for a
    whole DELETE keeps the object-store write count at 1, not
    touched-file-many."""
    u = _uuid.uuid4()
    rel = dv_file_name(u)
    full = os.path.join(table_path, rel)
    descriptors: list[dict] = []
    buf = bytearray(struct.pack("B", _DV_FILE_VERSION))
    for bm in bitmaps:
        bm = np.asarray(bm, dtype=np.uint64)
        data = serialize_rbm_array(bm)
        offset = len(buf)
        buf += struct.pack(">i", len(data))
        buf += data
        buf += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descriptors.append(
            {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": int(len(bm)),
            }
        )
    tmp = full + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(buf))
    os.replace(tmp, full)
    return descriptors


def inline_descriptor(row_indexes: np.ndarray) -> dict:
    """An ``i`` (inline) descriptor — the whole bitmap rides in the
    log action; right for tiny DVs where a separate object is waste."""
    data = serialize_rbm_array(np.asarray(row_indexes, dtype=np.uint64))
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(
            data + b"\x00" * (-len(data) % 4)
        ) if len(data) % 4 else z85_encode(data),
        "offset": None,
        "sizeInBytes": len(data),
        "cardinality": int(len(row_indexes)),
    }


def dv_abs_path(table_path: str, descriptor: dict) -> str | None:
    """Absolute on-disk path of a descriptor's DV file (None for
    inline)."""
    st = descriptor["storageType"]
    if st == "i":
        return None
    if st == "p":
        return descriptor["pathOrInlineDv"]
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        # optional random prefix before the 20-char Z85 UUID
        prefix, uid = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(uid))
        return os.path.join(table_path, dv_file_name(u, prefix))
    raise ValueError(f"unknown deletion vector storageType {st!r}")


def read_dv(table_path: str, descriptor: dict) -> np.ndarray:
    """Descriptor -> sorted uint64 deleted row indexes. Verifies the
    on-disk CRC and the descriptor's cardinality — a silent partial
    bitmap would resurrect or lose rows, the one unforgivable DV
    failure."""
    st = descriptor["storageType"]
    if st == "i":
        raw = z85_decode(descriptor["pathOrInlineDv"])
        data = raw[: descriptor["sizeInBytes"]]
    else:
        full = dv_abs_path(table_path, descriptor)
        with open(full, "rb") as fh:
            head = fh.read(1)
            if not head or head[0] != _DV_FILE_VERSION:
                raise ValueError(
                    f"deletion vector file {full}: unsupported format "
                    f"version {head[0] if head else '<empty>'}"
                )
            fh.seek(descriptor["offset"])
            (size,) = struct.unpack(">i", fh.read(4))
            if size != descriptor["sizeInBytes"]:
                raise ValueError(
                    f"deletion vector at {full}:{descriptor['offset']}: "
                    f"size {size} != descriptor sizeInBytes "
                    f"{descriptor['sizeInBytes']}"
                )
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
            if zlib.crc32(data) & 0xFFFFFFFF != crc:
                raise ValueError(
                    f"deletion vector at {full}:{descriptor['offset']}: "
                    "CRC mismatch"
                )
    ri = deserialize_rbm_array(data)
    if len(ri) != descriptor["cardinality"]:
        raise ValueError(
            f"deletion vector cardinality {descriptor['cardinality']} != "
            f"decoded {len(ri)}"
        )
    return ri


def keep_mask(row_indexes: np.ndarray, deleted_sorted: np.ndarray) -> np.ndarray:
    """Boolean mask of rows to KEEP given physical row indexes and a
    sorted deleted-index array — vectorized searchsorted membership,
    O(batch · log deleted)."""
    ri = np.asarray(row_indexes, dtype=np.uint64)
    if len(deleted_sorted) == 0:
        return np.ones(len(ri), dtype=bool)
    pos = np.searchsorted(deleted_sorted, ri)
    hit = pos < len(deleted_sorted)
    hit[hit] = deleted_sorted[pos[hit]] == ri[hit]
    return ~hit
