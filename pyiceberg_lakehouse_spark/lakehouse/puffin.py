"""Puffin file format + Iceberg v3 DELETION VECTOR blobs, from the
public specs (Puffin spec; Iceberg v3 spec's Deletion Vectors
section) — no Puffin/Iceberg library in the loop.

Puffin layout:
    Magic "PFA1" | Blob_1 .. Blob_n | Footer
    Footer = Magic | FooterPayload (FileMetadata JSON) |
             FooterPayloadSize (u32 LE) | Flags (u32 LE) | Magic
FileMetadata: {"blobs": [{"type", "fields", "snapshot-id",
"sequence-number", "offset", "length", "properties"...}],
"properties": {...}}. Flags bit 0 = footer payload LZ4-compressed
(this writer always writes it uncompressed; the reader rejects the
compressed flag honestly — no LZ4 frame codec is wired here).

Deletion-vector blob ("deletion-vector-v1"), per the Iceberg v3 spec:
    u32 BE length of (magic + vector)
    magic bytes D1 D3 39 64
    the positions as a 64-bit Roaring bitmap, "portable" format
    (operators/roaring.py)
    u32 BE CRC-32 of (magic + vector)
Blob metadata carries {"referenced-data-file": <path>,
"cardinality": <count>} properties; the manifest entry's
content_offset/content_size_in_bytes point at the whole framed blob.

Self-validating posture: write->read round-trips are bit-exact and
the framing constants (magic, CRC placement, BE lengths) are pinned
in tests/test_puffin.py; no external Puffin file exists on this box
to diff against, the same honesty note as the other from-scratch
containers.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyiceberg_lakehouse_spark.operators.roaring import (
    deserialize_roaring64,
    serialize_roaring64,
)

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
FLAG_FOOTER_COMPRESSED = 1


def write_puffin(path: str, blobs: list[dict],
                 properties: dict | None = None) -> list[dict]:
    """``blobs``: [{"type": str, "data": bytes, "fields": [int],
    "snapshot-id"?, "sequence-number"?, "properties"?}]. Writes the
    file and returns the blob metadata entries (offset/length filled
    in) as recorded in the footer."""
    out = bytearray(MAGIC)
    metas = []
    for b in blobs:
        data = b["data"]
        meta = {
            "type": b["type"],
            "fields": list(b.get("fields", [])),
            "snapshot-id": int(b.get("snapshot-id", -1)),
            "sequence-number": int(b.get("sequence-number", -1)),
            "offset": len(out),
            "length": len(data),
        }
        if b.get("properties"):
            meta["properties"] = dict(b["properties"])
        metas.append(meta)
        out += data
    payload = json.dumps({
        "blobs": metas,
        **({"properties": properties} if properties else {}),
    }).encode("utf-8")
    out += MAGIC
    out += payload
    out += struct.pack("<I", len(payload))
    out += struct.pack("<I", 0)  # flags: footer uncompressed
    out += MAGIC
    with open(path, "wb") as fh:
        fh.write(out)
    return metas


def read_puffin_footer(path: str) -> dict:
    """-> the FileMetadata dict (blob offsets/lengths/properties)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("puffin: magic missing at head or tail")
    size, flags = struct.unpack_from("<II", data, len(data) - 12)
    if flags & FLAG_FOOTER_COMPRESSED:
        raise NotImplementedError(
            "puffin: LZ4-compressed footer payload"
        )
    if flags & ~FLAG_FOOTER_COMPRESSED:
        raise ValueError(f"puffin: unknown footer flags {flags:#x}")
    start = len(data) - 12 - size
    if start < 8 or data[start - 4 : start] != MAGIC:
        raise ValueError("puffin: footer magic missing before payload")
    return json.loads(data[start : start + size].decode("utf-8"))


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(offset)
        data = fh.read(length)
    if len(data) != length:
        raise ValueError("puffin: blob extends past the file")
    return data


def encode_deletion_vector(positions) -> bytes:
    """Row ordinals -> the Iceberg v3 framed DV blob bytes."""
    vec = serialize_roaring64(positions)
    body = DV_MAGIC + vec
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_deletion_vector(blob: bytes) -> list[int]:
    """Framed DV blob -> sorted row ordinals; validates the length,
    magic and CRC framing structurally."""
    if len(blob) < 12:
        raise ValueError("deletion vector blob shorter than framing")
    (ln,) = struct.unpack_from(">I", blob, 0)
    if 4 + ln + 4 != len(blob):
        raise ValueError(
            f"deletion vector length {ln} inconsistent with blob size"
            f" {len(blob)}"
        )
    body = blob[4 : 4 + ln]
    if body[:4] != DV_MAGIC:
        raise ValueError("deletion vector magic bytes missing")
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise ValueError("deletion vector CRC-32 mismatch")
    return deserialize_roaring64(body[4:])


def write_deletion_vector_file(
    path: str,
    dvs: list[dict],
    snapshot_id: int = -1,
    sequence_number: int = -1,
) -> list[dict]:
    """``dvs``: [{"data_file": path, "positions": [ordinals]}] -> one
    Puffin file holding one deletion-vector-v1 blob per data file.
    Returns per-dv dicts with the manifest-entry fields a v3 writer
    records: referenced_data_file, content_offset,
    content_size_in_bytes, records (the DV's cardinality — the
    ``write_iceberg_metadata`` snapshot-entry key)."""
    blobs = []
    cards = []
    for dv in dvs:
        pos = sorted(set(int(p) for p in dv["positions"]))
        cards.append(len(pos))
        blobs.append({
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "data": encode_deletion_vector(pos),
            "properties": {
                "referenced-data-file": dv["data_file"],
                "cardinality": str(len(pos)),
            },
        })
    metas = write_puffin(path, blobs)
    return [
        {
            "referenced_data_file": dv["data_file"],
            "content_offset": meta["offset"],
            "content_size_in_bytes": meta["length"],
            "records": card,
        }
        for dv, meta, card in zip(dvs, metas, cards)
    ]


def read_deletion_vectors(path: str) -> dict[str, list[int]]:
    """Whole-file read: {referenced data file -> sorted ordinals},
    via the footer metadata (the path an engine without manifest
    offsets would take; the manifest-offset path is
    ``read_puffin_blob`` + ``decode_deletion_vector``)."""
    meta = read_puffin_footer(path)
    out: dict[str, list[int]] = {}
    for b in meta.get("blobs", []):
        if b.get("type") != "deletion-vector-v1":
            continue
        props = b.get("properties") or {}
        ref = props.get("referenced-data-file")
        if ref is None:
            raise ValueError(
                "deletion-vector blob lacks referenced-data-file"
            )
        pos = decode_deletion_vector(
            read_puffin_blob(path, b["offset"], b["length"])
        )
        card = props.get("cardinality")
        if card is not None and int(card) != len(pos):
            raise ValueError(
                f"deletion vector cardinality {card} != decoded"
                f" {len(pos)}"
            )
        out[ref] = pos
    return out
