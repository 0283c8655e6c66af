"""APNG (Animated PNG) — acTL/fcTL/fdAT chunks + frame composition.

Builds on the repo's pure-numpy PNG codec (operators/multimodal.py):
each animation frame's pixel data is ordinary PNG IDAT content scoped
to the frame's region, so encode wraps encode_png's stream into fdAT
chunks and decode reconstructs a standalone PNG per frame and reuses
decode_png — one codec, two containers, no drift.

Scope (honest gates, same stance as the GIF compositor):
- decode: acTL (num_frames/num_plays), fcTL geometry + delay +
  dispose_op/blend_op, fdAT sequence-number validation (fcTL and fdAT
  share ONE counter that must run 0,1,2,... per spec), frames gated to
  the canvas extent. The default image participates as frame 0 when
  its fcTL precedes IDAT; a default image WITHOUT fcTL is cover art
  and is excluded from the animation, per spec.
- composition: the full APNG model over RGBA — OVER alpha blending
  (exact integer arithmetic, round-half-up on the 255 divisor),
  SOURCE replace (an alpha-0 source pixel ERASES, unlike GIF),
  dispose 0 none / 1 background (clear the frame rect to fully
  transparent black) / 2 previous (revert); a first frame declaring
  dispose 2 degrades to 1 per spec.
- encode: RGBA8 frames (the composition-complete form), first frame
  full-canvas.
"""

from __future__ import annotations

import struct

import numpy as np

from pyiceberg_lakehouse_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
)


def _idat_payload(png: bytes) -> bytes:
    """Concatenate the IDAT payloads of a standalone PNG stream."""
    out = bytearray()
    off = 8
    while off + 8 <= len(png):
        (length,) = struct.unpack(">I", png[off : off + 4])
        tag = png[off + 4 : off + 8]
        if tag == b"IDAT":
            out += png[off + 8 : off + 8 + length]
        if tag == b"IEND":
            break
        off += 12 + length
    return bytes(out)


def encode_apng(frames: list[dict], num_plays: int = 0) -> bytes:
    """Frames: [{pixels (h, w, 4) uint8, x, y, delay_num, delay_den,
    dispose_op, blend_op}]. The first frame must cover the full canvas
    at (0, 0) — it doubles as the default image."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    f0 = np.asarray(frames[0]["pixels"], dtype=np.uint8)
    if f0.ndim != 3 or f0.shape[2] != 4:
        raise ValueError("APNG frames must be (h, w, 4) RGBA")
    ch, cw = f0.shape[:2]
    if frames[0].get("x", 0) or frames[0].get("y", 0):
        raise ValueError("the first frame must sit at (0, 0)")

    def fctl(seq: int, f: dict, w: int, h: int) -> bytes:
        return _png_chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB",
                seq, w, h, int(f.get("x", 0)), int(f.get("y", 0)),
                int(f.get("delay_num", 1)), int(f.get("delay_den", 100)),
                int(f.get("dispose_op", 0)), int(f.get("blend_op", 0)),
            ),
        )

    ihdr = struct.pack(">IIBBBBB", cw, ch, 8, 6, 0, 0, 0)
    out = bytearray(_PNG_SIG + _png_chunk(b"IHDR", ihdr))
    out += _png_chunk(
        b"acTL", struct.pack(">II", len(frames), int(num_plays))
    )
    seq = 0
    for i, f in enumerate(frames):
        px = np.asarray(f["pixels"], dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] != 4:
            raise ValueError("APNG frames must be (h, w, 4) RGBA")
        h, w = px.shape[:2]
        x, y = int(f.get("x", 0)), int(f.get("y", 0))
        if x + w > cw or y + h > ch:
            raise ValueError("frame extends past the canvas")
        if not 0 <= int(f.get("dispose_op", 0)) <= 2:
            raise ValueError("dispose_op must be 0-2")
        if not 0 <= int(f.get("blend_op", 0)) <= 1:
            raise ValueError("blend_op must be 0-1")
        out += fctl(seq, f, w, h)
        seq += 1
        data = _idat_payload(encode_png(px, filter_type=2))
        if i == 0:
            if (h, w) != (ch, cw):
                raise ValueError("the first frame must cover the canvas")
            out += _png_chunk(b"IDAT", data)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(payload: bytes) -> dict:
    """-> {width, height, num_plays, frames: [{x, y, width, height,
    delay_num, delay_den, dispose_op, blend_op, pixels}]}. A plain PNG
    (no acTL) raises ValueError — route it to decode_png instead. A
    default image whose IDAT is NOT preceded by an fcTL is cover art
    and is excluded from the animation, per spec."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    if payload[12:16] != b"IHDR":
        raise ValueError("corrupt PNG (IHDR not first chunk)")
    cw, ch = struct.unpack(">II", payload[16:24])
    ihdr_body = payload[16:29]

    chunks = []
    off = 8
    while off + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[off : off + 4])
        tag = payload[off + 4 : off + 8]
        if off + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        chunks.append((tag, payload[off + 8 : off + 8 + length]))
        off += 12 + length
        if tag == b"IEND":
            break

    actl = None
    frames: list[dict] = []
    pending = None  # open fcTL collecting its data chunks
    seen_idat = False
    expected_seq = 0

    def close_pending() -> None:
        nonlocal pending
        if pending is not None:
            if not pending["data"]:
                raise ValueError("fcTL without frame data")
            frames.append(pending)
            pending = None

    for tag, body in chunks:
        if tag == b"acTL":
            if len(body) != 8:
                raise ValueError("acTL must be 8 bytes")
            actl = struct.unpack(">II", body)
        elif tag == b"fcTL":
            if len(body) != 26:
                raise ValueError("fcTL must be 26 bytes")
            close_pending()
            (seq, w, h, x, y, dnum, dden, dop, bop) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq} != expected {expected_seq}"
                )
            expected_seq += 1
            if x + w > cw or y + h > ch or w == 0 or h == 0:
                raise ValueError("APNG frame outside the canvas")
            if dop > 2 or bop > 1:
                raise ValueError("invalid dispose_op/blend_op")
            pending = {
                "x": x, "y": y, "width": w, "height": h,
                "delay_num": dnum, "delay_den": dden,
                "dispose_op": dop, "blend_op": bop,
                "data": bytearray(),
            }
        elif tag == b"IDAT":
            # default-image data: part of the animation only when an
            # fcTL opened before the first IDAT
            if pending is not None and (not seen_idat or pending["data"]):
                pending["data"] += body
            seen_idat = True
        elif tag == b"fdAT":
            if len(body) < 4:
                raise ValueError("fdAT shorter than its sequence number")
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq} != expected {expected_seq}"
                )
            expected_seq += 1
            if pending is None:
                raise ValueError("fdAT without a preceding fcTL")
            pending["data"] += body[4:]
        elif tag == b"IEND":
            close_pending()
    if actl is None:
        raise ValueError("not an APNG (no acTL chunk)")
    if len(frames) != actl[0]:
        raise ValueError(
            f"acTL declares {actl[0]} frames, stream carries {len(frames)}"
        )
    for f in frames:
        sub = (
            _PNG_SIG
            + _png_chunk(
                b"IHDR",
                struct.pack(">II", f["width"], f["height"]) + ihdr_body[8:],
            )
            + _png_chunk(b"IDAT", bytes(f["data"]))
            + _png_chunk(b"IEND", b"")
        )
        px = decode_png(sub)
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        if px.shape[2] == 3:
            px = np.concatenate(
                [px, np.full(px.shape[:2] + (1,), 255, dtype=np.uint8)],
                axis=2,
            )
        f["pixels"] = px
        del f["data"]
    return {
        "width": cw, "height": ch,
        "num_plays": actl[1], "frames": frames,
    }


def compose_apng(decoded: dict) -> list[dict]:
    """Apply the APNG composition model. Returns one dict per frame:
    {frame_idx, delay_num, delay_den, canvas (h, w, 4) uint8 RGBA} —
    the canvas as rendered for that frame (after its draw, before its
    disposal). The output buffer starts fully transparent black."""
    cw, ch = decoded["width"], decoded["height"]
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    out = []
    for i, f in enumerate(decoded["frames"]):
        x, y, w, h = f["x"], f["y"], f["width"], f["height"]
        dop = f["dispose_op"]
        if i == 0 and dop == 2:
            dop = 1  # spec: first-frame PREVIOUS degrades to BACKGROUND
        saved = canvas.copy() if dop == 2 else None
        region = canvas[y : y + h, x : x + w]
        src = f["pixels"].astype(np.int64)
        if f["blend_op"] == 0:  # SOURCE: replace, alpha included
            region[:] = src.astype(np.uint8)
        else:  # OVER: exact integer port of the spec's compositing
            dst = region.astype(np.int64)
            sa = src[:, :, 3:4]
            da = dst[:, :, 3:4]
            # alphas as /255 fractions: out_a = sa + da*(1 - sa)
            # numerators kept over the common denominator 255
            oa_num = sa * 255 + da * (255 - sa)  # out_a * 255^2 / 255
            rgb_num = src[:, :, :3] * sa * 255 + dst[:, :, :3] * da * (
                255 - sa
            )
            rgb = np.where(
                oa_num > 0,
                (rgb_num + np.maximum(oa_num, 1) // 2)
                // np.maximum(oa_num, 1),
                0,
            )
            region[:, :, :3] = rgb.astype(np.uint8)
            region[:, :, 3] = ((oa_num + 127) // 255).astype(np.uint8)[
                :, :, 0
            ]
        out.append(
            {
                "frame_idx": i,
                "delay_num": f["delay_num"],
                "delay_den": f["delay_den"],
                "canvas": canvas.copy(),
            }
        )
        if dop == 1:
            canvas[y : y + h, x : x + w] = 0
        elif dop == 2:
            canvas = saved
    return out
