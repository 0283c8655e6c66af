"""Progressive JPEG (ITU-T T.81 SOF2, spectral selection + successive
approximation) in pure numpy — the decoder half of the last image gate
made real, plus a scan-scripted encoder to produce test streams.

Builds on the baseline codec's primitives (operators/jpeg.py): zigzag,
quality tables, flat canonical Huffman, bit IO, DCT sandwich, BT.601.
A progressive stream is the SAME quantized coefficients as baseline,
delivered across multiple scans:

- DC first scan (Ss=0, Ah=0): DPCM over the point-transformed DC
  (ARITHMETIC shift ``coef >> Al`` — floor, so the later refinement can
  OR true low bits into the two's-complement representation), may be
  interleaved over all components;
- DC refinement (Ah>0): one raw bit per block, ``coef |= bit << Al``;
- AC first scan (Ss>0, Ah=0, single component): run/size coding of the
  band [Ss..Se] with EOB-run escapes (``s=0, r<15`` → EOBRUN =
  2^r - 1 + r extra bits), values point-transformed TOWARD ZERO
  (sign * (|coef| >> Al) — sign-magnitude, unlike DC);
- AC refinement (Ah>0): the correction-bit algorithm — newly-significant
  coefficients arrive as ±2^Al after a run counted over ZERO-HISTORY
  positions only, while every already-significant coefficient crossed
  (including those inside EOB runs) contributes one magnitude-correction
  bit (T.81 G.1.2.3 / G.2; the widely-implemented libjpeg structure).

Scope: 8-bit, greyscale or YCbCr at 4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling (any integer-ratio Hi x Vi factors decode: interleaved DC
scans walk the MCU order, non-interleaved scans walk each component's
OWN block grid per T.81 A.2.2, so subsampled components' MCU-padding
blocks are DC-only — exactly how libjpeg emits them), with restart
intervals (DRI/RSTm) on both encode and decode — byte-aligned, DC
predictors and EOB-run state reset at every boundary, the modulo-8
marker counter restarting per scan. The encoder's scan script
(DC Al=1 → DC refine → per-component AC Al=1 → per-component AC refine)
exercises all four scan types, so a full decode round-trip covers every
code path foreign progressive files (libjpeg's standard script) use.
"""

from __future__ import annotations

import struct

import numpy as np

from pyiceberg_lakehouse_spark.operators.jpeg import (
    ZIGZAG,
    _entropy_span,
    _Geometry,
    _amplitude_bits,
    _BitReader,
    _BitWriter,
    _blocks_grid,
    _box_downsample,
    _category,
    _codes_from_table,
    _D,
    _extend,
    _flat_table,
    _huff_decode,
    _SUBSAMPLING,
    quality_tables,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
    _AC_SYMBOLS,
    _DC_SYMBOLS,
)

# ----------------------------------------------------------- decoder -----


def decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive JPEG bytes -> (h, w) or (h, w, 3) uint8 (RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt_id)
    h = w = 0
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # per comp: (n_blocks, 64) zigzag
    geom: _Geometry | None = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        # T.81 B.1.1.2: markers may be preceded by fill bytes (repeated
        # 0xFF). Skip them, mirroring libjpeg — otherwise 0xFF FF <marker>
        # parses the second 0xFF as a marker code and the real marker byte
        # as the high byte of a segment length.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"corrupt JPEG (DQT precision {pq})")
                # pq=1: 16-bit big-endian table entries (T.81 B.2.4.1) —
                # used by very-high-quality foreign encoders
                if pq:
                    zz = np.frombuffer(
                        body[off + 1 : off + 129], dtype=">u2"
                    ).astype(np.float64)
                else:
                    zz = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                t = np.zeros(64)
                t[ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
                off += 129 if pq else 65
        elif marker == 0xC2:
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, samp, tq))
            geom = _Geometry(h, w, [c[1] for c in comps])
            coefs = [
                np.zeros((geom.bym[i] * geom.bxm[i], 64), dtype=np.int64)
                for i in range(ncomp)
            ]
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                codes = _codes_from_table(bits, vals)
                huff[(tc, th)] = {(ln, c): s for s, (c, ln) in codes.items()}
                off += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("not a progressive JPEG (sequential SOF)")
        elif marker == 0xDA:
            if coefs is None:
                raise ValueError("corrupt JPEG (SOS before SOF2)")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tabs = body[1 + si * 2 : 3 + si * 2]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se, a = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = a >> 4, a & 0x0F
            data, pos = _entropy_span(payload, pos)
            # EOB-run state is per scan (any residue dies with the scan)
            _decode_scan(
                _BitReader(data), coefs, huff, scan_comps, ss, se, ah, al,
                geom, restart_interval,
            )
        # other markers (APPn, COM) are skipped
    if coefs is None or not comps or geom is None:
        raise ValueError("corrupt JPEG (no scan data)")
    planes = []
    for idx, (_cid, _s, tq) in enumerate(comps):
        bym, bxm = geom.bym[idx], geom.bxm[idx]
        blocks = np.zeros((bym * bxm, 64))
        blocks[:, ZIGZAG] = coefs[idx]
        freq = blocks.reshape(bym, bxm, 8, 8) * qts[tq]
        spatial = np.einsum("xu,ybuv,cv->ybxc", _D.T, freq, _D.T, optimize=True)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bym * 8, bxm * 8) + 128.0
        # crop to true sample dims, then JFIF nearest-neighbor upsample
        plane = plane[: geom.hpx[idx], : geom.wpx[idx]]
        fy, fx = geom.vmax // geom.vs[idx], geom.hmax // geom.hs[idx]
        if fy != 1 or fx != 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(planes, axis=-1)).astype(np.uint8)


def _decode_scan(
    r, coefs, huff, scan_comps, ss, se, ah, al, geom, restart_interval=0
) -> int:
    tabs = {idx: dct for idx, dct, _act in scan_comps}

    def _restart_points(n_mcus: int, per_mcu: int):
        """Flat walk indices where an RSTm boundary falls, mapped to the
        expected modulo-8 sequence number."""
        if not restart_interval:
            return {}
        return {
            m * per_mcu: (m // restart_interval - 1) % 8
            for m in range(restart_interval, n_mcus, restart_interval)
        }

    if ss == 0:
        # ---- DC scan (interleaved over the MCU order when multi-
        # component, else the component's own grid) ----
        if se != 0:
            raise ValueError("corrupt scan header (DC scan with Se != 0)")
        if len(scan_comps) == 1:
            only = scan_comps[0][0]
            walk = [(only, b) for b in geom.noninterleaved_blocks(only)]
            per_mcu = 1
        else:
            walk = geom.interleaved_blocks(scan_comps)
            per_mcu = sum(
                geom.hs[idx] * geom.vs[idx] for idx, _, _ in scan_comps
            )
        rst = _restart_points(len(walk) // per_mcu, per_mcu)
        if ah == 0:
            preds = {idx: 0 for idx, _, _ in scan_comps}
            for i, (idx, b) in enumerate(walk):
                if i in rst:
                    r.align_restart(rst[i])
                    preds = {k: 0 for k in preds}  # DC predictors reset
                size = _huff_decode(r, huff[(0, tabs[idx])])
                diff = _extend(r.read(size), size) if size else 0
                preds[idx] += diff
                coefs[idx][b, 0] = preds[idx] << al
        else:
            for i, (idx, b) in enumerate(walk):
                if i in rst:
                    r.align_restart(rst[i])
                if r.read(1):
                    coefs[idx][b, 0] |= 1 << al
        return 0
    # ---- AC scan: single component, non-interleaved ----
    if len(scan_comps) != 1:
        raise ValueError("corrupt scan header (interleaved AC scan)")
    idx, _dct, act = scan_comps[0]
    table = huff[(1, act)]
    coef = coefs[idx]
    blocks = geom.noninterleaved_blocks(idx)
    rst = _restart_points(len(blocks), 1)
    eobrun = 0
    if ah == 0:
        for i, b in enumerate(blocks):
            if i in rst:
                r.align_restart(rst[i])
                eobrun = 0  # EOB runs never cross a restart boundary
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_decode(r, table)
                rr, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if rr == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << rr) - 1 + (r.read(rr) if rr else 0)
                    break
                k += rr
                if k > se:
                    raise ValueError("corrupt JPEG (AC index overflow)")
                coef[b, k] = _extend(r.read(s), s) << al
                k += 1
        return eobrun
    # ---- AC refinement (T.81 G.1.2.3; libjpeg structure) ----
    p1, m1 = 1 << al, -1 << al
    for i, b in enumerate(blocks):
        if i in rst:
            r.align_restart(rst[i])
            eobrun = 0  # EOB runs never cross a restart boundary
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _huff_decode(r, table)
                rr, s = sym >> 4, sym & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "corrupt JPEG (refinement size > 1)"
                        )
                    newval = p1 if r.read(1) else m1
                else:
                    if rr != 15:
                        eobrun = (1 << rr) + (r.read(rr) if rr else 0)
                        break
                    # rr == 15: ZRL — pass over 16 zero-history coefs
                # advance over rr zero-history coefficients, correcting
                # every already-significant coefficient crossed
                while k <= se:
                    if coef[b, k] != 0:
                        if r.read(1) and not (coef[b, k] & p1):
                            coef[b, k] += p1 if coef[b, k] >= 0 else m1
                    else:
                        if rr == 0:
                            if newval:
                                coef[b, k] = newval
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if eobrun > 0:
            # inside an EOB run: only correction bits for significant coefs
            while k <= se:
                if coef[b, k] != 0:
                    if r.read(1) and not (coef[b, k] & p1):
                        coef[b, k] += p1 if coef[b, k] >= 0 else m1
                k += 1
            eobrun -= 1
    return eobrun


# ----------------------------------------------------------- encoder -----


def encode_progressive(
    pixels,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> progressive JPEG whose
    scan script (DC Al=1 → DC refine → AC first Al=1 per comp → AC refine
    per comp) exercises every progressive scan type. Decodes to the SAME
    pixels as the baseline encoder at the same quality and subsampling —
    the coefficients are identical; only the delivery differs.

    ``subsampling``: "4:4:4" (default) / "4:2:2" / "4:2:0"; the DC scan
    interleaves components in MCU order with Hi x Vi factors, the AC
    scans (non-interleaved per T.81) walk each component's OWN block
    grid. Ignored for grayscale."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt_l, qt_c = quality_tables(quality)
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if gray:
        planes, qts, qt_ids = [px.astype(np.float64)], [qt_l], [0]
        hv = [(1, 1)]
    else:
        hv = _SUBSAMPLING[subsampling]
        hmax0 = max(x for x, _ in hv)
        vmax0 = max(y for _, y in hv)
        ycc = rgb_to_ycbcr(px)
        planes = [
            _box_downsample(ycc[..., i], vmax0 // vi, hmax0 // hi)
            for i, (hi, vi) in enumerate(hv)
        ]
        qts, qt_ids = [qt_l, qt_c, qt_c], [0, 1, 1]

    geom = _Geometry(h, w, [(hi << 4) | vi for hi, vi in hv])
    comp_coeffs = []
    for i, (plane, qt) in enumerate(zip(planes, qts)):
        blocks = _blocks_grid(plane, geom.bym[i], geom.bxm[i])
        dct = np.einsum("ux,ybxc,vc->ybuv", _D, blocks - 128.0, _D, optimize=True)
        quant = np.round(dct / qt).astype(np.int64)
        comp_coeffs.append(
            quant.reshape(geom.bym[i] * geom.bxm[i], 64)[:, ZIGZAG]
        )

    dc_bits, dc_vals = _flat_table(_DC_SYMBOLS)
    ac_bits, ac_vals = _flat_table(_AC_SYMBOLS)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        body = bytes([tid]) + bytes(int(qt.reshape(64)[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qt_ids[ci]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int, data: bytes):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])  # DC table 0 / AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr)
        out.extend(data)

    all_ids = [ci + 1 for ci in range(ncomp)]
    dc_scan_comps = [(ci, 0, 0) for ci in range(ncomp)]
    dc_walk = (
        geom.interleaved_blocks(dc_scan_comps)
        if ncomp > 1
        else [(0, b) for b in geom.noninterleaved_blocks(0)]
    )

    dc_per_mcu = (
        sum(hi * vi for hi, vi in hv) if ncomp > 1 else 1
    )

    def rst_at(i: int, per_mcu: int) -> int | None:
        if not restart_interval or i == 0 or i % per_mcu:
            return None
        m = i // per_mcu
        if m % restart_interval:
            return None
        return (m // restart_interval - 1) % 8

    # scan 1: DC first, Al=1, interleaved (arithmetic shift for DPCM)
    wtr = _BitWriter()
    preds = [0] * ncomp
    for i, (ci, b) in enumerate(dc_walk):
        m = rst_at(i, dc_per_mcu)
        if m is not None:
            wtr.restart(m)
            preds = [0] * ncomp
        v = int(comp_coeffs[ci][b, 0]) >> 1
        diff = v - preds[ci]
        preds[ci] = v
        size = _category(diff)
        c, ln = dc_codes[size]
        wtr.write(c, ln)
        if size:
            wtr.write(_amplitude_bits(diff, size), size)
    sos(all_ids, 0, 0, 0, 1, wtr.flush())

    # scan 2: DC refinement, Ah=1 -> Al=0 (raw low bits)
    wtr = _BitWriter()
    for i, (ci, b) in enumerate(dc_walk):
        m = rst_at(i, dc_per_mcu)
        if m is not None:
            wtr.restart(m)
        wtr.write(int(comp_coeffs[ci][b, 0]) & 1, 1)
    sos(all_ids, 0, 0, 1, 0, wtr.flush())

    # scans 3..: per component, AC first pass at Al=1 then refinement —
    # non-interleaved, walking the component's OWN grid (MCU-padding
    # blocks beyond it are not coded, matching the decoder)
    for ci in range(ncomp):
        coeffs = comp_coeffs[ci]
        ac_blocks = geom.noninterleaved_blocks(ci)
        wtr = _BitWriter()
        for i, b in enumerate(ac_blocks):
            m = rst_at(i, 1)
            if m is not None:
                wtr.restart(m)
            run = 0
            wrote_any = False
            for k in range(1, 64):
                v = int(coeffs[b, k])
                t = (abs(v) >> 1) * (1 if v >= 0 else -1)  # toward zero
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                size = _category(t)
                c, ln = ac_codes[(run << 4) | size]
                wtr.write(c, ln)
                wtr.write(_amplitude_bits(t, size), size)
                run = 0
                wrote_any = True
            if run or not wrote_any:
                c, ln = ac_codes[0x00]  # EOB (run length 1)
                wtr.write(c, ln)
        sos([ci + 1], 1, 63, 0, 1, wtr.flush())

        # AC refinement Ah=1 -> Al=0: emitted by SIMULATING the decoder's
        # advance cursor, so every correction bit lands exactly where the
        # decoder's symbol-advance (or EOB sweep) will read it — a naive
        # "flush all buffered bits after each ZRL" desyncs whenever a
        # still-significant coefficient sits beyond a ZRL's 16-zero span.
        wtr = _BitWriter()
        for i, b in enumerate(ac_blocks):
            m = rst_at(i, 1)
            if m is not None:
                wtr.restart(m)
            vals = [int(coeffs[b, k]) for k in range(64)]
            absv = [abs(v) for v in vals]
            newly = [k for k in range(1, 64) if absv[k] == 1]
            cursor = 1

            def _advance(stop_after_zeros: int, place: int | None) -> None:
                """Mirror the decoder: walk from ``cursor``, emitting a
                correction bit at every already-significant coefficient,
                consuming ``stop_after_zeros`` zero-history positions; the
                final zero position receives ``place`` (or nothing for a
                ZRL)."""
                nonlocal cursor
                zeros = stop_after_zeros
                while cursor < 64:
                    if absv[cursor] > 1:
                        wtr.write(absv[cursor] & 1, 1)
                    else:
                        if zeros == 0:
                            cursor += 1
                            return
                        zeros -= 1
                    cursor += 1

            for ns in newly:
                run = sum(
                    1 for k in range(cursor, ns) if absv[k] <= 1
                )  # zero-history positions before the new coefficient
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    _advance(15, None)  # ZRL: 16 zero-history positions
                    run -= 16
                c, ln = ac_codes[(run << 4) | 1]
                wtr.write(c, ln)
                wtr.write(1 if vals[ns] >= 0 else 0, 1)
                _advance(run, ns)
            if any(absv[k] > 1 for k in range(cursor, 64)) or cursor < 64:
                # EOB: decoder sweeps cursor..63 reading a correction bit
                # at every significant coefficient
                c, ln = ac_codes[0x00]
                wtr.write(c, ln)
                for k in range(cursor, 64):
                    if absv[k] > 1:
                        wtr.write(absv[k] & 1, 1)
        sos([ci + 1], 1, 63, 1, 0, wtr.flush())

    out += b"\xff\xd9"
    return bytes(out)


def progressive_header(payload: bytes) -> tuple[int, int, int]:
    """SOF2 parse -> (width, height, n_components)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 fill bytes before a marker
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker == 0xC2:
            body = payload[pos + 4 : pos + 2 + seglen]
            h, w = struct.unpack(">HH", body[1:5])
            return w, h, body[5]
        if marker in (0xDA, 0xD9):
            break
        pos += 2 + seglen
    raise ValueError("corrupt JPEG (no SOF2 header)")
