"""Fragmented MP4 (moof/traf/tfhd/tfdt/trun — ISO 14496-12 §8.8):
synthesis + demux roundtrips, the trun > tfhd > trex field-resolution
precedence, cross-fragment dts threading, and hostile inputs.

Self-validation strategy (no mp4box/ffmpeg in this container): the
synthesizer emits only documented box layouts whose expected expansion
is closed-form, property tests draw arbitrary fragment shapes, and the
precedence rules are pinned by hand-spliced streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators.multimodal import (
    _cf_bytes,
    demux_mp4_fragments,
    make_mp4_fragmented,
)


def _two_track(d=5, nf=3, sv=4, sa=5, dv=120):
    vid = [[_cf_bytes(d * 7 + (f * sv + k) * 13, 3,
                      20 + (d + 7 * (f * sv + k)) % 40)
            for k in range(sv)] for f in range(nf)]
    aud = [[_cf_bytes(d * 3 + (f * sa + k) * 7, 11,
                      10 + (d + 3 * (f * sa + k)) % 20)
            for k in range(sa)] for f in range(nf)]
    return make_mp4_fragmented(
        [
            {
                "handler": "vide", "codec": "mp4v", "timescale": 600,
                "default_duration": dv, "frag_samples": vid,
                "frag_cts": [[((f * sv + k + 1) % 3) * 50
                              for k in range(sv)] for f in range(nf)],
                "sync_first": True,
            },
            {
                "handler": "soun", "codec": "ulaw", "timescale": 8000,
                "frag_samples": aud,
                "frag_durations": [[160 + 20 * ((f * sa + k) % 2)
                                    for k in range(sa)] for f in range(nf)],
            },
        ]
    ), vid, aud


def test_roundtrip_two_tracks():
    payload, vid, aud = _two_track()
    tracks = demux_mp4_fragments(payload)
    assert [t["track_id"] for t in tracks] == [1, 2]
    assert [t["handler"] for t in tracks] == ["vide", "soun"]
    assert [t["codec"] for t in tracks] == ["mp4v", "ulaw"]
    assert [t["timescale"] for t in tracks] == [600, 8000]
    v, a = tracks[0]["samples"], tracks[1]["samples"]
    assert [s["data"] for s in v] == [b for f in vid for b in f]
    assert [s["data"] for s in a] == [b for f in aud for b in f]
    # trex-default durations thread dts across fragments through tfdt
    assert [s["dts"] for s in v] == [120 * i for i in range(12)]
    # per-sample trun durations: alternating 160/180 cumsum
    assert [s["dts"] for s in a] == [160 * i + 20 * (i // 2)
                                     for i in range(15)]
    # v1 trun composition offsets
    assert [s["pts"] - s["dts"] for s in v] == [((i + 1) % 3) * 50
                                                for i in range(12)]
    # first-sample-flags sync over a non-sync trex default
    assert [s["is_sync"] for s in v] == [i % 4 == 0 for i in range(12)]
    assert all(s["is_sync"] for s in a)
    # fragment tagging
    assert [s["frag_seq"] for s in v] == [i // 4 + 1 for i in range(12)]


def test_fragment_shapes_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        shapes=st.lists(
            st.tuples(st.integers(1, 6), st.integers(1, 6)),
            min_size=1, max_size=5,
        ),
        dv=st.integers(1, 1000),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(shapes, dv, seed):
        rng = np.random.default_rng(seed)
        vid = [[rng.bytes(int(rng.integers(1, 50))) for _ in range(nv)]
               for nv, _ in shapes]
        aud = [[rng.bytes(int(rng.integers(1, 30))) for _ in range(na)]
               for _, na in shapes]
        adur = [[int(rng.integers(1, 500)) for _ in f] for f in aud]
        payload = make_mp4_fragmented(
            [
                {"handler": "vide", "default_duration": dv,
                 "frag_samples": vid, "sync_first": True},
                {"handler": "soun", "frag_samples": aud,
                 "frag_durations": adur},
            ]
        )
        tracks = demux_mp4_fragments(payload)
        v, a = tracks[0]["samples"], tracks[1]["samples"]
        assert [s["data"] for s in v] == [b for f in vid for b in f]
        assert [s["data"] for s in a] == [b for f in aud for b in f]
        assert [s["dts"] for s in v] == [dv * i for i in range(len(v))]
        flat_dur = [x for f in adur for x in f]
        want = np.concatenate([[0], np.cumsum(flat_dur)[:-1]])
        assert [s["dts"] for s in a] == list(want)
        assert [s["idx"] for s in v] == list(range(len(v)))

    check()


def test_tfhd_defaults_override_trex():
    """Splice a tfhd default-sample-duration into a stream whose trex
    says something else: tfhd must win."""
    payload, _, _ = _two_track(dv=120)
    raw = bytearray(payload)
    # find the first tfhd (video traf): version 0, flags 0x020000, tid 1
    pat = b"tfhd" + b"\x00\x02\x00\x00" + struct.pack(">I", 1)
    i = raw.index(pat)
    box_start = i - 4
    # rebuild that tfhd with the default-duration flag + value 70
    new_tfhd = (
        struct.pack(">I", 8 + 4 + 4 + 4)
        + b"tfhd"
        + b"\x00\x02\x00\x08"
        + struct.pack(">II", 1, 70)
    )
    old_len = struct.unpack_from(">I", raw, box_start)[0]
    # grow every ancestor box (traf, moof) by the delta
    delta = len(new_tfhd) - old_len
    out = bytes(raw[:box_start]) + new_tfhd + bytes(raw[box_start + old_len:])
    out = bytearray(out)
    # patch the enclosing traf and moof sizes (scan back from tfhd)
    for anc in (b"traf", b"moof"):
        j = out.rindex(anc, 0, box_start)
        sz = struct.unpack_from(">I", out, j - 4)[0]
        struct.pack_into(">I", out, j - 4, sz + delta)
    # the video trun's data_offset moved by delta too
    tracks = None
    k = out.index(b"trun", box_start)
    tflags = int.from_bytes(out[k + 5 : k + 8], "big")
    assert tflags & 0x1
    doff = struct.unpack_from(">i", out, k + 12)[0]
    struct.pack_into(">i", out, k + 12, doff + delta)
    # and the audio traf's trun data_offset (same moof)
    k2 = out.index(b"trun", k + 4)
    doff2 = struct.unpack_from(">i", out, k2 + 12)[0]
    struct.pack_into(">i", out, k2 + 12, doff2 + delta)
    tracks = demux_mp4_fragments(bytes(out))
    v = tracks[0]["samples"]
    # fragment 1 samples use the spliced 70; later fragments still 120
    assert [s["dts"] for s in v[:4]] == [0, 70, 140, 210]
    assert v[4]["dts"] == 480  # tfdt still said 4 * 120


def test_missing_size_resolution_raises():
    """A trun with no sizes and no tfhd/trex default must refuse."""
    payload, _, _ = _two_track()
    raw = bytearray(payload)
    # clear the trex default_sample_size is already 0 = legal "absent";
    # strip the sample-size flag from the first video trun
    k = raw.index(b"trun")
    tflags = int.from_bytes(raw[k + 5 : k + 8], "big")
    raw[k + 5 : k + 8] = (tflags & ~0x200).to_bytes(3, "big")
    with pytest.raises(ValueError, match="size resolves nowhere"):
        demux_mp4_fragments(bytes(raw))


def test_implicit_chained_base_offset_gated():
    """A non-first traf with neither base-data-offset nor
    default-base-is-moof hits the honest NotImplementedError gate."""
    payload, _, _ = _two_track(nf=1)
    raw = bytearray(payload)
    # the SECOND tfhd in the moof is the audio traf's
    i = raw.index(b"tfhd")
    j = raw.index(b"tfhd", i + 4)
    raw[j + 4 : j + 8] = b"\x00\x00\x00\x00"  # clear its flags
    with pytest.raises(NotImplementedError, match="end-of-previous-traf"):
        demux_mp4_fragments(bytes(raw))


def test_hostile_trun_count_rejected():
    payload, _, _ = _two_track(nf=1)
    raw = bytearray(payload)
    k = raw.index(b"trun")
    struct.pack_into(">I", raw, k + 8, 10**6)  # sample_count
    with pytest.raises(ValueError, match="trun sample count"):
        demux_mp4_fragments(bytes(raw))


def test_hostile_truncated_mdat_rejected():
    payload, _, _ = _two_track(nf=1)
    # chop the file inside the mdat payload: the box walk itself
    # must flag the truncation (declared size exceeds the file)
    with pytest.raises(ValueError, match="corrupt MP4 box"):
        demux_mp4_fragments(payload[:-10])


def test_unknown_track_id_rejected():
    payload, _, _ = _two_track(nf=1)
    raw = bytearray(payload)
    i = raw.index(b"tfhd")
    struct.pack_into(">I", raw, i + 8, 99)
    with pytest.raises(ValueError, match="unknown track_ID"):
        demux_mp4_fragments(bytes(raw))


def test_styp_and_free_boxes_skipped():
    """CMAF media segments open with styp; free boxes pad. Both skip."""
    payload, vid, _ = _two_track(nf=1)
    # insert styp + free between moov and moof — data offsets are
    # moof-relative (default-base-is-moof), so nothing needs patching
    i = payload.index(b"moof") - 4
    styp = struct.pack(">I", 20) + b"styp" + b"cmfs" + struct.pack(">I", 0) + b"cmfs"
    free = struct.pack(">I", 12) + b"free" + b"pad!"
    spliced = payload[:i] + styp + free + payload[i:]
    tracks = demux_mp4_fragments(spliced)
    assert [s["data"] for s in tracks[0]["samples"]] == [
        b for f in vid for b in f
    ]


def test_plain_mp4_has_no_fragments():
    """A progressive (moov-only) MP4 demuxes to tracks with zero
    fragment samples — demux_mp4_fragments reads fragments, not stbl."""
    from pyiceberg_lakehouse_spark.operators.multimodal import make_mp4_media

    payload = make_mp4_media(
        [b"abc", b"defg"], stts_runs=[(2, 100)], sync_every=2,
    )
    tracks = demux_mp4_fragments(payload)
    assert len(tracks) == 1
    assert tracks[0]["samples"] == []


# ----------------------------------------------------------------- webp ---
# (colocated with the container probes rather than a new file)


def test_webp_probe_variants():
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        decode_image_codec,
        make_webp,
        probe_webp,
    )

    for v in ("VP8 ", "VP8L", "VP8X"):
        m = probe_webp(make_webp(12345, 300, v))
        if v == "VP8 ":
            # lossy dims are 14-bit fields; the synthesizer masks
            assert m["width"] == 12345 & 0x3FFF
        else:
            assert m["width"] == 12345
        assert m["height"] == 300 and m["variant"] == v
    m = probe_webp(make_webp(64, 48, "VP8L", has_alpha=True))
    assert m["has_alpha"]
    m = probe_webp(make_webp(64, 48, "VP8X", has_alpha=True, animated=True))
    assert m["has_alpha"] and m["animated"]
    assert decode_image_codec(make_webp(64, 48, "VP8X", has_alpha=True)) == (
        64, 48, "RGBA",
    )


def test_webp_hostile_inputs():
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        make_webp,
        probe_webp,
    )

    good = make_webp(10, 10, "VP8 ")
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        probe_webp(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="RIFF size exceeds"):
        probe_webp(good[:-4])
    raw = bytearray(good)
    raw[12 + 8 + 3 : 12 + 8 + 6] = b"\x00\x00\x00"  # break the sync code
    with pytest.raises(ValueError, match="sync code"):
        probe_webp(bytes(raw))
    with pytest.raises(ValueError, match="animation needs"):
        make_webp(4, 4, "VP8L", animated=True)
    with pytest.raises(ValueError, match="no VP8"):
        probe_webp(b"RIFF" + (4).to_bytes(4, "little") + b"WEBP")
