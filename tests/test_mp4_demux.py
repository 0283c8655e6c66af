"""ISO BMFF sample-table demux properties (operators/multimodal.py:
make_mp4_media / demux_mp4). The differential query
multimodal_mp4_samples pins the happy path against a closed-form
oracle; these tests pin the table semantics the synthesizer doesn't
exercise: fixed-size stsz, absent stss (all-sync per spec), co64,
single-chunk layouts, and corruption rejection."""

from __future__ import annotations

import struct

import pytest

from pyiceberg_lakehouse_spark.operators.multimodal import (
    demux_mp4,
    make_mp4_media,
    mp4_mdat_start,
    probe_mp4,
)


def _samples(n: int, base: int = 30) -> list[bytes]:
    return [bytes((i * 7 + j) % 256 for j in range(base + i)) for i in range(n)]


def test_roundtrip_bytes_offsets_timestamps():
    payloads = _samples(11)
    mp4 = make_mp4_media(payloads, stts_runs=[(5, 100), (6, 150)])
    out = demux_mp4(mp4)
    assert [s["data"] for s in out] == payloads
    assert [s["dts"] for s in out] == [
        0, 100, 200, 300, 400, 500, 650, 800, 950, 1100, 1250
    ]
    # every offset slices exactly its sample back out of the file
    for s in out:
        assert mp4[s["offset"] : s["offset"] + s["size"]] == s["data"]
    # mdat-relative offsets are the size prefix sums (contiguous layout)
    base = mp4_mdat_start(mp4)
    acc = 0
    for s, p in zip(out, payloads):
        assert s["offset"] - base == acc
        acc += len(p)


def test_sync_flags_every_4th():
    mp4 = make_mp4_media(_samples(10), stts_runs=[(10, 40)], sync_every=4)
    assert [s["is_sync"] for s in demux_mp4(mp4)] == [
        True, False, False, False, True, False, False, False, True, False
    ]


def test_absent_stss_means_all_sync():
    mp4 = bytearray(make_mp4_media(_samples(6), stts_runs=[(6, 10)]))
    i = bytes(mp4).find(b"stss")
    mp4[i : i + 4] = b"free"  # neuter the box; spec: no stss => all sync
    out = demux_mp4(bytes(mp4))
    assert all(s["is_sync"] for s in out)


def test_single_chunk_and_ragged_final_chunk():
    # 7 samples at 3/chunk -> chunks of 3,3,1 (ragged stsc final run)
    out = demux_mp4(make_mp4_media(_samples(7), stts_runs=[(7, 10)]))
    assert len(out) == 7
    # 2 samples -> single chunk, single stsc entry
    out = demux_mp4(make_mp4_media(_samples(2), stts_runs=[(2, 10)]))
    assert [s["idx"] for s in out] == [0, 1]


def test_fixed_size_stsz():
    payloads = [bytes(range(50))] * 4
    mp4 = bytearray(make_mp4_media(payloads, stts_runs=[(4, 10)]))
    # rewrite stsz to the fixed-size form: sample_size=50, no table
    i = bytes(mp4).find(b"stsz")
    body = i + 4
    struct.pack_into(">B3xII", mp4, body, 0, 50, 4)
    out = demux_mp4(bytes(mp4))
    assert [s["size"] for s in out] == [50, 50, 50, 50]
    assert [s["data"] for s in out] == payloads


def test_probe_still_reads_duration():
    mp4 = make_mp4_media(_samples(8), stts_runs=[(8, 125)])
    _brand, duration_ms, _w, _h, n_tracks = probe_mp4(mp4)
    assert duration_ms == 1000 and n_tracks == 1


def test_corruption_rejected():
    mp4 = make_mp4_media(_samples(5), stts_runs=[(5, 10)])
    with pytest.raises(ValueError):
        demux_mp4(mp4[:40])  # truncated mid-box
    bad = bytearray(mp4)
    i = bytes(bad).find(b"stts")
    struct.pack_into(">I", bad, i + 8, 99)  # stts count disagrees with stsz
    with pytest.raises(ValueError):
        demux_mp4(bytes(bad))
    with pytest.raises(ValueError):
        demux_mp4(b"\x00\x00\x00\x08junk")  # no ftyp


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=40),
    spc=st.integers(min_value=1, max_value=7),
    sync_every=st.integers(min_value=1, max_value=9),
    delta=st.integers(min_value=1, max_value=10_000),
    seed=st.integers(min_value=0, max_value=255),
)
def test_roundtrip_property(sizes, spc, sync_every, delta, seed):
    """Any sample-size sequence, chunking, sync cadence and timing must
    survive the write -> demux roundtrip byte- and field-exactly."""
    payloads = [
        bytes((seed + i * 31 + j * 7) % 256 for j in range(n))
        for i, n in enumerate(sizes)
    ]
    n = len(payloads)
    mp4 = make_mp4_media(
        payloads,
        stts_runs=[(n, delta)],
        sync_every=sync_every,
        samples_per_chunk=spc,
    )
    out = demux_mp4(mp4)
    assert [s["data"] for s in out] == payloads
    assert [s["dts"] for s in out] == [i * delta for i in range(n)]
    assert [s["is_sync"] for s in out] == [i % sync_every == 0 for i in range(n)]
    for s in out:
        assert mp4[s["offset"] : s["offset"] + s["size"]] == s["data"]


def test_hostile_fixed_size_count_rejected_before_allocation():
    """A fixed-size stsz claiming 50M samples of 50 bytes fits any box
    header but not the file — must raise, not allocate a 400 MB list."""
    mp4 = bytearray(make_mp4_media([bytes(50)] * 4, stts_runs=[(4, 10)]))
    i = bytes(mp4).find(b"stsz")
    struct.pack_into(">B3xII", mp4, i + 4, 0, 50, 50_000_000)
    with pytest.raises(ValueError):
        demux_mp4(bytes(mp4))


def test_multi_track_refused_not_mixed():
    """Two traks would overwrite each other's sample tables in the flat
    box dict (e.g. video stss applied to audio samples) — the demux must
    refuse rather than silently mix tracks."""
    mp4 = make_mp4_media(_samples(4), stts_runs=[(4, 10)])
    # graft a second (empty) trak into moov: locate moov, append a
    # minimal trak box by rebuilding the file with the boxes re-wrapped
    moov_at = mp4.find(b"moov") - 4
    moov_size = struct.unpack_from(">I", mp4, moov_at)[0]
    fake_trak = struct.pack(">I4s", 8, b"trak")
    new_moov_body = mp4[moov_at + 8 : moov_at + moov_size] + fake_trak
    new_moov = struct.pack(">I4s", 8 + len(new_moov_body), b"moov") + new_moov_body
    doctored = mp4[:moov_at] + new_moov + mp4[moov_at + moov_size :]
    with pytest.raises(ValueError, match="trak"):
        demux_mp4(doctored)


def test_husk_box_header_rejected():
    """An 8-byte stsz husk (no room for its own header fields) must
    raise instead of parsing the next box's bytes as sample counts."""
    mp4 = make_mp4_media(_samples(3), stts_runs=[(3, 10)])
    i = mp4.find(b"stsz") - 4
    old_size = struct.unpack_from(">I", mp4, i)[0]
    # shrink stsz to a husk and pad the freed bytes as a free box so the
    # sibling walk still parses
    doctored = bytearray(mp4)
    struct.pack_into(">I", doctored, i, 8)
    freed = old_size - 8
    struct.pack_into(">I4s", doctored, i + 8, freed, b"free")
    with pytest.raises(ValueError):
        demux_mp4(bytes(doctored))


# ------------------------------------------------- multi-track demux ------

from pyiceberg_lakehouse_spark.operators.multimodal import (  # noqa: E402
    demux_mp4_tracks,
    make_mp4_media_multi,
    ulaw_decode,
)


def _track(sizes, seed, **kw):
    return {
        "samples": [
            bytes((seed + i * 31 + j * 7) % 256 for j in range(n))
            for i, n in enumerate(sizes)
        ],
        "stts_runs": [(len(sizes), 10)],
        **kw,
    }


def test_multitrack_handler_routing_and_per_trak_tables():
    v = _track([40, 41, 42, 43, 44], 1, handler="vide", sync_every=2,
               samples_per_chunk=2)
    a = _track([20, 21, 22, 23, 24, 25, 26], 2, handler="soun",
               samples_per_chunk=3)
    mp4 = make_mp4_media_multi([v, a])
    tr = demux_mp4_tracks(mp4)
    assert [(t["track_id"], t["handler"], t["codec"]) for t in tr] == [
        (1, "vide", "mp4v"), (2, "soun", "ulaw")
    ]
    # per-trak scoping: the video stss must NOT leak onto audio samples
    assert [s["is_sync"] for s in tr[0]["samples"]] == [
        True, False, True, False, True
    ]
    assert all(s["is_sync"] for s in tr[1]["samples"])  # no stss => all sync
    assert [s["data"] for s in tr[0]["samples"]] == v["samples"]
    assert [s["data"] for s in tr[1]["samples"]] == a["samples"]


def test_multitrack_interleaved_chunk_offsets():
    """Chunks are laid out v0 a0 v1 a1 ... with the longer track's tail
    appended — every sample's absolute offset must slice its exact bytes
    back out of the interleaved mdat."""
    v = _track([50] * 6, 3, handler="vide", samples_per_chunk=2)
    a = _track([30] * 12, 4, handler="soun", samples_per_chunk=3)
    mp4 = make_mp4_media_multi([v, a])
    tr = demux_mp4_tracks(mp4)
    for t, src in zip(tr, (v, a)):
        for s, payload in zip(t["samples"], src["samples"]):
            assert mp4[s["offset"] : s["offset"] + s["size"]] == payload
    # the mdat is genuinely interleaved: audio chunk 0 sits between video
    # chunks 0 and 1
    v_off = [s["offset"] for s in tr[0]["samples"]]
    a_off = [s["offset"] for s in tr[1]["samples"]]
    assert v_off[0] < a_off[0] < v_off[2]


def test_single_track_demux_still_refuses_multitrack():
    mp4 = make_mp4_media_multi(
        [_track([40] * 3, 5), _track([20] * 3, 6, handler="soun")]
    )
    with pytest.raises(ValueError, match="trak"):
        demux_mp4(mp4)


def test_nested_trak_rejected():
    mp4 = make_mp4_media(_samples(3), stts_runs=[(3, 10)])
    # wrap the existing trak in ANOTHER trak box: nested traks are
    # corruption, not data
    i = mp4.find(b"trak") - 4
    trak_size = struct.unpack_from(">I", mp4, i)[0]
    inner = mp4[i : i + trak_size]
    outer = struct.pack(">I4s", 8 + len(inner), b"trak") + inner
    moov_at = mp4.find(b"moov") - 4
    moov_size = struct.unpack_from(">I", mp4, moov_at)[0]
    new_body = (
        mp4[moov_at + 8 : i] + outer + mp4[i + trak_size : moov_at + moov_size]
    )
    new_moov = struct.pack(">I4s", 8 + len(new_body), b"moov") + new_body
    doctored = mp4[:moov_at] + new_moov + mp4[moov_at + moov_size :]
    with pytest.raises(ValueError, match="nested trak"):
        demux_mp4_tracks(doctored)


@settings(max_examples=25, deadline=None)
@given(
    v_sizes=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=20),
    a_sizes=st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=30),
    v_spc=st.integers(min_value=1, max_value=5),
    a_spc=st.integers(min_value=1, max_value=7),
    sync_every=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=255),
)
def test_multitrack_roundtrip_property(v_sizes, a_sizes, v_spc, a_spc, sync_every, seed):
    """Any 2-trak layout — arbitrary per-trak sample sizes, chunking and
    sync cadence — must survive the interleaved write -> per-trak demux
    roundtrip byte- and field-exactly on BOTH traks."""
    v = _track(v_sizes, seed, handler="vide", sync_every=sync_every,
               samples_per_chunk=v_spc)
    a = _track(a_sizes, seed + 1, handler="soun", samples_per_chunk=a_spc)
    mp4 = make_mp4_media_multi([v, a])
    tr = demux_mp4_tracks(mp4)
    assert [t["handler"] for t in tr] == ["vide", "soun"]
    assert [s["data"] for s in tr[0]["samples"]] == v["samples"]
    assert [s["data"] for s in tr[1]["samples"]] == a["samples"]
    assert [s["is_sync"] for s in tr[0]["samples"]] == [
        i % sync_every == 0 for i in range(len(v_sizes))
    ]
    assert all(s["is_sync"] for s in tr[1]["samples"])
    for t in tr:
        for s in t["samples"]:
            assert mp4[s["offset"] : s["offset"] + s["size"]] == s["data"]


# --------------------------------------------------- G.711 mu-law ---------

import numpy as np  # noqa: E402


def test_ulaw_decode_canonical_values():
    """Endpoints from the published CCITT tables: 0x00 -> -32124 (max
    negative), 0xFF -> +0, 0x7F -> -0, 0x80 -> +32124 (max positive)."""
    vals = ulaw_decode(np.array([0x00, 0xFF, 0x7F, 0x80], dtype=np.uint8))
    assert list(vals) == [-32124, 0, 0, 32124]
    # full range is the 14-bit-expanded G.711 envelope
    allv = ulaw_decode(np.arange(256, dtype=np.uint8))
    assert allv.min() == -32124 and allv.max() == 32124


def test_ulaw_decode_matches_scalar_reference():
    """The vectorized decode equals the textbook scalar expansion for
    every byte."""

    def scalar(b):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    got = ulaw_decode(np.arange(256, dtype=np.uint8))
    assert list(got) == [scalar(b) for b in range(256)]


# ------------------------------------------------ ctts / pts + A-law ------

from pyiceberg_lakehouse_spark.operators.multimodal import alaw_decode  # noqa: E402


def test_absent_ctts_means_pts_equals_dts():
    mp4 = make_mp4_media(_samples(5), stts_runs=[(5, 40)])
    assert all(s["pts"] == s["dts"] for s in demux_mp4(mp4))


@settings(max_examples=25, deadline=None)
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    delta=st.integers(min_value=1, max_value=500),
    seed=st.integers(min_value=0, max_value=255),
)
def test_ctts_roundtrip_property(offsets, delta, seed):
    """Any composition-offset sequence survives the RLE write -> run
    expansion roundtrip: pts == dts + offset for every sample."""
    n = len(offsets)
    payloads = [bytes((seed + i) % 256 for _ in range(10)) for i in range(n)]
    mp4 = make_mp4_media_multi(
        [{"samples": payloads, "stts_runs": [(n, delta)], "ctts_offsets": offsets}]
    )
    out = demux_mp4_tracks(mp4)[0]["samples"]
    assert [s["pts"] - s["dts"] for s in out] == offsets
    assert [s["dts"] for s in out] == [i * delta for i in range(n)]


def test_ctts_count_mismatch_rejected():
    mp4 = bytearray(
        make_mp4_media_multi(
            [{"samples": [bytes(10)] * 4, "stts_runs": [(4, 10)],
              "ctts_offsets": [1, 2, 3, 4]}]
        )
    )
    i = bytes(mp4).find(b"ctts")
    struct.pack_into(">I", mp4, i + 8, 99)  # entry count disagrees w/ stsz
    with pytest.raises(ValueError):
        demux_mp4_tracks(bytes(mp4))


def test_alaw_decode_canonical_values():
    """Endpoints from the published tables: 0x55 -> -8, 0xD5 -> +8,
    0x2A -> -32256 (max negative), 0xAA -> +32256 (max positive)."""
    vals = alaw_decode(np.array([0x55, 0xD5, 0x2A, 0xAA], dtype=np.uint8))
    assert list(vals) == [-8, 8, -32256, 32256]
    allv = alaw_decode(np.arange(256, dtype=np.uint8))
    assert allv.min() == -32256 and allv.max() == 32256


def test_alaw_decode_matches_scalar_reference():
    def scalar(b):
        a = b ^ 0x55
        seg = (a >> 4) & 0x07
        t = (a & 0x0F) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    got = alaw_decode(np.arange(256, dtype=np.uint8))
    assert list(got) == [scalar(b) for b in range(256)]


# --------------------------------------------------- MP3 frame demux ------

from pyiceberg_lakehouse_spark.operators.multimodal import (  # noqa: E402
    demux_mp3_frames,
    make_mp3,
)


def test_mp3_frame_demux_extents_and_timestamps():
    mp3 = make_mp3(n_frames=7, bitrate_kbps=96, sample_rate=48000, fill_seed=9)
    frames = demux_mp3_frames(mp3)
    flen = 144 * 96 * 1000 // 48000
    assert [f["offset"] for f in frames] == [i * flen for i in range(7)]
    assert all(f["size"] == flen for f in frames)
    assert [f["dts_ms"] for f in frames] == [i * 1152 * 1000 // 48000 for i in range(7)]
    # seeded main data roundtrips through the extents
    for i, f in enumerate(frames):
        assert f["data"][4:] == bytes(
            (9 + i * 7 + j * 3) % 256 for j in range(flen - 4)
        )
        assert mp3[f["offset"] : f["offset"] + f["size"]] == f["data"]


def test_mp3_frame_demux_strict_about_corruption():
    mp3 = make_mp3(n_frames=3, bitrate_kbps=128, sample_rate=44100)
    with pytest.raises(ValueError, match="truncated"):
        demux_mp3_frames(mp3[:-10])  # last frame's length overruns
    with pytest.raises(ValueError, match="frame sync"):
        demux_mp3_frames(b"\x00\x00" + mp3)
    # a padded frame steps flen+1: build one by hand (padding bit set)
    flen = 144 * 128 * 1000 // 44100
    hdr = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2) | 0x02, 0x00])
    padded = hdr + b"\x00" * (flen + 1 - 4)
    frames = demux_mp3_frames(padded + mp3)
    assert frames[0]["size"] == flen + 1 and frames[1]["offset"] == flen + 1


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=30),
    br=st.sampled_from([56, 64, 96, 128, 160, 224]),
    rate=st.sampled_from([44100, 48000, 32000]),
    seed=st.integers(min_value=0, max_value=255),
)
def test_mp3_frame_demux_property(n, br, rate, seed):
    mp3 = make_mp3(n_frames=n, bitrate_kbps=br, sample_rate=rate, fill_seed=seed)
    frames = demux_mp3_frames(mp3)
    assert len(frames) == n
    assert b"".join(f["data"] for f in frames) == mp3


def test_pcm16_decode_both_endiannesses():
    from pyiceberg_lakehouse_spark.operators.multimodal import pcm16_decode

    data = bytes([0x01, 0x02, 0xFF, 0x7F, 0x00, 0x80])
    le = pcm16_decode(data, big_endian=False)
    be = pcm16_decode(data, big_endian=True)
    assert list(le) == [0x0201, 0x7FFF, -32768]
    assert list(be) == [0x0102, -0x81, 0x80]
    with pytest.raises(ValueError, match="odd byte count"):
        pcm16_decode(b"\x00\x01\x02", big_endian=False)


def test_audio_codec_routing_cycles_all_four():
    from pyiceberg_lakehouse_spark.operators.multimodal import _synthetic_2trak_mp4

    codecs = []
    for d in range(4, 8):
        mp4, _nv, _na = _synthetic_2trak_mp4(d)
        tr = demux_mp4_tracks(mp4)
        codecs.append(tr[1]["codec"])
        if tr[1]["codec"] in ("sowt", "twos"):
            assert all(s["size"] % 2 == 0 for s in tr[1]["samples"])
    assert codecs == ["ulaw", "alaw", "sowt", "twos"]


# ------------------------------------------------------- edts / elst ------


def test_elst_roundtrip_and_absent_is_none():
    # iPhone-style trim: one empty edit (delay) + one trimmed segment
    edits = [(500, -1, 1.0), (2000, 350, 1.0)]
    mp4 = make_mp4_media_multi(
        [{"samples": [bytes(10)] * 3, "stts_runs": [(3, 100)], "elst": edits}]
    )
    tr = demux_mp4_tracks(mp4)
    assert tr[0]["edits"] == [
        {"segment_duration": 500, "media_time": -1, "rate": 1.0},
        {"segment_duration": 2000, "media_time": 350, "rate": 1.0},
    ]
    plain = make_mp4_media(_samples(3), stts_runs=[(3, 10)])
    assert demux_mp4_tracks(plain)[0]["edits"] is None


def test_elst_hostile_entry_count_rejected():
    mp4 = bytearray(
        make_mp4_media_multi(
            [{"samples": [bytes(10)] * 3, "stts_runs": [(3, 100)],
              "elst": [(1000, 0, 1.0)]}]
        )
    )
    i = bytes(mp4).find(b"elst")
    struct.pack_into(">I", mp4, i + 8, 1_000_000)  # count exceeds the box
    with pytest.raises(ValueError, match="elst"):
        demux_mp4_tracks(bytes(mp4))


def test_v1_tkhd_and_mdhd_offsets():
    """Version-1 boxes widen the time fields to 8 bytes: track_ID sits at
    body+20 in tkhd (not +24) and timescale at body+20 in mdhd — pinned
    with handcrafted v1 boxes since the synthesizer emits v0."""
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        _box,
        _parse_mp4_tracks,
    )

    tkhd_v1 = _box(
        b"tkhd",
        struct.pack(">B3s", 1, b"\x00\x00\x07")
        + b"\x00" * 16  # creation + modification (8 + 8)
        + struct.pack(">I", 77)  # track_ID
        + b"\x00" * 4
        + struct.pack(">Q", 1000)  # duration (v1: 8 bytes)
        + b"\x00" * 52,
    )
    mdhd_v1 = _box(
        b"mdhd",
        struct.pack(">B3x", 1)
        + b"\x00" * 16  # creation + modification (8 + 8)
        + struct.pack(">IQ", 90000, 1000)  # timescale, duration
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x4x4s12x", 0, b"vide") + b"\x00")
    trak = _box(b"trak", tkhd_v1 + _box(b"mdia", mdhd_v1 + hdlr))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    tracks = _parse_mp4_tracks(ftyp + _box(b"moov", trak))
    assert len(tracks) == 1
    assert tracks[0]["track_id"] == 77
    assert tracks[0]["timescale"] == 90000
    assert tracks[0]["handler"] == "vide"


# ---------------------------------------------------- IMA ADPCM 'ima4' ----

from pyspark.sql import functions as F  # noqa: E402

from pyiceberg_lakehouse_spark.operators.multimodal import (  # noqa: E402
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    _cf_bytes,
    _synthetic_2trak_mp4,
    ima4_decode,
)


def test_ima4_decode_matches_scalar_reference():
    """The block-vectorized walk equals the textbook scalar IMA state
    machine (step table + index adaptation, int16 clamp) on arbitrary
    block bytes, including the preamble sign-extension and index clamp."""

    def scalar(data):
        out = []
        for b0 in range(0, len(data), 34):
            blk = data[b0 : b0 + 34]
            pre = blk[0] * 256 + blk[1]
            pred = pre & 0xFF80
            if pred >= 0x8000:
                pred -= 0x10000
            idx = min(pre & 0x7F, 88)
            for j in range(64):
                byte = blk[2 + j // 2]
                n = byte & 0xF if j % 2 == 0 else byte >> 4
                step = int(_IMA_STEP_TABLE[idx])
                diff = step >> 3
                if n & 4:
                    diff += step
                if n & 2:
                    diff += step >> 1
                if n & 1:
                    diff += step >> 2
                pred = pred - diff if n & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[n & 7])))
                out.append(pred)
        return out

    rng = np.random.default_rng(29)
    for nblk in (1, 2, 5):
        data = rng.integers(0, 256, size=34 * nblk, dtype=np.uint8).tobytes()
        assert list(ima4_decode(data)) == scalar(data)
    # seed states that hit the clamps: max step index (clamped 127 -> 88),
    # most-negative predictor
    edge = bytes([0x80, 0x7F]) + b"\xff" * 32
    assert list(ima4_decode(edge)) == scalar(edge)


def test_ima4_decode_known_vector():
    """Hand-checkable: zero preamble (pred=0, idx=0, step=7), all-zero
    nibbles -> every step adds step>>3 = 0 and idx walks down to 0; the
    decode is all zeros. Nibble 8 (sign bit only) also adds -0."""
    assert list(ima4_decode(bytes(34))) == [0] * 64
    allsign = bytes(2) + b"\x88" * 32
    assert list(ima4_decode(allsign)) == [0] * 64
    # nibble 3: diff = step>>1 + step>>2 + step>>3, idx stays 0 -> every
    # sample adds 3+1+0 = ... step=7: 3 + 1 + 0 = 4? no: 7>>3=0, 7>>1=3,
    # 7>>2=1 -> +4 per sample, idx += -1 (clamped 0), so ramp 4,8,12,...
    ramp = ima4_decode(bytes(2) + b"\x33" * 32)
    assert list(ramp[:4]) == [4, 8, 12, 16]


def test_ima4_decode_rejects_partial_block():
    with pytest.raises(ValueError, match="whole 34-byte blocks"):
        ima4_decode(b"\x00" * 35)


def test_ima4_trak_routes_through_demux():
    """The 'ima4' fourcc travels through the stsd box and the demux
    reports it; sample sizes are whole blocks by construction."""
    mp4, _nv, na = _synthetic_2trak_mp4(11, audio_codec="ima4")
    tracks = demux_mp4_tracks(mp4)
    soun = [t for t in tracks if t["handler"] == "soun"]
    assert len(soun) == 1 and soun[0]["codec"] == "ima4"
    assert len(soun[0]["samples"]) == na
    for s in soun[0]["samples"]:
        assert len(s["data"]) % 34 == 0
        assert s["data"] == _cf_bytes(
            11 * 3 + s["idx"] * 7, 11, len(s["data"])
        )


def test_ima4_unknown_codec_still_gated(spark, sf_dir):
    """Routing honesty: a fourcc outside the five supported formats
    raises NotImplementedError, never guesses."""
    import pandas as pd  # noqa: F401

    from pyiceberg_lakehouse_spark.operators.multimodal import (
        decode_mp4_audio,
    )
    from pyiceberg_lakehouse_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 31 == 1
    )
    with pytest.raises(Exception, match="audio codec"):
        decode_mp4_audio(docs, audio_codec="opus").collect()


def test_ima4_decode_composition(spark, sf_dir):
    """decode_mp4_audio(audio_codec='ima4') matches a direct per-doc
    decode of the closed-form blocks."""
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        decode_mp4_audio,
    )
    from pyiceberg_lakehouse_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 3
    )
    got = {
        (r["doc_id"], r["sample_idx"]): (
            r["n_pcm"], r["pcm_sum"], r["pcm_min"], r["pcm_max"]
        )
        for r in decode_mp4_audio(docs, audio_codec="ima4").collect()
    }
    assert got
    for d in [r["doc_id"] for r in docs.select("doc_id").collect()]:
        na = 8 + d % 5
        for i in range(na):
            sz = 34 * (1 + (d + 5 * i) % 2)
            pcm = ima4_decode(_cf_bytes(d * 3 + i * 7, 11, sz))
            assert got[(d, i)] == (
                len(pcm), int(pcm.sum()), int(pcm.min()), int(pcm.max())
            )
