"""Property tests for the r14 second-wave codecs: arbitrary content
through the PDF writer/reader and the FLAC encoder/decoder."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyiceberg_lakehouse_spark.operators.flac import (
    decode_flac,
    encode_flac,
)
from pyiceberg_lakehouse_spark.operators.pdf import (
    encode_pdf,
    extract_pdf_text,
)

# printable latin-1 minus nothing: parens/backslashes must escape
_line = st.text(
    st.characters(min_codepoint=32, max_codepoint=255),
    min_size=0,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(
        st.lists(_line, min_size=1, max_size=6), min_size=1, max_size=3
    ),
    compress=st.booleans(),
    xref_stream=st.booleans(),
    hex_strings=st.booleans(),
    objstm=st.booleans(),
)
def test_pdf_arbitrary_text_roundtrips(
    pages, compress, xref_stream, hex_strings, objstm
):
    blob = encode_pdf(
        pages,
        compress=compress,
        xref_stream=xref_stream,
        object_streams=objstm and xref_stream,
        hex_strings=hex_strings,
    )
    r = extract_pdf_text(blob)
    assert r["pages"] == ["\n".join(p) for p in pages]
    assert r["n_pages"] == len(pages)


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=300),
    xref_stream=st.booleans(),
)
def test_pdf_never_misparses_on_truncation(data, xref_stream):
    """Truncating a valid PDF anywhere raises a clean error or (for a
    cut that leaves an older intact %%EOF) parses — it never crashes
    with an unrelated exception type."""
    blob = encode_pdf([["hello world"]], xref_stream=xref_stream)
    cut = len(data) % max(1, len(blob) - 1) + 1
    try:
        extract_pdf_text(blob[:cut])
    except (ValueError, NotImplementedError, KeyError, IndexError):
        pass  # clean structured rejection
    except EOFError:
        pass


_samples = st.lists(
    st.integers(min_value=-(1 << 15), max_value=(1 << 15) - 1),
    min_size=1,
    max_size=400,
)


@settings(max_examples=40, deadline=None)
@given(
    left=_samples,
    mode=st.sampled_from(
        ["independent", "left_side", "right_side", "mid_side"]
    ),
    sub=st.sampled_from(["verbatim", "fixed", "lpc", "constant"]),
    order=st.integers(min_value=0, max_value=4),
    part_order=st.integers(min_value=0, max_value=2),
    rice=st.integers(min_value=2, max_value=14),
)
def test_flac_arbitrary_signal_lossless(
    left, mode, sub, order, part_order, rice
):
    right = [(-s) ^ 0x1234 for s in left]
    right = [max(-(1 << 15), min((1 << 15) - 1, s)) for s in right]
    chans = [left, right]
    blob = encode_flac(
        chans,
        blocksize=64,
        stereo_mode=mode,
        subframe=sub,
        fixed_order=order,
        lpc_coeffs=[3, -2],
        part_order=part_order,
        rice_param=rice,
    )
    got, meta = decode_flac(blob)
    assert got == chans
    assert meta["md5_match"]


@settings(max_examples=30, deadline=None)
@given(
    samples=_samples,
    flip=st.integers(min_value=0, max_value=10_000),
)
def test_flac_bit_flips_never_pass_silently(samples, flip):
    """Any single bit flip in the frame region must either raise (CRC
    or structure) or still decode the exact original (a flip in
    padding bits) — never yield different audio with md5_match True."""
    blob = bytearray(encode_flac([samples], blocksize=64))
    # locate first frame (after fLaC + metadata blocks)
    pos = 4
    last = False
    while not last:
        last = bool(blob[pos] & 0x80)
        pos += 4 + int.from_bytes(blob[pos + 1 : pos + 4], "big")
    if pos >= len(blob):
        return
    at = pos + flip % (len(blob) - pos)
    blob[at] ^= 1 << (flip % 8)
    try:
        got, meta = decode_flac(bytes(blob))
    except (ValueError, NotImplementedError):
        return
    if meta["md5_match"]:
        assert got == [samples]
