"""operators/multimodal.py BMP codec: the decoder must be a real BMP
parser — header-driven, padding-aware, orientation-tolerant — not an
inverse of our encoder's happy path."""

from __future__ import annotations

import struct

import pytest

from beam_scala_examples_spark.operators.multimodal import (
    _bmp_pixels,
    decode_bmp,
    encode_bmp,
)


def test_round_trip_matches_pixel_formula():
    text = "The quick brown fox jumps over the lazy dog"
    doc_id = 7
    w, h = 1 + len(text) % 7, 1 + doc_id % 5
    px = _bmp_pixels(text, w * h)
    got = decode_bmp(encode_bmp(doc_id, text))
    assert got == {
        "width": w,
        "height": h,
        "sum_r": sum(p[0] for p in px),
        "sum_g": sum(p[1] for p in px),
        "sum_b": sum(p[2] for p in px),
    }


def test_row_padding_not_counted():
    # width 2 -> 6 pixel bytes/row + 2 padding bytes; a decoder that
    # walks rows as 3*w without honouring the 4-byte stride would read
    # padding as pixels from row 2 on.
    text = "a"          # w = 1 + 1 % 7 = 2
    got = decode_bmp(encode_bmp(4, text))  # h = 1 + 4 % 5 = 5
    assert (got["width"], got["height"]) == (2, 5)
    v = ord("a")
    n_px = 2 * 5
    assert got["sum_r"] == got["sum_g"] == got["sum_b"] == v * n_px


def test_top_down_bmp_decodes():
    """Negative biHeight (top-down raster) is legal BMP; the decoder
    must take abs() for geometry.  Build one by hand."""
    w, h = 3, 2
    row = (3 * w + 3) // 4 * 4
    raster = bytearray()
    for y in range(h):           # top-down: row 0 first
        for x in range(w):
            raster += bytes((10, 20, 30))  # B, G, R
        raster += b"\x00" * (row - 3 * w)
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(raster),
                      0, 0, 0, 0)
        + bytes(raster)
    )
    got = decode_bmp(payload)
    assert got == {
        "width": w, "height": h,
        "sum_r": 30 * w * h, "sum_g": 20 * w * h, "sum_b": 10 * w * h,
    }


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00garbage")
    good = bytearray(encode_bmp(1, "xyz"))
    good[28] = 8  # biBitCount = 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(good))


def test_wav_round_trip_matches_sample_formula():
    from beam_scala_examples_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    text = "Sphinx of black quartz, judge my vow"
    samples = [((ord(c) % 256) * 257) - 32768 for c in text]
    got = decode_wav(encode_wav(11, text))
    rate = (8000, 16000, 44100)[len(text) % 3]
    assert got == {
        "sample_rate": rate,
        "n_samples": len(text),
        "duration_us": len(text) * 1_000_000 // rate,
        "sum_abs": sum(abs(s) for s in samples),
        "peak": max(abs(s) for s in samples),
    }


def test_wav_skips_unknown_chunks_and_honours_alignment():
    """A LIST chunk with an ODD size before fmt/data: a decoder that
    forgets RIFF word alignment walks into garbage."""
    import struct

    from beam_scala_examples_spark.operators.multimodal import decode_wav

    data = struct.pack("<3h", 100, -200, 300)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd_junk = b"junk!"  # size 5 -> pad byte required
    chunks = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd_junk)) + odd_junk + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    got = decode_wav(payload)
    assert got == {
        "sample_rate": 8000,
        "n_samples": 3,
        "duration_us": 375,
        "sum_abs": 600,
        "peak": 300,
    }


def test_wav_rejects_non_wav_and_unsupported():
    import struct

    import pytest as _pytest

    from beam_scala_examples_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError):
        decode_wav(b"OggS\x00\x00\x00\x00nonsense")
    good = bytearray(encode_wav(1, "xyz"))
    # stereo: channels field is 2 bytes at offset 12+8+2 = 22
    struct.pack_into("<H", good, 22, 2)
    with _pytest.raises(ValueError):
        decode_wav(bytes(good))


def test_truncated_payloads_raise_value_error_not_foreign_types():
    """Size-corrupted / cut-off payloads must surface as the documented
    ValueError rejection, not IndexError or struct.error leaking out of
    the Arrow decode pass (round-4 advisor item)."""
    from beam_scala_examples_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    bmp = encode_bmp(3, "hello world")
    with pytest.raises(ValueError):
        decode_bmp(bmp[:40])            # header cut mid-way
    with pytest.raises(ValueError):
        decode_bmp(bmp[:-5])            # raster cut short
    lying = bytearray(bmp)
    struct.pack_into("<i", lying, 22, 9999)  # biHeight claims 9999 rows
    with pytest.raises(ValueError):
        decode_bmp(bytes(lying))

    wav = encode_wav(3, "hello world")
    with pytest.raises(ValueError):
        decode_wav(wav[:-4])            # data chunk body truncated
    lying = bytearray(wav)
    # data chunk size field at RIFF(12) + fmt(8+16) + 'data'(4) = 40
    struct.pack_into("<I", lying, 40, 1 << 20)  # claims 1 MiB of samples
    struct.pack_into("<I", lying, 4, 1 << 20)   # RIFF size backs the lie
    with pytest.raises(ValueError):
        decode_wav(bytes(lying))
    # truncated fmt chunk: declare size 8, cut the file there
    fmt8 = struct.pack("<HHI", 1, 1, 8000)[:8]
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", 8) + fmt8
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)


from hypothesis import given, settings, strategies as st


@given(
    doc_id=st.integers(0, 10_000),
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=200,
    ),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_bmp_round_trip_property(doc_id, text):
    """Random printable text x doc_id: the real parser must recover the
    construction formula's stats for every geometry (all widths 1..7,
    all heights 1..5, all padding cases)."""
    from beam_scala_examples_spark.operators.multimodal import (
        _bmp_pixels,
        decode_bmp,
        encode_bmp,
    )

    w, h = 1 + len(text) % 7, 1 + doc_id % 5
    px = _bmp_pixels(text, w * h)
    got = decode_bmp(encode_bmp(doc_id, text))
    assert got == {
        "width": w,
        "height": h,
        "sum_r": sum(p[0] for p in px),
        "sum_g": sum(p[1] for p in px),
        "sum_b": sum(p[2] for p in px),
    }


@given(
    doc_id=st.integers(0, 10_000),
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=200,
    ),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_wav_round_trip_property(doc_id, text):
    from beam_scala_examples_spark.operators.multimodal import (
        WAV_RATES,
        decode_wav,
        encode_wav,
    )

    samples = [((ord(c) % 256) * 257) - 32768 for c in text]
    rate = WAV_RATES[len(text) % 3]
    got = decode_wav(encode_wav(doc_id, text))
    assert got == {
        "sample_rate": rate,
        "n_samples": len(text),
        "duration_us": len(text) * 1_000_000 // rate,
        "sum_abs": sum(abs(s) for s in samples),
        "peak": max(abs(s) for s in samples),
    }


def _bmp_from_logical(px_rows, bottom_up: bool) -> bytes:
    """Hand-build a 24bpp BMP from logical (R,G,B) pixel rows in either
    storage orientation."""
    h = len(px_rows)
    w = len(px_rows[0])
    row = (3 * w + 3) // 4 * 4
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    raster = bytearray()
    for y in order:
        for r, g, b in px_rows[y]:
            raster += bytes((b, g, r))
        raster += b"\x00" * (row - 3 * w)
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1,
                      24, 0, len(raster), 0, 0, 0, 0)
        + bytes(raster)
    )


def test_resize_keeps_even_logical_rows_and_cols():
    """Nearest-neighbor 2x keeps logical (row, col) both even — and the
    SAME logical pixels regardless of storage orientation (a decoder
    that forgot the bottom-up flip keeps the wrong rows for even
    heights)."""
    from beam_scala_examples_spark.operators.multimodal import resize_bmp

    # 3x4 logical image, distinct per-pixel values
    px = [[(10 * y + x, 100 + 10 * y + x, 200 + 10 * y + x)
           for x in range(3)] for y in range(4)]
    keep = [px[y][x] for y in (0, 2) for x in (0, 2)]
    want = {
        "out_width": 2, "out_height": 2,
        "sum_r": sum(p[0] for p in keep),
        "sum_g": sum(p[1] for p in keep),
        "sum_b": sum(p[2] for p in keep),
    }
    assert resize_bmp(_bmp_from_logical(px, bottom_up=True)) == want
    assert resize_bmp(_bmp_from_logical(px, bottom_up=False)) == want


def test_resize_factor_one_is_identity_sums():
    from beam_scala_examples_spark.operators.multimodal import (
        decode_bmp,
        resize_bmp,
    )

    payload = encode_bmp(7, "The quick brown fox")
    full = decode_bmp(payload)
    got = resize_bmp(payload, factor=1)
    assert (got["out_width"], got["out_height"]) == (
        full["width"], full["height"]
    )
    assert {k: got[k] for k in ("sum_r", "sum_g", "sum_b")} == {
        k: full[k] for k in ("sum_r", "sum_g", "sum_b")
    }


def test_resize_rejects_truncation_and_bad_factor():
    from beam_scala_examples_spark.operators.multimodal import resize_bmp

    payload = encode_bmp(3, "hello world")
    with pytest.raises(ValueError):
        resize_bmp(payload[:40])
    with pytest.raises(ValueError):
        resize_bmp(payload[:-5])
    with pytest.raises(ValueError):
        resize_bmp(payload, factor=0)


def _fir_reference(samples, factor=2):
    """Arbitrary-precision mirror of the round-8 resample kernel:
    edge-replicated 5-tap binomial on the +32768-biased samples,
    shift-16 division, then the stride."""
    n = len(samples)
    u = [s + 32768 for s in samples]

    def c(i):
        return u[min(max(i, 0), n - 1)]

    filt = [
        ((c(i - 2) + 4 * c(i - 1) + 6 * c(i) + 4 * c(i + 1) + c(i + 2))
         >> 4) - 32768
        for i in range(n)
    ]
    return [abs(v) for v in filt[::factor]]


def test_resample_filters_then_keeps_every_other_sample():
    from beam_scala_examples_spark.operators.multimodal import (
        _wav_samples,
        encode_wav,
        resample_wav,
    )

    text = "resample me please"      # nc=18 -> rate 8000, 18 samples
    kept = _fir_reference(_wav_samples(text))
    got = resample_wav(encode_wav(1, text))
    assert got == {
        "sample_rate": 4000,
        "n_samples": len(kept),
        "duration_us": len(kept) * 1_000_000 // 4000,
        "sum_abs": sum(kept),
        "peak": max(kept),
    }


def test_resample_antialias_kills_nyquist_tone():
    """Round-8 low-pass pin (ADVICE-era production gap, verdict item
    5): a tone AT the input Nyquist (the worst aliasing case — plain
    ::2 decimation folds it to a full-amplitude DC tone) must VANISH
    through the binomial FIR, whose transfer (cos w/2)^4 is exactly
    zero there.  Interior filtered samples are (a+b)/2 - 32768 = 0 for
    the +/-20000 alternation; only the two edge-replicated samples may
    carry residue."""
    import struct

    from beam_scala_examples_spark.operators.multimodal import (
        resample_wav,
    )

    samples = [20000 if i % 2 == 0 else -20000 for i in range(64)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    got = resample_wav(payload)
    kept = _fir_reference(samples)
    assert got["n_samples"] == 32
    assert got["sum_abs"] == sum(kept)
    # every interior survivor is EXACTLY zero; without the filter each
    # would be 20000 (the folded tone)
    assert kept[1:-1] == [0] * 30
    assert got["sum_abs"] <= 2 * 20000 // 2   # edge residue only


def test_resample_rejects_truncation_and_bad_factor():
    from beam_scala_examples_spark.operators.multimodal import (
        encode_wav,
        resample_wav,
    )

    payload = encode_wav(3, "hello world")
    with pytest.raises(ValueError):
        resample_wav(payload[:20])
    with pytest.raises(ValueError):
        resample_wav(payload[:-3])
    with pytest.raises(ValueError):
        resample_wav(payload, factor=0)


def test_y4m_sampling_matches_luma_formula():
    from beam_scala_examples_spark.operators.multimodal import (
        _y4m_luma,
        encode_y4m,
        sample_y4m,
    )

    text = "frame sampling for real"
    doc_id = 9
    w, h = 1 + len(text) % 7, 1 + doc_id % 5
    nf = 1 + (doc_id + len(text)) % 6
    want_sum = sum(
        sum(_y4m_luma(text, f, w * h)) for f in range(0, nf, 2)
    )
    got = sample_y4m(encode_y4m(doc_id, text))
    assert got == {
        "width": w, "height": h, "fps": 25,
        "n_frames": nf, "n_sampled": (nf + 1) // 2, "sum_y": want_sum,
    }


def test_y4m_c420_plane_stride():
    """A hand-built C420jpeg stream: the sampler must stride w*h +
    2*(w/2)*(h/2) per frame — a C444-only walker would misalign on the
    second FRAME marker."""
    from beam_scala_examples_spark.operators.multimodal import sample_y4m

    w, h = 4, 2
    y0, y1 = bytes([1]) * (w * h), bytes([3]) * (w * h)
    chroma = bytes([128]) * ((w // 2) * (h // 2) * 2)
    payload = (
        b"YUV4MPEG2 W4 H2 F30:1 C420jpeg\n"
        + b"FRAME\n" + y0 + chroma
        + b"FRAME\n" + y1 + chroma
    )
    got = sample_y4m(payload)           # stride 2 -> samples frame 0 only
    assert got == {
        "width": 4, "height": 2, "fps": 30,
        "n_frames": 2, "n_sampled": 1, "sum_y": 1 * w * h,
    }
    assert sample_y4m(payload, stride=1)["sum_y"] == (1 + 3) * w * h


def test_y4m_rejects_malformed():
    from beam_scala_examples_spark.operators.multimodal import (
        encode_y4m,
        sample_y4m,
    )

    payload = encode_y4m(2, "hello there world")
    with pytest.raises(ValueError):
        sample_y4m(b"AVI1 garbage")
    with pytest.raises(ValueError):
        sample_y4m(payload[:-4])        # truncated last frame
    with pytest.raises(ValueError):
        sample_y4m(payload, stride=0)
    # corrupt the second FRAME marker
    idx = payload.find(b"FRAME\n", payload.find(b"FRAME\n") + 1)
    if idx >= 0:
        bad = payload[:idx] + b"XRAME" + payload[idx + 5:]
        with pytest.raises(ValueError):
            sample_y4m(bad)


def test_phash_orientation_sensitive_storage_invariant():
    """pHash is computed on the LOGICAL image: the same logical raster
    stored bottom-up (positive biHeight, encoder default) and top-down
    (negative biHeight) must hash identically — a decoder that skips
    the flip computes the DCT of a vertically mirrored image."""
    from beam_scala_examples_spark.operators.multimodal import (
        _bmp_pixels,
        encode_bmp,
        phash_bmp,
    )

    text = "The quick brown fox jumps over the lazy dog again"
    doc_id = 3                     # h = 4: flip matters
    bottom_up = encode_bmp(doc_id, text)
    w, h = 1 + len(text) % 7, 1 + doc_id % 5
    row = (3 * w + 3) // 4 * 4
    px = _bmp_pixels(text, w * h)
    raster = bytearray()
    for y in range(h):             # top-down storage: row 0 first
        for x in range(w):
            r, g, b = px[y * w + x]
            raster += bytes((b, g, r))
        raster += b"\x00" * (row - 3 * w)
    top_down = (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(raster),
                      0, 0, 0, 0)
        + bytes(raster)
    )
    assert phash_bmp(bottom_up) == phash_bmp(top_down)
    # and a genuinely mirrored image must NOT hash identically
    mirrored = bytearray(bottom_up)
    hdr = bytearray(struct.pack("<i", -h))
    mirrored[22:26] = hdr           # claim top-down without reordering
    assert phash_bmp(bytes(mirrored)) != phash_bmp(bottom_up)


def test_phash_rejects_corrupt_payloads():
    from beam_scala_examples_spark.operators.multimodal import (
        encode_bmp,
        phash_bmp,
    )

    with pytest.raises(ValueError):
        phash_bmp(b"JPEG~~~~")
    good = encode_bmp(5, "hello world")
    with pytest.raises(ValueError):
        phash_bmp(good[:40])        # truncated header
    with pytest.raises(ValueError):
        phash_bmp(good[:-4])        # truncated raster


def test_scene_keyframes_consistent_with_scene_cuts():
    """Round-8 video signatures: for any rendered stream the scene
    partition must agree with the round-6 cut detector — one scene per
    cut + 1, scene lengths summing to the sampled-frame count — and
    the keyframe signature must equal the md5-prefix of the keyframe
    luma string both engines derive from text."""
    import hashlib

    from beam_scala_examples_spark.operators.multimodal import (
        _y4m_luma,
        encode_y4m,
        scene_cuts_y4m,
        scene_keyframes_y4m,
    )

    for doc_id, text in [
        (1, "hello world this is a longer text for video"),
        (7, "abc" * 50), (12, "x" * 9), (23, "scene CUTS here!" * 9),
    ]:
        p = encode_y4m(doc_id, text)
        scenes = scene_keyframes_y4m(p)
        cuts = scene_cuts_y4m(p)
        assert len(scenes) == cuts["n_cuts"] + 1
        assert sum(s["scene_len"] for s in scenes) == cuts["n_sampled"]
        w = 1 + len(text) % 7
        h = 1 + doc_id % 5
        assert all(s["plane_px"] == w * h for s in scenes)
        # scene 0's keyframe is sampled frame 0 — recompute its sig
        luma = _y4m_luma(text, 0, w * h)
        want = int(
            hashlib.md5(
                " ".join(str(v) for v in luma).encode()
            ).hexdigest()[:8],
            16,
        )
        assert scenes[0]["sig"] == want


def test_audio_fingerprint_invariants():
    """Round-8 audio fingerprint: codes are 8-bit, one per frame t>=1;
    payloads shorter than a frame abstain; a one-character (one-sample)
    perturbation leaves the large majority of codes bit-identical (the
    robustness the pair rung's jaccard threshold is sized to); corrupt
    payloads raise."""
    import pytest as _pytest

    from beam_scala_examples_spark.operators.multimodal import (
        AUDIO_FRAME,
        AUDIO_HOP,
        encode_wav,
        fingerprint_wav,
    )

    text = "the quick brown fox jumps over the lazy dog " * 8
    fps = fingerprint_wav(encode_wav(3, text))
    n_frames = (len(text) - AUDIO_FRAME) // AUDIO_HOP + 1
    assert [f["frame_idx"] for f in fps] == list(range(1, n_frames))
    assert all(0 <= f["code"] <= 255 for f in fps)
    variant = text[:50] + "Z" + text[51:]
    fv = fingerprint_wav(encode_wav(3, variant))
    agree = sum(
        1 for a, b in zip(fps, fv) if a["code"] == b["code"]
    )
    assert agree >= len(fps) - 3   # <=2 frames -> <=3 codes touched
    assert fingerprint_wav(encode_wav(1, "tiny")) == []
    payload = encode_wav(3, text)
    with _pytest.raises(ValueError):
        fingerprint_wav(payload[:20])
    with _pytest.raises(ValueError):
        fingerprint_wav(payload[:-3])
