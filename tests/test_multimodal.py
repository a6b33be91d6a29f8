"""Multimodal plumbing tests: schema, Arrow batch shape, metadata pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.operators import multimodal as mm


def test_decode_image_runs_batched(spark):
    media = mm.synth_media(spark, 128)
    out = mm.decode_image(media)
    rows = out.collect()
    assert len(rows) == 128
    assert out.schema == mm.DECODED_IMAGE_SCHEMA
    for r in rows:
        assert 16 <= r.height < 64 and 16 <= r.width < 64
        assert 0.0 <= r.mean_luma <= 1.0
        assert r.n_bytes == 64  # sha2-256 hex → 64 bytes as binary-cast string


def test_decode_is_deterministic(spark):
    a = sorted(map(tuple, mm.decode_image(mm.synth_media(spark, 32)).collect()))
    b = sorted(map(tuple, mm.decode_image(mm.synth_media(spark, 32)).collect()))
    assert a == b


def test_real_codec_path_gates_on_pillow(spark):
    """The r10 feature-gated real decode path: when Pillow is importable
    the SAME Arrow kernels decode real pixels (exercised against the
    CRC-valid synthetic PNGs, dims cross-checked vs the header parser);
    when it is not — this sandbox — codec="real" fails FAST driver-side
    with ImportError, codec="auto" falls back to the stub, and the stub
    path stays bit-stable (the contract the spec-derived driver oracles
    pin)."""
    import pytest

    media = mm.synth_media(spark, 16)
    if mm._pillow() is not None:
        pngs = mm.synth_png_media(spark, 16)
        dec = {r.media_id: r for r in
               mm.decode_image(pngs, codec="real").collect()}
        hdr = {r.media_id: r for r in
               mm.png_header_stats(pngs).collect()}
        for mid, h in hdr.items():
            if h.valid:
                assert dec[mid].width == h.width
                assert dec[mid].height == h.height
                assert 0.0 <= dec[mid].mean_luma <= 1.0
        rs = mm.resize_images(pngs, max_side=8, codec="real").collect()
        assert all(max(r.width, r.height) <= 8 for r in rs)
        assert all(bytes(r.payload)[:8] == b"\x89PNG\r\n\x1a\n" for r in rs)
    else:
        with pytest.raises(ImportError, match="Pillow"):
            mm.decode_image(media, codec="real")
        with pytest.raises(ImportError, match="Pillow"):
            mm.resize_images(media, codec="real")
        # auto == stub here, and the stub is bit-stable: the documented
        # fake arithmetic on a known payload
        auto = sorted(map(tuple, mm.decode_image(media, codec="auto").collect()))
        stub = sorted(map(tuple, mm.decode_image(media, codec="stub").collect()))
        assert auto == stub
        assert mm._fake_decode(bytes([200, 10]) + bytes(30)) == (
            16 + 200 % 48,
            16 + 10,
            round((200 + 10) / (32 * 255.0), 6),
        )
    with pytest.raises(ValueError, match="unknown codec"):
        mm.decode_image(media, codec="webp")


def test_filter_by_meta_prunes_payload(spark):
    media = mm.synth_media(spark, 16)
    out = mm.filter_by_meta(media, media_type="image", min_width=64)
    assert out.count() == 16
    assert mm.filter_by_meta(media, media_type="video").count() == 0
    # metadata-only projection must not reference payload in the plan
    plan = mm.filter_by_meta(media, media_type="image").select(
        "media_id", "meta"
    )._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_sample_frames(spark):
    vids = spark.range(2).select(
        F.col("id").alias("media_id"),
        F.lit(b"x").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(3500).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    frames = mm.sample_frames(vids, every_ms=1000).collect()
    # 0,1000,2000,3000 per video
    assert len(frames) == 8
    assert {f.frame_ts_ms for f in frames} == {0, 1000, 2000, 3000}


def test_resize_images_binary_roundtrip(spark):
    """resize emits binary payloads (Arrow binary both directions), bounded
    dimensions, deterministic output."""
    media = mm.synth_media(spark, 32)
    out = mm.resize_images(media, max_side=24)
    rows = out.collect()
    assert len(rows) == 32
    assert out.schema == mm.RESIZED_IMAGE_SCHEMA
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) > 0
        assert 1 <= r.width <= 24 and 1 <= r.height <= 24
    again = sorted(map(tuple, mm.resize_images(media, max_side=24).collect()))
    assert again == sorted(map(tuple, rows))


def test_audio_features(spark):
    out = mm.extract_audio_features(mm.synth_media(spark, 64))
    rows = out.collect()
    assert len(rows) == 64
    assert out.schema == mm.DECODED_AUDIO_SCHEMA
    for r in rows:
        assert 1000 <= r.n_samples < 8000
        assert 0.0 <= r.rms <= 1.0
        assert r.clipped >= 0


def test_pcm_frame_energy_real_decode(spark):
    """The PCM kernel is a REAL decode: a synthesized sine of amplitude a
    must measure RMS ~= a/sqrt(2) per frame and peak ~= a*32767."""
    import math

    media = mm.synth_pcm_audio(spark, 8, sr=8000, dur_ms=200)
    rows = mm.pcm_frame_energy(media, frame_ms=25).collect()
    # 8 clips x (200/25) frames
    assert len(rows) == 8 * 8
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, frs in by_media.items():
        amp = 0.1 + ((mid * 11 + 13) % 8) * 0.1
        assert [f.frame_idx for f in sorted(frs, key=lambda f: f.frame_idx)] == list(range(8))
        for f in frs:
            assert f.n_samples == 200
            # full frames of a sine: RMS within 2% of a/sqrt(2)
            assert abs(f.rms - amp / math.sqrt(2)) < 0.02 * amp + 1e-3
            assert abs(f.peak - amp * 32767) < 0.02 * amp * 32767 + 2


def test_pcm_energy_ignores_non_audio(spark):
    mixed = mm.synth_media(spark, 4).unionByName(mm.synth_pcm_audio(spark, 4))
    out = mm.pcm_frame_energy(mixed)
    assert out.select("media_id").distinct().count() == 4


def test_image_phash_locality_and_banded_pairs(spark):
    """Near-identical payloads (one byte changed) must land within a few
    hash bits and be found by the banded Hamming join; unrelated payloads
    must not pair.  Also checks the pigeonhole contract: hamming <=
    bands-1 implies a shared band, so no true pair is missed."""
    from data_pipeline_zeal_spark.operators.multimodal import (
        image_phash,
        phash_near_dup_pairs,
    )

    # bimodal payload: every cell far from the mean, so a one-cell edit
    # flips exactly that cell's bit (values near the threshold would make
    # the hash legitimately unstable — that's real phash behavior too)
    base = bytes([10] * 32 + [200] * 32)
    edited = bytes([200]) + base[1:]          # one-cell edit
    other = bytes((i * 37 + 11) % 256 for i in range(64))
    media = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], "media_id long, payload binary"
    )
    hashes = image_phash(media)
    h = {r.media_id: r.phash for r in hashes.collect()}
    ham = bin((h[0] ^ h[1]) & ((1 << 64) - 1)).count("1")
    assert ham <= 3  # one grid cell flipped -> few bits

    pairs = phash_near_dup_pairs(hashes, max_hamming=3).collect()
    assert [(p.media_a, p.media_b) for p in pairs] == [(0, 1)]
    assert pairs[0].hamming == ham


def _wav_bytes(sr=16000, channels=1, bits=16, n_samples=1600, junk_chunk=True):
    """Build a real RIFF/WAVE byte string with struct — closed-form
    ground truth for the parser."""
    import struct

    data = b"\x00\x00" * n_samples * channels
    byte_rate = sr * channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sr, byte_rate,
                      channels * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk:  # parsers must skip unknown chunks (LIST, odd-sized)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_header_parse_real_bytes(spark):
    from data_pipeline_zeal_spark.operators.multimodal import wav_header_stats

    rows = [
        (1, _wav_bytes(sr=16000, channels=1, bits=16, n_samples=1600)),
        (2, _wav_bytes(sr=44100, channels=2, bits=16, n_samples=44100)),
        (3, b"not a wav at all"),
        (4, b"RIFF\x00\x00\x00\x00WAVE"),  # container but no chunks
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in wav_header_stats(media).collect()}
    assert out[1].valid and out[1].sample_rate == 16000
    assert out[1].duration_s == 0.1  # 1600 samples @ 16 kHz
    assert out[2].valid and out[2].channels == 2
    assert out[2].duration_s == 1.0  # 44100 stereo samples @ 44.1 kHz
    assert not out[3].valid and out[3].sample_rate is None
    assert not out[4].valid


def test_wav_parser_rejects_zeroed_fmt():
    from data_pipeline_zeal_spark.operators.multimodal import parse_wav_header
    import struct

    fmt = struct.pack("<HHIIHH", 1, 0, 0, 0, 0, 16)  # zero channels/rate
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert parse_wav_header(wav) is None


def _png_bytes(width=4, height=3, color=2, extra_trns=False):
    import struct
    import zlib

    from data_pipeline_zeal_spark.operators.multimodal import _PNG_CHANNELS

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"\x00" * (height * (1 + width * _PNG_CHANNELS[color]))
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if extra_trns:
        out += chunk(b"tRNS", b"\x00\x00\x00\x00\x00\x00")
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_header_parse_real_bytes(spark):
    from data_pipeline_zeal_spark.operators.multimodal import png_header_stats

    media = spark.createDataFrame(
        [
            (1, _png_bytes(width=7, height=5, color=2)),
            (2, _png_bytes(width=2, height=2, color=6)),
            (3, _png_bytes(width=3, height=3, color=0, extra_trns=True)),
            (4, b"definitely not a png"),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in png_header_stats(media).collect()}
    assert out[1].valid and (out[1].width, out[1].height) == (7, 5)
    assert out[1].n_pixels == 35 and not out[1].has_alpha
    assert out[2].valid and out[2].has_alpha  # truecolor+alpha color type
    assert out[3].valid and out[3].has_alpha  # alpha via tRNS chunk
    assert out[3].n_chunks == 4
    assert not out[4].valid and out[4].width is None


def test_png_parser_rejects_corruption():
    from data_pipeline_zeal_spark.operators.multimodal import parse_png_header

    good = _png_bytes()
    assert parse_png_header(good) is not None
    # flipped byte inside IHDR -> CRC mismatch
    assert parse_png_header(good[:16] + bytes([good[16] ^ 0xFF]) + good[17:]) is None
    # truncated mid-chunk
    assert parse_png_header(good[:-6]) is None
    # bad signature
    assert parse_png_header(b"x" + good[1:]) is None


def test_png_synth_fixture_branches(spark):
    from data_pipeline_zeal_spark.operators.multimodal import (
        png_header_stats,
        synth_png_media,
    )

    out = png_header_stats(synth_png_media(spark, 64)).collect()
    valid = [r for r in out if r.valid]
    assert len(out) == 64 and len(valid) == 48  # 3 of every 4 parse
    assert all(r.n_pixels == r.width * r.height for r in valid)


def test_png_parser_rejects_truncated_crc_and_dataless():
    from data_pipeline_zeal_spark.operators.multimodal import parse_png_header

    good = _png_bytes()
    # clipped 2 bytes into a trailing chunk CRC: must reject, not raise
    assert parse_png_header(good[:-2]) is None
    # signature + CRC-correct IHDR + IEND but zero IDAT chunks: dataless
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    dataless = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    assert parse_png_header(dataless) is None


def test_jpeg_header_parse_real_bytes(spark):
    from data_pipeline_zeal_spark.operators.multimodal import (
        jpeg_header_stats,
        synth_jpeg_media,
    )

    media = synth_jpeg_media(spark, 16)
    out = {r.media_id: r for r in jpeg_header_stats(media).collect()}
    assert len(out) == 16
    # ids 0..2 are well-formed; dims derive from the id
    assert out[0].valid and (out[0].width, out[0].height) == (16, 9)
    assert out[0].progressive  # i % 5 == 0 -> SOF2
    assert out[1].valid and not out[1].progressive
    assert out[1].n_components == 3 and out[1].precision == 8
    # every 4th payload is corrupt (rotating SOI / truncation / zero-width)
    for i in (3, 7, 11, 15):
        assert not out[i].valid and out[i].width is None
    for i in (0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14):
        assert out[i].valid


def test_jpeg_parser_rejects_corruption():
    import struct

    from data_pipeline_zeal_spark.operators.multimodal import parse_jpeg_header

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = seg(0xC0, struct.pack(">BHHB", 8, 10, 20, 3) + bytes(9))
    sos = seg(0xDA, b"\x03" + bytes(6) + b"\x00\x3f\x00")
    good = b"\xff\xd8" + sof + sos + b"\xaa\xbb" + b"\xff\xd9"
    parsed = parse_jpeg_header(good)
    assert parsed is not None and (parsed["width"], parsed["height"]) == (20, 10)
    assert parse_jpeg_header(b"\x00\x00" + good[2:]) is None   # bad SOI
    assert parse_jpeg_header(good[:-2]) is None                # missing EOI
    assert parse_jpeg_header(b"\xff\xd8" + sos) is None        # SOS before SOF
    # EOI with no scan data at all
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None
    # nonsense segment length (1 < 2)
    bad_len = b"\xff\xd8" + bytes([0xFF, 0xC0]) + struct.pack(">H", 1)
    assert parse_jpeg_header(bad_len) is None


def test_jpeg_parser_accepts_trailer_after_eoi():
    """Real-world JPEGs often carry padding or appended bytes after the
    EOI marker (EXIF writers, camera firmware); the gate must search for
    EOI at-or-after SOS, not require it at exact end-of-buffer."""
    import struct

    from data_pipeline_zeal_spark.operators.multimodal import parse_jpeg_header

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = seg(0xC0, struct.pack(">BHHB", 8, 10, 20, 3) + bytes(9))
    sos = seg(0xDA, b"\x03" + bytes(6) + b"\x00\x3f\x00")
    good = b"\xff\xd8" + sof + sos + b"\xaa\xbb" + b"\xff\xd9"
    padded = good + b"\x00" * 16 + b"trailing-exif-junk"
    parsed = parse_jpeg_header(padded)
    assert parsed is not None and (parsed["width"], parsed["height"]) == (20, 10)
    # but a stream with NO EOI anywhere after SOS is still rejected
    assert parse_jpeg_header(good[:-2] + b"\x00\x00") is None


def _png_gray_const(width: int, height: int, value: int) -> bytes:
    """Minimal valid 8-bit GRAYSCALE PNG with every pixel == value (no
    filtering): real-decoder oracle material — mean luma is EXACTLY
    value/255 and dims are the IHDR dims."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_codec_exact_pixel_oracles(spark):
    """r10 directive #7, Pillow leg: codec='real' decode/resize against
    EXACT pixel oracles — constant-fill grayscale PNGs decode to their
    IHDR dims and mean luma value/255 precisely, and a real thumbnail's
    payload re-decodes to the same constant luma at bounded dims.
    Skips cleanly until the environment ships Pillow (the
    ImportError-fast contract is pinned in
    test_real_codec_path_gates_on_pillow)."""
    import pytest

    pytest.importorskip("PIL")

    rows = [
        (1, _png_gray_const(7, 5, 0)),
        (2, _png_gray_const(4, 4, 255)),
        (3, _png_gray_const(33, 9, 100)),
    ]
    pngs = spark.createDataFrame(rows, "media_id long, payload binary")
    dec = {r.media_id: r for r in mm.decode_image(pngs, codec="real").collect()}
    assert (dec[1].width, dec[1].height, dec[1].mean_luma) == (7, 5, 0.0)
    assert (dec[2].width, dec[2].height, dec[2].mean_luma) == (4, 4, 1.0)
    assert (dec[3].width, dec[3].height) == (33, 9)
    assert dec[3].mean_luma == round(100 / 255.0, 6)

    rs = {r.media_id: r for r in
          mm.resize_images(pngs, max_side=8, codec="real").collect()}
    assert all(max(r.width, r.height) <= 8 for r in rs.values())
    assert (rs[3].width, rs[3].height) == (8, 2)  # 33x9 -> aspect-kept
    # a real thumbnail of a constant image is the same constant image
    from data_pipeline_zeal_spark.operators.multimodal import _real_decode

    h, w, luma = _real_decode(bytes(rs[3].payload))
    assert (w, h) == (8, 2) and luma == round(100 / 255.0, 6)


def test_real_audio_path_gates_on_soundfile(spark):
    """r12 (round-11 verdict directive #7): the audio twin of the Pillow
    gate — when soundfile is importable, codec='real' extracts features
    from ACTUAL samples (parity-checked against the stdlib-wave decode
    on tone WAVs); when it is not — this sandbox — codec='real' fails
    FAST driver-side with ImportError, and codec='auto' falls back to
    the bit-stable stub the driver oracles pin."""
    import pytest

    media = mm.synth_wav_media(spark, 8, tone=True)
    if mm._soundfile() is not None:
        feats = {
            r.media_id: r
            for r in mm.extract_audio_features(media, codec="real").collect()
        }
        wav = {r.media_id: r for r in mm.decode_wav_pcm(media).collect()}
        for mid, w in wav.items():
            assert feats[mid].n_samples == w.n_samples * w.channels or (
                feats[mid].n_samples == w.n_samples
            )
            # same samples, same energy (soundfile folds float identically)
            assert abs(feats[mid].rms - w.rms) < 1e-3
    else:
        with pytest.raises(ImportError, match="soundfile"):
            mm.extract_audio_features(media, codec="real")
        # auto == stub here, bit-stable
        auto = sorted(
            map(tuple, mm.extract_audio_features(media, codec="auto").collect())
        )
        stub = sorted(
            map(tuple, mm.extract_audio_features(media, codec="stub").collect())
        )
        assert auto == stub and auto


def test_real_audio_exact_sample_oracles(spark):
    """The soundfile leg's exact-value twin of the Pillow pixel oracles:
    skips cleanly until the environment ships soundfile."""
    import pytest

    pytest.importorskip("soundfile")

    media = mm.synth_wav_media(spark, 8, tone=True)
    feats = {
        r.media_id: r
        for r in mm.extract_audio_features(media, codec="real").collect()
    }
    assert feats and all(r.rms > 0 for r in feats.values())


def test_wave_stdlib_decode_runs_today(spark):
    """The one audio decode leg that needs NO optional codec: stdlib
    ``wave`` parses the real RIFF containers, and the decoded stats
    must agree with the independent header parser field-for-field —
    REAL container decode tested in this sandbox, not a stub."""
    media = mm.synth_wav_media(spark, 16, tone=True)
    hdr = {r.media_id: r for r in mm.wav_header_stats(media).collect()
           if r.valid}
    dec = {r.media_id: r for r in mm.decode_wav_pcm(media).collect()}
    # junk rows are dropped by BOTH paths; valid rows agree exactly
    assert set(dec) == set(hdr) and len(dec) == 12
    for mid, h in hdr.items():
        d = dec[mid]
        assert d.sample_rate == h.sample_rate
        assert d.channels == h.channels
        assert d.n_samples * d.channels * 2 == h.data_bytes
        # tone payloads carry real energy; per-id amplitude floor holds
        assert d.peak > 0 and d.rms > 0.01


def test_wave_stdlib_zero_fill_is_silent(spark):
    """The default (oracle-pinned) fixture is all-zero PCM: the real
    decode must report exact silence — rms 0.0, peak 0 — proving the
    energy numbers come from the samples, not the container."""
    media = mm.synth_wav_media(spark, 8)  # tone=False
    dec = mm.decode_wav_pcm(media).collect()
    assert dec and all(r.rms == 0.0 and r.peak == 0 for r in dec)


def test_wave_stdlib_junk_only_partition(spark):
    """Round-12 advice: an Arrow batch that is ENTIRELY junk must yield
    an empty frame WITH the schema's columns — pyspark's mapInPandas
    serializer selects columns by name, so a column-less empty
    ``pd.DataFrame([])`` crashes the whole partition with
    KeyError('media_id').  One junk payload in one partition is exactly
    that batch."""
    junk = spark.createDataFrame(
        [(1, bytearray(b"not-a-riff-container")),
         (2, bytearray(b"RIFF\x00\x00truncated"))],
        "media_id long, payload binary",
    ).repartition(1)
    assert mm.decode_wav_pcm(junk).collect() == []


def _mp4_parts():
    import struct

    def box(t, b):
        return struct.pack(">I", 8 + len(b)) + t + b

    def mvhd(v, ts, dur):
        if v == 0:
            body = b"\x00" * 4 + struct.pack(">IIII", 0, 0, ts, dur)
        else:
            body = b"\x01" + b"\x00" * 3 + struct.pack(">QQIQ", 0, 0, ts, dur)
        return box(b"mvhd", body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    moov = box(b"moov", mvhd(0, 600, 1200))
    mdat = box(b"mdat", b"\xab" * 17)
    return box, mvhd, ftyp, moov, mdat


def test_mp4_header_parse_real_bytes(spark):
    from data_pipeline_zeal_spark.operators.multimodal import mp4_header_stats

    box, mvhd, ftyp, moov, mdat = _mp4_parts()
    import struct

    largemdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 9) + b"y" * 9
    )
    eofmdat = struct.pack(">I", 0) + b"mdat" + b"z" * 5
    media = spark.createDataFrame(
        [
            (1, ftyp + moov + mdat),
            # v1 mvhd, all three mdat size encodings in one file
            (2, ftyp + box(b"moov", mvhd(1, 90000, 4500)) + mdat
                + largemdat + eofmdat),
            (3, b"definitely not an mp4 container"),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in mp4_header_stats(media).collect()}
    assert out[1].valid and out[1].major_brand == "isom"
    assert out[1].minor_version == 512 and out[1].n_compatible_brands == 2
    assert (out[1].n_boxes, out[1].mdat_bytes) == (3, 17)
    assert (out[1].timescale, out[1].duration) == (600, 1200)
    assert out[2].valid and out[2].mdat_bytes == 17 + 9 + 5
    assert (out[2].timescale, out[2].duration) == (90000, 4500)
    assert not out[3].valid and out[3].major_brand is None


def test_mp4_parser_rejects_malformed_boxes():
    from data_pipeline_zeal_spark.operators.multimodal import parse_mp4_header

    import struct

    box, mvhd, ftyp, moov, mdat = _mp4_parts()
    good = ftyp + moov + mdat
    assert parse_mp4_header(good) is not None
    # first box is not ftyp
    assert parse_mp4_header(moov + ftyp + mdat) is None
    # a box's declared size overruns EOF (truncation anywhere inside)
    for cut in (len(good) - 3, len(ftyp) + 5, 10):
        assert parse_mp4_header(good[:cut]) is None
    # size below the 8-byte header length
    bad = ftyp + struct.pack(">I", 4) + b"moov" + moov[8:] + mdat
    assert parse_mp4_header(bad) is None
    # truncated largesize word
    assert parse_mp4_header(
        ftyp + moov + struct.pack(">I", 1) + b"mdat" + b"\x00" * 4
    ) is None
    # non-printable box type
    assert parse_mp4_header(
        ftyp + struct.pack(">I", 8) + b"\x01\x02\x03\x04" + moov + mdat
    ) is None
    # mandatory-box violations: missing mdat / missing moov / moov
    # without mvhd / zero timescale / duplicate ftyp
    assert parse_mp4_header(ftyp + moov) is None
    assert parse_mp4_header(ftyp + mdat) is None
    assert parse_mp4_header(ftyp + box(b"moov", b"") + mdat) is None
    assert parse_mp4_header(
        ftyp + box(b"moov", mvhd(0, 0, 100)) + mdat
    ) is None
    assert parse_mp4_header(ftyp + ftyp + moov + mdat) is None
    # truncated mvhd fullbox for its declared version
    assert parse_mp4_header(
        ftyp + box(b"moov", box(b"mvhd", b"\x01" + b"\x00" * 20)) + mdat
    ) is None


def test_mp4_synth_fixture_branches(spark):
    from data_pipeline_zeal_spark.operators.multimodal import (
        mp4_header_stats,
        synth_mp4_media,
    )

    out = mp4_header_stats(synth_mp4_media(spark, 64)).collect()
    valid = [r for r in out if r.valid]
    assert len(out) == 64 and len(valid) == 48  # 3 of every 4 parse
    # the fixture exercises both mvhd versions, all three brands, and
    # duration stays an exact integer multiple of 600 model units
    assert {r.major_brand for r in valid} == {"isom", "mp42", "avc1"}
    assert {r.timescale for r in valid} == {600, 1000, 90000}
    assert all(r.duration % 600 == 0 and r.mdat_bytes > 0 for r in valid)
    assert all(r.n_boxes in (3, 4) for r in valid)
