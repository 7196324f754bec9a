"""ETL pipeline invariants: the normalized star schema (pages / categories /
bridge) replacing the reference's ORM loads, plus the parquet sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipediaetl_spark.operators.etl import categorizer_tables, q45_converter_output
from wikipediaetl_spark.operators.multimodal import decode_media, extract_features, media_table


def test_star_schema_integrity(spark, sf_dir):
    t = categorizer_tables(spark, sf_dir)
    pages, cats, bridge = t["pages"], t["categories"], t["page_categories"]
    n_pages = pages.count()
    assert n_pages > 0
    # surrogate keys dense & unique (categorizer.py:51,:64 auto-increment parity)
    assert pages.select("page_id").distinct().count() == n_pages
    assert cats.select("category_id").distinct().count() == cats.count()
    # referential integrity: every bridge row joins back to both dims
    assert bridge.join(pages, "page_id", "left_anti").count() == 0
    assert bridge.join(cats, "category_id", "left_anti").count() == 0
    # bridge is a set (no dup pairs)
    assert bridge.count() == bridge.distinct().count()


def test_converter_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    """converter.py:60-61 parity: write.mode('overwrite').parquet then read
    back identical rows."""
    out = str(tmp_path / "html_texts")
    df = q45_converter_output(spark, sf_dir)
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == {"file_name", "extracted_text"}
    assert back.join(df, ["file_name", "extracted_text"], "left_anti").count() == 0


def test_media_decode_stub_contract():
    import pytest

    from wikipediaetl_spark.operators import multimodal

    if multimodal._HAS_PIL:
        # Extras guard active: real image decode runs (same 8-stat contract).
        import io

        img = multimodal._PILImage.new("L", (2, 2), color=7)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        feats = decode_media(buf.getvalue(), "image", fake=False)
        assert len(feats) == 8 and feats[0] == 4  # 2x2 pixels
    else:
        with pytest.raises(NotImplementedError):
            decode_media(b"abc", "image", fake=False)
    # video always has a real backend (PyAV or stdlib y4m parser, r6);
    # hostile bytes → TOTAL zero row, mirroring the audio contract
    assert list(decode_media(b"abc", "video", fake=False)) == [0.0] * 8
    # audio always has a real backend (stdlib wave); hostile bytes → TOTAL
    assert list(decode_media(b"abc", "audio", fake=False)) == [0.0] * 8
    feats = decode_media(b"abc", "image", fake=True)
    assert len(feats) == 8
    assert feats[0] == 3  # n_bytes


def _wav_bytes(samples, sampwidth=2, framerate=8000):
    """PCM WAV payload from int samples (stdlib wave writer)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(framerate)
        fmt = {1: "B", 2: "<h", 4: "<i"}[sampwidth]
        wf.writeframes(b"".join(struct.pack(fmt, s) for s in samples))
    return buf.getvalue()


def test_audio_decode_real_wav_path():
    """The audio path is genuinely real in this container: synthesized PCM
    WAV bytes decode through the stdlib-wave backend to the 8-stat feature
    contract over the SAMPLE values (not the container bytes)."""
    import numpy as np
    import pytest

    samples = [0, 100, -100, 200, -200, 300]
    feats = decode_media(_wav_bytes(samples), "audio", fake=False)
    # the wave path normalizes to soundfile's float contract: PCM ints
    # scale by 2^(8*width-1), so features are backend-independent (ADVICE r5)
    arr = np.array(samples, dtype=np.float64) / 32768.0
    assert feats[0] == len(samples)
    assert feats[1] == pytest.approx(arr.mean())
    assert feats[3] == pytest.approx(arr.min()) and feats[4] == pytest.approx(arr.max())
    assert feats[6] == pytest.approx(arr[0]) and feats[7] == pytest.approx(arr[-1])
    # 8-bit samples decode too (unsigned dtype, re-centered around 128)
    feats8 = decode_media(_wav_bytes([0, 128, 255], sampwidth=1), "audio", fake=False)
    assert feats8[0] == 3
    assert feats8[3] == pytest.approx(-1.0) and feats8[4] == pytest.approx(127 / 128)


def test_audio_decode_through_map_in_pandas(spark):
    """Real audio decode executor-side through the mapInPandas plumbing:
    WAV payloads in a binary column, fake=False, distributed decode."""
    from wikipediaetl_spark.operators.multimodal import extract_features

    rows = [
        (1, "audio", bytearray(_wav_bytes([10, 20, 30]))),
        (2, "audio", bytearray(_wav_bytes([5, -5]))),
        (3, "audio", bytearray(b"not a wav")),  # hostile → zero row
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r.features for r in extract_features(df, fake=False).collect()}
    assert out[1][0] == 3
    assert abs(out[1][3] - 10.0 / 32768) < 1e-12 and abs(out[1][4] - 30.0 / 32768) < 1e-12
    assert out[2][0] == 2 and out[2][1] == 0.0  # mean of (5,-5)
    assert out[3] == [0.0] * 8


def test_media_decode_undecodable_payload_yields_zero_row(monkeypatch):
    """When the real PIL path IS available but the payload is truncated or
    hostile, decode must yield the TOTAL zero-feature row, never kill the
    task (ADVICE r3). Simulated with a stub Image whose open() raises — the
    same code path a corrupt byte-stream takes through real PIL."""
    from wikipediaetl_spark.operators import multimodal

    class _BrokenImage:
        @staticmethod
        def open(_buf):
            raise OSError("cannot identify image file")

    monkeypatch.setattr(multimodal, "_pil_image", lambda: _BrokenImage)
    feats = multimodal.decode_media(b"\xff\xd8garbage", "image", fake=False)
    assert list(feats) == [0.0] * 8


def test_media_features_pipeline(spark, sf_dir):
    m = media_table(spark, sf_dir)
    feats = extract_features(m, fake=True)
    rows = feats.limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    # deterministic across runs
    again = {r.doc_id: r.features for r in extract_features(m, fake=True).limit(5).collect()}
    for r in rows:
        assert again[r.doc_id] == r.features


def test_frame_sampling_fanout(spark, sf_dir):
    from wikipediaetl_spark.operators.multimodal import media_table, sample_frames

    m = media_table(spark, sf_dir).limit(10)
    frames = sample_frames(m, n_frames=4, fake=True)
    rows = frames.collect()
    assert len(rows) == 40  # 10 docs × 4 frames
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in rows)


def test_resize_contract(spark, sf_dir):
    from wikipediaetl_spark.operators.multimodal import media_table, resize_images

    m = media_table(spark, sf_dir).limit(5)
    out = resize_images(m, target=(16, 16), fake=True).collect()
    assert all(len(r.pixels) == 256 and r.width == r.height == 16 for r in out)


def _y4m_bytes(w=8, h=8, n_frames=3):
    """Deterministic uncompressed YUV4MPEG2 container — a real video
    payload ffmpeg-class decoders (PyAV) open natively, buildable without
    any encoder. Frame i's luma plane is the constant 16 + 50*i, chroma
    neutral (128). Must stay byte-identical to tests/fixtures/tiny.y4m."""
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes([16 + 50 * i]) * (w * h))  # Y
        out.append(bytes([128]) * (w * h // 2))  # U + V (4:2:0)
    return b"".join(out)


def test_y4m_fixture_is_committed_and_deterministic():
    """The committed container fixture matches the in-test generator, so a
    PyAV-equipped environment exercises real decode on pinned bytes."""
    import pathlib

    fixture = pathlib.Path(__file__).parent / "fixtures" / "tiny.y4m"
    assert fixture.read_bytes() == _y4m_bytes()


def test_video_decode_real_y4m_path():
    """Real decode of the committed y4m fixture — PyAV where importable,
    the stdlib YUV4MPEG2 parser otherwise (r6: a real backend always
    exists, so this runs in EVERY environment): three 8x8 frames with
    constant luma 16/66/116 → 192 grayscale pixels whose stats are pinned
    (grayscale of a neutral-chroma YUV frame tracks the luma value)."""
    feats = decode_media(_y4m_bytes(), "video", fake=False)
    assert feats[0] == 8 * 8 * 3  # pixels across all 3 frames
    assert feats[3] < feats[4]  # luma ramps frame-to-frame
    assert abs(feats[1] - (feats[3] + feats[4]) / 2) < 3  # symmetric ramp


def test_video_stdlib_y4m_parser_exact():
    """The stdlib parser is pinned EXACTLY (independent of PyAV): luma
    planes 16/66/116 with neutral chroma, truncation/garbage → None."""
    from wikipediaetl_spark.operators.multimodal import _parse_y4m_lumas

    payload = _y4m_bytes()
    lumas = _parse_y4m_lumas(payload)
    assert lumas is not None and len(lumas) == 3
    assert [int(f[0, 0]) for f in lumas] == [16, 66, 116]
    assert all(f.shape == (8, 8) for f in lumas)
    assert _parse_y4m_lumas(payload, max_frames=2) is not None
    assert len(_parse_y4m_lumas(payload, max_frames=2)) == 2
    assert _parse_y4m_lumas(b"not a video") is None
    assert _parse_y4m_lumas(payload[:-10]) is None  # truncated final frame
    assert _parse_y4m_lumas(b"YUV4MPEG2 W8 H8 Cweird\nFRAME\n" + b"x" * 96) is None


def test_frame_sample_real_y4m_path():
    from wikipediaetl_spark.operators.multimodal import frame_sample

    frames = frame_sample(_y4m_bytes(), 3, fake=False)
    assert len(frames) == 3
    assert all(len(f) == 64 for f in frames)  # 8x8 grayscale bytes
    # hostile payload through the REAL path yields empty frames, not a raise
    assert frame_sample(b"not a video", 2, fake=False) == [b"", b""]
