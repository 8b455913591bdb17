"""Text analysis + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from dcafs_spark.operators.multimodal import extract_features, resize_meta, sample_frames, synth_media
from dcafs_spark.operators.textan import (
    fingerprint,
    lang_id,
    quality_features,
    token_count_bpe,
    token_count_ws,
)


def test_lang_id(spark):
    rows = [
        (1, "the cat is on the mat and the dog is here"),
        (2, "le chat est sur la table et les chiens"),
        (3, "der hund und die katze ist nicht hier"),
        (4, "el perro y los gatos una casa por que"),
        (5, "你好世界这是一个中文句子的测试文本内容"),
        (6, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "zh", 6: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 times")], "doc_id long, text string")
    row = df.select(
        token_count_ws(F.col("text")).alias("ws"), token_count_bpe(F.col("text")).alias("bpe")
    ).first()
    assert row["ws"] == 4
    # Hello , world ! 42 times → 6
    assert row["bpe"] == 6


def test_quality_score_ordering(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then some more text of normal quality"),
        (2, "!!! ??? ### $$$ %%%"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"] for r in quality_features(df).collect()}
    assert got[1] > got[2]


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a  b c   d e f g h i j"), (3, "totally different words here now ok yes no maybe")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_multimodal_features(spark):
    media = synth_media(spark, 12)
    feats = extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert r["n_bytes"] >= 32 and len(r["feature"]) == 4


def test_multimodal_frame_sampling(spark):
    media = synth_media(spark, 12)
    frames = sample_frames(media, every_ms=250)
    rows = frames.collect()
    assert all(r["frame_idx"] >= 0 for r in rows)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_multimodal_resize_meta(spark):
    media = synth_media(spark, 3)
    out = resize_meta(media, 128, 96).first()
    assert out["meta"]["width"] == 128 and out["meta"]["height"] == 96


def test_decode_stub_raises_on_empty():
    from dcafs_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"")


def _make_ppm(w, h, val=100):
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + bytes([val] * (3 * w * h))


def _make_bmp(w, h, val=50, bpp=8):
    import struct

    pixels = bytes([val] * (w * h))
    data_off = 54
    file_size = data_off + len(pixels)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0)
    return hdr + info + pixels


def test_decode_ppm_real_parse():
    from dcafs_spark.operators.multimodal import _decode_image

    assert _decode_image(_make_ppm(4, 3, 100)) == [4.0, 3.0, 100.0, 100.0]


def test_decode_bmp_real_parse():
    from dcafs_spark.operators.multimodal import _decode_image

    assert _decode_image(_make_bmp(6, 2, 50)) == [6.0, 2.0, 50.0, 8.0]


def test_decode_falls_back_to_byte_stats():
    from dcafs_spark.operators.multimodal import _decode_image

    # text that merely STARTS like a magic number must not mis-decode
    fake = b"P6 is a nice format, BMs are too"
    n = len(fake)
    assert _decode_image(fake) == [float(n), float(fake[0]), float(fake[-1]), float(sum(fake[:16]) % 256)]


def test_decode_through_spark_pipeline(spark):
    from pyspark.sql import functions as F

    from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rows = [
        (1, "image", _make_ppm(4, 3), ("image/x-portable-pixmap", 4, 3, 0, 0)),
        (2, "image", _make_bmp(6, 2), ("image/bmp", 6, 2, 0, 0)),
        (3, "image", b"opaque-blob-data", ("application/octet-stream", 0, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: list(r["feature"]) for r in extract_features(df).collect()}
    assert out[1][:2] == [4.0, 3.0] and out[2][:2] == [6.0, 2.0]
    assert out[3][0] == float(len(b"opaque-blob-data"))


def test_kafka_options_assembly():
    from dcafs_spark.streaming.runner import kafka_options

    opts = kafka_options(
        {"servers": "b1:9092,b2:9092", "topics": "sensors", "starting_offsets": "earliest",
         "max_per_trigger": 5000, "group_id": "dcafs"}
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "sensors",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "5000",
        "kafka.group.id": "dcafs",
    }
    assert kafka_options({"servers": "b", "pattern": "s.*"})["subscribePattern"] == "s.*"
    with pytest.raises(ValueError):
        kafka_options({"servers": "b"})
    with pytest.raises(ValueError):
        kafka_options({"servers": "b", "topics": "t", "pattern": "p"})


# ------------------------------------------------------------------ PNG tier


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return struct.pack(">I", len(data)) + ctype + data + struct.pack(
        ">I", zlib.crc32(ctype + data)
    )


def _make_png(pixels, color_type: int, filters) -> bytes:
    """Encode a numpy (h, w, channels) uint8 array applying the given
    PNG filter type per scanline — an independent reference encoder so
    the decoder's unfiltering is cross-checked, not self-confirmed."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    channels = 1 if px.ndim == 2 else px.shape[2]
    bpp = channels
    flat = px.reshape(h, w * channels).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = filters[y % len(filters)]
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(row)
        out = np.zeros_like(row)
        for x in range(row.size):
            a = int(row[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if (x >= bpp and y > 0) else 0
            if ft == 0:
                out[x] = row[x]
            elif ft == 1:
                out[x] = row[x] - a
            elif ft == 2:
                out[x] = row[x] - b
            elif ft == 3:
                out[x] = row[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = row[x] - pred
        raw.append(ft)
        raw.extend((out & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _ref_stats(px):
    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    return [
        float(a.shape[1]),
        float(a.shape[0]),
        round(float(a.mean()), 3),
        float(a.max()),
    ]


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_png_all_filters(filters):
    import numpy as np

    from dcafs_spark.operators.multimodal import _decode_image

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert _decode_image(_make_png(px, 2, filters)) == _ref_stats(px)


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_decode_png_color_types(color_type, channels):
    import numpy as np

    from dcafs_spark.operators.multimodal import _decode_image

    rng = np.random.default_rng(color_type)
    shape = (6, 4) if channels == 1 else (6, 4, channels)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert _decode_image(_make_png(px, color_type, [0, 4])) == _ref_stats(px)


def test_decode_png_rejects_unsupported():
    import struct
    import zlib

    from dcafs_spark.operators.multimodal import _decode_png

    # 16-bit depth -> None (falls through to byte stats, no crash)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    assert _decode_png(payload) is None
    # truncated IDAT -> None
    import numpy as np

    good = _make_png(np.zeros((3, 3, 3), dtype=np.uint8), 2, [0])
    assert _decode_png(good[:40]) is None


def test_decode_png_through_spark_pipeline(spark):
    import numpy as np

    from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    px = np.full((8, 8, 3), 200, dtype=np.uint8)
    rows = [(1, "image", _make_png(px, 2, [0, 1, 2, 3, 4]), ("image/png", 8, 8, 0, 0))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]
    assert feat["feature"] == [8.0, 8.0, 200.0, 200.0]


# ------------------------------------------------------------------ WAV tier


def _make_wav(rate, channels, bits, samples):
    """Independent RIFF/WAVE PCM encoder (stdlib struct only)."""
    import struct

    import numpy as np

    a = np.asarray(samples)
    if bits == 8:
        raw = (a + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = a.astype(np.int16).tobytes()
    else:
        raw = a.astype(np.int32).tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_16bit_stereo():
    import numpy as np

    from dcafs_spark.operators.multimodal import _decode_image

    # 1 kHz of interleaved stereo: 8000 frames at 16 kHz = 500 ms
    vals = np.tile(np.array([16384, -16384], dtype=np.int16), 8000)
    out = _decode_image(_make_wav(16000, 2, 16, vals))
    assert out[0] == 16000.0 and out[1] == 2.0 and out[2] == 500.0
    assert out[3] == round(16384 / 32768, 6)  # constant-magnitude signal → rms

def test_decode_wav_8bit_silence_and_32bit():
    import numpy as np

    from dcafs_spark.operators.multimodal import _decode_wav

    silent = _decode_wav(_make_wav(8000, 1, 8, np.zeros(800, dtype=np.int16)))
    assert silent == [8000.0, 1.0, 100.0, 0.0]
    loud = _decode_wav(_make_wav(44100, 1, 32, np.full(441, 2**30)))
    assert loud[0] == 44100.0 and loud[2] == 10.0 and loud[3] == 0.5


def test_decode_wav_rejects_compressed_and_truncated():
    import struct

    import numpy as np

    from dcafs_spark.operators.multimodal import _decode_wav

    good = _make_wav(16000, 1, 16, np.zeros(100, dtype=np.int16))
    assert _decode_wav(good[:30]) is None
    # format tag 85 (MP3 in WAV) -> None, falls to byte stats
    mp3ish = bytearray(good)
    struct.pack_into("<H", mp3ish, 20, 85)
    assert _decode_wav(bytes(mp3ish)) is None


def test_decode_wav_through_spark_pipeline(spark):
    import numpy as np

    from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    wav = _make_wav(16000, 1, 16, np.zeros(1600, dtype=np.int16))
    rows = [(7, "audio", wav, ("audio/wav", 0, 0, 100, 16000))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]
    assert feat["feature"] == [16000.0, 1.0, 100.0, 0.0]


def test_repetition_ratio_known_values(spark):
    from dcafs_spark.operators.textan import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 2 distinct of 5
            (2, "one two three four"),   # all bigrams distinct
            (3, "x x x x"),              # bigrams: xx xx xx -> 1 of 3
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["d2"],)
        for r in df.select("id", repetition_ratio(F.col("text"), 2).alias("d2")).collect()
    }
    assert got[1] == (round(1 - 2 / 5, 4),)
    assert got[2] == (0.0,)
    assert got[3] == (round(1 - 1 / 3, 4),)


class TestGifDecode:
    @staticmethod
    def _gif(w, h, indices, palette):
        """Minimal valid GIF: fixed-width literal LZW (CLEAR before each
        pixel keeps the dictionary empty, a legal stream shape)."""
        nbits = max(2, (len(palette) - 1).bit_length())
        size = 1 << nbits
        gct = b"".join(bytes(p) for p in palette) + b"\x00\x00\x00" * (size - len(palette))
        hdr = (
            b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0x80 | (nbits - 1), 0, 0])
        )
        desc = b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        mcs = nbits
        clear, end = 1 << mcs, (1 << mcs) + 1
        code_size = mcs + 1
        codes = []
        for idx in indices:
            codes += [clear, idx]
        codes.append(end)
        acc = nb = 0
        outb = bytearray()
        for c in codes:
            acc |= c << nb
            nb += code_size
            while nb >= 8:
                outb.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            outb.append(acc & 0xFF)
        blocks = bytearray([mcs])
        for i in range(0, len(outb), 255):
            chunk = outb[i : i + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        return hdr + gct + desc + bytes(blocks) + b"\x3b"

    def test_decodes_palette_image(self):
        from dcafs_spark.operators.multimodal import _decode_gif

        pal = [(0, 0, 0), (255, 255, 255), (10, 20, 30), (200, 100, 50)]
        payload = self._gif(2, 2, [0, 1, 2, 3], pal)
        w, h, mean, mx = _decode_gif(payload)
        assert (w, h, mx) == (2.0, 2.0, 255.0)
        allbytes = [b for p in [pal[0], pal[1], pal[2], pal[3]] for b in p]
        assert mean == round(sum(allbytes) / len(allbytes), 3)

    def test_lzw_kwkwk_case(self):
        from dcafs_spark.operators.multimodal import _lzw_decode

        # codes: CLEAR, 0, next_code -> the KwKwK pattern = [0, 0,0]
        mcs = 2
        clear, end = 4, 5
        codes = [clear, 0, 6, end]
        acc = nb = 0
        data = bytearray()
        for c in codes:
            acc |= c << nb
            nb += mcs + 1
            while nb >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            data.append(acc & 0xFF)
        assert _lzw_decode(bytes(data), mcs, 10) == [0, 0, 0]

    def test_non_gif_falls_through(self):
        from dcafs_spark.operators.multimodal import _decode_gif

        assert _decode_gif(b"NOTAGIF" + b"\x00" * 20) is None
        assert _decode_gif(b"GIF89a" + b"\x01") is None

    def test_feature_pipeline_consumes_gif(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

        pal = [(0, 0, 0), (255, 255, 255)]
        payload = self._gif(2, 1, [0, 1], pal)
        df = spark.createDataFrame(
            [(1, "image", payload, ("image/gif", 2, 1, 0, 0))], MEDIA_SCHEMA
        )
        row = extract_features(df).first()
        feats = list(row["feature"])
        assert feats[0] == 2.0 and feats[1] == 1.0  # real decode, not byte stats


class TestGifFrameSampling:
    @staticmethod
    def _animated_gif(n_frames, delay_cs):
        """n identical 1x1 frames with a GCE delay before each."""
        hdr = b"GIF89a" + (1).to_bytes(2, "little") * 2 + bytes([0x80, 0, 0])
        gct = bytes([0, 0, 0, 255, 255, 255]) + b"\x00" * 0
        # 2-entry palette -> gct size flag 0 => 2 colors = 6 bytes
        frame = b""
        for _ in range(n_frames):
            # 0x21 0xF9, size=4, flags, delay lo/hi, transparent idx, term
            gce = b"\x21\xf9\x04\x00" + delay_cs.to_bytes(2, "little") + b"\x00\x00"
            desc = b"\x2c" + b"\x00" * 4 + (1).to_bytes(2, "little") * 2 + b"\x00"
            # mcs=2: CLEAR(4),0,END(5) at 3 bits -> bits 100 000 101 LSB-first
            codes = [4, 0, 5]
            acc = nb = 0
            data = bytearray()
            for c in codes:
                acc |= c << nb
                nb += 3
                while nb >= 8:
                    data.append(acc & 0xFF)
                    acc >>= 8
                    nb -= 8
            if nb:
                data.append(acc & 0xFF)
            frame += gce + desc + bytes([2, len(data)]) + bytes(data) + b"\x00"
        return hdr + gct + frame + b"\x3b"

    def test_frame_times_parsed(self):
        from dcafs_spark.operators.multimodal import gif_frame_times

        gif = self._animated_gif(4, 10)  # 4 frames, 100ms apart
        assert gif_frame_times(gif) == [0, 100, 200, 300]

    def test_sampling_uses_real_timeline(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

        gif = self._animated_gif(8, 10)  # frames at 0,100,...,700ms
        df = spark.createDataFrame(
            [(7, "video", gif, ("image/gif", 1, 1, 800, 0))], MEDIA_SCHEMA
        )
        rows = sample_frames(df, every_ms=250).collect()
        # boundaries: 0 -> next 250 -> frame 300 -> next 550 -> frame 600
        assert [r["frame_idx"] for r in rows] == [0, 3, 6]

    def test_non_gif_falls_back_to_duration(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

        df = spark.createDataFrame(
            [(8, "video", b"\x00" * 32, ("video/mp4", 1, 1, 1000, 0))], MEDIA_SCHEMA
        )
        rows = sample_frames(df, every_ms=250).collect()
        assert len(rows) == 4


class TestResizeImages:
    @staticmethod
    def _ppm(w, h, fn):
        body = bytes(v for y in range(h) for x in range(w) for v in fn(x, y))
        return b"P6\n%d %d\n255\n" % (w, h) + body

    def test_nearest_neighbor_pixels(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, resize_images

        # 4x4 gradient: pixel (x,y) = (x*10, y*10, 0)
        src = self._ppm(4, 4, lambda x, y: (x * 10, y * 10, 0))
        df = spark.createDataFrame(
            [(1, "image", src, ("image/x-portable-pixmap", 4, 4, 0, 0))], MEDIA_SCHEMA
        )
        row = resize_images(df, 2, 2).first()
        out = bytes(row["payload"])
        assert out.startswith(b"P6\n2 2\n255\n")
        px = out[len(b"P6\n2 2\n255\n"):]
        # nearest-neighbor picks source pixels (0,0),(2,0),(0,2),(2,2)
        assert px == bytes([0, 0, 0, 20, 0, 0, 0, 20, 0, 20, 20, 0])
        assert row["meta"]["width"] == 2 and row["meta"]["height"] == 2

    def test_non_ppm_passthrough(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, resize_images

        df = spark.createDataFrame(
            [(2, "image", b"\xff\xd8notjpegreally", ("image/jpeg", 10, 10, 0, 0))],
            MEDIA_SCHEMA,
        )
        row = resize_images(df, 2, 2).first()
        assert bytes(row["payload"]) == b"\xff\xd8notjpegreally"
        assert row["meta"]["width"] == 10  # untouched meta


# ------------------------------------------------------------------ JPEG
# Minimal baseline-JPEG ENCODER (test-side only): uniform quant table,
# tiny custom Huffman tables (12 DC categories at 4 bits; AC EOB at
# 1 bit + optional (0,1) symbol at 2 bits), DC-dominated blocks. This
# is an independent implementation of the T.81 *writer* side, so the
# decoder test is a true round-trip, not decoder-vs-itself.


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def tobytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _enc_dc(bw, diff):
    cat = abs(diff).bit_length()
    bw.write(cat, 4)  # DC symbol `cat` has canonical code == cat at len 4
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)


def _make_jpeg(w, h, comp_blocks, q=8, restart_interval=0, samps=None, sof=0xC0):
    """comp_blocks: per component, list of blocks in MCU order; each
    block is (dc,) or (dc, ac1) with ac1 the quantized coefficient at
    zigzag index 1. samps: per-comp (h,v) sampling, default 1x1."""
    import struct

    nc = len(comp_blocks)
    samps = samps or [(1, 1)] * nc
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0]) + bytes([q] * 64)
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        hi, vi = samps[c]
        out += bytes([c + 1, (hi << 4) | vi, 0])
    counts_dc = bytes([0, 0, 0, 12] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12) + bytes([0x00]) + counts_dc + bytes(range(12))
    counts_ac = bytes([1, 1] + [0] * 14)  # EOB: code 0 (len 1); (0,1): code 10 (len 2)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2) + bytes([0x10]) + counts_ac + bytes([0x00, 0x01])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 * nc + 3, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00])
    out += bytes([0, 63, 0])

    def enc_block(bw, blk, pred):
        dc = blk[0]
        _enc_dc(bw, dc - pred)
        if len(blk) > 1 and blk[1]:
            ac = blk[1]
            assert abs(ac) == 1, "test encoder supports size-1 AC only"
            bw.write(0b10, 2)  # symbol (run=0,size=1)
            bw.write(1 if ac > 0 else 0, 1)
        bw.write(0, 1)  # EOB
        return dc

    n_units = len(comp_blocks[0])  # blocks of comp 0
    bpm = [hi * vi for hi, vi in samps]  # blocks per MCU per comp
    n_mcus = n_units // bpm[0]
    mcu_stream = []
    for m in range(n_mcus):
        unit = []
        for c in range(nc):
            for b in range(bpm[c]):
                unit.append((c, comp_blocks[c][m * bpm[c] + b]))
        mcu_stream.append(unit)
    step = restart_interval or n_mcus
    segs = []
    for s0 in range(0, n_mcus, step):
        bw = _BitWriter()
        preds = [0] * nc
        for unit in mcu_stream[s0 : s0 + step]:
            for c, blk in unit:
                preds[c] = enc_block(bw, blk, preds[c])
        segs.append(bw.tobytes())
    for k, seg in enumerate(segs):
        out += seg
        if k < len(segs) - 1:
            out += bytes([0xFF, 0xD0 + (k % 8)])
    out += b"\xff\xd9"
    return bytes(out)


class TestJpegDecode:
    def test_solid_gray_roundtrip(self):
        from dcafs_spark.operators.multimodal import _decode_jpeg

        # v=200 → DC = 8*(200-128)/q = 72 at q=8; IDCT restores exactly
        jp = _make_jpeg(8, 8, [[(72,)]])
        assert _decode_jpeg(jp) == [8.0, 8.0, 200.0, 200.0]

    def test_two_blocks_dc_diff_negative(self):
        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        # left block 200, right block 100 → second DC diff = -100
        jp = _make_jpeg(16, 8, [[(72,), (-28,)]])
        px = _decode_jpeg_pixels(jp)
        assert px.shape == (8, 16, 3)
        assert (px[:, :8] == 200).all() and (px[:, 8:] == 100).all()

    def test_solid_color_ycbcr(self):
        import numpy as np

        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        r0, g0, b0 = 250, 120, 40
        y = round(0.299 * r0 + 0.587 * g0 + 0.114 * b0)
        cb = round(128 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0)
        cr = round(128 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0)
        # at q=8 the quantized DC of a solid block v is 8·(v−128)/8 = v−128
        jp = _make_jpeg(8, 8, [[(y - 128,)], [(cb - 128,)], [(cr - 128,)]], q=8)
        px = _decode_jpeg_pixels(jp)
        exp = np.clip(
            np.round(
                [
                    y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128),
                ]
            ),
            0,
            255,
        ).astype("uint8")
        assert (px == exp.reshape(1, 1, 3)).all()
        # lossy but close to the source color
        assert abs(int(px[0, 0, 0]) - r0) <= 2

    def test_restart_markers(self):
        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        blocks = [[(72,), (-28,), (0,), (40,)]]
        plain = _decode_jpeg_pixels(_make_jpeg(32, 8, blocks))
        rst = _decode_jpeg_pixels(_make_jpeg(32, 8, blocks, restart_interval=1))
        assert plain is not None and (plain == rst).all()

    def test_ac_coefficient_idct(self):
        import numpy as np

        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        # one AC coef at zigzag 1 (u=0, v=1): independent IDCT reference
        jp = _make_jpeg(8, 8, [[(0, 1)]], q=8)
        px = _decode_jpeg_pixels(jp)
        xs = np.arange(8)
        basis1 = np.cos((2 * xs + 1) * np.pi / 16)  # v=1 row pattern
        # reference: s(x,y) = 1/4 * C(0)C(1) * F * cos((2x+1)π/16); F=8
        exp_row = np.clip(np.round(128 + 0.25 * (1 / np.sqrt(2)) * 8 * basis1), 0, 255)
        assert (px[0, :, 0] == exp_row.astype("uint8")).all()
        assert (px[:, :, 0] == px[0, :, 0]).all()  # constant down columns

    def test_chroma_subsampling_420(self):
        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        # 16x16, Y at 2x2 (4 blocks/MCU), Cb/Cr at 1x1: solid gray
        jp = _make_jpeg(
            16, 16,
            [[(50,)] * 4, [(0,)], [(0,)]],
            q=8, samps=[(2, 2), (1, 1), (1, 1)],
        )
        px = _decode_jpeg_pixels(jp)
        assert px.shape == (16, 16, 3) and (px == 178).all()

    def test_progressive_returns_none_and_byte_stats_fallback(self):
        from dcafs_spark.operators.multimodal import _decode_image, _decode_jpeg

        prog = _make_jpeg(8, 8, [[(72,)]], sof=0xC2)
        assert _decode_jpeg(prog) is None
        feats = _decode_image(prog)
        assert feats[0] == float(len(prog))  # byte-stats tier

    def test_truncated_entropy_returns_none(self):
        from dcafs_spark.operators.multimodal import _decode_jpeg

        jp = _make_jpeg(16, 8, [[(72,), (-28,)]])
        assert _decode_jpeg(jp[:-12]) is None

    def test_resize_jpeg_emits_ppm(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, resize_images

        jp = _make_jpeg(16, 8, [[(72,), (-28,)]])
        df = spark.createDataFrame(
            [(7, "image", jp, ("image/jpeg", 16, 8, 0, 0))], MEDIA_SCHEMA
        )
        row = resize_images(df, 4, 2).first()
        out = bytes(row["payload"])
        assert out.startswith(b"P6\n4 2\n255\n")
        px = out[len(b"P6\n4 2\n255\n"):]
        # cols sampled at x=0,4 (left=200) and 8,12 (right=100)
        assert px == bytes([200] * 6 + [100] * 6) * 2
        assert row["meta"]["width"] == 4 and row["meta"]["height"] == 2

    def test_feature_pipeline_consumes_jpeg(self, spark):
        from dcafs_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

        jp = _make_jpeg(8, 8, [[(72,)]])
        df = spark.createDataFrame(
            [(11, "image", jp, ("image/jpeg", 8, 8, 0, 0))], MEDIA_SCHEMA
        )
        row = extract_features(df).first()
        assert row["feature"] == [8.0, 8.0, 200.0, 200.0]

    def test_fuzz_random_block_grids(self):
        """Seeded fuzz in the suite's vectorized-grid style: random
        image sizes, component counts, restart intervals, and DC
        levels; DC-only blocks decode to exactly clip(DC·q/8 + 128)
        per block, computed here independently of the decoder."""
        import random

        import numpy as np

        from dcafs_spark.operators.multimodal import _decode_jpeg_pixels

        rng = random.Random(1234)
        for _case in range(25):
            bw_, bh_ = rng.randint(1, 4), rng.randint(1, 3)
            w, h = bw_ * 8, bh_ * 8
            nc = rng.choice([1, 3])
            q = rng.choice([1, 2, 8, 16])
            ri = rng.choice([0, 0, 1, 2])
            def draw_dc():
                # avoid dc*q ≡ 4 (mod 8): those land exactly on a .5
                # pixel level where the IDCT's last-ulp decides the
                # round — not a correctness property of any decoder
                while True:
                    dc = rng.randint(-1024 // q, 1023 // q)
                    if (dc * q) % 8 != 4:
                        return dc

            comp_blocks = []
            for _c in range(nc):
                comp_blocks.append([(draw_dc(),) for _ in range(bw_ * bh_)])
            jp = _make_jpeg(w, h, comp_blocks, q=q, restart_interval=ri)
            px = _decode_jpeg_pixels(jp)
            assert px is not None and px.shape == (h, w, 3), (w, h, nc, q, ri)
            for bi in range(bw_ * bh_):
                my, mx = divmod(bi, bw_)
                block = px[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                if nc == 1:
                    v = int(np.clip(round(comp_blocks[0][bi][0] * q / 8 + 128), 0, 255))
                    assert (block == v).all(), (bi, v)
                else:
                    y = comp_blocks[0][bi][0] * q / 8 + 128
                    cb = comp_blocks[1][bi][0] * q / 8
                    cr = comp_blocks[2][bi][0] * q / 8
                    exp = np.clip(
                        np.round([y + 1.402 * cr,
                                  y - 0.344136 * cb - 0.714136 * cr,
                                  y + 1.772 * cb]),
                        0, 255,
                    ).astype("uint8")
                    assert (block == exp.reshape(1, 1, 3)).all(), (bi, exp)
