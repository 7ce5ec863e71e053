"""Multimodal plumbing tests: schema contracts, Arrow batch shapes,
partition sizing, and the real-codec gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.operators import (
    multimodal as mm,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_contract(media):
    assert [f.name for f in mm.MEDIA_SCHEMA.fields] == media.columns
    got = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in mm.MEDIA_SCHEMA.fields}
    assert got == want


def test_extract_features_shape_and_determinism(spark, media):
    feats = mm.extract_features(media, dim=4)
    assert feats.columns == [
        "asset_id", "media_type", "n_bytes", "payload_sha256",
        "feat_mean", "feat_dim",
    ]
    rows = feats.orderBy("asset_id").limit(5).collect()
    rows2 = mm.extract_features(media, dim=4).orderBy("asset_id").limit(
        5
    ).collect()
    assert rows == rows2  # deterministic across runs/partitionings
    assert all(0.0 <= r["feat_mean"] <= 1.0 for r in rows)
    assert all(r["feat_dim"] == 4 for r in rows)


def test_frame_sample_fanout(media):
    frames = mm.sample_frames(media, every_ms=1000)
    video = media.filter(F.col("media_type") == "video").select(
        "asset_id", "duration_ms"
    )
    expected = video.select(
        F.greatest(F.lit(1), (F.col("duration_ms") / 1000).cast("long"))
        .alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert frames.count() == expected
    # frame indices are dense 0..n-1 per asset
    per = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    assert per.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_real_codec_path_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff")


def test_repartition_for_media(spark, media):
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    df = mm.repartition_for_media(media, target_rows=50)
    # no hidden session reconfiguration (batch caps are the caller's,
    # via media_batch_conf at session build)...
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        == before
    )
    # ...and the scan is spread over at least the session's parallelism.
    cores = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() >= min(
        cores, media.rdd.getNumPartitions()
    )
    assert mm.media_batch_conf(50)[
        "spark.sql.execution.arrow.maxRecordsPerBatch"
    ] == "50"


def test_media_stats_sniffs_magic_bytes(spark):
    rows = [
        (1, "image", None, bytearray(b"\xff\xd8\xff\xe0rest"), None, None, None, None),
        (2, "image", None, bytearray(b"\x89PNG\r\n"), None, None, None, None),
        (3, "audio", None, bytearray(b"plain"), None, None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r["asset_id"]: r["sniffed_format"]
        for r in mm.media_stats(df).collect()
    }
    assert got == {1: "jpeg", 2: "png", 3: "unknown"}


# ---------------------------------------------------------------------------
# Real PPM/BMP codecs (round 5)
# ---------------------------------------------------------------------------


def _bmp_bytes(width, height, rows_rgb, bottom_up=True):
    """Hand-assemble an uncompressed 24-bit BMP. ``rows_rgb`` is
    [[(r,g,b), ...], ...] top row first."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    px = b""
    order = reversed(rows_rgb) if bottom_up else rows_rgb
    for row in order:
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        px += line + b"\x00" * (row_bytes - len(line))
    data_off = 54
    filesz = data_off + len(px)
    hdr = b"BM" + struct.pack("<IHHI", filesz, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height if bottom_up else -height,
        1,
        24,
        0,
        len(px),
        2835,
        2835,
        0,
        0,
    )
    return hdr + dib + px


def test_parse_ppm_header_comments_and_pixels():
    payload = b"P6\n# a comment\n 2 1\n# another\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    w, h, mx, px = mm.parse_ppm(payload)
    assert (w, h, mx) == (2, 1, 255)
    assert px.tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_parse_ppm_16bit_maxval():
    import struct

    pix = struct.pack(">6H", 256, 512, 1024, 2048, 4096, 65535)
    w, h, mx, px = mm.parse_ppm(b"P6 2 1 65535\n" + pix)
    assert (w, h, mx) == (2, 1, 65535)
    assert px.tolist() == [[[256, 512, 1024], [2048, 4096, 65535]]]


def test_parse_ppm_malformed():
    import pytest

    with pytest.raises(ValueError):
        mm.parse_ppm(b"P5 2 1 255\n\x00\x00")  # wrong magic
    with pytest.raises(ValueError):
        mm.parse_ppm(b"P6 2 1 255\n\x00\x00")  # truncated pixels
    with pytest.raises(ValueError):
        mm.parse_ppm(b"P6 2 1")  # truncated header


def test_parse_bmp_bottom_up_and_top_down():
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    for bottom_up in (True, False):
        w, h, bpp, px = mm.parse_bmp(_bmp_bytes(2, 2, rows, bottom_up))
        assert (w, h, bpp) == (2, 2, 24)
        assert px.tolist() == [
            [[1, 2, 3], [4, 5, 6]],
            [[7, 8, 9], [10, 11, 12]],
        ], bottom_up


def test_parse_bmp_rejects_unsupported():
    import pytest

    with pytest.raises(ValueError):
        mm.parse_bmp(b"XX" + b"\x00" * 60)
    good = _bmp_bytes(1, 1, [[(1, 2, 3)]])
    bad_bpp = bytearray(good)
    bad_bpp[28] = 32  # declare 32-bit
    with pytest.raises(ValueError):
        mm.parse_bmp(bytes(bad_bpp))


def test_decode_images_mixed_formats_and_errors(spark):
    ppm = b"P6 1 1 255\n\x0A\x14\x1E"
    bmp = _bmp_bytes(1, 1, [[(100, 150, 200)]])
    df = spark.createDataFrame(
        [(1, ppm), (2, bmp), (3, b"garbage")],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in mm.decode_images(df).collect()}
    assert (got[1]["mean_r"], got[1]["mean_g"], got[1]["mean_b"]) == (
        10.0,
        20.0,
        30.0,
    )
    assert got[1]["err"] is None
    assert (got[2]["mean_r"], got[2]["mean_g"], got[2]["mean_b"]) == (
        100.0,
        150.0,
        200.0,
    )
    assert got[2]["err"] is None
    assert got[3]["err"] is not None and got[3]["width"] is None


def test_wav_roundtrip_and_chunk_walk():
    import struct

    samples = [0, 1000, -1000, 32767, -32768, 7]
    payload = mm.write_wav(samples, sample_rate=8000)
    nch, sr, bits, v = mm.parse_wav(payload)
    assert (nch, sr, bits) == (1, 8000, 16)
    assert v.tolist() == samples
    # Parser must walk chunks, not assume a 44-byte header: splice an
    # odd-size LIST chunk (word-aligned with a pad byte) before data.
    hdr, data = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = (
        payload[:4]
        + struct.pack("<I", len(payload) - 8 + len(extra))
        + payload[8:36]
        + extra
        + data
    )
    nch2, sr2, bits2, v2 = mm.parse_wav(spliced)
    assert v2.tolist() == samples and (nch2, sr2, bits2) == (1, 8000, 16)


def test_parse_wav_malformed():
    import pytest

    with pytest.raises(ValueError):
        mm.parse_wav(b"RIFX1234WAVE")  # wrong magic
    with pytest.raises(ValueError):
        mm.parse_wav(mm.write_wav([1, 2, 3])[:20])  # truncated chunk
    good = bytearray(mm.write_wav([1, 2, 3]))
    good[20] = 3  # audio format = 3 (float), unsupported
    with pytest.raises(ValueError):
        mm.parse_wav(bytes(good))


def test_decode_audio_features_and_errors(spark):
    import math

    # Samples +256/-256 alternating: rms = 256, zero crossings = 3.
    wav = mm.write_wav([256, -256, 256, -256], sample_rate=1000)
    df = spark.createDataFrame(
        [(1, wav), (2, b"garbage")], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in mm.decode_audio(df).collect()}
    r1 = got[1]
    assert r1["err"] is None
    assert (r1["sample_rate"], r1["n_channels"], r1["bits"]) == (1000, 1, 16)
    assert r1["n_samples"] == 4 and r1["duration_ms"] == 4
    assert math.isclose(r1["rms"], 256.0)
    assert r1["zero_crossings"] == 3
    assert got[2]["err"] is not None and got[2]["n_samples"] is None


def test_synthesize_wav_is_valid_and_text_derived(spark):
    df = spark.createDataFrame([(7, "AZ")], "doc_id long, text string")
    row = mm.synthesize_wav(df).collect()[0]
    nch, sr, bits, v = mm.parse_wav(bytes(row["payload"]))
    assert (nch, sr, bits) == (1, 8000, 16)
    assert v.shape[0] == 16
    assert v[0] == (ord("A") - 79) * 256  # negative: 'A' < 'O'
    assert v[1] == (ord("Z") - 79) * 256
    assert all(x == (ord("x") - 79) * 256 for x in v[2:])  # x-padding


def test_dominant_frequency_fft_and_errors(spark):
    """A pure 1 kHz square wave at 8 kHz/16 samples must peak at bin 2;
    garbage payloads surface in err."""
    samples = [8000 if (2 * 1000 * i // 8000) % 2 == 0 else -8000
               for i in range(16)]
    wav = mm.write_wav(samples, 8000)
    df = spark.createDataFrame(
        [(1, wav), (2, b"junk")], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in mm.dominant_frequency(df).collect()}
    assert got[1]["dominant_bin"] == 2
    assert got[1]["dominant_freq_hz"] == 1000
    assert got[1]["err"] is None
    assert got[2]["err"] is not None and got[2]["dominant_bin"] is None


def test_resize_images_roundtrip_and_errors(spark):
    """2×2 downsample of a 4×4 PPM keeps the top-left pixel of each 2×2
    block, re-encodes as a VALID P6, and rejects junk via err."""
    import numpy as np

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = b"P6\n4 4\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [(1, payload), (2, b"nope")], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in mm.resize_images(df, 2).collect()}
    r = got[1]
    assert (r["width"], r["height"], r["err"]) == (2, 2, None)
    w, h, mx, small = mm.parse_ppm(bytes(r["payload"]))
    assert (w, h, mx) == (2, 2, 255)
    assert small.tolist() == px[::2, ::2].tolist()
    assert got[2]["err"] is not None and got[2]["payload"] is None


def test_jpeg_roundtrip_solid_color_exact():
    """Solid-color baseline JPEG with the flat-16 quantizer round-trips
    to the codec's exact closed form (determinism contract in
    operators/jpeg.py) — the property the mm_decode_jpeg oracle hashes."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        jpeg as J,
    )

    for r0, g0, b0, w, h in [
        (200, 30, 99, 8, 8),
        (12, 250, 7, 16, 24),
        (0, 0, 0, 8, 16),
        (255, 255, 255, 16, 8),
    ]:
        img = np.full((h, w, 3), (r0, g0, b0), dtype=np.uint8)
        payload = J.encode_baseline_jpeg(img, qtables=J.flat_tables(16))
        W, H, nc, out = J.parse_jpeg(payload)
        assert (W, H, nc) == (w, h, 3)
        fl = np.floor

        def clip(x):
            return min(255.0, max(0.0, x))

        y0 = clip(fl(0.299 * r0 + 0.587 * g0 + 0.114 * b0 + 0.5))
        cb0 = clip(
            fl(-0.168736 * r0 - 0.331264 * g0 + 0.5 * b0 + 128.0 + 0.5)
        )
        cr0 = clip(
            fl(0.5 * r0 - 0.418688 * g0 - 0.081312 * b0 + 128.0 + 0.5)
        )

        def rt(c):
            dcq = fl((c - 128.0) / 2 + 0.5)
            return clip(fl(dcq * 16 / 8 + 128.0 + 0.5))

        y1, cb1, cr1 = rt(y0), rt(cb0), rt(cr0)
        exp = [
            clip(fl(y1 + 1.402 * (cr1 - 128.0) + 0.5)),
            clip(
                fl(
                    y1
                    - 0.344136 * (cb1 - 128.0)
                    - 0.714136 * (cr1 - 128.0)
                    + 0.5
                )
            ),
            clip(fl(y1 + 1.772 * (cb1 - 128.0) + 0.5)),
        ]
        assert out.reshape(-1, 3).tolist() == [exp] * (w * h)


def test_jpeg_roundtrip_tolerance_and_subsampling():
    """Lossy-but-close on real content: gradients at q95 within a few
    code values for both 4:4:4 and 4:2:0; noise at q90 within JPEG's
    usual error envelope; odd (non-MCU-aligned) sizes crop correctly."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        jpeg as J,
    )

    grad = np.stack([np.linspace(0, 200, 32)] * 24).astype(np.uint8)
    img = np.stack([grad, grad // 2, grad // 3], axis=2)
    for sub, tol in (("4:4:4", 12), ("4:2:0", 30)):
        out = J.parse_jpeg(
            J.encode_baseline_jpeg(img, quality=95, subsampling=sub)
        )[3]
        err = np.abs(out.astype(int) - img.astype(int))
        assert out.shape == img.shape and err.max() <= tol

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (17, 9, 3), dtype=np.uint8)
    W, H, nc, out = J.parse_jpeg(J.encode_baseline_jpeg(noise, quality=90))
    assert (W, H) == (9, 17) and out.shape == (17, 9, 3)
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 15


def test_jpeg_rejects_malformed_and_exotic():
    """ValueError for junk/truncation; NotImplementedError reserved for
    the documented out-of-scope tail (progressive SOF2)."""
    import struct

    import numpy as np
    import pytest

    from extract_transform_load_template_multidb_spark.operators import (
        jpeg as J,
    )

    with pytest.raises(ValueError):
        J.parse_jpeg(b"nope")
    img = np.full((8, 8, 3), 80, dtype=np.uint8)
    payload = J.encode_baseline_jpeg(img)
    with pytest.raises(ValueError):
        J.parse_jpeg(payload[:40] + b"\x00")  # desynced segment stream
    # Flip SOF0 (FFC0) to progressive SOF2 (FFC2): must be the
    # documented NotImplementedError, not a crash.
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        J.parse_jpeg(prog)
    sof = payload.index(b"\xff\xc0")
    twelve_bit = (
        payload[: sof + 4] + b"\x0c" + payload[sof + 5 :]
    )  # precision byte 8 → 12
    with pytest.raises(NotImplementedError):
        J.parse_jpeg(twelve_bit)


def test_decode_jpegs_dataframe_and_errors(spark):
    """The mapInPandas stage decodes real payloads and surfaces
    malformed ones in err without failing the stage."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        jpeg as J,
    )

    img = np.full((8, 16, 3), (10, 200, 30), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, J.encode_baseline_jpeg(img, qtables=J.flat_tables(16))),
            (2, b"\xff\xd8garbage"),
            (3, None),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in mm.decode_jpegs(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (16, 8)
    assert got[1]["err"] is None and got[1]["n_components"] == 3
    assert got[2]["err"] is not None and got[2]["width"] is None
    assert got[3]["err"] is not None


def test_channel_histograms_clamps_top_bin(spark):
    """n_bins that does not divide 256 must clamp top-range values into
    the last bin (no silently dropped pixels), and every histogram must
    sum to n_pixels; invalid n_bins raises."""
    import numpy as np
    import pytest

    px = np.full((4, 4, 3), 255, dtype=np.uint8)  # top-of-range
    payload = b"P6\n4 4\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [(1, payload)], "asset_id long, payload binary"
    )
    rows = mm.channel_histograms(df, n_bins=3).collect()
    assert len(rows) == 3
    for r in rows:
        assert sum(r["bins"]) == r["n_pixels"] == 16
        assert r["bins"][-1] == 16  # 255 lands in the LAST bin
    with pytest.raises(ValueError):
        mm.channel_histograms(df, n_bins=0)
    with pytest.raises(ValueError):
        mm.channel_histograms(df, n_bins=257)


def test_png_roundtrip_all_filters_rgb_rgba():
    """encode→decode is bit-exact for every filter type, both color
    types, and awkward shapes (1×1, 1-row, 1-col) — PNG is lossless, the
    property the mm_decode_png oracle hashes."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    rng = np.random.default_rng(7)
    shapes = [(8, 4), (1, 1), (1, 9), (9, 1), (5, 7)]
    for ch in (3, 4):
        for h, w in shapes:
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
                W, H, C, out = P.parse_png(
                    P.encode_png(img, filters=filters)
                )
                assert (W, H, C) == (w, h, ch), (filters, ch, h, w)
                assert out.tolist() == img.tolist(), (filters, ch, h, w)


def test_png_rejects_malformed_and_exotic():
    """ValueError for junk/CRC damage/truncation; NotImplementedError
    reserved for valid-but-unsupported variants (16-bit, palette,
    interlaced)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = P.encode_png(img)

    with pytest.raises(ValueError):
        P.parse_png(b"not a png")
    with pytest.raises(ValueError):
        P.parse_png(good[:20])  # truncated mid-chunk
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError):
        P.parse_png(bytes(corrupt))

    def variant(depth=8, color_type=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color_type, 0, 0,
                           interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + P._chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError):
        P.parse_png(variant(depth=16))
    with pytest.raises(NotImplementedError):
        P.parse_png(variant(color_type=3))
    with pytest.raises(NotImplementedError):
        P.parse_png(variant(interlace=1))


def test_decode_pngs_mixed_and_malformed(spark):
    """The Spark decode stage: valid RGB + RGBA rows decode with exact
    channel means; junk and unsupported variants land in err without
    failing the stage."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    df = spark.createDataFrame(
        [
            (1, P.encode_png(rgb, filters=(0, 1, 2, 3, 4))),
            (2, P.encode_png(rgba, filters=(4,))),
            (3, b"\x89PNGgarbage"),
            (4, None),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in mm.decode_pngs(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (
        3, 2, 3,
    )
    assert got[1]["err"] is None
    assert got[1]["mean_r"] == rgb[:, :, 0].mean()
    assert got[2]["n_channels"] == 4
    assert got[2]["mean_b"] == rgba[:, :, 2].mean()
    assert got[3]["err"] is not None and got[3]["width"] is None
    assert got[4]["err"] is not None


def _lzw_compress_gif(indices, min_code):
    """Reference GIF-LZW COMPRESSOR (tests only): real dictionary, real
    width growth — produces the compressed streams the uncompressed
    encoder never does, so the decoder's dictionary/KwKwK/width paths
    get exercised."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_codes = [clear]
    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    s = b""
    for v in indices.ravel().tolist():
        sv = s + bytes([v])
        if sv in table:
            s = sv
        else:
            out_codes.append(table[s])
            if next_code < 4096:
                table[sv] = next_code
                next_code += 1
            s = bytes([v])
    if s:
        out_codes.append(table[s])
    out_codes.append(eoi)
    # Bit-pack by SIMULATING the decoder's width schedule exactly: the
    # decoder adds its (lagging) dictionary entry only when it has a
    # previous code, so width changes one code later than a naive
    # encoder-side count — emit each code at the width the decoder will
    # read it with.
    data = bytearray()
    acc = nbits = 0
    width = min_code + 1
    next_code = eoi + 1
    prev = -1
    for code in out_codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width = min_code + 1
            next_code = eoi + 1
            prev = -1
        elif code != eoi:
            if prev >= 0 and next_code < 4096:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def test_gif_decoder_handles_real_lzw_compression():
    """parse_gif must decode genuinely LZW-COMPRESSED streams (dictionary
    hits, code-width growth, the KwKwK case) — not just the encoder's
    uncompressed form. A repetitive image forces dictionary reuse and
    KwKwK; assembled into a full GIF container by hand."""
    import struct

    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        gif as G,
    )

    rng = np.random.default_rng(5)
    # Repetitive rows -> dictionary hits; a run of one value -> KwKwK.
    base = rng.integers(0, 16, (4, 64), dtype=np.uint8)
    idx = np.vstack([base] * 8)
    idx[0, :32] = 7  # long run triggers KwKwK early
    h, w = idx.shape
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    min_code = 4
    data = _lzw_compress_gif(idx, min_code)
    payload = bytearray()
    payload += b"GIF87a"
    payload += struct.pack("<HHBBB", w, h, 0x80 | (3 << 4) | 3, 0, 0)
    payload += pal.tobytes()
    payload += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    payload.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        payload.append(len(chunk))
        payload += chunk
    payload += b"\x00\x3b"
    W, H, p2, out = G.parse_gif(bytes(payload))
    assert (W, H) == (w, h)
    assert out.tolist() == idx.tolist()
    assert len(data) < idx.size  # it genuinely compressed


def test_gif_roundtrip_and_rejects():
    """encode_gif87a -> parse_gif is bit-exact for arbitrary index
    images; junk/truncation raise ValueError; interlaced frames raise
    NotImplementedError."""
    import struct

    import numpy as np
    import pytest

    from extract_transform_load_template_multidb_spark.operators import (
        gif as G,
    )

    rng = np.random.default_rng(11)
    for h, w, npal in [(8, 4, 256), (1, 1, 2), (5, 7, 16), (3, 200, 256)]:
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
        W, H, p2, out = G.parse_gif(G.encode_gif87a(idx, pal))
        assert (W, H) == (w, h)
        assert out.tolist() == idx.tolist()
        assert p2[:npal].tolist() == pal.tolist()

    with pytest.raises(ValueError):
        G.parse_gif(b"not a gif at all")
    good = bytearray(
        G.encode_gif87a(np.zeros((2, 2), np.uint8), np.zeros((4, 3), np.uint8))
    )
    with pytest.raises(ValueError):
        G.parse_gif(bytes(good[:20]))
    # flip the interlace bit in the image descriptor
    desc = bytes(good).index(b"\x2c")
    good[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        G.parse_gif(bytes(good))


def test_gif89a_extension_blocks_skipped_gracefully():
    """A GIF89a with Graphic Control + Comment + Application extension
    blocks before the image descriptor must decode to the same pixels
    as the bare 87a container — the block walker skips every extension
    label, not just GCE (pins the codec tail as formats evolve)."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        gif as G,
    )

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (6, 9), dtype=np.uint8)
    base = bytearray(G.encode_gif87a(idx, pal))
    desc = bytes(base).index(b"\x2c")
    ext = bytearray()
    # Graphic Control Extension: label 0xF9, one 4-byte sub-block.
    ext += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    # Comment extension: label 0xFE, two sub-blocks.
    ext += b"\x21\xfe\x05hello\x03abc\x00"
    # Application extension: label 0xFF, 11-byte app block + data.
    ext += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    payload = bytes(base[:6]) + b"GIF89a"[6:]  # keep header bytes
    payload = b"GIF89a" + bytes(base[6:desc]) + bytes(ext) + bytes(base[desc:])
    W, H, p2, out = G.parse_gif(payload)
    assert (W, H) == (9, 6)
    assert out.tolist() == idx.tolist()
    assert p2[: len(pal)].tolist() == pal.tolist()


def test_png_palette_color_type_fails_fast():
    """Palette PNGs (color type 3) are outside the supported RGB/RGBA
    tail and must raise NotImplementedError — not misdecode — so the
    fail-fast boundary stays pinned."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    # Hand-build a color-type-3 PNG: IHDR(ct=3) + PLTE + 1-row IDAT.
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])
    idat = zlib.compress(b"\x00\x00\x01")
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", idat)
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color type 3"):
        P.parse_png(payload)

    # The RGB/RGBA path is untouched by the guard.
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    w, h, ch, out = P.parse_png(P.encode_png(img))
    assert (w, h, ch) == (2, 2, 3)


def test_png_filter_reconstruction_vectorized_matches_reference():
    """The vectorized Sub/Average/Paeth reconstruction must reproduce
    the spec's per-byte recurrence exactly on wide RGB and RGBA rows
    (regression pin for the lane-cumsum / per-pixel-vector rewrite)."""
    import numpy as np

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    rng = np.random.default_rng(31)
    for ch in (3, 4):
        img = rng.integers(0, 256, (7, 129, ch), dtype=np.uint8)
        for filters in [(1,), (3,), (4,), (0, 1, 2, 3, 4)]:
            w, h, c, out = P.parse_png(P.encode_png(img, filters=filters))
            assert (w, h, c) == (129, 7, ch)
            assert out.tolist() == img.tolist(), filters


def test_png_adam7_interlace_fails_fast_on_real_image():
    """A REAL encoded PNG whose IHDR interlace byte is rewritten to 1
    (Adam7) with a recomputed CRC — i.e. a structurally valid Adam7
    container, not just a junk header — must raise NotImplementedError
    naming Adam7, never misdecode the sequential scanlines as if they
    were progressive passes. Completes the codec-tail pin set next to
    the palette-PNG and GIF89a tests."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from extract_transform_load_template_multidb_spark.operators import (
        png as P,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    good = P.encode_png(img)
    # IHDR data starts at offset 16 (8 sig + 4 len + 4 tag); its 13
    # bytes end with the interlace method at offset 16 + 12.
    body = bytearray(good)
    ihdr = bytearray(body[16 : 16 + 13])
    assert ihdr[12] == 0
    ihdr[12] = 1
    body[16 : 16 + 13] = ihdr
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    body[16 + 13 : 16 + 17] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="Adam7"):
        P.parse_png(bytes(body))
    # The original still decodes exactly.
    w, h, ch, out = P.parse_png(good)
    assert (w, h, ch) == (7, 5, 3)
    assert out.tolist() == img.tolist()
