"""Multimodal plumbing tests: binary payload columns, metadata pruning,
mapInPandas decode/feature/frame-sample shapes (decoders are deterministic
fakes; the real paths raise DecoderUnavailable by design)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from inception_spark.operators.multimodal import (
    DecoderUnavailable,
    attach_media_meta,
    extract_features,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG-fake-image-bytes-1"),
        (2, b"\x89PNG-fake-image-bytes-22222"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    return attach_media_meta(df, modality="image", mime="image/png")


def test_media_meta_schema(media_df):
    r = media_df.collect()[0]
    assert r["media_meta"]["modality"] == "image"
    assert r["media_meta"]["n_bytes"] == 23
    assert r["media_meta"]["width"] is None


def test_metadata_filter_prunes_before_decode(media_df):
    # metadata-only predicate: no binary column in the scan output
    pruned = media_df.filter(
        F.col("media_meta.modality") == "image"
    ).select("id", "media_meta.n_bytes")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in pruned.columns
    assert pruned.count() == 2


def test_extract_features_deterministic(media_df):
    out = extract_features(media_df, dim=32).collect()
    assert len(out) == 2
    by_id = {r["id"]: r["feature"] for r in out}
    assert len(by_id[1]) == 32
    # deterministic: re-run yields identical vectors
    again = {r["id"]: r["feature"] for r in extract_features(media_df, dim=32).collect()}
    assert by_id == again
    # distinct payloads → distinct features
    assert by_id[1] != by_id[2]


def test_real_decode_path_raises(media_df):
    with pytest.raises(Exception) as ei:
        extract_features(media_df, fake=False).collect()
    assert "DecoderUnavailable" in str(ei.value) or "media decoding" in str(
        ei.value
    )


def test_sample_frames_explosion(spark):
    df = spark.createDataFrame(
        [(7, b"0123456789" * 10)], "id long, payload binary"
    )
    df = attach_media_meta(df, modality="video", mime="video/mp4")
    df = df.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(5000).cast("long")),
    )
    frames = sample_frames(df, every_ms=1000).collect()
    assert len(frames) == 5
    assert [f["frame_number"] for f in frames] == [1, 2, 3, 4, 5]
    total = b"".join(bytes(f["frame"]) for f in frames)
    assert len(total) == 100  # full payload covered by slices


def test_resize_images(media_df):
    from inception_spark.operators.multimodal import resize_images

    out = resize_images(media_df, width=32, height=16).collect()
    assert len(out) == 2
    for r in out:
        assert r["media_meta"]["width"] == 32
        assert r["media_meta"]["height"] == 16
        assert r["media_meta"]["n_bytes"] == len(bytes(r["payload"])) == 32 * 16


def _gradient_bmp(w=8, h=6):
    """Build a real 24-bpp BMP with a deterministic RGB gradient."""
    import numpy as np

    from inception_spark.operators.multimodal import encode_bmp

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = np.arange(w, dtype=np.uint8) * 30          # R by column
    img[..., 1] = (np.arange(h, dtype=np.uint8) * 40)[:, None]  # G by row
    img[..., 2] = 7
    return img, encode_bmp(img)


def test_bmp_roundtrip_exact():
    import numpy as np

    from inception_spark.operators.multimodal import decode_bmp

    img, payload = _gradient_bmp(5, 3)  # odd width exercises row padding
    back = decode_bmp(payload)
    assert back.shape == (3, 5, 3)
    assert np.array_equal(back, img)


def test_real_resize_and_features_on_bmp(spark):
    import numpy as np

    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_bmp,
        extract_features,
        probe_bmp_dims,
        resize_images,
        resize_nearest,
    )

    img, payload = _gradient_bmp(8, 6)
    df = attach_media_meta(
        spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary"),
        modality="image", mime="image/bmp",
    )

    # JVM-side header probe fills width/height without touching Python
    probed = probe_bmp_dims(df).select("media_meta.*").head()
    assert (probed["width"], probed["height"]) == (8, 6)

    # real resize: decode → nearest-neighbor → re-encode, verified pixel-
    # exact against the numpy reference
    out = resize_images(df, width=4, height=3, fake=False).head()
    resized = decode_bmp(bytes(out["payload"]))
    assert np.array_equal(resized, resize_nearest(img, 4, 3))
    assert out["media_meta"]["width"] == 4 and out["media_meta"]["height"] == 3

    # real features: unit-norm, deterministic across calls
    f1 = extract_features(df, dim=32, fake=False).head()["feature"]
    f2 = extract_features(df, dim=32, fake=False).head()["feature"]
    assert f1 == f2 and abs(float(np.linalg.norm(f1)) - 1.0) < 1e-5


def test_decode_image_unsupported_format_raises():
    import pytest

    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        decode_image,
    )

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed — compressed formats decode for real")
    except ImportError:
        pass
    with pytest.raises(DecoderUnavailable):
        decode_image(b"\xff\xd8\xff\xe0jpeg-needs-PIL")
    # a PNG-signed payload with no chunks dispatches to the NATIVE PNG
    # decoder (PIL not involved) and refuses with the same contract
    with pytest.raises(DecoderUnavailable):
        decode_image(b"\x89PNG\r\n\x1a\n....")


# --- native WAV codec ----------------------------------------------------------

def _tone(rate=8000, secs=0.25, hz=440.0):
    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    return 0.5 * np.sin(2 * np.pi * hz * t)


def test_wav_roundtrip():
    import numpy as np

    from inception_spark.operators.multimodal import decode_wav, encode_wav

    x = _tone()
    payload = encode_wav(x, 8000)
    y, rate = decode_wav(payload)
    assert rate == 8000 and len(y) == len(x)
    assert float(np.max(np.abs(x - y))) < 1e-3  # 16-bit quantization


def test_wav_stereo_downmix_and_guards():
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        decode_wav,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        pcm = (np.tile([0.5, -0.5], 100) * 32767).astype("<i2")
        w.writeframes(pcm.tobytes())
    y, rate = decode_wav(buf.getvalue())
    assert rate == 8000 and len(y) == 100
    assert abs(float(np.max(np.abs(y)))) < 1e-4  # L/R cancel to ~0
    with _pytest.raises(DecoderUnavailable):
        decode_wav(b"\x00" * 64)


def test_audio_features_shape_and_determinism():
    import numpy as np

    from inception_spark.operators.multimodal import audio_features

    x = _tone()
    f1 = audio_features(x, 8000, 16)
    f2 = audio_features(x, 8000, 16)
    assert f1.shape == (16,) and np.array_equal(f1, f2)
    assert abs(f1[0] - 0.25) < 1e-6          # duration
    assert abs(f1[1] - 0.5 / 2 ** 0.5) < 1e-2  # sine RMS = A/sqrt(2)


def test_resample_audio_np_length():
    from inception_spark.operators.multimodal import resample_audio_np

    x = _tone(rate=8000, secs=0.5)
    y = resample_audio_np(x, 8000, 4000)
    assert abs(len(y) - len(x) / 2) <= 1


def test_probe_wav_meta_jvm_side(spark):
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        encode_wav,
        probe_wav_meta,
    )

    payload = encode_wav(_tone(rate=8000, secs=0.25), 8000)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    out = probe_wav_meta(attach_media_meta(df, modality="audio", mime="audio/wav"))
    row = out.select("media_meta.*").collect()[0]
    assert row["width"] == 8000          # sample rate via header probe
    assert row["duration_ms"] == 250
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_extract_audio_features_real_and_resample(spark):
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_wav,
        encode_wav,
        extract_audio_features,
        resample_audio,
    )

    rows = [
        (1, bytearray(encode_wav(_tone(hz=440.0), 8000))),
        (2, bytearray(encode_wav(_tone(hz=880.0), 8000))),
    ]
    df = attach_media_meta(
        spark.createDataFrame(rows, "id long, payload binary"),
        modality="audio", mime="audio/wav",
    )
    feats = {r["id"]: r["feature"]
             for r in extract_audio_features(df, dim=16, fake=False).collect()}
    assert len(feats[1]) == 16
    # different pitch -> different spectral bands
    assert feats[1][3:] != feats[2][3:]
    res = resample_audio(df, rate=4000, fake=False).collect()
    y, rate = decode_wav(bytes(res[0]["payload"]))
    assert rate == 4000 and abs(len(y) - 1000) <= 1


def test_netpbm_roundtrip_and_gray_replication():
    import numpy as np

    from inception_spark.operators.multimodal import (
        decode_netpbm,
        encode_ppm,
    )

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_netpbm(encode_ppm(img)) == img).all()
    # header comments + extra whitespace parse like the spec says
    p6 = b"P6\n# a comment\n 3 2\n255\n" + img.tobytes()
    assert (decode_netpbm(p6) == img).all()
    # P5 grayscale replicates to (h, w, 3)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p5 = b"P5\n3 2\n255\n" + gray.tobytes()
    out = decode_netpbm(p5)
    assert out.shape == (2, 3, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 1] == gray).all()


def test_netpbm_16bit_refused():
    import pytest as _pytest

    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        decode_netpbm,
    )

    with _pytest.raises(DecoderUnavailable):
        decode_netpbm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_resize_images_accepts_ppm_input(spark):
    """decode_image dispatches netpbm natively, so the real (fake=False)
    resize path works on PPM payloads end to end."""
    import numpy as np

    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_bmp,
        encode_ppm,
        resize_images,
    )

    img = np.random.RandomState(0).randint(0, 255, (8, 6, 3), np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)))], "id long, payload binary"
    )
    out = resize_images(
        attach_media_meta(df, modality="image", mime="image/x-portable-pixmap"),
        width=3,
        height=4,
        fake=False,
    ).collect()[0]
    got = decode_bmp(bytes(out["payload"]))  # re-encoded as BMP
    assert got.shape == (4, 3, 3)


# --- native PNG codec ----------------------------------------------------------


def _grad_img(h=13, w=17):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x * 3 + y * 5) % 256], axis=2
    ).astype(np.uint8)


def test_png_roundtrip_exact():
    import numpy as np

    from inception_spark.operators.multimodal import decode_png, encode_png

    img = _grad_img()
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_all_filter_types_unfilter():
    """Hand-build a PNG whose scanlines use every filter type (None, Sub,
    Up, Average, Paeth) by applying the forward filters per the spec —
    decode must recover the original pixels exactly."""
    import struct
    import zlib

    import numpy as np

    from inception_spark.operators.multimodal import _PNG_SIG, decode_png

    img = _grad_img(h=10, w=9)
    h, w, nch = img.shape
    flat = img.reshape(h, w * nch).astype(np.int32)
    body = bytearray()
    for y in range(h):
        ftype = y % 5
        cur = flat[y]
        up = flat[y - 1] if y else np.zeros(w * nch, np.int32)
        out = np.zeros(w * nch, np.int32)
        for x in range(w * nch):
            a = int(cur[x - nch]) if x >= nch else 0
            b = int(up[x])
            c = int(up[x - nch]) if x >= nch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (int(cur[x]) - pred) & 0xFF
        body += bytes([ftype]) + bytes(out.astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_gray_rgba_palette_variants():
    import struct
    import zlib

    import numpy as np

    from inception_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    def build(w, h, ctype, raw, extra=b""):
        return (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + extra
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    # gray (ctype 0): value replicates across RGB
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    out = decode_png(build(4, 3, 0, raw))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)

    # RGBA (ctype 6): alpha dropped
    img = _grad_img(h=3, w=4)
    rgba = np.dstack([img, np.full((3, 4), 128, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    assert np.array_equal(decode_png(build(4, 3, 6, raw)), img)

    # palette (ctype 3): indices resolve through PLTE
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 1]], np.uint8)
    raw = b"\x00" + idx.tobytes()
    out = decode_png(
        build(4, 1, 3, raw, extra=chunk(b"PLTE", plte.tobytes()))
    )
    assert np.array_equal(out, plte[idx[0]].reshape(1, 4, 3))


def test_png_refusals():
    import struct
    import zlib

    import numpy as np

    import pytest

    from inception_spark.operators.multimodal import (
        _PNG_SIG,
        DecoderUnavailable,
        decode_png,
        encode_png,
    )

    with pytest.raises(DecoderUnavailable):
        decode_png(b"not a png")
    with pytest.raises(DecoderUnavailable):
        decode_png(_PNG_SIG + b"\x00\x00")  # no chunks
    # corrupt deflate stream
    good = bytearray(encode_png(_grad_img(4, 4)))
    good[40] ^= 0xFF
    with pytest.raises(DecoderUnavailable):
        decode_png(bytes(good))
    # truncated scanlines: valid deflate of too-few bytes
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    short = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(DecoderUnavailable):
        decode_png(short)
    # 16-bit depth refused
    deep = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(DecoderUnavailable):
        decode_png(deep)


def test_real_resize_and_features_on_png(spark):
    """End-to-end fake=False pipeline on REAL PNG payloads: decode →
    nearest resize → re-encode (BMP out), and decode → image_features."""
    import numpy as np

    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_bmp,
        decode_png,
        encode_png,
        extract_features,
        image_features,
        resize_images,
    )

    imgs = {1: _grad_img(16, 12), 2: _grad_img(9, 21)}
    rows = [(i, encode_png(img)) for i, img in imgs.items()]
    df = attach_media_meta(
        spark.createDataFrame(rows, "id long, payload binary"),
        modality="image",
        mime="image/png",
    )
    resized = resize_images(df, width=8, height=8, fake=False).collect()
    for r in resized:
        arr = decode_bmp(bytes(r["payload"]))
        assert arr.shape == (8, 8, 3)
        assert r["media_meta"]["width"] == 8

    feats = {
        r["id"]: np.asarray(r["feature"])
        for r in extract_features(df, dim=32, fake=False).collect()
    }
    for i, img in imgs.items():
        expect = image_features(decode_png(encode_png(img)), 32)
        assert np.allclose(feats[i], expect, atol=1e-6)


def test_probe_png_dims_jvm_side(spark):
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        encode_png,
        probe_png_dims,
    )

    rows = [(1, encode_png(_grad_img(5, 7))), (2, b"BMnot-a-png")]
    df = attach_media_meta(
        spark.createDataFrame(rows, "id long, payload binary"),
        modality="image",
    )
    out = {r["id"]: r["media_meta"] for r in probe_png_dims(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (7, 5)
    assert out[2]["width"] is None
    plan = probe_png_dims(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # header probe stays JVM-side


def test_netpbm_truncated_and_maxval_rescale():
    import numpy as np

    import pytest

    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        decode_netpbm,
    )

    # truncated samples must refuse with the codec contract, not a bare
    # numpy ValueError
    with pytest.raises(DecoderUnavailable, match="truncated netpbm samples"):
        decode_netpbm(b"P6\n4 4\n255\n" + b"\x00" * 10)
    # maxval < 255 rescales to the uint8 0-255 contract (round half up)
    img = decode_netpbm(b"P5\n3 1\n15\n" + bytes([0, 7, 15]))
    assert img.shape == (1, 3, 3)
    assert list(img[0, :, 0]) == [0, 119, 255]  # (7*255+7)//15 == 119
    # maxval 0 refused
    with pytest.raises(DecoderUnavailable):
        decode_netpbm(b"P5\n1 1\n0\n\x00")


def test_gif_roundtrip_exact():
    """decode(encode(img)) == img for an RGB image with <=256 colors."""
    import numpy as np

    from inception_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(16, 3), dtype=np.uint8)  # 16 colors
    idx = rng.integers(0, 16, size=(13, 9))
    img = base[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_real_lzw_dictionary_growth():
    """A hand-built GIF with a genuinely compressed LZW stream (no
    per-pixel clears) exercises dictionary growth and the code==next_code
    ('KwKwK') special case."""
    import numpy as np

    from inception_spark.operators.multimodal import decode_gif

    # 2-color image, pixels: 0 0 0 1 1 0 0 0 (w=8, h=1)
    # encode by hand with min_code_size=2 (clear=4, eoi=5)
    pixels = [0, 0, 0, 1, 1, 0, 0, 0]
    codes = [4]  # clear
    # LZW: 0 -> emit 0 (prev=0); 00 new entry 6; read 0 emit; ... encode
    # greedily with a real encoder table to produce growing codes
    table = {bytes([i]): i for i in range(4)}
    next_code = 6
    buf = b""
    for p in pixels:
        cand = buf + bytes([p])
        if cand in table:
            buf = cand
        else:
            codes.append(table[buf])
            table[cand] = next_code
            next_code += 1
            buf = bytes([p])
    codes.append(table[buf])
    codes.append(5)  # eoi
    # pack LSB-first at 3 bits (next_code stays < 8)
    acc = nacc = 0
    out = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += 3
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    pal = bytes([0, 0, 0, 255, 255, 255] + [0] * 6)  # 4-entry table
    payload = (
        b"GIF89a" + (8).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x81, 0, 0]) + pal
        + b"\x2c\x00\x00\x00\x00" + (8).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + b"\x00"
        + bytes([2, len(out)]) + bytes(out) + b"\x00\x3b"
    )
    img = decode_gif(payload)
    expect = np.array(
        [[0, 0, 0], [0, 0, 0], [0, 0, 0], [255, 255, 255],
         [255, 255, 255], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
        dtype=np.uint8,
    ).reshape(1, 8, 3)
    assert np.array_equal(img, expect)


def test_gif_interlaced_rows_deshuffled():
    import numpy as np

    from inception_spark.operators.multimodal import decode_gif, encode_gif

    # build a non-interlaced gif, then rewrite it as interlaced by
    # reordering rows into pass order and setting the interlace flag
    h, w = 10, 4
    img = np.stack(
        [np.full((w, 3), 20 * y, dtype=np.uint8) for y in range(h)]
    )
    plain = bytearray(encode_gif(img))
    # rows in interlace pass order
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    shuffled = img[order]
    inter = bytearray(encode_gif(shuffled))
    # image descriptor starts right after header+gct (identical for both)
    di = bytes(inter).index(b"\x2c")
    assert inter[di + 9] == 0
    inter[di + 9] = 0x40  # set interlace flag
    out = decode_gif(bytes(inter))
    assert np.array_equal(out, img)
    assert not np.array_equal(decode_gif(bytes(plain)), out.copy()[order])


def test_gif_refusals():
    import pytest as _pytest

    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        decode_gif,
        encode_gif,
    )
    import numpy as np

    with _pytest.raises(DecoderUnavailable, match="not a GIF"):
        decode_gif(b"JFIF....")
    with _pytest.raises(DecoderUnavailable, match="truncated GIF header"):
        decode_gif(b"GIF89a\x01\x00")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_gif(img))
    with _pytest.raises(DecoderUnavailable, match="truncated GIF pixel"):
        decode_gif(bytes(good[:-6]) + b"\x00\x3b")
    with _pytest.raises(ValueError, match="256 unique colors"):
        rng = np.random.default_rng(0)
        encode_gif(rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))


def test_decode_image_dispatches_gif():
    import numpy as np

    from inception_spark.operators.multimodal import decode_image, encode_gif

    img = np.zeros((3, 3, 3), dtype=np.uint8)
    img[1, 1] = (255, 0, 0)
    assert np.array_equal(decode_image(encode_gif(img)), img)


# ---------------------------------------------------------------------------
# baseline JPEG (operators/jpeg.py)
# ---------------------------------------------------------------------------

def _smooth_img(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_all_modes():
    """Encoder↔decoder round-trip across 4:4:4 / 4:2:0, restart
    intervals and odd dimensions — decode correctness established
    without any third-party codec (the GIF/PNG proof pattern)."""
    import numpy as np

    from inception_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_img(41, 53)
    for subsample in (False, True):
        for restart in (0, 2):
            enc = encode_jpeg(
                img, quality=90, subsample=subsample,
                restart_interval=restart,
            )
            assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
            dec = decode_jpeg(enc)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int)).mean()
            # smooth content at q90: tiny quantization error only
            assert err < (2.5 if subsample else 1.2), (subsample, restart)


def test_jpeg_solid_color_exact_and_gray():
    import numpy as np

    from inception_spark.operators.jpeg import decode_jpeg, encode_jpeg

    solid = np.full((16, 24, 3), 127, np.uint8)
    assert np.abs(
        decode_jpeg(encode_jpeg(solid, quality=95)).astype(int) - 127
    ).max() <= 1
    g = _smooth_img(20, 20)[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == (20, 20, 3)
    # grayscale replicates into all three channels
    assert (dec[..., 0] == dec[..., 1]).all()
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).mean() < 1.5


def test_jpeg_refusals():
    import struct

    import numpy as np
    import pytest as _pytest

    from inception_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from inception_spark.operators.multimodal import DecoderUnavailable

    enc = bytearray(encode_jpeg(_smooth_img(16, 16)))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2:])
    with _pytest.raises(DecoderUnavailable):
        decode_jpeg(prog)
    with _pytest.raises(DecoderUnavailable):
        decode_jpeg(b"\x00\x01not a jpeg")
    with _pytest.raises(DecoderUnavailable):
        decode_jpeg(bytes(enc[:40]))  # truncated before any scan


def test_decode_image_dispatches_jpeg_and_pipeline(spark):
    """decode_image routes FFD8 payloads to the native decoder, and the
    real (fake=False) resize/feature pipeline runs on JPEG inputs."""
    import numpy as np

    from inception_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_bmp,
        decode_image,
        extract_features,
        image_features,
        resize_images,
    )

    imgs = {1: _smooth_img(16, 12), 2: _smooth_img(9, 21)}
    payloads = {i: encode_jpeg(img, quality=92) for i, img in imgs.items()}
    assert np.array_equal(
        decode_image(payloads[1]), decode_jpeg(payloads[1])
    )
    df = attach_media_meta(
        spark.createDataFrame(
            [(i, p) for i, p in payloads.items()], "id long, payload binary"
        ),
        modality="image",
        mime="image/jpeg",
    )
    resized = resize_images(df, width=8, height=8, fake=False).collect()
    for r in resized:
        assert decode_bmp(bytes(r["payload"])).shape == (8, 8, 3)
    feats = {
        r["id"]: np.asarray(r["feature"])
        for r in extract_features(df, dim=32, fake=False).collect()
    }
    for i in imgs:
        expect = image_features(decode_jpeg(payloads[i]), 32)
        assert np.allclose(feats[i], expect, atol=1e-6)


# ---------------------------------------------------------------------------
# container-metadata probes (MP4 / MP3)
# ---------------------------------------------------------------------------

def _box(tag, body):
    import struct

    return struct.pack(">I", len(body) + 8) + tag + body


def _minimal_mp4(duration_ms=2500, w=640, h=360):
    import struct

    ts = 1000
    mvhd = bytes([0, 0, 0, 0]) + struct.pack(
        ">IIII", 0, 0, ts, duration_ms * ts // 1000
    ) + b"\x00" * 80
    tkhd = bytes([0, 0, 0, 0]) + b"\x00" * 72 + struct.pack(
        ">II", w << 16, h << 16
    )
    trak = _box(b"trak", _box(b"tkhd", tkhd))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def _minimal_mp3(n_frames=8, kbps=128, rate=44100, id3=True):
    frame_len = 144 * kbps * 1000 // rate
    # FF FB: MPEG-1 Layer III no-CRC; bitrate idx 9 (128), rate idx 0
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + b"\x00" * (frame_len - 4)
    tag = b""
    if id3:
        body = b"junkmetadata"
        sz = len(body)
        tag = b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + body
    return tag + frame * n_frames


def test_probe_mp4_meta_boxes():
    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        probe_mp4_meta,
    )

    m = probe_mp4_meta(_minimal_mp4(duration_ms=2500, w=640, h=360))
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 2500
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_tracks"] == 1
    import pytest as _pytest

    with _pytest.raises(DecoderUnavailable):
        probe_mp4_meta(b"not an mp4 at all....")


def test_probe_mp3_meta_frames():
    from inception_spark.operators.multimodal import (
        DecoderUnavailable,
        probe_mp3_meta,
    )

    p = _minimal_mp3(n_frames=8, id3=True)
    m = probe_mp3_meta(p)
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    audio_bytes = len(p) - 22  # ID3 header 10 + body 12
    assert m["duration_ms"] == audio_bytes * 8 // 128
    # no ID3 variant
    assert probe_mp3_meta(_minimal_mp3(id3=False))["bitrate_kbps"] == 128
    import pytest as _pytest

    with _pytest.raises(DecoderUnavailable):
        probe_mp3_meta(b"\x00" * 64)


def test_enrich_media_meta_mixed_batch(spark):
    """One pass fills duration for MP4/MP3/WAV and dims for images;
    unknown payloads keep their NULLs."""
    import numpy as np

    from inception_spark.operators.jpeg import encode_jpeg
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        encode_wav,
        enrich_media_meta,
    )

    wav = encode_wav(np.zeros(4410, dtype=np.int16), 44100)
    rows = [
        (1, _minimal_mp4(duration_ms=1234, w=320, h=200)),
        (2, _minimal_mp3(n_frames=4)),
        (3, wav),
        (4, encode_jpeg(_smooth_img(24, 32))),
        (5, b"unknown-format-payload"),
    ]
    df = attach_media_meta(
        spark.createDataFrame(rows, "id long, payload binary"),
        modality="mixed",
    )
    got = {r["id"]: r["media_meta"] for r in enrich_media_meta(df).collect()}
    assert got[1]["duration_ms"] == 1234
    assert (got[1]["width"], got[1]["height"]) == (320, 200)
    assert got[2]["duration_ms"] is not None and got[2]["duration_ms"] > 0
    assert got[3]["duration_ms"] == 100  # 4410 samples @ 44100 Hz
    assert (got[4]["height"], got[4]["width"]) == (24, 32)
    assert got[5]["duration_ms"] is None and got[5]["width"] is None


# ---------------------------------------------------------------------------
# perceptual-hash image dedup
# ---------------------------------------------------------------------------

def _gradient_img(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic structured test image: per-seed diagonal gradient."""
    y, x = np.mgrid[0:h, 0:w]
    base = (x * (seed % 7 + 1) + y * (seed % 5 + 2)) % 256
    img = np.stack([base, (base * 2) % 256, (base * 3) % 256], axis=-1)
    return img.astype(np.uint8)


def test_dhash64_deterministic_and_robust():
    from inception_spark.operators.multimodal import dhash64, resize_nearest

    img = _gradient_img(1)
    h1 = dhash64(img)
    assert h1 == dhash64(img.copy())
    assert isinstance(h1, int)
    # downscaling the same image keeps the hash close (dHash's point)
    small = resize_nearest(img, 16, 16)
    d = bin((h1 ^ dhash64(small)) & (2**64 - 1)).count("1")
    assert d <= 6
    # a structurally different image is far away
    other = dhash64(_gradient_img(4))
    d2 = bin((h1 ^ other) & (2**64 - 1)).count("1")
    assert d2 > 6


def test_image_dup_pairs_finds_near_dups_across_codecs(spark):
    """The same image stored as BMP and as PNG (lossless: identical
    pixels → identical dHash) must pair up; unrelated images must not.
    Exercises decode dispatch inside one phash_images pass."""
    from inception_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        image_dup_pairs,
        phash_images,
    )

    img_a = _gradient_img(1)
    img_b = _gradient_img(4)
    rows = [
        (0, bytearray(encode_bmp(img_a))),
        (1, bytearray(encode_png(img_a))),   # same pixels, other codec
        (2, bytearray(encode_bmp(img_b))),   # different image
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")

    ph = {r["id"]: r["phash"] for r in phash_images(df).collect()}
    assert ph[0] == ph[1]
    assert ph[0] != ph[2]

    pairs = image_dup_pairs(df, max_hamming=3).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(0, 1, 0)]


def test_image_dup_pairs_bucket_cap_and_warning(spark):
    import warnings

    from inception_spark.operators.multimodal import (
        encode_bmp,
        image_dup_pairs,
    )

    # identical solid-color images: one hot bucket per band
    solid = np.full((8, 8, 3), 128, dtype=np.uint8)
    rows = [(i, bytearray(encode_bmp(solid))) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    # cap below the bucket population drops the whole bucket → no pairs
    assert image_dup_pairs(df, max_bucket=5).count() == 0
    # uncapped: all 15 unordered pairs at hamming 0
    assert image_dup_pairs(df, max_bucket=100).count() == 15
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        image_dup_pairs(df, max_hamming=5, max_bucket=100)
        assert any("guarantees recall" in str(x.message) for x in w)


def _tone_wav(freqs, *, rate=16000, dur=0.5, amp=0.5):
    from inception_spark.operators.multimodal import encode_wav

    t = np.arange(int(rate * dur)) / rate
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    x = amp * x / max(1, len(freqs))
    return encode_wav(x, rate)


def test_afp64_invariances():
    from inception_spark.operators.multimodal import afp64, decode_wav

    a, r = decode_wav(_tone_wav([440, 1200]))
    h = afp64(a, r)
    assert h == afp64(a, r)
    # amplitude scaling never moves an argmax
    assert afp64(a * 0.25, r) == h
    # rate canonicalization: same tones at another sample rate land close
    b, r2 = decode_wav(_tone_wav([440, 1200], rate=8000))
    d = bin((h ^ afp64(b, r2)) & (2**64 - 1)).count("1")
    assert d <= 6
    # different spectral content is far away
    c, r3 = decode_wav(_tone_wav([3000]))
    assert bin((h ^ afp64(c, r3)) & (2**64 - 1)).count("1") > 6


def test_audio_dup_pairs_blocks_and_verifies(spark):
    from inception_spark.operators.multimodal import audio_dup_pairs

    rows = [
        (0, bytearray(_tone_wav([440, 1200]))),
        (1, bytearray(_tone_wav([440, 1200], amp=0.2))),  # volume re-encode
        (2, bytearray(_tone_wav([3000]))),                # other content
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    pairs = audio_dup_pairs(df).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["hamming"] <= 3


def test_hamming64_blocking_equals_brute_force(spark):
    """Pigeonhole guarantee, proven: at max_hamming <= 3 the banded
    blocking finds EXACTLY the brute-force pair set over random-ish
    64-bit fingerprints (including negative int64 values)."""
    import random

    from inception_spark.operators.multimodal import hamming64_dup_pairs

    rnd = random.Random(42)
    base = [rnd.getrandbits(64) for _ in range(40)]
    hashes = []
    for i, h in enumerate(base):
        hashes.append(h)
        if i % 4 == 0:  # plant near-dups at hamming 1-3
            flipped = h
            for _ in range(rnd.randint(1, 3)):
                flipped ^= 1 << rnd.randrange(64)
            hashes.append(flipped)
    signed = [(i, h - (1 << 64) if h >= 1 << 63 else h)
              for i, h in enumerate(hashes)]
    df = spark.createDataFrame(signed, "id long, h long")

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming64_dup_pairs(df, hash_col="h").collect()
    )
    expect = sorted(
        (a, b, bin((ha ^ hb) & (2**64 - 1)).count("1"))
        for (a, ha), (b, hb) in __import__("itertools").combinations(
            [(i, h & (2**64 - 1)) for i, h in signed], 2
        )
        if bin((ha ^ hb) & (2**64 - 1)).count("1") <= 3
    )
    assert got == expect and len(expect) >= 8


def test_hamming64_observed_drop_accounting(spark):
    """Bucket-cap drops are OBSERVED, not silent (VERDICT r5 ask 3): the
    shared primitive reports rows_in_dropped_buckets / band_rows through
    the same Observation contract as the text dedup ancestors."""
    from pyspark.sql import Observation

    from inception_spark.operators.multimodal import hamming64_dup_pairs

    # clusters of 3 (h = cluster << 16 | member-flip): band 1 carries the
    # cluster key (3-row buckets, under cap), band 0 keys are the member
    # flips {0,1,2} (10-row buckets) and bands 2/3 are all-zero (30-row
    # buckets) — cap 9 drops all of those, pairs survive via band 1
    rows = [(i, ((i // 3) << 16) + (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, h long")
    obs = Observation("hamming64")
    out = hamming64_dup_pairs(
        df, hash_col="h", max_bucket=9, observation=obs
    )
    assert out.count() == 10 * 3  # 3 intra-cluster pairs per cluster
    got = obs.get
    assert got["band_rows"] == 30 * 4
    assert got["rows_in_dropped_buckets"] == 90  # band 0 + bands 2,3


# ---------------------------------------------------------------------------
# r12: engineered phash corpus — the closed-form-oracle image-dedup entry
# ---------------------------------------------------------------------------


def test_phash_codeword_realized_and_brightness_invariant():
    """dHash(synth(id)) == phash_codeword(id mod 64) for every class and
    a brightness sweep — the invariance theorem the oracle rests on."""
    import numpy as np

    from inception_spark.operators.multimodal import (
        decode_image,
        dhash64,
        encode_bmp,
        phash_codeword,
    )

    def synth_local(i, n_classes=64):
        c = int(i) % n_classes
        delta = (int(i) // n_classes) % 100
        v = np.empty((8, 9), dtype=np.int64)
        v[:, 0] = 100 + delta
        for x in range(8):
            step = 1 if (c >> x) & 1 else -1
            v[:, x + 1] = v[:, x] + step
        return np.repeat(v.astype(np.uint8)[..., None], 3, axis=2)

    # every class at delta=0, plus the full delta sweep on 3 classes
    for i in list(range(64)) + [64 * d + c for d in range(1, 100, 7)
                                for c in (0, 37, 63)]:
        img = synth_local(i)
        assert dhash64(decode_image(encode_bmp(img))) == phash_codeword(
            i % 64
        ), f"id {i}"


def test_phash_codewords_pairwise_separated():
    """min pairwise Hamming over all 256 codewords is 8 (> max_hamming 3
    with margin) — cross-class pairs are impossible, not just unlikely."""
    from inception_spark.operators.multimodal import phash_codeword

    words = [phash_codeword(c) & (2**64 - 1) for c in range(256)]
    worst = min(
        bin(a ^ b).count("1")
        for i, a in enumerate(words)
        for b in words[i + 1 :]
    )
    assert worst == 8


def test_image_phash_dedup_stats_counts_exact(spark):
    """End-to-end through the real pipeline on a small id spine: pair
    counts equal n_c*(n_c-1)/2 per class and every hamming is 0."""
    from inception_spark.operators.multimodal import image_phash_dedup_stats

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    rows = {
        r["phash_class"]: r
        for r in image_phash_dedup_stats(docs, n_classes=16).collect()
    }
    # 200 ids over 16 classes: classes 0..7 get 13 docs, 8..15 get 12
    for cls, r in rows.items():
        n = 13 if cls < 8 else 12
        assert r["n_pairs"] == n * (n - 1) // 2, cls
        assert r["sum_hamming"] == 0, cls
    assert set(rows) == set(range(16))


def test_afp_codeword_realized_and_amplitude_invariant():
    """afp64(synth(id)) == afp_codeword(id mod 16) across classes and
    the full amplitude sweep — the audio invariance theorem."""
    import numpy as np

    from inception_spark.operators.multimodal import (
        afp64,
        afp_codeword,
        decode_wav,
        encode_wav,
    )

    t = np.arange(500, dtype=np.float64) / 500.0
    for i in list(range(16)) + [16 * d + c for d in range(1, 10)
                                for c in (0, 7, 15)]:
        b = i % 16
        amp = 0.3 + 0.05 * ((i // 16) % 10)
        k = (250 * b + 125) // 16 + 1
        payload = encode_wav(np.tile(amp * np.sin(2 * np.pi * k * t), 16),
                             8000)
        samples, rate = decode_wav(payload)
        assert afp64(samples, rate) == afp_codeword(b), f"id {i}"


def test_audio_afp_dedup_stats_counts_exact(spark):
    from inception_spark.operators.multimodal import audio_afp_dedup_stats

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    rows = {
        r["afp_class"]: r
        for r in audio_afp_dedup_stats(docs, n_classes=8).collect()
    }
    # 100 ids over 8 classes: classes 0..3 get 13, 4..7 get 12
    for cls, r in rows.items():
        n = 13 if cls < 4 else 12
        assert r["n_pairs"] == n * (n - 1) // 2, cls
        assert r["sum_hamming"] == 0, cls
    assert set(rows) == set(range(8))
