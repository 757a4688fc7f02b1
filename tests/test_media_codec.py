"""Pure-stdlib PNG/WAV codecs + real decode through the Spark plumbing."""

import pytest

from hipipe_spark.sources.media_codec import (
    apng_decode, apng_encode, png_decode, png_encode, png_thumbnail,
    wav_decode, wav_encode)


def _px(n, a=7, b=3):
    return bytes((a + b * j) % 256 for j in range(n))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_roundtrip_every_filter(ft, channels):
    w, h = 13, 9
    px = _px(w * h * channels)
    data = png_encode(w, h, px, channels, filter_type=ft)
    gw, gh, gch, gpx = png_decode(data)
    assert (gw, gh, gch) == (w, h, channels)
    assert gpx == px


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"\x00" * 64)
    with pytest.raises(ValueError):
        png_encode(4, 4, b"\x00" * 15)  # wrong buffer size
    with pytest.raises(ValueError):
        png_encode(2, 2, b"\x00" * 8, channels=2)


def test_png_thumbnail_aspect_and_roundtrip():
    w, h, ch = 16, 8, 1
    px = _px(w * h * ch)
    ow, oh, thumb_png = png_thumbnail(w, h, ch, px, 8, 8)
    # aspect preserved: scale = min(8/16, 8/8, 1) = 0.5
    assert (ow, oh) == (8, 4)
    tw2, th2, _, tpx = png_decode(thumb_png)
    assert (tw2, th2) == (8, 4) and len(tpx) == 32
    # nearest-neighbour: top-left thumb pixel == source (0,0)
    assert tpx[0] == px[0]
    # never upscales
    assert png_thumbnail(4, 4, 1, _px(16), 32, 32)[:2] == (4, 4)


def test_apng_roundtrip():
    w, h = 7, 5
    frames = [bytes((11 * f + 3 * j) % 256 for j in range(w * h))
              for f in range(4)]
    data = apng_encode(w, h, frames, channels=1, delay_num=1, delay_den=10)
    gw, gh, gch, got, delay = apng_decode(data)
    assert (gw, gh, gch) == (w, h, 1)
    assert got == frames
    assert delay == pytest.approx(100.0)


def test_apng_single_frame_and_plain_png():
    # 1-frame APNG round-trips; a plain PNG decodes as one frame
    data = apng_encode(4, 4, [bytes(range(16))])
    assert apng_decode(data)[3] == [bytes(range(16))]
    plain = png_encode(4, 4, bytes(range(16)))
    w, h, ch, frames, delay = apng_decode(plain)
    assert frames == [bytes(range(16))] and delay == 0.0


def test_apng_rejects_offset_frames():
    import struct
    import zlib

    from hipipe_spark.sources.media_codec import _PNG_SIG, _chunk
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    actl = _chunk(b"acTL", struct.pack(">II", 1, 0))
    # fcTL with a 1-pixel x offset — unsupported subset, must raise
    fctl = _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 3, 4, 1, 0,
                                       1, 10, 0, 0))
    raw = b"".join(b"\x00" + bytes(4) for _ in range(4))
    idat = _chunk(b"IDAT", zlib.compress(raw))
    data = _PNG_SIG + ihdr + actl + fctl + idat + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        apng_decode(data)


def test_wav_roundtrip():
    samples = [(31 + 17 * t) % 2048 - 1024 for t in range(300)]
    data = wav_encode(samples, rate=8000)
    rate, ch, n, got = wav_decode(data)
    assert (rate, ch, n) == (8000, 1, 300)
    assert got == samples


def test_wav_clamps_to_int16():
    rate, ch, n, got = wav_decode(wav_encode([40000, -40000], rate=8000))
    assert got == [32767, -32768]


def test_decode_features_end_to_end(spark):
    """Real bytes → real decode: every feature must equal the
    generator's arithmetic (the same invariant the driver oracle
    checks at the gate)."""
    from hipipe_spark.sources.multimodal import (
        AUDIO_RATE, _audio_n, _img_dims, _video_dims, decode_features,
        gen_real_media)

    n = 24
    feats = {r["media_id"]: r
             for r in decode_features(gen_real_media(spark, n=n)).collect()}
    assert len(feats) == n
    for i in range(n):
        r = feats[i]
        if i % 3 == 0:
            w, h, ch = _img_dims(i)
            assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
            npx = w * h * ch
            want_mean = sum((i * 7 + 3 * j) % 256 for j in range(npx)) / npx
            assert r["mean_val"] == pytest.approx(want_mean)
            scale = min(8 / w, 8 / h, 1.0)
            assert r["thumb_w"] == max(1, int(w * scale))
            assert r["thumb_h"] == max(1, int(h * scale))
        elif i % 3 == 1:
            ns = _audio_n(i)
            assert r["sample_rate"] == AUDIO_RATE
            assert r["duration_ms"] == 1000 * ns // AUDIO_RATE
            want_rms = (sum(((i * 31 + 17 * t) % 2048 - 1024) ** 2
                            for t in range(ns)) / ns) ** 0.5
            assert r["mean_val"] == pytest.approx(want_rms)
        else:
            w, h, nf = _video_dims(i)
            assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
            assert r["n_frames"] == nf
            assert r["duration_ms"] == nf * 100
            sampled = list(range(0, nf, 2))
            want_mean = sum((i * 7 + 11 * f + 3 * j) % 256
                            for f in sampled
                            for j in range(w * h)) / (len(sampled) * w * h)
            assert r["mean_val"] == pytest.approx(want_mean)


def test_extract_features_stdlib_route(spark):
    from hipipe_spark.sources.multimodal import extract_features, gen_real_media
    out = extract_features(gen_real_media(spark, n=6), decoder="stdlib")
    assert "mean_val" in out.columns and out.count() == 6
