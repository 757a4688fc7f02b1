"""Property sweeps for the stdlib codecs: any pixel buffer must
round-trip bit-exactly through every PNG filter type, any int16 signal
through WAV, any frame stack through APNG."""

from hypothesis import given, settings
from hypothesis import strategies as st

from hipipe_spark.sources.media_codec import (
    apng_decode, apng_encode, png_decode, png_encode, wav_decode,
    wav_encode)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12), h=st.integers(1, 12),
    channels=st.sampled_from([1, 3]),
    filter_type=st.integers(0, 4),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, filter_type, data):
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * channels,
        max_size=w * h * channels)))
    got = png_decode(png_encode(w, h, px, channels, filter_type))
    assert got == (w, h, channels, px)


@settings(max_examples=30, deadline=None)
@given(samples=st.lists(st.integers(-32768, 32767), min_size=1,
                        max_size=500),
       rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    grate, ch, n, got = wav_decode(wav_encode(samples, rate=rate))
    assert (grate, ch, n) == (rate, 1, len(samples))
    assert got == samples


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8), h=st.integers(1, 8),
    n_frames=st.integers(1, 5),
    data=st.data(),
)
def test_apng_roundtrip_property(w, h, n_frames, data):
    frames = [bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h, max_size=w * h)))
        for _ in range(n_frames)]
    gw, gh, gch, got, _delay = apng_decode(apng_encode(w, h, frames))
    assert (gw, gh, gch) == (w, h, 1)
    assert got == frames
