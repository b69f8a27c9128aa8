"""Pure-stdlib PNG codec (llm/png.py) + capability-gated media decode.

The decode leg of the multimodal path was a documented stub through
round 4; these tests pin the real path: encode→decode roundtrips over
every filter type and channel layout, known-pixel feature oracles, and
the fallback gate for undecodable bytes.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from steam_data_pipeline_spark.llm.multimodal import _decode
from steam_data_pipeline_spark.llm.png import (
    PNG_MAGIC,
    PngError,
    decode_png,
    encode_png,
)


def _img(w, h, ch, fn):
    """Interleaved sample buffer from fn(x, y, c)."""
    return bytes(
        fn(x, y, c) & 0xFF for y in range(h) for x in range(w) for c in range(ch)
    )


class TestRoundtrip:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_every_filter_and_layout(self, ftype, ch):
        w, h = 7, 5
        px = _img(w, h, ch, lambda x, y, c: 13 * x + 31 * y + 77 * c + 5)
        data = encode_png(w, h, ch, px, row_filters=[ftype] * h)
        assert data[:8] == PNG_MAGIC
        gw, gh, gch, gpx = decode_png(data)
        assert (gw, gh, gch) == (w, h, ch)
        assert bytes(gpx) == px

    def test_mixed_filters_per_row(self):
        w, h, ch = 9, 10, 3
        px = _img(w, h, ch, lambda x, y, c: x * y + 17 * c)
        data = encode_png(w, h, ch, px, row_filters=[y % 5 for y in range(h)])
        assert bytes(decode_png(data)[3]) == px

    def test_random_images_roundtrip(self):
        rng = random.Random(42)
        for _ in range(20):
            w, h = rng.randint(1, 12), rng.randint(1, 12)
            ch = rng.choice([1, 2, 3, 4])
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            filters = [rng.randrange(5) for _ in range(h)]
            got = decode_png(encode_png(w, h, ch, px, row_filters=filters))
            assert (got[0], got[1], got[2], bytes(got[3])) == (w, h, ch, px)


class TestMalformed:
    def _png(self):
        return encode_png(2, 2, 3, _img(2, 2, 3, lambda x, y, c: x + y + c))

    def test_bad_magic(self):
        with pytest.raises(PngError, match="magic"):
            decode_png(b"GIF89a" + self._png()[6:])

    def test_corrupt_crc(self):
        data = bytearray(self._png())
        data[20] ^= 0xFF  # inside IHDR body -> CRC mismatch
        with pytest.raises(PngError, match="CRC"):
            decode_png(bytes(data))

    def test_truncated(self):
        with pytest.raises(PngError):
            decode_png(self._png()[:-10])

    def test_interlaced_rejected(self):
        # rebuild IHDR with interlace=1 and a valid CRC
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        chunk = (
            struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        data = PNG_MAGIC + chunk + self._png()[8 + 25 :]
        with pytest.raises(PngError, match="interlaced"):
            decode_png(data)

    def test_bad_bit_depth_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        chunk = (
            struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        data = PNG_MAGIC + chunk + self._png()[8 + 25 :]
        with pytest.raises(PngError, match="bit depth"):
            decode_png(data)


class TestDecodeFeatures:
    def test_known_pixels_rgb(self):
        """Known-pixel oracle: 2x2 RGB, means computed by hand."""
        px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
        data = encode_png(2, 2, 3, px)
        decoded, feat = _decode(data, "image")
        assert decoded is True
        w, h, ch, mr, mg, mb, ml, sl = feat
        assert (w, h, ch) == (2.0, 2.0, 3.0)
        assert (mr, mg, mb) == (55.0, 65.0, 75.0)
        assert ml == pytest.approx(0.299 * 55 + 0.587 * 65 + 0.114 * 75)
        assert sl > 0

    def test_known_pixels_grey(self):
        data = encode_png(2, 1, 1, bytes([100, 200]))
        decoded, feat = _decode(data, "image")
        assert decoded and feat[:6] == [2.0, 1.0, 1.0, 150.0, 150.0, 150.0]
        assert feat[7] == pytest.approx(50.0)  # std of {100,200}

    def test_rgba_alpha_ignored_in_means(self):
        px = bytes([10, 20, 30, 255, 50, 60, 70, 0])
        decoded, feat = _decode(encode_png(2, 1, 4, px), "image")
        assert decoded and feat[3:6] == [30.0, 40.0, 50.0]

    def test_non_png_falls_back_to_histogram(self):
        decoded, feat = _decode(bytes(range(64)), "image")
        assert decoded is False
        assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-9

    def test_corrupt_png_falls_back_not_raises(self):
        """PNG magic but garbage body -> graceful fallback, no crash
        (a 100 TB media corpus WILL contain truncated files)."""
        junk = PNG_MAGIC + b"\x00" * 40
        decoded, feat = _decode(junk, "image")
        assert decoded is False and len(feat) == 8

    def test_null_content_yields_fallback_row(self):
        """NULL content must NOT raise: MEDIA_SCHEMA declares content
        nullable, and one NULL row failing would kill the whole
        mapInPandas task (round-9 llm review contract)."""
        decoded, feat = _decode(None, "image")
        assert decoded is False
        assert feat == [0.0] * 8


class TestApng:
    def _frames(self, w=4, h=3, ch=3, n=3):
        return [
            (
                40 * (f + 1),
                _img(w, h, ch, lambda x, y, c, f=f: 10 * f + x + 2 * y + 5 * c),
            )
            for f in range(n)
        ]

    def test_roundtrip_frames_and_delays(self):
        from steam_data_pipeline_spark.llm.png import decode_apng, encode_apng

        frames = self._frames()
        data = encode_apng(4, 3, 3, frames, row_filters=[0, 2, 4])
        w, h, ch, got = decode_apng(data)
        assert (w, h, ch) == (4, 3, 3)
        assert [(d, bytes(p)) for d, p in got] == [
            (d, bytes(p)) for d, p in frames
        ]

    def test_single_frame_apng(self):
        from steam_data_pipeline_spark.llm.png import decode_apng, encode_apng

        frames = self._frames(n=1)
        assert len(decode_apng(encode_apng(4, 3, 3, frames))[3]) == 1

    def test_plain_png_rejected_by_apng_decoder(self):
        from steam_data_pipeline_spark.llm.png import decode_apng

        plain = encode_png(2, 2, 3, _img(2, 2, 3, lambda x, y, c: x + y))
        with pytest.raises(PngError, match="acTL"):
            decode_apng(plain)

    def test_corrupt_sequence_rejected(self):
        from steam_data_pipeline_spark.llm.png import decode_apng, encode_apng

        data = bytearray(encode_apng(4, 3, 3, self._frames()))
        # find the second fcTL and break its sequence number, fixing CRC
        idx = data.find(b"fcTL", data.find(b"fcTL") + 4)
        body_start = idx + 4
        struct.pack_into(">I", data, body_start, 99)
        body = bytes(data[idx : idx + 4 + 26])
        struct.pack_into(
            ">I", data, idx + 4 + 26, zlib.crc32(body) & 0xFFFFFFFF
        )
        with pytest.raises(PngError, match="sequence"):
            decode_apng(bytes(data))

    def test_extract_frames_spark(self, spark):
        """Mixed media batch: APNG rows yield per-frame rows with
        cumulative timeline timestamps and exact channel means; junk
        and plain-PNG rows yield nothing."""
        from steam_data_pipeline_spark.llm.multimodal import extract_frames
        from steam_data_pipeline_spark.llm.png import encode_apng

        frames = [
            (100, bytes([10, 20, 30] * 4)),   # 2x2 RGB, all pixels equal
            (250, bytes([50, 60, 70] * 4)),
        ]
        apng = encode_apng(2, 2, 3, frames)
        rows = [
            (1, 1, "video", bytearray(apng)),
            (2, 2, "video", bytearray(b"not media")),
            (3, 3, "image", bytearray(encode_png(1, 1, 1, bytes([7])))),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, doc_id long, modality string, content binary"
        )
        got = sorted(
            (r.media_id, r.frame_idx, r.ts_ms, r.delay_ms, r.mean_r, r.mean_g, r.mean_b)
            for r in extract_frames(media).collect()
        )
        assert got == [
            (1, 0, 0, 100, 10.0, 20.0, 30.0),
            (1, 1, 100, 250, 50.0, 60.0, 70.0),
        ]


class TestPerceptualHash:
    def _png_gray(self, pixels, w, h):
        return encode_png(w, h, 1, bytes(pixels))

    def _staircase(self, bits, base=90):
        """9x8 grayscale whose dHash bits are EXACTLY `bits` (64 bools):
        each row walks +5/-5 from `base` per bit."""
        px = []
        for y in range(8):
            v = base
            px.append(v)
            for x in range(8):
                v += 5 if bits[y * 8 + x] else -5
                px.append(v)
        return px

    def test_dhash_encodes_comparisons_exactly(self):
        from steam_data_pipeline_spark.llm.multimodal import _dhash
        import numpy as np

        bits = [(i * 7 + 3) % 5 < 2 for i in range(64)]
        px = self._staircase(bits)
        a = np.array(px, dtype=np.float64).reshape(8, 9)
        got = _dhash(a)
        want = 0
        for b in bits:
            want = (want << 1) | int(b)
        if want >= 1 << 63:
            want -= 1 << 64
        assert got == want

    def test_dhash_brightness_invariant(self):
        from steam_data_pipeline_spark.llm.multimodal import _dhash
        import numpy as np

        bits = [i % 3 == 0 for i in range(64)]
        a = np.array(self._staircase(bits), dtype=np.float64).reshape(8, 9)
        assert _dhash(a) == _dhash(a + 40.0)  # uniform exposure shift

    def test_dhash_block_scale_invariant(self):
        """2x upscaling with constant blocks resizes back to the same
        cells -> same hash (the resize path is exercised for real)."""
        from steam_data_pipeline_spark.llm.multimodal import _dhash
        import numpy as np

        bits = [(i % 7) < 3 for i in range(64)]
        a = np.array(self._staircase(bits), dtype=np.float64).reshape(8, 9)
        big = np.kron(a, np.ones((2, 2)))
        assert _dhash(big) == _dhash(a)

    def test_dhash_structure_sensitive(self):
        from steam_data_pipeline_spark.llm.multimodal import _dhash
        import numpy as np

        a = np.array(
            self._staircase([True] * 64), dtype=np.float64
        ).reshape(8, 9)
        b = np.array(
            self._staircase([False] * 64), dtype=np.float64
        ).reshape(8, 9)
        assert _dhash(a) != _dhash(b)

    def test_perceptual_dedup_spark(self, spark):
        """Two perceptual groups (same structure, different exposure)
        plus one undecodable row: brightness variants collide, the
        junk row is excluded, keepers are min media_id."""
        from steam_data_pipeline_spark.llm.multimodal import perceptual_dedup

        bits_a = [i % 2 == 0 for i in range(64)]
        bits_b = [i % 2 == 1 for i in range(64)]
        rows = []
        for mid, (bits, base) in enumerate(
            [(bits_a, 90), (bits_a, 120), (bits_b, 90), (bits_b, 100)]
        ):
            rows.append(
                (mid, bytearray(self._png_gray(self._staircase(bits, base), 9, 8)))
            )
        rows.append((99, bytearray(b"junk bytes, not an image")))
        media = spark.createDataFrame(rows, "media_id long, content binary")
        got = sorted(
            (r.keeper, r.n_media) for r in perceptual_dedup(media).collect()
        )
        assert got == [(0, 2), (2, 2)]


class TestReviewHardening:
    """Round-5 self-review regressions: malformed media must FALL BACK
    (or raise PngError/WavError), never escape the capability gate
    with ZeroDivisionError/struct.error and kill the Spark task."""

    def test_zero_dimension_png_rejected_and_falls_back(self):
        data = encode_png(0, 3, 3, b"")  # encoder is permissive; decoder not
        with pytest.raises(PngError, match="zero-dimension"):
            decode_png(data)
        decoded, feat = _decode(data, "image")
        assert decoded is False and len(feat) == 8

    def test_short_ihdr_body_is_pngerror(self):
        from steam_data_pipeline_spark.llm.png import _chunk, decode_apng

        data = PNG_MAGIC + _chunk(b"IHDR", b"\x00" * 5) + _chunk(b"IEND", b"")
        with pytest.raises(PngError, match="IHDR"):
            decode_png(data)
        with pytest.raises(PngError, match="IHDR"):
            decode_apng(data)

    def test_short_actl_fctl_fdat_are_pngerror(self):
        import struct as _s

        from steam_data_pipeline_spark.llm.png import _chunk, decode_apng

        ihdr = _chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        for bad in (
            _chunk(b"acTL", b"\x00\x00"),
            _chunk(b"acTL", _s.pack(">II", 1, 0)) + _chunk(b"fcTL", b"\x00" * 4),
        ):
            with pytest.raises(PngError, match="length"):
                decode_apng(PNG_MAGIC + ihdr + bad + _chunk(b"IEND", b""))

    def test_zero_rate_wav_falls_back(self):
        from steam_data_pipeline_spark.llm.wav import WavError, decode_wav, encode_wav

        data = encode_wav(0, 1, [1, -2, 3])
        with pytest.raises(WavError, match="rate"):
            decode_wav(data)
        decoded, feat = _decode(data, "audio")
        assert decoded is False and len(feat) == 8

    def test_stereo_zcr_is_per_channel(self):
        """L=+100,+100 / R=-100,-100: neither channel crosses zero;
        the old interleaved count reported 3."""
        from steam_data_pipeline_spark.llm.wav import encode_wav

        decoded, feat = _decode(
            encode_wav(8000, 2, [100, -100, 100, -100]), "audio"
        )
        assert decoded is True
        assert feat[7] == 0.0  # zcr
        # and a genuinely alternating mono signal still counts
        decoded, feat = _decode(
            encode_wav(8000, 1, [100, -100, 100, -100]), "audio"
        )
        assert feat[7] == 3.0
