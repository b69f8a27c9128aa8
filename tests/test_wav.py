"""Pure-stdlib WAV codec (llm/wav.py) + the audio leg of the
capability-gated media decode."""

from __future__ import annotations

import math
import struct

import pytest

from steam_data_pipeline_spark.llm.multimodal import _decode
from steam_data_pipeline_spark.llm.wav import WavError, decode_wav, encode_wav


class TestRoundtrip:
    def test_mono_16bit(self):
        samples = [0, 1000, -1000, 32767, -32768, 7]
        rate, ch, got = decode_wav(encode_wav(8000, 1, samples))
        assert (rate, ch, got) == (8000, 1, samples)

    def test_stereo_16bit(self):
        samples = [10, -10, 20, -20, 30, -30]  # 3 frames x 2 channels
        rate, ch, got = decode_wav(encode_wav(44100, 2, samples))
        assert (rate, ch, got) == (44100, 2, samples)

    def test_8bit_recentred(self):
        samples = [-128, -1, 0, 1, 127]
        rate, ch, got = decode_wav(encode_wav(8000, 1, samples, bits=8))
        assert got == samples

    def test_odd_8bit_data_word_aligned(self):
        # 3 bytes of 8-bit data forces the pad byte after the chunk
        samples = [5, -5, 9]
        data = encode_wav(8000, 1, samples, bits=8)
        assert len(data) % 2 == 0
        assert decode_wav(data)[2] == samples


class TestMalformed:
    def test_bad_magic(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"OggS" + b"\x00" * 40)

    def test_truncated(self):
        with pytest.raises(WavError):
            decode_wav(encode_wav(8000, 1, [1, 2, 3, 4])[:-3])

    def test_non_pcm_rejected(self):
        data = bytearray(encode_wav(8000, 1, [1, 2]))
        # format tag lives at offset 20 (RIFF8 + WAVE4 + 'fmt '4 + len4)
        struct.pack_into("<H", data, 20, 3)  # 3 = IEEE float
        with pytest.raises(WavError, match="format tag"):
            decode_wav(bytes(data))

    def test_missing_data_chunk(self):
        full = encode_wav(8000, 1, [1, 2])
        # keep RIFF header + fmt chunk only
        with pytest.raises(WavError, match="data"):
            decode_wav(full[:12] + full[12 : 12 + 8 + 16])


class TestDecodeFeatures:
    def test_known_sample_stats(self):
        """Known-sample oracle: mean/rms/peak/zcr by hand."""
        samples = [100, -100, 50, -50]
        decoded, feat = _decode(encode_wav(8000, 1, samples), "audio")
        assert decoded is True
        rate, ch, n_frames, dur_ms, mean, rms, peak, zcr = feat
        assert (rate, ch, n_frames) == (8000.0, 1.0, 4.0)
        assert dur_ms == 0.0  # 4 frames at 8 kHz -> floor(0.5 ms)
        assert mean == 0.0
        assert rms == math.sqrt((10000 + 10000 + 2500 + 2500) / 4)
        assert peak == 100.0
        assert zcr == 3.0

    def test_stereo_frames_counted(self):
        decoded, feat = _decode(encode_wav(16000, 2, [1, 2, 3, 4, 5, 6]), "audio")
        assert decoded and feat[:3] == [16000.0, 2.0, 3.0]

    def test_corrupt_wav_falls_back(self):
        junk = b"RIFF" + b"\x08\x00\x00\x00" + b"WAVE"  # no fmt/data
        decoded, feat = _decode(junk, "audio")
        assert decoded is False and len(feat) == 8

    def test_png_still_decodes(self):
        from steam_data_pipeline_spark.llm.png import encode_png

        decoded, feat = _decode(encode_png(2, 1, 1, bytes([100, 200])), "image")
        assert decoded is True and feat[3] == 150.0
