"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal decode path.

The audio sibling of `llm.png`: the container ships no audio
libraries (librosa/soundfile), so the real audio-decode leg is
implemented from the RIFF/WAVE specification directly — chunk
parsing, fmt validation, PCM sample extraction.

Supported subset — PCM (format tag 1), 8-bit unsigned or 16-bit
signed little-endian, any channel count/sample rate. Anything else
(float PCM, ADPCM, extensible wrappers beyond plain PCM, truncated
chunks) raises `WavError`, which the feature extractor treats as
"not decodable → byte-histogram fallback". Same capability-gate
shape as PNG: real samples when the bytes are a WAV we understand,
an honest fallback otherwise; swap the body for soundfile at
production scale and the Spark plumbing is untouched.

The encoder exists so fixtures and tests can fabricate real WAV
bytes with exactly-known integer samples — the analytic oracles for
the decode queries derive sample statistics from the generating
formula, so a decoder bug cannot cancel itself out.
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Raised when bytes are not a WAV this codec can decode."""


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode WAV bytes → ``(sample_rate, n_channels, samples)``.

    ``samples`` is the interleaved integer sample sequence: signed
    16-bit values for 16-bit PCM, and 8-bit unsigned recentred to
    signed (-128..127) so downstream statistics treat silence as 0
    for both widths.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise WavError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            if length < 16:
                raise WavError("bad fmt chunk length")
            tag, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise WavError(f"unsupported format tag {tag} (PCM only)")
            if bits not in (8, 16):
                raise WavError(f"unsupported bit depth {bits}")
            if n_ch < 1:
                raise WavError("zero channels")
            if rate < 1:
                # a zero rate would divide-by-zero in the duration
                # feature, outside the WavError fallback gate
                raise WavError("zero sample rate")
            fmt = (rate, n_ch, bits)
        elif ctype == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if raw is None:
        raise WavError("missing data chunk")
    rate, n_ch, bits = fmt
    if bits == 16:
        if len(raw) % 2:
            raise WavError("odd data length for 16-bit PCM")
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        samples = [b - 128 for b in raw]
    if samples and len(samples) % n_ch:
        raise WavError("sample count not divisible by channel count")
    return rate, n_ch, samples


def encode_wav(
    sample_rate: int,
    n_channels: int,
    samples: list[int],
    bits: int = 16,
) -> bytes:
    """Encode interleaved integer samples as a real PCM WAV."""
    if bits == 16:
        raw = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        raw = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise WavError(f"unsupported bit depth {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
        + (b"\x00" if len(raw) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
