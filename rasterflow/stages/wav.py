"""Pure-numpy RIFF/WAVE PCM16 codec — the audio counterpart of
``stages/png.py``: a REAL container format decoded end-to-end in-container
(no audio libs here), so the multimodal audio plumbing is exercised by a
genuine codec, not only the deterministic stub.

Scope: canonical RIFF with a PCM (format 1) 16-bit ``fmt `` chunk and a
``data`` chunk; unknown chunks (LIST/INFO/fact/cue…) are walked and
skipped per the RIFF spec, including the odd-size pad byte.  Encode emits
the canonical 44-byte-header layout every mainstream encoder produces.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sI4s")
_CHUNK = struct.Struct("<4sI")
_FMT = struct.Struct("<HHIIHH")


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """int16 samples (interleaved if multichannel, length divisible by
    ``channels``) -> canonical PCM16 WAV bytes."""
    s = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    if channels < 1 or len(s) % channels:
        raise ValueError("sample count must divide evenly into channels")
    data = s.tobytes()
    block = 2 * channels
    fmt = _FMT.pack(1, channels, sample_rate, sample_rate * block, block, 16)
    body = (
        _CHUNK.pack(b"fmt ", len(fmt))
        + fmt
        + _CHUNK.pack(b"data", len(data))
        + data
    )
    return _HDR.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav_pcm16(b: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, int16 sample array, interleaved).

    Walks the chunk list (skipping non-fmt/data chunks and their pad
    bytes); raises ValueError on a malformed container, a non-PCM format,
    or non-16-bit samples.
    """
    if len(b) < _HDR.size:
        raise ValueError("not a RIFF file: too short")
    riff, _size, wave = _HDR.unpack_from(b, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = _HDR.size
    rate = nch = None
    data = None
    while pos + _CHUNK.size <= len(b):
        cid, clen = _CHUNK.unpack_from(b, pos)
        pos += _CHUNK.size
        if pos + clen > len(b):
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if clen < _FMT.size:
                raise ValueError("fmt chunk too short")
            audio_fmt, nch, rate, _br, _ba, bits = _FMT.unpack_from(b, pos)
            if audio_fmt != 1:
                raise ValueError(f"unsupported audio format {audio_fmt} (want PCM=1)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (want 16)")
        elif cid == b"data":
            data = b[pos : pos + clen]
        pos += clen + (clen & 1)  # RIFF pads odd chunks to even offsets
    if rate is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(data) % 2:
        raise ValueError("data chunk not a whole number of int16 samples")
    samples = np.frombuffer(data, dtype="<i2")
    if nch > 1 and len(samples) % nch:
        raise ValueError("sample count not divisible by channel count")
    return int(rate), int(nch), samples
