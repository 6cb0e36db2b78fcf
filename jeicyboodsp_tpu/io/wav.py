"""Sample I/O matching the reference's L0 layer.

The reference programs read a WAV by skipping exactly 44 header bytes and
streaming raw interleaved int16 PCM (e.g. ``7Band_GEQ.cpp:116``,
``WienerFilter_final.cpp:93``), and write headerless PCM (the header write is
commented out, ``7Band_GEQ.cpp:117``).  ``read_wav_ref`` reproduces that
blind-44-byte skip; ``write_wav`` provides the proper header the reference
kept disabled (``WienerFilter_final.cpp:237-258``).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_HEADER_LEN = 44


def read_wav_ref(path: str) -> np.ndarray:
    """Read int16 samples the way the reference does: skip 44 bytes, fread shorts."""
    with open(path, "rb") as f:
        f.seek(WAV_HEADER_LEN)
        data = f.read()
    n = len(data) // 2
    return np.frombuffer(data[: 2 * n], dtype="<i2").copy()


def read_pcm16(path: str) -> np.ndarray:
    """Read headerless little-endian int16 PCM."""
    with open(path, "rb") as f:
        data = f.read()
    n = len(data) // 2
    return np.frombuffer(data[: 2 * n], dtype="<i2").copy()


def write_pcm16(path: str, samples: np.ndarray) -> None:
    np.asarray(samples, dtype="<i2").tofile(path)


def wav_header(num_samples: int, sample_rate: int, channels: int = 1, bits: int = 16) -> bytes:
    """RIFF/WAVE header, PCM fmt 16 (WienerFilter_final.cpp:237-258 layout)."""
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    data_size = num_samples * block_align
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + data_size,
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        sample_rate,
        byte_rate,
        block_align,
        bits,
        b"data",
        data_size,
    )


def write_wav(path: str, samples: np.ndarray, sample_rate: int, channels: int = 1) -> None:
    samples = np.asarray(samples, dtype="<i2")
    with open(path, "wb") as f:
        f.write(wav_header(samples.size // channels, sample_rate, channels))
        samples.tofile(f)
