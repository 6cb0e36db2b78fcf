from jeicyboodsp_tpu.io.wav import (  # noqa: F401
    read_pcm16,
    read_wav_ref,
    write_pcm16,
    write_wav,
)
