"""Real WAV (RIFF PCM16 mono) codec — stdlib ``wave`` only, no external
audio libraries. The audio analogue of ``functions/imagecodec.py``: an
uncompressed container this environment CAN decode for real, so the
multimodal audio kernel computes true signal statistics instead of the
md5 stub (which remains for compressed formats: mp3/aac/video need codec
libraries this container doesn't have).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(payload: bytes) -> bool:
    return (payload is not None and len(payload) >= 12
            and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE")


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 mono samples, rate). Multi-channel input
    is downmixed by taking channel 0 (deterministic, no float mixing)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        raw = np.frombuffer(w.readframes(n), dtype="<i2")
    if ch > 1:
        raw = raw[::ch]
    return raw, rate


def audio_stats(samples: np.ndarray, rate: int) -> dict:
    """Exact integer-scaled signal statistics (the floor(x*1e4+0.5)
    convention shared with the image kernel):

      dur_ms   -- sample count / rate
      rms_e4   -- RMS of samples normalized to [-1, 1)
      zcr_e4   -- zero-crossing rate (sign changes / (n-1))
    """
    n = int(samples.size)
    if n == 0:
        return {"dur_ms": 0, "rms_e4": 0, "zcr_e4": 0}
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x)))
    if n > 1:
        s = np.signbit(samples)
        zcr = float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1)
    else:
        zcr = 0.0
    return {
        "dur_ms": int(n * 1000 // rate),
        "rms_e4": int(np.floor(rms * 10_000 + 0.5)),
        "zcr_e4": int(np.floor(zcr * 10_000 + 0.5)),
    }
