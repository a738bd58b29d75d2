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


def afp64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint (the Haitsma-Kalker plan, clip-level):
    1024-sample frames (hop 512) -> rfft power spectrum -> 65 contiguous
    bands -> per-frame bit b = E[b] > E[b+1] (spectral-envelope shape,
    robust to level and small noise) -> majority vote across frames.
    Pure numpy float64 — the distributed stage and the golden mirror
    share this exact kernel. Short clips zero-pad to one frame."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < 1024:
        x = np.pad(x, (0, 1024 - len(x)))
    n_frames = 1 + (len(x) - 1024) // 512
    votes = np.zeros(64, dtype=np.int64)
    for f in range(n_frames):
        fr = x[f * 512: f * 512 + 1024]
        p = np.abs(np.fft.rfft(fr)) ** 2
        # 65 near-equal bands over bins 1..512 (skip DC)
        bounds = np.linspace(1, len(p), 66).astype(np.int64)
        e = np.add.reduceat(p, bounds[:-1])
        votes += (e[:-1] > e[1:]).astype(np.int64)
    bits = votes * 2 > n_frames  # strict majority
    out = 0
    for i in np.nonzero(bits)[0]:
        out |= 1 << int(i)
    return out
