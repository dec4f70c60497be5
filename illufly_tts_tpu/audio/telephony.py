# -*- coding: utf-8 -*-
"""Telephony output path: on-device 24 kHz -> 8 kHz resample + G.711 mu-law.

Motivation (round 3): the serving loop is TRANSFER-bound, not compute-bound
— 16-bit PCM at 24 kHz is 48 KB per audio-second, and the measured host
link tops out around ~45 MB/s, capping end-to-end throughput near ~940x
realtime no matter how fast the chip is (docs/ARCHITECTURE.md roofline).
Telephony deployments (G.711 mu-law at 8 kHz, the Twilio/PSTN media
format) need 6x fewer bytes: 8 KB per audio-second.  Doing the decimation
and companding INSIDE the stage-B jit keeps the host transfer at 1 byte
per 8 kHz sample and costs negligible FLOPs (one strided FIR + integer
ops, fused by XLA into the decode program).

The mu-law encoder reproduces the 14-bit G.711 algorithm bit-exactly
(validated against CPython's ``audioop.lin2ulaw`` in
tests/test_telephony.py): 16-bit PCM is arithmetic-shifted to 14 bits,
biased by 33, clipped to 8159, segment-coded, and complemented.

The reference has no analogue (it serves 24 kHz WAV only —
src/illufly_tts/api/endpoints.py:148); this is added capability for
bandwidth-constrained serving.
"""
from __future__ import annotations

import numpy as np

try:  # jax optional at import time so host-only tools can use the np half
    import jax.numpy as jnp
    from jax import lax
except Exception:  # pragma: no cover
    jnp = None
    lax = None

RATIO = 3                   # 24 kHz -> 8 kHz
TELEPHONY_RATE = 8000
_SEG_ENDS = (63, 127, 255, 511, 1023, 2047, 4095, 8191)


# --------------------------------------------------------------------------
# decimation FIR (host-designed once, applied on device)
# --------------------------------------------------------------------------

def design_decimation_fir(
    num_taps: int = 73,
    cutoff_hz: float = 3600.0,
    sample_rate: int = 24000,
    beta: float = 8.6,
) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for decimate-by-3 (odd taps, linear
    phase, DC gain exactly 1).  beta=8.6 ~ 90 dB sidelobes; the 3.6 kHz
    cutoff leaves the 300-3400 Hz telephony band flat and puts the 4 kHz
    Nyquist edge deep in the transition."""
    assert num_taps % 2 == 1, "linear phase needs odd taps"
    n = np.arange(num_taps) - (num_taps - 1) / 2
    fc = cutoff_hz / sample_rate
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    h *= np.kaiser(num_taps, beta)
    return (h / h.sum()).astype(np.float32)


def resample_to_8k(audio, taps):
    """[B, S] float32 at 24 kHz -> [B, S//3] float32 at 8 kHz (device).

    Output sample i is the FIR centered on input sample 3*i, so frame
    boundaries map cleanly: one 600-sample model frame -> 200 output
    samples.  S must be divisible by 3 (it is: samples_per_frame=600)."""
    k = taps.shape[0]
    pad_l = (k - 1) // 2
    pad_r = (k - 3) - pad_l  # out_len == S // 3 exactly
    lhs = audio[:, None, :].astype(jnp.float32)          # [B, 1, S]
    rhs = jnp.asarray(taps, jnp.float32)[None, None, :]  # [O=1, I=1, K]
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(RATIO,),
        padding=[(pad_l, pad_r)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


# --------------------------------------------------------------------------
# G.711 mu-law (bit-exact vs audioop.lin2ulaw — the 14-bit ITU variant)
# --------------------------------------------------------------------------

def mulaw_encode(audio) -> "jnp.ndarray":
    """float32 [-1, 1] -> uint8 G.711 mu-law bytes (device)."""
    x16 = jnp.round(jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    x14 = lax.shift_right_arithmetic(x16, 2)
    neg = x14 < 0
    mag = jnp.where(neg, -x14, x14)
    mag = jnp.minimum(mag, 8159) + 33
    seg = jnp.zeros_like(mag)
    for t in _SEG_ENDS:
        seg = seg + (mag > t).astype(jnp.int32)
    body = jnp.left_shift(seg, 4) | (
        lax.shift_right_logical(mag, seg + 1) & 0xF
    )
    body = jnp.where(seg >= 8, 0x7F, body)
    mask = jnp.where(neg, 0x7F, 0xFF)
    return (body ^ mask).astype(jnp.uint8)


def mulaw_encode_np(x16: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law (host reference, same bit-exact
    algorithm; used by tests and by host-side encode fallbacks)."""
    x14 = (x16.astype(np.int32)) >> 2
    neg = x14 < 0
    mag = np.where(neg, -x14, x14)
    mag = np.minimum(mag, 8159) + 33
    seg = np.zeros_like(mag)
    for t in _SEG_ENDS:
        seg += (mag > t).astype(np.int32)
    body = (seg << 4) | ((mag >> (seg + 1)) & 0xF)
    body = np.where(seg >= 8, 0x7F, body)
    mask = np.where(neg, 0x7F, 0xFF)
    return (body ^ mask).astype(np.uint8)


_MULAW_LUT: dict = {}


def mulaw_lut(dtype=np.float32) -> np.ndarray:
    """256-entry mu-law expansion table (float32 [-1,1] or int16 PCM).
    Expanding a clip is then one fancy-index gather — the per-sample
    integer math of ``mulaw_decode_np`` is ~10x slower at the serving
    batch's ~7.7M samples and would eat the wire codec's transfer win."""
    key = np.dtype(dtype).name
    if key not in _MULAW_LUT:
        f32 = mulaw_decode_np(np.arange(256, dtype=np.uint8))
        if key == "int16":
            _MULAW_LUT[key] = np.round(f32 * 32767.0).astype(np.int16)
        else:
            _MULAW_LUT[key] = f32.astype(dtype)
    return _MULAW_LUT[key]


def mulaw_decode_np(u8: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> float32 [-1, 1] (host; midpoint inverse of the
    encoder — each code maps to the center of its quantization cell)."""
    u = (~u8.astype(np.int32)) & 0xFF
    seg = (u >> 4) & 0x7
    mant = u & 0xF
    # restore the implicit MSB (bit 4 of the pre-mask mantissa) and the
    # half-cell midpoint, then remove the bias
    mag14 = ((mant + 16) << (seg + 1)) + (1 << seg) - 33
    x14 = np.where(u & 0x80, -mag14, mag14)  # bit7 of ~byte == negative
    return (x14 << 2).astype(np.float32) / 32767.0
