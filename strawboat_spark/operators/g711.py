"""G.711 companded audio (ITU-T μ-law and A-law) — the telephony
8-bit log-PCM codings that WAV containers carry as format tags 7 and 6.

Both laws are fully analytic (sign / segment-exponent / mantissa bit
fields, the classic CCITT reference arithmetic) — no spec tables — so
decode is exact integer math a SQL oracle can replicate literally,
and the 256-entry code space is exhaustively testable: decode is
injective per code and encode(decode(c)) == c for every code.

Vectorized over numpy uint8 arrays (a whole WAV data chunk decodes in
one shot inside the Arrow batch; no per-sample Python).
"""

from __future__ import annotations

import numpy as np


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """μ-law bytes -> int16 linear samples (14-bit range, CCITT bias 0x84)."""
    u = (~codes.astype(np.uint8)) & 0xFF
    mant = (u & 0x0F).astype(np.int32)
    exp = ((u >> 4) & 0x07).astype(np.int32)
    t = ((mant << 3) + 0x84) << exp
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _quantizer(decode_fn):
    """Nearest-level quantizer over a law's 256 decode levels: encode
    maps a linear sample to the code whose decoded value is closest
    (ties and duplicate levels resolve to the highest code, so the
    canonical positive zero wins for μ-law's ±0 pair). Exactly optimal
    by construction against the verified decoder — no transcription of
    the CCITT segment-search needed."""
    levels = decode_fn(np.arange(256, dtype=np.uint8)).astype(np.int32)
    order = np.argsort(levels, kind="stable")
    sorted_levels = levels[order]
    # for duplicate levels keep the LAST (highest code in sort order)
    def encode(samples: np.ndarray) -> np.ndarray:
        x = samples.astype(np.int32)
        idx = np.searchsorted(sorted_levels, x)
        idx = np.clip(idx, 1, 255)
        lo, hi = sorted_levels[idx - 1], sorted_levels[idx]
        pick = np.where((x - lo) <= (hi - x), idx - 1, idx)
        # walk forward over equal levels so ties take the highest code
        same = np.where(
            (pick < 255) & (sorted_levels[np.minimum(pick + 1, 255)] == sorted_levels[pick]),
            pick + 1,
            pick,
        )
        return order[same].astype(np.uint8)

    return encode


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> μ-law bytes (nearest decode level; the ±0 pair
    resolves to 0xFF, the canonical positive zero)."""
    return _ULAW_ENCODE(samples)


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear samples (13-bit range, 0x55 toggle)."""
    a = (codes.astype(np.uint8) ^ 0x55).astype(np.int32)
    mant = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0,
        mant + 8,
        np.where(seg == 1, mant + 0x108, (mant + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> A-law bytes (nearest decode level)."""
    return _ALAW_ENCODE(samples)


_ULAW_ENCODE = _quantizer(ulaw_to_linear)
_ALAW_ENCODE = _quantizer(alaw_to_linear)
