"""Token-bucket math (SURVEY §2.5 O2).

Exactly the reference's refill rule, ``pyspider/scheduler/
token_bucket.py — Bucket.get() (~L10-60)``:

    tokens = min(burst, tokens + rate * (now - last_update))

but evaluated on the engine's *logical clock* (RoundConfig.now) and
vectorized over hosts. Admission per host per round:
``n_admit = floor(tokens_refilled)``; after the global round-budget cut
the *actually scheduled* count is subtracted (the simulator does the
identical two-phase accounting, so crawl order matches).
"""

from __future__ import annotations

import numpy as np


def refill(
    tokens: np.ndarray, last_ts: np.ndarray, now: float, rate: float, burst: float
) -> np.ndarray:
    """Vectorized bucket refill; element-wise over hosts."""
    dt = np.maximum(0.0, now - last_ts)
    return np.minimum(burst, tokens + rate * dt)


def refill_scalar(tokens: float, last_ts: float, now: float, rate: float, burst: float) -> float:
    return min(burst, tokens + rate * max(0.0, now - last_ts))
