"""Cross-engine decimal rounding for Arrow kernels.

The repo's quantization discipline (6dp SRP sign test, 4dp IVF
distances) exists so double-summation ulp noise cannot flip a
comparison between engines. That only works if every party rounds
half-cases the same way: Spark's ``F.round`` (BigDecimal HALF_UP) and
DuckDB's ``round()`` (C-library) both round halves AWAY FROM ZERO for
doubles, but ``np.round`` is round-half-EVEN — so a sum landing in
the sub-ulp window of an exact .5 boundary would diverge silently at
scale (r11 ADVICE). Kernels therefore use this helper, never
``np.round``.
"""

from __future__ import annotations


def round_half_away(arr, decimals: int):
    """Round a numpy array to ``decimals`` places, halves away from
    zero — the mode Spark HALF_UP and DuckDB round() agree on."""
    import numpy as np

    s = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(arr) * s + 0.5), arr) / s
