"""Cross-engine decimal rounding for Arrow kernels.

The repo's quantization discipline (6dp SRP sign test, 4dp IVF
distances) exists so double-summation ulp noise cannot flip a
comparison between engines. That only works if every party rounds
half-cases the same way — and ``np.round`` is round-half-EVEN, so a
sum landing in the sub-ulp window of an exact .5 boundary would
diverge silently at scale (r11 ADVICE). Kernels therefore use this
helper, never ``np.round``.

Which engine does the helper track? DuckDB. ``round_half_away``
matches DuckDB's ``round()`` (C-library half-away-from-zero on the
double's true value), and matches Spark's ``F.round`` on
exactly-representable .5 boundaries (1.5, 2.25, ...). They part ways
on PSEUDO-halves (r12 ADVICE): Spark routes doubles through
``BigDecimal.valueOf`` — the SHORTEST DECIMAL REPRESENTATION — so
``F.round(1.005, 2) = 1.01`` (the literal "1.005" rounds HALF_UP),
while this helper and DuckDB see the stored double
1.00499999999999989... and round to 1.00. The pseudo-half subclass is
the tolerated residue: the quantization call sites compare
helper-vs-DuckDB (the oracle), and a value must sit within one ulp of
a .5 decimal boundary for the engines to differ at all.
"""

from __future__ import annotations


def round_half_away(arr, decimals: int):
    """Round a numpy array to ``decimals`` places, halves away from
    zero on the double's TRUE value — the mode DuckDB round() uses.
    Agrees with Spark F.round on exactly-representable .5 boundaries;
    see the module docstring for the pseudo-half divergence."""
    import numpy as np

    s = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(arr) * s + 0.5), arr) / s
