"""Clean-room NumPy oracles of the reference's math, used as the golden
standard for parity tests (SURVEY.md §4: the reference ships no asserted
expected values, so parity is established against an independent float64
re-derivation of the same formulas)."""
