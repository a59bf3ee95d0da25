"""Human-readable display formatting for byte counts and row counts.

Parity with the reference CLI's display helpers
(tbl-cli ... crates/tbl-core/src/formats.rs:4-33 — `format_bytes`
divides by 1024 through B..EB and prints two decimals;
`format_with_commas` groups digits by thousands).  Pure functions, no
Ray, safe to call from workers.
"""

from __future__ import annotations

_UNITS = ("B", "KB", "MB", "GB", "TB", "PB", "EB")


def format_bytes(n_bytes: int) -> str:
    """`1536 -> '1.50 KB'`; units step by 1024 up to EB (formats.rs:4)."""
    size = float(n_bytes)
    unit = 0
    while size >= 1024.0 and unit < len(_UNITS) - 1:
        size /= 1024.0
        unit += 1
    return f"{size:.2f} {_UNITS[unit]}"


def format_with_commas(number: int) -> str:
    """`1234567 -> '1,234,567'` (formats.rs:18)."""
    return f"{int(number):,}"
