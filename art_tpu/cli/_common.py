"""Shared CLI helpers."""

from __future__ import annotations


def num_suffix(s: str) -> float:
    """Parse a number with an optional k/K kilo suffix (reference
    art.c:200-212 option parsing convention)."""
    if s and s[-1] in "kK":
        return float(s[:-1]) * 1000.0
    return float(s)
