"""Bounded driver-side prefix sums re-attached as Catalyst expressions.

The shared idiom behind zipWithIndex-style id assignment
(``sources.tables.with_record_id``) and the binned rank-sum AUROC
(``operators.evaluate.auroc``): collect one small (key → count) table,
turn it into cumulative offsets, and map them back onto rows with a
literal ``create_map`` + ``try_element_at`` (ANSI-safe: a missing key
yields NULL → coalesced to 0, never an error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def prefix_offsets(totals: dict) -> dict:
    """Cumulative offsets in ascending key order (None keys, if any, first —
    they sort before everything instead of raising)."""
    offsets, off = {}, 0
    for k in sorted(totals, key=lambda x: (x is not None, x)):
        offsets[k] = off
        off += totals[k]
    return offsets


def prefix_offset_expr(totals: dict, key_col: Column) -> Column:
    """Column mapping ``key_col`` → its cumulative offset (0 when absent).

    Rejects ``None`` keys: a NULL key cannot appear in a ``create_map``
    literal, so its rows would silently coalesce to offset 0 and collide
    with the lowest real key's range — fail loudly instead."""
    if any(k is None for k in totals):
        raise ValueError(
            "prefix_offset_expr: None key in totals — NULL keys would "
            "silently share offset 0; filter or fill them upstream"
        )
    offsets = {k: v for k, v in prefix_offsets(totals).items() if k is not None}
    if not offsets:
        return F.lit(0).cast("long")
    return F.coalesce(
        F.try_element_at(
            F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
            key_col,
        ),
        F.lit(0),
    ).cast("long")
