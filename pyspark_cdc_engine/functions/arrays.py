"""Version-aware array/struct merge expressions (SURVEY §2.8 F1-F2, §2.9).

These are the reference's flagship non-standard semantics re-expressed as
expression builders (dedupExpr / mergeStructExpr / mergeArrayExpr,
ScdType1MergeApp.scala:212-244). All are pure Catalyst higher-order-function
expressions: O(n²) per array, which is the right trade at n ≤ tens of elements
because it avoids two shuffles (explode → window → collect_list) per merge —
the same reasoning the reference documents (SURVEY §4).
"""

from __future__ import annotations


def dedup_array_expr(array_field: str, key_field: str) -> str:
    """Keep, per distinct key, only the element(s) with the maximal version:
    an element survives iff no other element shares its key with a strictly
    greater version (ties all survive; ScdType1MergeApp.scala:212-213)."""
    return (
        f"filter({array_field}, e -> NOT exists({array_field}, "
        f"o -> o.{key_field} = e.{key_field} AND o.version > e.version))"
    )


def merge_struct_expr(struct_field: str, target: str = "target", source: str = "source") -> str:
    """1:1 child merge: the higher-versioned non-null struct wins; source wins
    only when strictly newer (ScdType1MergeApp.scala:219-225)."""
    s, t = f"{source}.{struct_field}", f"{target}.{struct_field}"
    return (
        f"CASE WHEN {s} IS NULL THEN {t} "
        f"WHEN {t} IS NULL THEN {s} "
        f"WHEN {s}.version > COALESCE({t}.version, 0) THEN {s} "
        f"ELSE {t} END"
    )


def merge_array_expr(
    array_field: str, key_field: str, target: str = "target", source: str = "source"
) -> str:
    """1:N child merge keyed by ``key_field``: per key, source element replaces
    target only when strictly newer; unmatched elements from both sides are
    kept (new items append, replays/ties lose; ScdType1MergeApp.scala:236-244)."""
    s, t = f"{source}.{array_field}", f"{target}.{array_field}"
    return (
        f"CASE WHEN {s} IS NULL OR size({s}) = 0 THEN {t} "
        f"WHEN {t} IS NULL OR size({t}) = 0 THEN {s} "
        f"ELSE concat("
        f"filter({s}, se -> NOT exists({t}, te -> te.{key_field} = se.{key_field}"
        f" AND te.version >= se.version)), "
        f"filter({t}, te -> NOT exists({s}, se -> se.{key_field} = te.{key_field}"
        f" AND se.version > te.version))"
        f") END"
    )
