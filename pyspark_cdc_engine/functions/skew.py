"""Salted join: the skew-mitigation pattern for joins (the agg-side twin is
``salted_status_revenue``'s two-stage aggregate).

When one join key carries a disproportionate share of the big side, the
shuffle sends that key's entire volume to one reducer and the stage runs at
the speed of its hottest task. Salting splits each key into ``n_salt``
sub-keys: the big side gets a deterministic per-row salt, the small side is
replicated once per salt value, and the join key becomes (key, salt) — each
hot key now spreads over ``n_salt`` tasks at the cost of replicating the
small side ``n_salt``x (cheap by assumption; if the small side weren't small
you'd want AQE skew-join splitting instead, which the session factory enables
for exactly the cases salting can't reach)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on columns ``on``, salted ``n_salt``
    ways. ``big`` must be the left/probe side; ``how`` supports the joins
    where every output row originates from ``big`` (inner / left) — a right
    or full join through replication would duplicate unmatched small rows.

    The salt is deterministic (hash of the big side's whole row), so retried
    tasks re-derive identical salts — no correctness dependence on
    nondeterministic row order."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)).cast(
        "int"
    )
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, on=[*on, _SALT], how=how).drop(_SALT)
