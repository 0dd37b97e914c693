"""Skew-mitigation join: key salting (SURVEY §4.2 scale posture;
"skewed keys → salting or AQE skew-join").

AQE's skew-join split (enabled in session.py) handles most skew by
splitting oversized shuffle partitions at runtime. Salting is the
explicit fallback for the cases AQE can't fix: a single hot key whose
rows exceed one executor's memory in a shuffle join where the other
side is too large to broadcast.

Mechanics: the skewed (large) side gets a deterministic salt in
[0, n_salts) appended to its join key, spreading each hot key over
``n_salts`` shuffle partitions; the other side is exploded ×n_salts so
every salted key still finds its match. Correct for inner/left-semi
equi-joins (each left row matches exactly the same right rows as
before; the right explosion only duplicates build-side rows, never
probe-side output)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` with the skewed side salted.

    The salt is ``xxhash64`` of the whole skewed row (deterministic —
    reruns produce identical partitioning; no rand() in the plan).
    Supported join types: inner, left_semi — types where duplicating
    build-side rows per salt cannot change the result.

    ``hint`` (e.g. ``"merge"``) pins the join strategy: at small
    fixture scale the planner broadcasts the exploded dim side, which
    silently skips the salted shuffle this operator exists to create —
    above the broadcast threshold (the 100 TB case) the shuffle join is
    the planner's own choice and the hint is a no-op."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"salted_join supports inner/left_semi, got {how}")
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts))
    )
    if hint:
        salted = salted.hint(hint)
    exploded = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(
        exploded,
        (salted[left_key] == exploded[right_key]) & (salted[SALT_COL] == exploded[SALT_COL]),
        how,
    ).drop(SALT_COL)
    if how == "inner":
        out = out.drop(right_key)
    return out
