"""Bloom-filter join pruning — the runtime-filter pattern, explicit.

Spark's own runtime filters (and the reference's ``$in`` pushdown,
``kafka-database-import.go:148-170``) share one idea: reduce the big
side BEFORE the join with a compact membership summary of the small
side. This module builds that summary as a *distributed aggregation*
(per-partition ``bit_or`` partials, merged by the shuffle — never a
key list on the driver) and probes it with pure codegen bit arithmetic
on the scan, so at 100 TB the fact table is filtered at full scan
speed and only survivors reach the shuffle/join.

Sizing: the sketch is ``n_words × 64`` bits with ``N_HASH_FUNCS``
probes per key. The false-positive rate for |keys| = n is
``(1 - exp(-k·n/m))^k``; callers pick ``n_words`` for their dim size
(default 1024 words = 8 KiB ≈ 1 % FP at 5k keys). False positives are
EXPECTED — ``bloom_prune_semi_join`` always closes with the exact
semi-join on the survivors, so results are exact; the bloom only cuts
shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASH_FUNCS = 4

# xxhash64 is TYPE-sensitive in Spark: int 5 and bigint 5 hash to
# different values. Build and probe sides must therefore hash the SAME
# type or every probe is a silent false negative. All integral widths
# are normalized to long before hashing; other types must match exactly
# (enforced in bloom_prune_semi_join).
_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _norm_dtype(dtype: str) -> str:
    return "bigint" if dtype in _INTEGRAL_TYPES else dtype


def _norm_key(df: DataFrame, col: str) -> Column:
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    return c.cast("long") if dtype in _INTEGRAL_TYPES else c


def build_bloom(keys: DataFrame, key_col: str, n_words: int = 1024) -> list[int]:
    """Aggregate a key column into a Bloom bitmap (list of ``n_words``
    signed 64-bit words).

    Plan: explode each key to its ``N_HASH_FUNCS`` bit positions, group
    by word index with ``bit_or`` partials — one tiny shuffle of at
    most ``n_words × parallelism`` partial rows. Only the finished
    8 KiB sketch reaches the driver (the same driver-sized contract as
    a broadcast variable; never the keys themselves).

    Integral key columns are cast to long before hashing (xxhash64 is
    width-sensitive) so a bloom built on an int dim key probes
    correctly against a bigint fact key and vice versa."""
    m = n_words * 64
    key = _norm_key(keys, key_col)
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
                for i in range(N_HASH_FUNCS)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # call_function: SQL shiftleft takes a *column* shift amount,
            # the Python F.shiftleft wrapper only accepts an int literal
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bitmap = [0] * n_words
    for r in words.collect():  # ≤ n_words rows by construction
        bitmap[r.word] = r.bits
    return bitmap


def might_contain(bitmap: list[int], probe: Column) -> Column:
    """Codegen membership test of ``probe`` against a built bitmap: k
    ANDed bit lookups in a literal array — no join, no Python, runs
    inside the scan's WholeStageCodegen span.

    ``probe`` must be the same Spark type the bitmap was built on —
    for integral keys that means ``.cast('long')`` (build_bloom
    normalizes its side; a Column carries no schema so this side is the
    caller's contract; ``bloom_prune_semi_join`` enforces it)."""
    m = len(bitmap) * 64
    arr = F.lit(bitmap)
    cond = None
    for i in range(N_HASH_FUNCS):
        pos = F.pmod(F.xxhash64(probe, F.lit(i)), F.lit(m))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        hit = (
            F.call_function("shiftright", word, (pos % 64).cast("int")).bitwiseAND(
                F.lit(1)
            )
            == 1
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_prune_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    n_words: int = 1024,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: filter the fact scan by
    the dim-side bloom (cuts shuffle input to survivors + FP), then
    remove false positives with the real semi-join. Result is
    bit-identical to the plain semi-join.

    Integral fact/dim keys of different widths (int vs bigint) are
    normalized to long on both sides before hashing; any other type
    mismatch is rejected up front — a silent hash-type mismatch would
    make every probe a false negative and drop matching rows."""
    fact_dt = _norm_dtype(dict(fact.dtypes)[fact_key])
    dim_dt = _norm_dtype(dict(dim_keys.dtypes)[dim_key])
    if fact_dt != dim_dt:
        raise ValueError(
            f"bloom_prune_semi_join: incompatible key types "
            f"{fact_key}:{fact_dt} vs {dim_key}:{dim_dt} — xxhash64 is "
            f"type-sensitive; cast one side first"
        )
    bitmap = build_bloom(dim_keys, dim_key, n_words)
    pruned = fact.filter(might_contain(bitmap, _norm_key(fact, fact_key)))
    return pruned.join(
        dim_keys, pruned[fact_key] == dim_keys[dim_key], "left_semi"
    )
