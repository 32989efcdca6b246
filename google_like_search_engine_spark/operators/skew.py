"""Explicit key-salting for skewed joins.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default
in session.py) splits oversized sort-merge partitions at runtime and
covers most skew; explicit salting remains the tool when the plan
AQE sees is not a sort-merge join (e.g. the serving scope disables
AQE), or when a downstream stage must inherit the spread partitioning.
The crawl/web workload meets real skew constantly — the host-cap and
content-hash joins both key on hot domains.

``salted_join(left, right, on)`` spreads each hot LEFT key over
``n_salts`` sub-keys and replicates the RIGHT side once per salt, so
the shuffle for a key with 10M rows becomes ``n_salts`` tasks of
~10M/n rows instead of one straggler. The right side is replicated
``n_salts``x: use it when right is dimension-sized (but too big or
too dynamic to broadcast); result equality with the plain join is
pinned by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_on: Column | None = None,
) -> DataFrame:
    """Join ``left`` (skewed side) to ``right`` (small side) on
    ``on``, spreading every left key over ``n_salts`` sub-keys.

    ``salt_on`` picks the deterministic per-row spread expression
    (default: xxhash64 over all left columns — rows of the same hot
    key land on different salts, and re-runs agree row-by-row, the
    same determinism argument as curation's hash_bucket).

    Only left-preserving join types are legal: a right/full join over
    the replicated right side would emit every unmatched right row
    once per salt."""
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"
    ):
        raise ValueError(f"salted_join does not support how={how!r}")
    if _SALT in left.columns or _SALT in right.columns:
        # withColumn would silently overwrite the user's data and the
        # final drop would delete it — refuse instead
        raise ValueError(f"input already has a {_SALT!r} column")
    keys = [on] if isinstance(on, str) else list(on)
    spread = (
        salt_on
        if salt_on is not None
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    lhs = left.withColumn(_SALT, F.pmod(spread, F.lit(n_salts)).cast("int"))
    rhs = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lhs.join(rhs, keys + [_SALT], how).drop(_SALT)
