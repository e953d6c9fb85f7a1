"""Skew-aware joins: salting for heavy-hitter keys.

AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled, on in
session.py) splits oversized sort-merge partitions at runtime and covers
most cases.  Salting is the explicit fallback for the cases AQE can't fix:
broadcast-ineligible dimension joins against a fact with a few dominant
keys (one tech-log Component taking 90% of rows is exactly this shape —
the reference's routing map makes every row of a hot component hash to one
partition).

``salted_join`` replicates the SMALL side ``salt`` times and scatters the
big side uniformly: shuffle partitions receive ~|hot_key|/salt rows
instead of |hot_key|.  Cost: small side inflates salt-fold — pick salt so
|small| * salt still broadcasts or shuffles cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join ``big`` |><| ``small`` on column ``on`` with the big side
    salted across ``salt`` sub-keys.  Semantically identical to
    ``big.join(small, on, how)`` for inner/left joins (each big row meets
    exactly one replica of its matching small row).

    ``salt_from``: derive the salt deterministically from that big-side
    column (hash mod salt) instead of rand — same uniform scatter, but
    reproducible across retries/engines, which an oracle-checked query
    needs; rand stays the default for ad-hoc use."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_expr = (
        F.pmod(F.hash(F.col(salt_from)), F.lit(salt)).cast("int")
        if salt_from
        else (F.rand(seed=42) * salt).cast("int")
    )
    big_salted = big.withColumn("_salt", salt_expr)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [on, "_salt"], how)
    return joined.drop("_salt")
