"""ClickHouse ``sequenceMatch`` / ``sequenceCount`` analog: regex
pattern detection over each user's time-ordered event sequence.

Complements ``operators/funnel.py``: the funnel's chained min-ts
aggregates cover ordered-subsequence patterns ('(?1).*(?2).*(?3)')
without materializing any per-user history, and remain the right tool
for those.  This operator covers what chained aggregates cannot —
arbitrary regular expressions over the event sequence (adjacency
'(?1)(?2)', repetition, alternation, negative classes) — by encoding
each user's events as a character string and running ONE rlike /
regexp_count per user.

Scale shape: one shuffle on the user key into an object-hash aggregate
of (ts, id, char) structs; per-user state is ~10 bytes per event, the
same boundedness contract as ``sessionize`` (per-entity history, not
corpus-sized — ClickHouse's own sequenceMatch holds the identical
per-key event list in memory).  Events are mapped to single chars
BEFORE the shuffle, so event payloads never move; the sort is per-user
over that user's own events (array_sort on the aggregated array), not a
global order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# chars assigned to condition classes 1..N; '.' in patterns matches any
_CLASS_CHARS = "ABCDEFGHIJ"
OTHER_CHAR = "x"


def class_char(k: int) -> str:
    """The character encoding condition class ``k`` (1-based)."""
    return _CLASS_CHARS[k - 1]


def sequence_match(
    events: DataFrame,
    conditions: list[Column],
    pattern: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user regex match over the time-ordered event sequence.

    Each event becomes one character: the first condition in
    ``conditions`` it satisfies (class 1 -> 'A', 2 -> 'B', ...), else
    'x' — so a non-matching event still occupies a position, exactly the
    ClickHouse semantics where '(?1)(?2)' requires ADJACENT matches and
    '(?1).*(?2)' allows anything between.  ``pattern`` is a regex over
    that alphabet (use ``class_char`` to build it).  Ties in ``ts_col``
    are broken by ``id_col`` so the sequence — and therefore the match —
    is deterministic and oracle-replayable.

    Returns (user_col, seq_len, matched, match_count): whether the
    pattern occurs, and how many non-overlapping occurrences
    (sequenceCount) it has."""
    enc = F.lit(OTHER_CHAR)
    for k in range(len(conditions), 0, -1):
        enc = F.when(conditions[k - 1], F.lit(class_char(k))).otherwise(enc)
    tagged = events.select(
        F.col(user_col),
        F.struct(F.col(ts_col), F.col(id_col), enc.alias("c")).alias("e"),
    )
    seq = F.array_join(
        F.transform(F.array_sort(F.collect_list("e")), lambda s: s["c"]), ""
    )
    return (
        tagged.groupBy(user_col)
        .agg(seq.alias("seq"))
        .select(
            user_col,
            F.length("seq").alias("seq_len"),
            F.col("seq").rlike(pattern).alias("matched"),
            F.regexp_count(F.col("seq"), F.lit(pattern)).alias("match_count"),
        )
    )
