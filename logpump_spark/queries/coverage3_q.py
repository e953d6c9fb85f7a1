"""Round-5 coverage: HyperLogLog distinct sketch, argMax/argMin, pivot,
IP-parsing scalar suite, chat-turn assembly, and preference-pair
construction.

Reference parity: ClickHouse exposes ``uniqCombined``/``uniqHLL12``
(HLL distinct), ``argMax``/``argMin``, and ``pivot``-shaped conditional
aggregation as everyday log-analytics primitives — the surface the
reference delegates (SURVEY.md §2.F).  The chat/preference builders
extend the LLM training-data plane (§2.H/§2.I).

Every sketch here is *replayable*: md5-derived hashes and pure integer
register arithmetic mean the DuckDB oracle reconstructs the exact same
registers, so the driver's value-hash checks the sketch itself, not
just its estimate's plausibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import quant
from ..llmdata.dedup import md5_hash60
from ..tables import load

# --------------------------------------------------------------------
# agg_hll_distinct — HyperLogLog with oracle-replayable registers
# --------------------------------------------------------------------

_HLL_P = 9
_HLL_M = 1 << _HLL_P  # 512 registers
# rho counts trailing zeros of the remaining 51 hash bits; an empty
# register contributes 2^52 to the scaled harmonic sum (2^(52-0)).
_HLL_RMAX = 52

# DuckDB twin of md5_hash60 (shared with sketch_q / dedup oracles)
_MD5I = "CAST(concat('0x', substr(md5({s}), 2, 15)) AS BIGINT)"


def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch per event type (ClickHouse
    ``uniqHLL12`` analog), next to the exact count so estimate quality
    is part of the checked result.

    Replayable by construction: bucket = md5-60bit hash mod 512,
    rho = 1 + trailing-zeros of the remaining bits via the exact
    ``bit_count((h & -h) - 1)`` identity (no float log2 — engines
    disagree in the last ulp), registers = per-bucket MAX(rho), and the
    harmonic sum is the *integer* ``sum(2^(52-rho))`` so merge order
    can't wobble the estimate.  The only doubles are one identical
    literal expression and one final division of identical operands.

    Scale shape: the register agg's shuffle is bounded by
    |groups| x 512 regardless of row count — the whole point of HLL at
    100 TB — and it's mergeable: re-aggregating register tables from
    shards ORs the same maxima.  (Raw estimate, no small/large-range
    correction; the exact column alongside shows the bias.)"""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    key = F.floor(F.col("value") * 100).cast("long").cast("string")
    h = md5_hash60(key)
    base = ev.select(
        "event_type",
        (h % _HLL_M).alias("bucket"),
        F.shiftrightunsigned(h, _HLL_P).alias("h2"),
    )
    rho = F.when(F.col("h2") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.bit_count(F.col("h2").bitwiseAND(-F.col("h2")) - 1) + 1
    )
    regs = base.groupBy("event_type", "bucket").agg(F.max(rho).alias("rho"))
    stats = regs.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_RMAX} - rho)")).alias("s_used"),
        F.count(F.lit(1)).alias("m_used"),
    )
    # empty registers contribute 2^52 each; alpha_512 from one literal
    # expression evaluated identically in both engines
    s_total = F.col("s_used") + (F.lit(_HLL_M) - F.col("m_used")) * F.lit(
        1 << _HLL_RMAX
    ).cast("long")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M)))
    est = F.floor(
        alpha
        * F.lit(float(_HLL_M * _HLL_M))
        * F.pow(F.lit(2.0), F.lit(float(_HLL_RMAX)))
        / s_total.cast("double")
    ).cast("long")
    exact = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("k")
    ).groupBy("event_type").agg(F.countDistinct("k").alias("n_exact"))
    return (
        stats.select("event_type", est.alias("n_hll"), F.col("m_used"))
        .join(exact, "event_type")
        .select("event_type", "n_exact", "n_hll", "m_used")
        .orderBy("event_type")
    )


_HLL_H = _MD5I.format(s="CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR)")

_HLL_SQL = f"""
WITH base AS (
  SELECT event_type,
         ({_HLL_H}) % {_HLL_M} AS bucket,
         ({_HLL_H}) // {_HLL_M} AS h2
  FROM events WHERE value IS NOT NULL
),
rhos AS (
  SELECT event_type, bucket,
         CASE WHEN h2 = 0 THEN {_HLL_RMAX}
              ELSE bit_count(CAST((h2 & -h2) - 1 AS BIGINT)) + 1 END AS rho
  FROM base
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS rho FROM rhos GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         SUM((CAST(1 AS BIGINT) << ({_HLL_RMAX} - rho))) AS s_used,
         COUNT(*) AS m_used
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type, m_used,
         CAST(FLOOR(
           (0.7213 / (1.0 + 1.079 / {float(_HLL_M)}))
           * {float(_HLL_M * _HLL_M)} * power(2.0, {float(_HLL_RMAX)})
           / CAST(s_used + ({_HLL_M} - m_used) * (CAST(1 AS BIGINT) << {_HLL_RMAX}) AS DOUBLE)
         ) AS BIGINT) AS n_hll
  FROM stats
),
exact AS (
  SELECT event_type, COUNT(DISTINCT CAST(FLOOR(value * 100) AS BIGINT)) AS n_exact
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_type AS event_type, exact.n_exact AS n_exact,
       e.n_hll AS n_hll, e.m_used AS m_used
FROM est e JOIN exact ON exact.event_type = e.event_type
ORDER BY e.event_type
"""


# --------------------------------------------------------------------
# agg_argmax — argMax / argMin (max_by / min_by)
# --------------------------------------------------------------------


def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax``/``argMin`` via Spark's ``max_by``/``min_by``
    with a composite (value, id) ordering struct — the id tiebreak makes
    the picked row engine-deterministic even on duplicate values.  One
    partial-aggregated shuffle on the group key."""
    # argMax over a NULL ordering value or NULL group is undefined
    # cross-engine (struct-NULL ordering vs join-dropped groups) — pin
    # the domain to non-null dimension + value
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    qv = F.floor(F.col("value") * 10000).cast("long")
    base = ev.select("event_type", "user_id", "event_id", qv.alias("qv"))
    return (
        base.groupBy("event_type")
        .agg(
            F.expr("max_by(user_id, struct(qv, event_id))").alias("top_user"),
            F.expr("min_by(user_id, struct(qv, event_id))").alias("bottom_user"),
            (F.max("qv").cast("double") / 10000).alias("max_value"),
            (F.min("qv").cast("double") / 10000).alias("min_value"),
        )
        .orderBy("event_type")
    )


_ARGMAX_SQL = """
WITH base AS (
  SELECT event_type, user_id, event_id,
         CAST(FLOOR(value * 10000) AS BIGINT) AS qv
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
hi AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY qv DESC, event_id DESC) AS rn
  FROM base
),
lo AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY qv ASC, event_id ASC) AS rn
  FROM base
),
ext AS (
  SELECT event_type,
         CAST(MAX(qv) AS DOUBLE) / 10000 AS max_value,
         CAST(MIN(qv) AS DOUBLE) / 10000 AS min_value
  FROM base GROUP BY 1
)
SELECT ext.event_type AS event_type,
       hi.user_id AS top_user,
       lo.user_id AS bottom_user,
       ext.max_value AS max_value,
       ext.min_value AS min_value
FROM ext
JOIN hi ON hi.event_type = ext.event_type AND hi.rn = 1
JOIN lo ON lo.event_type = ext.event_type AND lo.rn = 1
ORDER BY ext.event_type
"""


# --------------------------------------------------------------------
# pivot_wide — long-to-wide conditional aggregation
# --------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot: per user cohort (user_id mod 10), one count
    column per event type.  The pivot values are an EXPLICIT list —
    at 100 TB an implicit pivot costs an extra distinct-scan job to
    discover them, and makes the output schema data-dependent."""
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


_PIVOT_SQL = f"""
SELECT user_id % 10 AS cohort,
{",".join(f"  COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------
# fn_ip_suite — IPv4 parse / format / CIDR membership
# --------------------------------------------------------------------


def fn_ip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 scalar suite (ClickHouse IPv4NumToString / IPv4StringToNum /
    isIPAddressInRange analogs): synthesize a deterministic address per
    event from the md5 hash, format int -> dotted-quad, parse it BACK
    with split+cast (the function under test), and classify RFC-1918
    private ranges + the /16 subnet.  Pure codegen'd column arithmetic."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 512)
    ip = (md5_hash60(F.col("event_id").cast("string")) % F.lit(1 << 32)).alias("ip_int")
    df = ev.select("event_id", ip)
    octet = lambda n: (F.shiftrightunsigned(F.col("ip_int"), n) % 256).cast("string")
    df = df.withColumn(
        "ip_str", F.concat_ws(".", octet(24), octet(16), octet(8), octet(0))
    )
    parts = F.split(F.col("ip_str"), "\\.")
    parsed = (
        parts.getItem(0).cast("long") * (1 << 24)
        + parts.getItem(1).cast("long") * (1 << 16)
        + parts.getItem(2).cast("long") * (1 << 8)
        + parts.getItem(3).cast("long")
    )
    o1 = F.shiftrightunsigned(F.col("ip_int"), 24) % 256
    o2 = F.shiftrightunsigned(F.col("ip_int"), 16) % 256
    is_private = (
        (o1 == 10)
        | ((o1 == 172) & (o2 >= 16) & (o2 <= 31))
        | ((o1 == 192) & (o2 == 168))
    )
    return df.select(
        "event_id",
        "ip_str",
        parsed.alias("ip_parsed"),
        (F.col("ip_int") == parsed).alias("roundtrip_ok"),
        F.concat_ws(".", octet(24), octet(16), F.lit("0"), F.lit("0")).alias(
            "subnet16"
        ),
        is_private.alias("is_private"),
    ).orderBy("event_id")


_IP_H = _MD5I.format(s="CAST(event_id AS VARCHAR)")

_IP_SQL = f"""
WITH base AS (
  SELECT event_id, ({_IP_H}) % 4294967296 AS ip_int
  FROM events WHERE event_id < 512
),
fmt AS (
  SELECT event_id, ip_int,
         CAST((ip_int // 16777216) % 256 AS VARCHAR) || '.' ||
         CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
         CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
         CAST(ip_int % 256 AS VARCHAR) AS ip_str
  FROM base
),
parsed AS (
  SELECT event_id, ip_int, ip_str,
         CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_parsed
  FROM fmt
)
SELECT event_id, ip_str, ip_parsed,
       (ip_int = ip_parsed) AS roundtrip_ok,
       CAST((ip_int // 16777216) % 256 AS VARCHAR) || '.' ||
       CAST((ip_int // 65536) % 256 AS VARCHAR) || '.0.0' AS subnet16,
       ((ip_int // 16777216) % 256 = 10
        OR ((ip_int // 16777216) % 256 = 172
            AND (ip_int // 65536) % 256 BETWEEN 16 AND 31)
        OR ((ip_int // 16777216) % 256 = 192
            AND (ip_int // 65536) % 256 = 168)) AS is_private
FROM parsed
ORDER BY event_id
"""


# --------------------------------------------------------------------
# chat_assemble — conversation/turn assembly for chat training data
# --------------------------------------------------------------------


def chat_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template assembly: each user's events become time-ordered
    tagged turns concatenated into one training document — the standard
    multi-turn SFT formatting pass.  Deterministic order via
    (unix_micros(ts), event_id) inside array_sort; the dialog travels as
    an md5 fingerprint + length so the checked result stays small.

    Scale shape: one shuffle on the conversation key; per-group state is
    the collected turn array (bounded by turns-per-conversation, the
    same bound any chat formatter needs)."""
    ev = load(spark, sf_dir, "events")
    line = F.concat(F.lit("<"), F.col("event_type"), F.lit("> "), F.col("props"))
    turn = F.struct(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id").alias("eid"),
        line.alias("line"),
    )
    dialog = F.array_join(
        F.transform(F.array_sort(F.collect_list(turn)), lambda x: x["line"]), "\n"
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.length(dialog).alias("dialog_len"),
            F.md5(dialog).alias("dialog_md5"),
        )
    )


_CHAT_SQL = """
WITH lines AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         '<' || event_type || '> ' || props AS line
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_turns,
       length(string_agg(line, chr(10) ORDER BY us, event_id)) AS dialog_len,
       md5(string_agg(line, chr(10) ORDER BY us, event_id)) AS dialog_md5
FROM lines
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------
# pref_pairs — preference-pair (chosen/rejected) construction
# --------------------------------------------------------------------


def pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction: within each (source, lang)
    prompt group, chosen = highest-scored document, rejected = lowest
    (score = n_chars here; any scalar quality score plugs in), with doc
    id tiebreaks for engine determinism.  Groups of one can't form a
    pair and are dropped.  One partial-aggregated shuffle — max/min of
    a (score, id) struct — never a self-join."""
    # pairs need a non-null prompt group and score: the oracle's hi/lo
    # window joins drop NULL (source, lang) groups while Spark's groupBy
    # keeps them, and max(struct(NULL,...)) ordering is engine-undefined
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    sd = F.struct(F.col("n_chars").alias("s"), F.col("doc_id").alias("d"))
    g = (
        docs.groupBy("source", "lang")
        .agg(
            F.max(sd).alias("c"),
            F.min(sd).alias("r"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return g.select(
        "source",
        "lang",
        F.col("c.d").alias("chosen_id"),
        F.col("r.d").alias("rejected_id"),
        (F.col("c.s") - F.col("r.s")).alias("margin"),
        "n_docs",
    ).orderBy("source", "lang")


_PREF_SQL = """
WITH base AS (
  SELECT * FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
),
hi AS (
  SELECT source, lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY n_chars DESC, doc_id DESC) AS rn
  FROM base
),
lo AS (
  SELECT source, lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY n_chars ASC, doc_id ASC) AS rn
  FROM base
),
n AS (SELECT source, lang, COUNT(*) AS n_docs FROM base GROUP BY 1, 2)
SELECT n.source AS source, n.lang AS lang,
       hi.doc_id AS chosen_id, lo.doc_id AS rejected_id,
       hi.n_chars - lo.n_chars AS margin,
       n.n_docs AS n_docs
FROM n
JOIN hi ON hi.source = n.source AND hi.lang = n.lang AND hi.rn = 1
JOIN lo ON lo.source = n.source AND lo.lang = n.lang AND lo.rn = 1
WHERE n.n_docs >= 2
ORDER BY n.source, n.lang
"""


# --------------------------------------------------------------------
# rollup_incremental — mergeable partial-aggregate maintenance
# --------------------------------------------------------------------


def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (ClickHouse AggregatingMergeTree /
    SummingMergeTree analog): a persisted daily rollup STATE is updated
    by merging the state of a late-arriving delta batch — never by
    rescanning the base data.

    Here the corpus is split deterministically (event_id mod 10 == 0 is
    the 'late' delta), both sides fold to per-(event_type, day) states
    (count / quantized sum / min / max — each mergeable), and the merge
    is a second groupBy over the UNION of states: sum-of-counts,
    sum-of-sums, min-of-mins, max-of-maxes.  The oracle computes the
    rollup directly over the full corpus, so the driver's hash check
    proves merge(state(base), state(delta)) == state(full) — the
    algebraic property that makes 100 TB rollups maintainable: a day's
    re-aggregation touches only that day's states plus the delta.
    """
    ev = load(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")
    base = ev.select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        qv.alias("qv"),
        (F.col("event_id") % 10 == 0).alias("is_delta"),
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qv").alias("s"),
            F.min("qv").alias("mn"),
            F.max("qv").alias("mx"),
        )

    merged = (
        state(base.filter(~F.col("is_delta")))
        .unionByName(state(base.filter(F.col("is_delta"))))
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("s").cast("double") / 10000).alias("sum_value"),
            (F.min("mn").cast("double") / 10000).alias("min_value"),
            (F.max("mx").cast("double") / 10000).alias("max_value"),
        )
    )
    return merged.orderBy("event_type", "day")


_ROLLUP_INC_SQL = """
SELECT event_type,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value,
       CAST(MIN(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS min_value,
       CAST(MAX(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------
# agg_cond_suite — ClickHouse -If combinator family
# --------------------------------------------------------------------


def agg_cond_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``countIf``/``sumIf``/``avgIf``/``minIf`` combinator
    twins: conditional aggregates as filtered aggregation inside ONE
    grouped pass — never one scan per condition."""
    ev = load(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")
    big = F.col("qv") > 100 * 10000
    even_user = F.col("user_id") % 2 == 0
    return (
        ev.select("event_type", "user_id", qv.alias("qv"))
        .groupBy("event_type")
        .agg(
            F.count_if(big).alias("n_big"),
            (F.sum(F.when(big, F.col("qv"))).cast("double") / 10000).alias(
                "sum_big"
            ),
            (
                F.sum(F.when(even_user, F.col("qv"))).cast("double")
                / F.count_if(even_user)
                / 10000
            ).alias("avg_even_user"),
            (F.min(F.when(big, F.col("qv"))).cast("double") / 10000).alias(
                "min_big"
            ),
        )
        .orderBy("event_type")
    )


_COND_SQL = """
WITH base AS (
  SELECT event_type, user_id, CAST(FLOOR(value * 10000) AS BIGINT) AS qv
  FROM events
)
SELECT event_type,
       COUNT(*) FILTER (WHERE qv > 1000000) AS n_big,
       CAST(SUM(qv) FILTER (WHERE qv > 1000000) AS DOUBLE) / 10000 AS sum_big,
       CAST(SUM(qv) FILTER (WHERE user_id % 2 = 0) AS DOUBLE)
         / COUNT(*) FILTER (WHERE user_id % 2 = 0) / 10000 AS avg_even_user,
       CAST(MIN(qv) FILTER (WHERE qv > 1000000) AS DOUBLE) / 10000 AS min_big
FROM base
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------
# agg_quantile_weighted — exact weighted quantiles
# --------------------------------------------------------------------


def agg_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted`` analog: per event type, the
    lower weighted median and weighted p90 over quantized values with
    integer weights (user_id mod 5 + 1 — any integer weight column
    plugs in).  The selected value is the smallest qv whose running
    weight reaches the target — pure integer comparisons (cum*2 >=
    total for p50, cum*10 >= 9*total for p90), so the pick is
    engine-exact with no interpolation arithmetic.  One group shuffle
    feeds the per-group total (broadcast back), the cumulative window,
    and the conditional-min fold."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    qv = F.floor(F.col("value") * 10000).cast("long")
    w_int = (F.col("user_id") % 5 + 1).cast("long")
    base = ev.select("event_type", qv.alias("qv"), w_int.alias("w"), "event_id")
    tot = base.groupBy("event_type").agg(F.sum("w").alias("tw"))
    from pyspark.sql import Window as W

    cum_w = (
        W.partitionBy("event_type")
        .orderBy("qv", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = (
        base.join(F.broadcast(tot), "event_type")
        .withColumn("cw", F.sum("w").over(cum_w))
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            (
                F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("qv"))).cast(
                    "double"
                )
                / 10000
            ).alias("wmedian"),
            (
                F.min(F.when(F.col("cw") * 10 >= F.col("tw") * 9, F.col("qv"))).cast(
                    "double"
                )
                / 10000
            ).alias("wp90"),
            F.max("tw").alias("total_weight"),
        )
        .orderBy("event_type")
    )


_WQUANT_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(FLOOR(value * 10000) AS BIGINT) AS qv,
         CAST(user_id % 5 + 1 AS BIGINT) AS w,
         event_id
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
tot AS (SELECT event_type, SUM(w) AS tw FROM base GROUP BY 1),
flagged AS (
  SELECT b.event_type, b.qv, t.tw,
         SUM(b.w) OVER (PARTITION BY b.event_type ORDER BY b.qv, b.event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM base b JOIN tot t ON t.event_type = b.event_type
)
SELECT event_type,
       CAST(MIN(CASE WHEN cw * 2 >= tw THEN qv END) AS DOUBLE) / 10000 AS wmedian,
       CAST(MIN(CASE WHEN cw * 10 >= tw * 9 THEN qv END) AS DOUBLE) / 10000 AS wp90,
       CAST(MAX(tw) AS BIGINT) AS total_weight
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


SPARK_QUERIES = {
    "agg_hll_distinct": agg_hll_distinct,
    "agg_argmax": agg_argmax,
    "pivot_wide": pivot_wide,
    "fn_ip_suite": fn_ip_suite,
    "chat_assemble": chat_assemble,
    "pref_pairs": pref_pairs,
    "rollup_incremental": rollup_incremental,
    "agg_cond_suite": agg_cond_suite,
    "agg_quantile_weighted": agg_quantile_weighted,
}

ORACLE_SQL = {
    "agg_hll_distinct": _HLL_SQL,
    "agg_argmax": _ARGMAX_SQL,
    "pivot_wide": _PIVOT_SQL,
    "fn_ip_suite": _IP_SQL,
    "chat_assemble": _CHAT_SQL,
    "pref_pairs": _PREF_SQL,
    "rollup_incremental": _ROLLUP_INC_SQL,
    "agg_cond_suite": _COND_SQL,
    "agg_quantile_weighted": _WQUANT_SQL,
}


def agg_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION HLL path: Spark's JVM-native Datasketches
    aggregates (hll_sketch_agg / hll_union_agg / hll_sketch_estimate) —
    the tool an operator actually reaches for at 100 TB, next to the
    oracle-replayable register twin `agg_hll_distinct`.  DuckDB cannot
    replay a Datasketches binary, so the CHECKED columns are the exact
    distinct plus tolerance flags: the direct estimate and the
    shard-merged estimate (two half-sketches unioned — the mergeability
    that matters operationally) must both land within 5% of exact
    (lgk=12 standard error is ~1.6%, so the flag is robustly stable).
    One grouped pass builds both sketch shapes; per-group state is the
    sketch (<= 2^12 registers)."""
    ev = load(spark, sf_dir, "events")
    base = ev.select("event_type", "user_id", (F.col("event_id") % 2).alias("half"))
    direct = base.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").alias("est"),
    )
    halves = base.groupBy("event_type", "half").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    merged = halves.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_m")
    )
    tol = lambda est: (
        F.abs(est - F.col("n_exact").cast("double"))
        <= F.lit(0.05) * F.col("n_exact").cast("double") + F.lit(2.0)
    )
    merged = merged.withColumnRenamed("event_type", "et2")
    return (
        direct.join(
            merged, direct["event_type"].eqNullSafe(F.col("et2"))
        )
        .select(
            "event_type",
            "n_exact",
            tol(F.col("est")).alias("est_ok"),
            tol(F.col("est_m")).alias("merged_ok"),
        )
        .orderBy("event_type")
    )


_HLL_NATIVE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS est_ok,
       TRUE AS merged_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""

SPARK_QUERIES["agg_hll_native"] = agg_hll_native
ORACLE_SQL["agg_hll_native"] = _HLL_NATIVE_SQL
