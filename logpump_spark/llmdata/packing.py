"""Training-set assembly operators: GPT-style sequence packing,
stratified train/val/test splitting, and temperature-weighted language
resampling.

These are the steps between "curated corpus" and "token stream fed to
the trainer".  All three are deterministic (multiplicative-hash order,
integer arithmetic) so a corpus snapshot can be re-derived bit-exactly,
and every shuffle is keyed on a bounded stratum (shard / lang), never a
single global ordering:

- pack_sequences: concat-and-chunk packing.  Documents are
  concatenated in id order WITHIN A SHARD and the token stream is cut
  into fixed ``budget``-token training sequences; each document lands
  at (seq_id, offset) and may span several sequences.  One shuffle (by
  shard), one window pass per shard — the 100 TB shape, because a
  single global cumulative sum would funnel the corpus through one
  partition while per-shard streams pack independently on every
  executor (shard count scales with the cluster).
- assign_splits: per-stratum EXACT-proportion train/val/test split via
  multiplicative-hash ranking (rand() only hits fractions in
  expectation and is not reproducible across engines).
- temperature_resample: XLM-R-style language rebalancing — sampling
  weight q_l ∝ p_l^alpha over language shares p_l, integer targets per
  language, hash-rank selection.  The language histogram is a tiny
  aggregate broadcast back onto the corpus; the only corpus-wide
  shuffle is the per-lang window.
- chunk_documents: overlapping token-window chunking (RAG /
  long-context preprocessing) — one projection + explode, zero
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .curation import _SAMPLE_MOD, _SAMPLE_MULT
from .dedup import tokens_col


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing: per shard, documents are laid head to
    tail in ``id_col`` order and the concatenated token stream is cut
    into ``budget``-token sequences.

    Emits one row per document: its shard, token count, the sequence it
    starts in (``seq_id``, shard-local), the offset inside that
    sequence, and how many sequences it spans (``n_seqs`` > 1 when a
    document straddles a chunk boundary).  Downstream, the trainer's
    reader materializes sequence ``s`` of a shard by slicing the docs
    with ``seq_id <= s < seq_id + n_seqs`` — no second pass over text
    here.

    Scale shape: ``shard`` is the only shuffle key and each shard's
    window is an independent linear scan, so packing parallelism =
    shard count (set it ~ executor count at 100 TB).  Token counts ride
    the same projection as the shard key; text itself is never
    shuffled."""
    toks = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum_end = F.sum("n_tokens").over(w)
    cum_start = cum_end - F.col("n_tokens")
    return (
        toks.withColumn("cum_start", cum_start)
        .withColumn("cum_end", cum_end)
        .select(
            id_col,
            "shard",
            "n_tokens",
            F.floor(F.col("cum_start") / budget).alias("seq_id"),
            (F.col("cum_start") % budget).alias("offset"),
            (
                F.floor((F.col("cum_end") - 1) / budget)
                - F.floor(F.col("cum_start") / budget)
                + 1
            ).alias("n_seqs"),
        )
    )


def assign_splits(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Deterministic stratified train/val/test assignment with EXACT
    per-stratum proportions.

    Rows of each stratum are ranked by a multiplicative hash of the id;
    the first ceil(n*val_frac) become ``val``, the next
    ceil(n*test_frac) become ``test``, the rest ``train``.  Hash
    ranking (not id ranking) keeps the splits unbiased w.r.t. any
    id-correlated property; integer arithmetic keeps them reproducible
    across engines and reruns.

    Scale shape: one window shuffle keyed by the stratum — same cost as
    any per-stratum aggregation; no global ordering."""
    key = (F.col(id_col) * _SAMPLE_MULT) % _SAMPLE_MOD
    w = W.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    wn = W.partitionBy(strata_col)
    n = F.count(F.lit(1)).over(wn)
    rank = F.row_number().over(w)
    n_val = F.ceil(n * F.lit(val_frac))
    n_test = F.ceil(n * F.lit(test_frac))
    return df.withColumn(
        "split",
        F.when(rank <= n_val, "val")
        .when(rank <= n_val + n_test, "test")
        .otherwise("train"),
    )


def temperature_resample(
    docs: DataFrame,
    alpha: float = 0.5,
    keep_frac: float = 0.5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted language rebalancing (the XLM-R / mT5
    multilingual sampling step): language l with corpus share p_l gets
    sampling weight q_l ∝ p_l^alpha, so alpha<1 upsamples the tail
    languages' SHARE of the kept corpus.  The kept size is
    floor(N*keep_frac) overall; each language's integer target is
    round-by-floor of its q_l share, capped at its available docs, and
    membership is decided by multiplicative-hash rank within the
    language — fully deterministic.

    Emits the kept docs with their language target.  Scale shape: the
    language histogram is a tiny aggregate (|langs| rows) broadcast
    back; the corpus sees one per-lang window shuffle and no global
    sort.

    Determinism note: weights are SCALED TO INTEGERS
    (floor(n_l^alpha * 1e6)) before the sum/ratio, so the targets are
    pure int64 arithmetic — a double sum's order-dependence, or a 1-ulp
    pow() difference between engines, can otherwise flip a floor() at a
    boundary.  alpha=0.5 routes through sqrt(), which IEEE 754 requires
    to be exactly rounded (pow carries no such guarantee)."""
    n_dbl = F.col("n_l").cast("double")
    w_dbl = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_l"))
    counts = counts.withColumn("w_l", F.floor(w_dbl * F.lit(1_000_000.0)))
    # q_l = w_l / sum(w_l); target_l = min(n_l, keep_total * w_l //
    # w_sum).  The totals are 1-row aggregates of the tiny counts table,
    # broadcast back onto it; all integer arithmetic from here.
    tot = counts.agg(
        F.sum("n_l").alias("n_total"), F.sum("w_l").alias("w_sum")
    )
    weights = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_l",
            F.least(
                F.col("n_l"),
                F.floor(
                    F.floor(F.col("n_total") * F.lit(keep_frac))
                    * F.col("w_l")
                    / F.col("w_sum")
                ).cast("long"),
            ),
        )
        .select(strata_col, "n_l", "target_l")
    )
    key = (F.col(id_col) * _SAMPLE_MULT) % _SAMPLE_MOD
    w = W.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.join(F.broadcast(weights), strata_col)
        .withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= F.col("target_l"))
        .drop("keep_rank")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context
    preprocessing step): document tokens are cut into windows of
    ``chunk_size`` tokens starting every ``chunk_size - overlap``
    tokens; the final window may be short, and a document shorter than
    one window yields exactly one chunk.

    Emits one row per chunk: (id, chunk_no, start_tok, n_chunk_tokens,
    chunk_md5) — the fingerprint is md5 of the space-joined window, so
    chunk CONTENT is witnessed without shipping it.  Chunk count is
    pure integer arithmetic (1 + ceil-div of the overhang), so the
    layout replays exactly in any engine.

    Scale shape: one projection + explode, no shuffle at all — chunking
    is embarrassingly parallel; the ~chunk_size/stride data expansion is
    the operator's semantics, not an implementation artifact."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    # 1 + ceil((n - chunk_size) / stride), floored at 1: int arithmetic,
    # truncation == floor because the guarded operand is nonnegative
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), ((n - chunk_size + stride - 1) / F.lit(stride)).cast("int")
    )
    start = F.col("chunk_no") * stride
    window = F.slice(F.col("_toks"), start + 1, chunk_size)
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_no"),
            start.alias("start_tok"),
            F.size(window).alias("n_chunk_tokens"),
            F.md5(F.array_join(window, " ")).alias("chunk_md5"),
        )
    )
