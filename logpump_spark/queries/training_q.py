"""Round-4 training-set assembly queries: sequence packing, stratified
split assignment, temperature resampling, event-sequence pattern match
(ClickHouse sequenceMatch analog), and real-pixel image resize.

Every oracle is exact arithmetic: integer window sums (packing),
multiplicative-hash ranks (splits/resampling — the same int64 recipe as
``stratified_sample``), integer-scaled sqrt weights (temperature), RE2-
portable regexes over deterministic event strings (seq_match), and a
generate_series replay of the nearest-neighbor pixel map (resize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..llmdata.curation import _SAMPLE_MOD, _SAMPLE_MULT
from ..llmdata.packing import assign_splits, pack_sequences, temperature_resample
from ..operators.seqmatch import sequence_match
from ..tables import load

_BUDGET = 64
_N_SHARDS = 8


def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk the documents corpus into 64-token training
    sequences across 8 shards; one row per doc with its (seq, offset)
    placement and span."""
    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=_BUDGET, n_shards=_N_SHARDS)
    return packed.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "seq_id",
        F.col("offset").alias("seq_offset"),
        "n_seqs",
    )


_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM toks
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum_end - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum_end - n_tokens) % {_BUDGET} AS BIGINT) AS seq_offset,
       CAST((cum_end - 1) // {_BUDGET}
            - (cum_end - n_tokens) // {_BUDGET} + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment: exact
    10%/10% val/test per language by multiplicative-hash rank."""
    docs = load(spark, sf_dir, "documents")
    return assign_splits(docs, strata_col="lang").select(
        "doc_id", "lang", "split"
    )


_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN rk <= CEIL(n * 0.1) THEN 'val'
            WHEN rk <= CEIL(n * 0.1) + CEIL(n * 0.1) THEN 'test'
            ELSE 'train' END AS split
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY (doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD}, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents)
ORDER BY doc_id
"""


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) language rebalancing to half the corpus —
    tail languages keep a larger share than their raw proportion."""
    docs = load(spark, sf_dir, "documents")
    kept = temperature_resample(docs, alpha=0.5, keep_frac=0.5)
    return kept.select("doc_id", "lang", "target_l")


_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_l,
         CAST(FLOOR(SQRT(COUNT(*)) * 1000000.0) AS BIGINT) AS w_l
  FROM documents GROUP BY lang
),
tot AS (SELECT SUM(n_l) AS n_total, SUM(w_l) AS w_sum FROM counts),
t AS (
  SELECT lang, n_l,
         LEAST(n_l, CAST(FLOOR(FLOOR(n_total * 0.5) * w_l / w_sum)
                         AS BIGINT)) AS target_l
  FROM counts, tot
),
r AS (
  SELECT d.doc_id, d.lang, t.target_l,
         ROW_NUMBER() OVER (PARTITION BY d.lang
            ORDER BY (d.doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD}, d.doc_id
         ) AS rk
  FROM documents d JOIN t USING (lang)
)
SELECT doc_id, lang, target_l FROM r WHERE rk <= target_l ORDER BY doc_id
"""


# signup with no intervening error before a purchase: needs the negative
# class [^C], which chained min-ts funnels cannot express
_SEQ_PATTERN = "A[^C]*B"


def seq_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequenceMatch/sequenceCount: a signup followed by a
    purchase with NO error event in between (pattern 'A[^C]*B' over the
    time-ordered event string)."""
    events = load(spark, sf_dir, "events")
    return sequence_match(
        events,
        conditions=[
            F.col("event_type") == "signup",
            F.col("event_type") == "purchase",
            F.col("event_type") == "error",
        ],
        pattern=_SEQ_PATTERN,
    )


_SEQ_MATCH_SQL = f"""
WITH enc AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'signup' THEN 'A'
                         WHEN 'purchase' THEN 'B'
                         WHEN 'error' THEN 'C'
                         ELSE 'x' END AS c
  FROM events
),
s AS (
  SELECT user_id, string_agg(c, '' ORDER BY ts, event_id) AS seq
  FROM enc GROUP BY user_id
)
SELECT user_id, CAST(length(seq) AS INT) AS seq_len,
       regexp_matches(seq, '{_SEQ_PATTERN}') AS matched,
       CAST(len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) AS INT)
         AS match_count
FROM s ORDER BY user_id
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode real PNGs with per-doc dimensions (same recipe as
    ``multimodal_decode``), then nearest-neighbor-resize the DECODED
    PIXELS to 8x8 and emit the integer pixel sum — the oracle replays
    the pixel map arithmetically, so a hash match proves the resize ran
    on genuine decoded bytes."""
    from ..llmdata.multimodal import resize_image_features, synthesize_png_media

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (1 + F.col("doc_id") % 17).alias("w"),
        (1 + (F.col("doc_id") * 7) % 13).alias("h"),
        F.when(F.col("doc_id") % 3 == 0, "RGB")
        .when(F.col("doc_id") % 3 == 1, "L")
        .otherwise("RGBA")
        .alias("m"),
    )
    media = synthesize_png_media(docs, "doc_id", "w", "h", "m", "source")
    return resize_image_features(media, target_w=8, target_h=8)


# pixel(x, y, c) = (x*7 + y*13 + c*29) % 256 (codecs.encode_png default);
# nearest-neighbor source pixel for target (x, y) is (x*w//8, y*h//8)
_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 17 AS INT) AS w,
         CAST(1 + (doc_id * 7) % 13 AS INT) AS h,
         CASE WHEN doc_id % 3 = 0 THEN 'RGB'
              WHEN doc_id % 3 = 1 THEN 'L'
              ELSE 'RGBA' END AS mode,
         CASE WHEN doc_id % 3 = 0 THEN 3
              WHEN doc_id % 3 = 1 THEN 1
              ELSE 4 END AS nch
  FROM documents
)
SELECT media_id, w AS src_width, h AS src_height,
       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, mode,
       CAST(SUM(((x.i * w // 8) * 7 + (y.i * h // 8) * 13 + c.i * 29) % 256)
            AS BIGINT) AS pixel_sum
FROM dims, range(0, 8) x(i), range(0, 8) y(i), range(0, 4) c(i)
WHERE c.i < nch
GROUP BY media_id, w, h, mode
ORDER BY media_id
"""


SPARK_QUERIES = {
    "pack_sequences": pack_sequences_q,
    "split_assign": split_assign,
    "sample_temperature": sample_temperature,
    "seq_match": seq_match,
    "multimodal_resize": multimodal_resize,
}
ORACLE_SQL = {
    "pack_sequences": _PACK_SQL,
    "split_assign": _SPLIT_SQL,
    "sample_temperature": _TEMPERATURE_SQL,
    "seq_match": _SEQ_MATCH_SQL,
    "multimodal_resize": _RESIZE_SQL,
}


_CHUNK = 32
_OVERLAP = 8


def chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows with stride 24 over every document —
    the RAG / long-context chunking pass; chunk content witnessed by an
    md5 fingerprint per window."""
    from ..llmdata.packing import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVERLAP)


_CHUNK_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, t,
         1 + greatest(0, (n - {_CHUNK} + {_CHUNK - _OVERLAP} - 1)
                          // {_CHUNK - _OVERLAP}) AS n_chunks
  FROM tok
)
SELECT doc_id, CAST(u.i AS INT) AS chunk_no,
       CAST(u.i * {_CHUNK - _OVERLAP} AS INT) AS start_tok,
       CAST(len(list_slice(t, u.i * {_CHUNK - _OVERLAP} + 1,
                           u.i * {_CHUNK - _OVERLAP} + {_CHUNK})) AS INT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(t, u.i * {_CHUNK - _OVERLAP} + 1,
                                      u.i * {_CHUNK - _OVERLAP} + {_CHUNK}),
                           ' ')) AS chunk_md5
FROM c, UNNEST(range(0, n_chunks)) AS u(i)
ORDER BY doc_id, chunk_no
"""

SPARK_QUERIES["chunk_docs"] = chunk_docs
ORACLE_SQL["chunk_docs"] = _CHUNK_SQL


def training_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end training-set assembly pipeline — what a
    user actually runs: Gopher quality gate -> stratified split (keep
    the train fraction) -> concat-and-chunk packing.  Each stage is the
    same library operator its standalone query exercises; the value here
    is the composition staying ONE lazy plan (gate projection fuses into
    the split window's scan; only the lang and shard shuffles move
    data)."""
    from ..llmdata.quality import gopher_rules

    docs = load(spark, sf_dir, "documents")
    gated = gopher_rules(docs).filter("keep").select("doc_id", "lang", "text")
    train = (
        assign_splits(gated, strata_col="lang")
        .filter(F.col("split") == "train")
        .select("doc_id", "lang", "text")
    )
    packed = pack_sequences(train, budget=_BUDGET, n_shards=_N_SHARDS)
    return packed.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "seq_id",
        F.col("offset").alias("seq_offset"),
        "n_seqs",
    )


def _training_prepare_sql() -> str:
    from ..llmdata.quality import (
        MAX_MEAN_WORD_LEN,
        MAX_SYMBOL_WORD_RATIO,
        MAX_WORDS,
        MIN_ALPHA_WORD_FRAC,
        MIN_MEAN_WORD_LEN,
        MIN_STOPWORD_HITS,
        MIN_WORDS,
    )
    from ..llmdata.text import STOPWORDS

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents
),
gated AS (
  SELECT doc_id, lang, text FROM f
  WHERE (len(t) >= {MIN_WORDS} AND len(t) <= {MAX_WORDS})
    AND ((length(text) - (len(t) - 1)) / len(t) >= {MIN_MEAN_WORD_LEN}
         AND (length(text) - (len(t) - 1)) / len(t) <= {MAX_MEAN_WORD_LEN})
    AND ((length(regexp_replace(text, '[^#…]', '', 'g')) / len(t))
         <= {MAX_SYMBOL_WORD_RATIO})
    AND ((len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) / len(t))
         >= {MIN_ALPHA_WORD_FRAC})
    AND (len(list_filter(t, w -> list_contains([{stop_list}], w)))
         >= {MIN_STOPWORD_HITS})
),
s AS (
  SELECT doc_id, lang, text,
         ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY (doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD}, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM gated
),
train AS (
  SELECT doc_id, text FROM s
  WHERE rk > CEIL(n * 0.1) + CEIL(n * 0.1)
),
toks AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM train
),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM toks
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum_end - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum_end - n_tokens) % {_BUDGET} AS BIGINT) AS seq_offset,
       CAST((cum_end - 1) // {_BUDGET}
            - (cum_end - n_tokens) // {_BUDGET} + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""


SPARK_QUERIES["training_prepare"] = training_prepare
ORACLE_SQL["training_prepare"] = _training_prepare_sql()


def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit: near-duplicate pairs (same token-set
    Jaccard edge rule as dedup_ngram_jaccard) that straddle two different
    splits of the stratified assignment — the check that catches a test
    set contaminated by near-copies of training docs.  Planted clones
    (ids shifted by 10^6, re-hashed into splits independently) guarantee
    the audit provably fires.  Output: pair counts per (split_a,
    split_b) crossing, plus how many touch val or test."""
    from ..llmdata.dedup import ngram_jaccard_pairs
    from .llm_q import _docs_with_planted_dups

    docs = _docs_with_planted_dups(spark, sf_dir)
    splits = assign_splits(docs, strata_col="lang").select("doc_id", "split")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_leaked_pairs"),
            F.sum(
                (
                    F.col("split_a").isin("val", "test")
                    | F.col("split_b").isin("val", "test")
                ).cast("long")
            ).alias("n_touching_holdout"),
        )
    )


_SPLIT_LEAKAGE_SQL = f"""
WITH docs AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM (SELECT * FROM documents WHERE doc_id < 20)
),
splits AS (
  SELECT doc_id,
         CASE WHEN rk <= CEIL(n * 0.1) THEN 'val'
              WHEN rk <= CEIL(n * 0.1) + CEIL(n * 0.1) THEN 'test'
              ELSE 'train' END AS split
  FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY (doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD}, doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM docs)
),
tok AS (
  SELECT doc_id, source, n_chars,
         UNNEST(list_distinct(string_split(text, ' '))) AS tok
  FROM docs
),
sizes AS (
  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_tok FROM docs
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM tok a JOIN tok b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 20
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE n_shared / (na.n_tok + nb.n_tok - n_shared) >= 0.2
)
SELECT sa.split AS split_a, sb.split AS split_b,
       COUNT(*) AS n_leaked_pairs,
       CAST(SUM(CASE WHEN sa.split IN ('val','test')
                       OR sb.split IN ('val','test') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_touching_holdout
FROM pairs
JOIN splits sa ON sa.doc_id = id_a
JOIN splits sb ON sb.doc_id = id_b
WHERE sa.split != sb.split
GROUP BY 1, 2 ORDER BY split_a, split_b
"""

SPARK_QUERIES["split_leakage_check"] = split_leakage_check
ORACLE_SQL["split_leakage_check"] = _SPLIT_LEAKAGE_SQL


def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) image dedup over real encoded-then-
    decoded PNGs: every image gets a 56-bit difference hash from its
    decoded pixels; identical-looking images (here: same formula
    pixels, i.e. same (w, h)) share a hash, and the per-hash group size
    is the duplicate-cluster report.  The oracle replays the resize map
    and the bit comparisons arithmetically, so a hash match proves the
    fingerprint came from genuine decode -> resize -> compare."""
    from ..llmdata.multimodal import dhash_features, synthesize_png_media

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (1 + F.col("doc_id") % 17).alias("w"),
        (1 + (F.col("doc_id") * 7) % 13).alias("h"),
        F.when(F.col("doc_id") % 3 == 0, "RGB")
        .when(F.col("doc_id") % 3 == 1, "L")
        .otherwise("RGBA")
        .alias("m"),
    )
    media = synthesize_png_media(docs, "doc_id", "w", "h", "m", "source")
    hashed = dhash_features(media)
    w_dup = W.partitionBy("dhash")
    return (
        hashed.withColumn("n_same_hash", F.count(F.lit(1)).over(w_dup))
        .select("media_id", "src_width", "src_height", "dhash", "n_same_hash")
    )


# pixel(x, y, c=0) = (x*7 + y*13) % 256; resize maps target (x, y) to
# source (x*w // 9, y*h // 7); bit(y*8+x) = g(x,y) < g(x+1,y)
_PHASH_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 17 AS INT) AS w,
         CAST(1 + (doc_id * 7) % 13 AS INT) AS h
  FROM documents
),
bits AS (
  SELECT media_id, w, h,
         CASE WHEN ((x.i * w // 9) * 7 + (y.i * h // 7) * 13) % 256
                 < (((x.i + 1) * w // 9) * 7 + (y.i * h // 7) * 13) % 256
              THEN (CAST(1 AS BIGINT) << (y.i * 8 + x.i)) ELSE 0 END AS b
  FROM dims, range(0, 8) x(i), range(0, 7) y(i)
),
hashed AS (
  SELECT media_id, w, h, SUM(b) AS dhash FROM bits GROUP BY 1, 2, 3
)
SELECT media_id, w AS src_width, h AS src_height,
       CAST(dhash AS BIGINT) AS dhash,
       COUNT(*) OVER (PARTITION BY dhash) AS n_same_hash
FROM hashed
ORDER BY media_id
"""

SPARK_QUERIES["multimodal_phash"] = multimodal_phash
ORACLE_SQL["multimodal_phash"] = _PHASH_SQL


def multimodal_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup fingerprint over real encoded-then-decoded WAVs:
    7-bit temporal energy-difference signature per clip + per-signature
    cluster size.  The oracle re-derives window energies from the known
    sample formula ((i*257) % 1024 - 512), proving the signature came
    from genuine PCM decode."""
    from ..llmdata.multimodal import audio_fingerprint, synthesize_wav_media

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(22050).alias("rate"),
        (50 + F.col("doc_id") % 100).alias("n"),
    )
    media = synthesize_wav_media(docs, "doc_id", "rate", "n", "source")
    fp = audio_fingerprint(media)
    w_dup = W.partitionBy("fp")
    return (
        fp.withColumn("n_same_fp", F.count(F.lit(1)).over(w_dup))
        .select("media_id", "n_samples", "fp", "n_same_fp")
    )


_AUDIO_FP_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id, CAST(50 + doc_id % 100 AS BIGINT) AS n
  FROM documents
),
samples AS (
  SELECT media_id, n, i.i AS i,
         ABS((i.i * 257) % 1024 - 512) AS a,
         (i.i * 8) // n AS win
  FROM dims, range(0, 150) i(i)
  WHERE i.i < n
),
energies AS (
  SELECT media_id, n, win, SUM(a) AS e
  FROM samples GROUP BY 1, 2, 3
),
bits AS (
  SELECT media_id, n, win,
         CASE WHEN e < LEAD(e) OVER (PARTITION BY media_id ORDER BY win)
              THEN (CAST(1 AS BIGINT) << win) ELSE 0 END AS b
  FROM energies
),
hashed AS (
  SELECT media_id, n, SUM(CASE WHEN win < 7 THEN b ELSE 0 END) AS fp
  FROM bits GROUP BY 1, 2
)
SELECT media_id, n AS n_samples, CAST(fp AS BIGINT) AS fp,
       COUNT(*) OVER (PARTITION BY fp) AS n_same_fp
FROM hashed
ORDER BY media_id
"""

SPARK_QUERIES["multimodal_audio_fp"] = multimodal_audio_fp
ORACLE_SQL["multimodal_audio_fp"] = _AUDIO_FP_SQL


def shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: each epoch permutes the
    corpus by an oracle-replayable hash of (doc_id, epoch) and deals
    docs into 8 reader shards with a per-shard position — the
    "shuffle 100 TB without shuffling 100 TB" idiom: shard assignment
    is a pure hash partition (no global sort ever exists), and the
    position is a per-shard window sort, so each epoch costs one
    hash-partitioned exchange + independent shard-local sorts.  Two
    epochs are emitted to pin that different epochs yield different
    permutations from the same corpus snapshot."""
    from ..llmdata.dedup import md5_hash60

    docs = load(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    )
    hk = md5_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("epoch").cast("string"))
    )
    shard = (hk % 8).cast("long")
    w = W.partitionBy("epoch", "shard").orderBy("hk", "doc_id")
    return (
        e.select("doc_id", "epoch", hk.alias("hk"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "epoch", "shard", "pos")
    )


_SHUFFLE_EPOCH_SQL = """
WITH e AS (
  SELECT doc_id, u.epoch FROM documents, UNNEST([0, 1]) AS u(epoch)
),
h AS (
  SELECT doc_id, epoch,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
              CAST(epoch AS VARCHAR)), 2, 15)) AS BIGINT) AS hk
  FROM e
)
SELECT doc_id, epoch, CAST(hk % 8 AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, hk % 8
                               ORDER BY hk, doc_id) AS INT) AS pos
FROM h ORDER BY doc_id, epoch
"""

SPARK_QUERIES["shuffle_epoch"] = shuffle_epoch
ORACLE_SQL["shuffle_epoch"] = _SHUFFLE_EPOCH_SQL
