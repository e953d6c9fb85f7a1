"""Driver-facing queries for the LLM-data operators (north star).

Every id here carries a full DuckDB value oracle (the MinHash/SimHash
rows-only exemption was retired in round 4 — both engines now derive
signatures from the same portable MD5-based hash, so the oracles
re-compute identical bands/signatures in SQL), with planted duplicates
proving the dedup family actually detects near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from ..llmdata.multimodal import attach_media, decode_image_features
from ..llmdata.similarity import (
    NEARDUP_SUBCELL_TARGET,
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    np_cosine,
)
from ..llmdata.text import bpe_token_count, fingerprint, lang_id, quality_features
from ..tables import load

_QUERY_IDS = list(range(10))


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + copies of the 20 lowest doc_ids (ids shifted by 10^6):
    guaranteed duplicate pairs so detection queries provably fire.

    doc_ids are contiguous 0..N-1 in every testdata sf, so ``doc_id <
    20`` IS the 20 lowest — expressed as a pushed parquet filter instead
    of ``orderBy().limit()``, which Spark planned as a full corpus
    range-sort (not TakeOrdered) in branches consumed under a window."""
    docs = load(spark, sf_dir, "documents")
    clones = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return docs.unionByName(clones)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted_dups(spark, sf_dir)
    return (
        exact_dedup(docs, ["text"], "doc_id")
        .select("keep_id", "n_copies")
    )


_DEDUP_EXACT_SQL = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM (SELECT * FROM documents WHERE doc_id < 20)
)
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM docs GROUP BY text ORDER BY keep_id
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, FULLY value-checked: the base
    hash is the md5-derived 60-bit integer both engines compute
    identically (dedup.md5_hash60), so the oracle replays shingling,
    the 32 universal-hash permutations, banding, bucket caps, and the
    estimated-Jaccard scores exactly.  Planted exact dups MUST appear
    with est_jaccard 1.0; tests/test_llm_ops.py asserts recall on
    planted near-dups too."""
    docs = _docs_with_planted_dups(spark, sf_dir)
    return minhash_lsh_pairs(docs, threshold=0.5)


_DOCS_PLANTED_CTE = """docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM (SELECT * FROM documents WHERE doc_id < 20)
)"""

# md5-derived 60-bit integer — the DuckDB twin of dedup.md5_hash60
_MD5I = "CAST(concat('0x', substr(md5({s}), 2, 15)) AS BIGINT)"


def _minhash_oracle_sql(
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    from ..llmdata.dedup import _MH_P, _MH_PARAMS

    rpb = n_hashes // n_bands
    mins = ",\n         ".join(
        f"MIN(({a}*h + {b}) % {_MH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_MH_PARAMS[:n_hashes])
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_no, {key} AS band_key FROM sig".format(
            b=b,
            key=_MD5I.format(
                s="concat("
                + ", ',', ".join(f"mh{b * rpb + j}" for j in range(rpb))
                + ")"
            ),
        )
        for b in range(n_bands)
    )
    eq_terms = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(n_hashes)
    )
    return f"""
WITH {_DOCS_PLANTED_CTE},
sh AS (
  SELECT doc_id, {_MD5I.format(s="s")} % {_MH_P} AS h FROM (
    SELECT doc_id, UNNEST(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
    FROM docs)
),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (
{band_selects}
),
buckets AS (
  SELECT band_no, band_key, COUNT(*) AS n FROM bands GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band_no = b.band_no AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
  JOIN buckets k ON k.band_no = a.band_no AND k.band_key = a.band_key
  WHERE k.n BETWEEN 2 AND {max_bucket}
)
SELECT id_a, id_b, ROUND(({eq_terms}) / {float(n_hashes)}, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
WHERE ROUND(({eq_terms}) / {float(n_hashes)}, 6) >= {threshold}
ORDER BY id_a, id_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates, FULLY value-checked: signatures ride
    as two nonnegative 32-bit halves built from the shared md5-derived
    token hash, so the oracle replays the 64 bit-sums, banding, and
    Hamming distances exactly (halves sidestep 1<<63, which ANSI
    engines reject)."""
    docs = _docs_with_planted_dups(spark, sf_dir)
    return simhash_neardup_pairs(docs, max_hamming=3)


def _simhash_oracle_sql(
    max_hamming: int = 3, n_bands: int = 4, max_bucket: int = 1000
) -> str:
    width = 64 // n_bands
    half_bands = 32 // width
    bit_sums = ",\n   ".join(
        f"SUM(CASE WHEN ({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    sig_lo = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
    )
    sig_hi = " + ".join(
        f"(CASE WHEN b{32 + i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_no, "
        f"(({'sig_lo' if b < half_bands else 'sig_hi'} >> {(b % half_bands) * width})"
        f" & {(1 << width) - 1}) AS band_val FROM parts"
        for b in range(n_bands)
    )
    return f"""
WITH {_DOCS_PLANTED_CTE},
hx AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) AS hi,
         CAST(concat('0x', substr(md5(t), 9, 8)) AS BIGINT) AS lo
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM docs)
),
sums AS (
  SELECT doc_id,
   {bit_sums}
  FROM hx GROUP BY doc_id
),
parts AS (
  SELECT doc_id, {sig_hi} AS sig_hi, {sig_lo} AS sig_lo FROM sums
),
bands AS (
{band_selects}
),
buckets AS (
  SELECT band_no, band_val, COUNT(*) AS n FROM bands GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band_no = b.band_no AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
  JOIN buckets k ON k.band_no = a.band_no AND k.band_val = a.band_val
  WHERE k.n BETWEEN 2 AND {max_bucket}
)
SELECT id_a, id_b,
       bit_count(xor(pa.sig_hi, pb.sig_hi)) + bit_count(xor(pa.sig_lo, pb.sig_lo))
         AS hamming
FROM cand
JOIN parts pa ON pa.doc_id = id_a
JOIN parts pb ON pb.doc_id = id_b
WHERE bit_count(xor(pa.sig_hi, pb.sig_hi)) + bit_count(xor(pa.sig_lo, pb.sig_lo))
      <= {max_hamming}
ORDER BY id_a, id_b
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over a deterministic candidate space
    (same source, |n_chars| within 20) — fully oracle-checked."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2)


_DEDUP_NGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, source, n_chars, UNNEST(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
sizes AS (
  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_tok FROM documents
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM tok a JOIN tok b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 20
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared,
       n_shared / (na.n_tok + nb.n_tok - n_shared) AS jaccard
FROM shared
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE n_shared / (na.n_tok + nb.n_tok - n_shared) >= 0.2
ORDER BY id_a, id_b
"""

# cosine formula shared by the similarity oracles: double-cast elements,
# explicit dot/(sqrt*sqrt), round 6 to absorb fold-order ULPs
_COS = """(
  list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),
                   list_transform({b}, x -> CAST(x AS DOUBLE)))
  / (sqrt(list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),
          list_transform({a}, x -> CAST(x AS DOUBLE))))
   * sqrt(list_dot_product(list_transform({b}, x -> CAST(x AS DOUBLE)),
          list_transform({b}, x -> CAST(x AS DOUBLE)))))
)"""


def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exactness
    baseline every ANN variant is measured against."""
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _QUERY_IDS, k=5)


_SIM_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({_COS.format(a='q.qv', b='e.embedding')}, 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""


_IVF_CELLS = 8
_IVF_ITERS = 2
_IVF_NPROBE = 2


# (session, sf_dir) -> the standard-config IVF top-5 plan.  sim_ivf_topk
# and sim_ivf_recall search the SAME fitted index; fit_ivf's Lloyd
# iterations run driver-side collects at construction, so without a memo
# each query re-fits the identical quantizer.  Production fits an index
# once and both the report and its recall eval read it — the memo makes
# the registry reflect that.  Only the PLAN is cached (no checkpoint):
# each query still executes its own search.
_IVF_STD_CACHE: dict[tuple[str, str], DataFrame] = {}


def _ivf_topk_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    # applicationId, not id(spark) — see curation_q._dup_cluster_labels
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_STD_CACHE:
        emb = load(spark, sf_dir, "embeddings")
        # nlist stays the FIXED standard config — a corpus-derived
        # nlist was built and MEASURED in r12 (sqrt rule, oracle-
        # replayed like SemDeDup's k) and REJECTED: at the 10x decade
        # the Lloyd fit's extra driver-side passes cost more than the
        # smaller probe scan saved (warm 2.6 s fixed-8 vs 4.8 s
        # derived-50; decade reading 4.1x -> 7.0x).  IVF has no
        # quadratic pair scan for a growing vocabulary to rescue —
        # per-query probe cost ~ nprobe*n/nlist is linear either way —
        # so nlist is a deployment TUNING knob (retune with nprobe per
        # corpus, recall read off sim_ivf_recall), not a derived
        # parameter.  SCALING.md §10.1 records the experiment.
        _IVF_STD_CACHE[key] = ivf_topk(
            emb, _QUERY_IDS, k=5, n_cells=_IVF_CELLS, iters=_IVF_ITERS,
            nprobe=_IVF_NPROBE,
        )
    return _IVF_STD_CACHE[key]


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a REAL fitted coarse quantizer: integer-quantized
    k-means (2 Lloyd iterations, deterministic init/ties), then each
    query searches only its 2 nearest cells.  The oracle re-derives the
    identical centroids in SQL — the fit itself is correctness-checked,
    not just the search."""
    return _ivf_topk_std(spark, sf_dir)


def _ivf_fit_cte(
    n_cells: int | str, iters: int, fit_where: str | None = None
) -> str:
    """CTE chain replaying fit_ivf exactly: quantize -> init -> (assign,
    update) x iters.  Distances are exact integer sums of squares; the
    centroid update is one floored double division of exact integers.
    ``n_cells`` may be an int literal or a SQL scalar-subquery string
    (the r12 derived-k SemDeDup oracle passes '(SELECT k FROM
    kparams)').  ``fit_where`` (r13): boolean SQL over aliases ``b``
    (base) and ``p`` (a caller-supplied kparams CTE) restricting the
    FIT corpus to fit_ivf's deterministic modulo sample — init and
    every Lloyd iteration then read ``fitbase``; the final ``cells``
    assignment always covers all of ``base``."""
    dist = "list_sum(list_transform(list_zip(b.q, c.c), p -> (p[1]-p[2])*(p[1]-p[2])))"
    if fit_where is None:
        fitbase = "fitbase AS (\n  SELECT * FROM base\n)"
    else:
        fitbase = (
            "fitbase AS (\n  SELECT b.* FROM base b CROSS JOIN kparams p\n"
            f"  WHERE {fit_where}\n)"
        )
    parts = [
        f"""base AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS q
  FROM embeddings
),
{fitbase},
cent0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, q AS c
  FROM fitbase QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {n_cells}
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""d{i} AS (
  SELECT b.vec_id, c.cid, {dist} AS dist
  FROM fitbase b CROSS JOIN cent{i - 1} c
),
a{i} AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
    FROM d{i}
  ) WHERE rn = 1
),
cent{i} AS (
  SELECT cid, list(cv ORDER BY pos) AS c FROM (
    SELECT cell AS cid, pos,
           CAST(FLOOR(CAST(SUM(val) AS BIGINT) / COUNT(*)) AS BIGINT) AS cv
    FROM (
      SELECT a.cell, generate_subscripts(b.q, 1) AS pos, unnest(b.q) AS val
      FROM a{i} a JOIN fitbase b USING (vec_id)
    ) GROUP BY cell, pos
  ) GROUP BY cid
)""")
    parts.append(f"""cells AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT b.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {dist}, c.cid) rn
    FROM base b CROSS JOIN cent{iters} c
  ) WHERE rn = 1
)""")
    return ",\n".join(parts)


_SIM_IVF_SQL = f"""
WITH {_ivf_fit_cte(_IVF_CELLS, _IVF_ITERS)},
probes AS (
  SELECT vec_id AS query_id, cid AS pcell FROM (
    SELECT b.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
             list_sum(list_transform(list_zip(b.q, c.c), p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) rn
    FROM base b CROSS JOIN cent{_IVF_ITERS} c
    WHERE b.vec_id < 10
  ) WHERE rn <= {_IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         ROUND({_COS.format(a='qe.embedding', b='e.embedding')}, 6) AS cos
  FROM probes p
  JOIN embeddings qe ON qe.vec_id = p.query_id
  JOIN cells ce ON ce.cell = p.pcell
  JOIN embeddings e ON e.vec_id = ce.vec_id AND e.vec_id != p.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""


def sim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within a coarse cell, with the
    r12 corpus-derived sub-cell vocabulary: when the largest label cell
    exceeds NEARDUP_SUBCELL_TARGET rows, candidates must also share the
    derived number of leading SRP sign bits, keeping pair expansion
    ~linear as the corpus densifies (SCALING.md §10 — the 10x decade
    measured 25.6x under the fixed vocabulary).  The oracle replays the
    integer bit derivation inside SQL, so parity holds at every scale;
    at the driver fixtures (max cell 59/218) zero bits derive and the
    operator is exhaustive-within-label exactly as before."""
    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=0.35, subcell_target=NEARDUP_SUBCELL_TARGET
    )


def _sign_bits_sql(vec: str, n_bits: int) -> str:
    """SQL twin of similarity.sign_bits_col: '01' string of the leading
    ``n_bits`` element signs; NULL vector/element -> '0' (CASE takes the
    else-branch on NULL, same as Column otherwise())."""
    return " || ".join(
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_bits)
    )


_SIM_NEARDUP_SQL = f"""
WITH params AS (
  -- subcell_bits() replayed in exact integer arithmetic: the number of
  -- SRP sign bits so the largest label cell splits to ~{NEARDUP_SUBCELL_TARGET} rows
  SELECT (SELECT COUNT(*) FROM range(16) t(i)
          WHERE mx > {NEARDUP_SUBCELL_TARGET} * (CAST(1 AS BIGINT) << CAST(i AS INT))) AS b
  FROM (SELECT COALESCE(MAX(c), 0) AS mx FROM
        (SELECT COUNT(*) AS c FROM embeddings GROUP BY label))
),
sub AS (
  SELECT vec_id, label, embedding,
         substring({_sign_bits_sql('embedding', 16)}, 1,
                   (SELECT CAST(b AS INT) FROM params)) AS sc
  FROM embeddings
),
capped AS (
  SELECT * FROM sub
  QUALIFY ROW_NUMBER() OVER (PARTITION BY label, sc ORDER BY vec_id) <= 10000
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS cell,
       ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cos
FROM capped a JOIN capped b
  ON a.label = b.label AND a.sc = b.sc AND a.vec_id < b.vec_id
WHERE ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.35
ORDER BY id_a, id_b
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (token counts, ratios)."""
    docs = load(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_distinct_tokens",
        "mean_token_len",
        "stopword_ratio",
        "punct_ratio",
        "upper_ratio",
    )


_TEXT_STATS_SQL = """
SELECT doc_id, lang,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  (LENGTH(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')) AS mean_token_len,
  len(list_filter(string_split(text, ' '),
      t -> list_contains(['the','a','of','and','is','to','in'], t)))
    / len(string_split(text, ' ')) AS stopword_ratio,
  LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) / LENGTH(text) AS punct_ratio,
  LENGTH(regexp_replace(text, '[^A-Z]', '', 'g')) / LENGTH(text) AS upper_ratio
FROM documents ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with deterministic tie order."""
    docs = load(spark, sf_dir, "documents")
    return lang_id(docs).select(
        "doc_id", "lang", "score_en", "score_de", "score_es", "lang_pred"
    )


_TEXT_LANG_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
    len(list_filter(string_split(text, ' '),
        t -> list_contains(['the','a','of','and','is'], t))) AS score_en,
    len(list_filter(string_split(text, ' '),
        t -> list_contains(['der','die','und','ist','das'], t))) AS score_de,
    len(list_filter(string_split(text, ' '),
        t -> list_contains(['el','la','de','y','es'], t))) AS score_es
  FROM documents
)
SELECT doc_id, lang, score_en, score_de, score_es,
  CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en > 0 THEN 'en'
       WHEN score_de >= score_es AND score_de > 0 THEN 'de'
       WHEN score_es > 0 THEN 'es'
       ELSE 'und' END AS lang_pred
FROM scored ORDER BY doc_id
"""


def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish-regex token counts."""
    docs = load(spark, sf_dir, "documents")
    return bpe_token_count(docs).select("doc_id", "ws_tokens", "bpe_tokens")


_TEXT_BPE_SQL = r"""
SELECT doc_id,
  len(string_split(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form md5/sha256 fingerprints."""
    docs = load(spark, sf_dir, "documents")
    return fingerprint(docs).select(
        "doc_id", "fp_md5", "fp_sha256", "fp_head", "norm_len"
    )


_DOC_FP_SQL = r"""
SELECT doc_id,
  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5,
  sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_sha256,
  substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, 16) AS fp_head,
  length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_len
FROM documents ORDER BY doc_id
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode REAL PNGs (stdlib codec: zlib-compressed filtered
    scanlines, CRC'd chunks) with per-doc dimensions, then decode them
    back through the strict mapInPandas path.  The oracle recomputes the
    expected dimensions from the same columns — so a hash match proves
    the encode->decode roundtrip ran on genuine bytes, executor-side.
    (n_bytes is excluded: compressed size is a zlib detail.)"""
    from ..llmdata.multimodal import synthesize_png_media

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
    feats = decode_image_features(media, strict=True)
    return feats.select(
        "media_id", "kind", "width", "height", "mode", "decoder"
    )


_MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
  'image' AS kind,
  CAST(1 + doc_id % 17 AS INT) AS width,
  CAST(1 + (doc_id * 7) % 13 AS INT) AS height,
  CASE WHEN doc_id % 3 = 0 THEN 'RGB'
       WHEN doc_id % 3 = 1 THEN 'L'
       ELSE 'RGBA' END AS mode,
  'png' AS decoder
FROM documents ORDER BY media_id
"""


def corpus_prepare_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline (dedup -> quality gate ->
    annotate) with planted duplicates, fully oracle-checked."""
    from ..llmdata.pipeline import corpus_prepare

    docs = _docs_with_planted_dups(spark, sf_dir)
    return corpus_prepare(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "bpe_tokens", "fp_md5"
    )


_CORPUS_PREPARE_SQL = r"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text
  FROM (SELECT * FROM documents WHERE doc_id < 20)
),
normed AS (
  SELECT doc_id, text, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
  FROM docs
),
kept AS (
  SELECT n.* FROM normed n
  JOIN (SELECT norm, MIN(doc_id) AS keep_id FROM normed GROUP BY norm) w
    ON n.norm = w.norm AND n.doc_id = w.keep_id
),
quality AS (
  SELECT doc_id, text,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_filter(string_split(text, ' '),
        t -> list_contains(['the','a','of','and','is','to','in'], t)))
      / len(string_split(text, ' ')) AS stopword_ratio,
    (LENGTH(text) - (len(string_split(text, ' ')) - 1))
      / len(string_split(text, ' ')) AS mean_token_len
  FROM kept
)
SELECT doc_id, n_tokens, stopword_ratio,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS bpe_tokens,
  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5
FROM quality
WHERE n_tokens >= 20 AND stopword_ratio <= 0.5 AND mean_token_len >= 2.0
ORDER BY doc_id
"""


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode REAL PCM16 WAVs with per-doc (rate, n_samples), decode them
    back through the strict RIFF-parsing path.  PCM16 mono size is
    deterministic (44 + 2*n_samples), so n_bytes IS oracle-checkable
    here, unlike the zlib-sized PNGs."""
    from ..llmdata.multimodal import decode_audio_features, synthesize_wav_media

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(22050).alias("rate"),
        (50 + F.col("doc_id") % 100).alias("n"),
    )
    media = synthesize_wav_media(docs, "doc_id", "rate", "n", "source")
    return decode_audio_features(media, strict=True).select(
        "media_id", "n_bytes", "sample_rate", "n_samples", "duration_ms", "decoder"
    )


_MULTIMODAL_AUDIO_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 22050 END AS rate,
    50 + doc_id % 100 AS n
  FROM documents
)
SELECT media_id,
  44 + 2 * n AS n_bytes,
  CAST(rate AS INT) AS sample_rate,
  n AS n_samples,
  (n * 1000) // rate AS duration_ms,
  'wav' AS decoder
FROM b ORDER BY media_id
"""


SPARK_QUERIES = {
    "corpus_prepare": corpus_prepare_q,
    "multimodal_audio": multimodal_audio,
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "sim_topk": sim_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_neardup": sim_neardup,
    "text_stats": text_stats,
    "text_lang_id": text_lang_id,
    "text_token_bpe": text_token_bpe,
    "doc_fingerprint": doc_fingerprint,
    "multimodal_decode": multimodal_decode,
}

ORACLE_SQL = {
    "corpus_prepare": _CORPUS_PREPARE_SQL,
    "multimodal_audio": _MULTIMODAL_AUDIO_SQL,
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": _minhash_oracle_sql(),
    "dedup_simhash": _simhash_oracle_sql(),
    "dedup_ngram_jaccard": _DEDUP_NGRAM_SQL,
    "sim_topk": _SIM_TOPK_SQL,
    "sim_ivf_topk": _SIM_IVF_SQL,
    "sim_neardup": _SIM_NEARDUP_SQL,
    "text_stats": _TEXT_STATS_SQL,
    "text_lang_id": _TEXT_LANG_SQL,
    "text_token_bpe": _TEXT_BPE_SQL,
    "doc_fingerprint": _DOC_FP_SQL,
    "multimodal_decode": _MULTIMODAL_SQL,
}


def embed_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label nearest-centroid purity over the embeddings table —
    the clustering-evaluation pass (llmdata/similarity.label_purity)."""
    from ..llmdata.similarity import label_purity

    emb = load(spark, sf_dir, "embeddings").filter(F.col("label").isNotNull())
    return label_purity(emb).orderBy("label")


_LABEL_PURITY_SQL = f"""
WITH px AS (
  SELECT label, u.i AS pos, ROUND(AVG(CAST(embedding[u.i] AS DOUBLE)), 6) AS c
  FROM embeddings, UNNEST(range(1, 65)) u(i)
  WHERE label IS NOT NULL
  GROUP BY label, u.i
),
cent AS (
  SELECT label AS clabel, list(c ORDER BY pos) AS cv FROM px GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, cent.clabel,
         ROUND({_COS.format(a="e.embedding", b="cent.cv")}, 6) AS cos
  FROM embeddings e CROSS JOIN cent WHERE e.label IS NOT NULL
),
assigned AS (
  SELECT vec_id, label, clabel AS assigned FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, clabel ASC) AS rk
    FROM scored) WHERE rk = 1
)
SELECT label, COUNT(*) AS n,
       CAST(SUM(CASE WHEN assigned = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN assigned = label THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS purity
FROM assigned GROUP BY label ORDER BY label
"""

SPARK_QUERIES["embed_label_purity"] = embed_label_purity
ORACLE_SQL["embed_label_purity"] = _LABEL_PURITY_SQL


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over real WAV payloads (the video frame-sample
    shape: one row per sampled byte offset, every 64 bytes).  PCM16
    size is deterministic (44 + 2*n_samples), so the offset arithmetic
    is fully oracle-checkable; the per-frame decode plugs into
    decode_image_features downstream."""
    from ..llmdata.multimodal import sample_frames, synthesize_wav_media

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(22050).alias("rate"),
        (50 + F.col("doc_id") % 100).alias("n"),
    )
    media = synthesize_wav_media(docs, "doc_id", "rate", "n", "source")
    return sample_frames(media, every_n_bytes=64)


_MULTIMODAL_FRAMES_SQL = """
WITH b AS (
  SELECT doc_id AS media_id, 44 + 2 * (50 + doc_id % 100) AS n_bytes
  FROM documents
)
SELECT media_id, 'audio' AS kind, n_bytes,
       CAST(u.i AS INT) AS frame_no,
       CAST(u.i * 64 AS INT) AS byte_offset
FROM b, UNNEST(range(0, (n_bytes - 1) // 64 + 1)) AS u(i)
ORDER BY media_id, frame_no
"""

SPARK_QUERIES["multimodal_frames"] = multimodal_frames
ORACLE_SQL["multimodal_frames"] = _MULTIMODAL_FRAMES_SQL


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dup pairs by levenshtein over 12-char leading
    keys: every 31st doc gets an in-plan mutated twin (one char
    substituted at position 6, outside the 3-char bucket prefix), and
    the operator must recover those pairs plus any organic ones
    (llmdata/dedup.edit_distance_pairs)."""
    from ..llmdata.dedup import edit_distance_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 5), F.lit("#"), F.substring("text", 7, 1_000_000)
        ).alias("text"),
    )
    return (
        edit_distance_pairs(docs.unionByName(twins))
    )


_DEDUP_EDIT_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         substr(text, 1, 5) || '#' || substr(text, 7) AS text
  FROM documents WHERE doc_id % 31 = 0
),
keyed AS (
  SELECT doc_id AS _id, substr(text, 1, 12) AS k,
         substr(text, 1, 3) || '|' || length(substr(text, 1, 12)) AS bkt
  FROM all_docs
),
capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bkt) AS bsz FROM keyed)
  WHERE bsz <= 200
)
SELECT a._id AS id_a, b._id AS id_b,
       CAST(levenshtein(a.k, b.k) AS INT) AS dist
FROM capped a JOIN capped b USING (bkt)
WHERE a._id < b._id AND levenshtein(a.k, b.k) <= 2
ORDER BY id_a, id_b
"""

SPARK_QUERIES["dedup_edit_distance"] = dedup_edit_distance
ORACLE_SQL["dedup_edit_distance"] = _DEDUP_EDIT_SQL


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: fitted k-means clusters +
    within-cluster cosine pruning (llmdata/similarity.semantic_dedup).
    The oracle replays the ENTIRE pipeline — the r12 corpus-derived k
    (clamp(ceil(n/250), 8, 4096)), the r13 derived modulo fit sample
    (stride max(1, n // (64*k)) offset at the corpus min id), Lloyd
    fit on the sample, final full-corpus cell assignment, in-cell pair
    scan, min-id shadowing — in SQL, so parity holds at every scale
    (driver fixtures at sf0.01 derive k=8, stride=1: the full fit)."""
    from ..llmdata.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.35)


_DEDUP_SEMANTIC_SQL = f"""
WITH kparams AS (
  -- semantic_n_cells() + semantic_fit_stride() replayed in exact
  -- integer arithmetic: k = clamp(ceil(n/250), 8, 4096),
  -- m = max(1, n // (64*k)), mn = corpus min id (sample offset)
  SELECT k, GREATEST(1, n // (64 * k)) AS m, mn FROM (
    SELECT LEAST(4096, GREATEST(8, (COUNT(*) + 249) // 250)) AS k,
           COUNT(*) AS n, COALESCE(MIN(vec_id), 0) AS mn
    FROM embeddings
  )
),
{_ivf_fit_cte('(SELECT k FROM kparams)', _IVF_ITERS, '(b.vec_id - p.mn) % p.m = 0')},
capped AS (
  SELECT e.vec_id, c.cell, e.embedding
  FROM embeddings e JOIN cells c USING (vec_id)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cell ORDER BY e.vec_id) <= 10000
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.35
),
kept_by AS (
  SELECT id_b AS vec_id, MIN(id_a) AS kept_by FROM pairs GROUP BY id_b
)
SELECT c.vec_id AS vec_id, c.cell AS cell,
       k.kept_by IS NULL AS keep, k.kept_by AS kept_by
FROM capped c LEFT JOIN kept_by k USING (vec_id)
ORDER BY vec_id
"""

SPARK_QUERIES["dedup_semantic"] = dedup_semantic
ORACLE_SQL["dedup_semantic"] = _DEDUP_SEMANTIC_SQL


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate pairs via MOD-sampled char-32-gram
    fingerprints (llmdata/dedup.substring_fingerprint_pairs).  Twins
    carrying an 80-char verbatim slice of every 13th doc inside fresh
    surrounding text are planted; the pair list must recover them."""
    from ..llmdata.dedup import substring_fingerprint_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat(
            F.lit("fresh preamble text that shares nothing "),
            F.substring("text", 10, 80),
            F.lit(" and an unrelated tail"),
        ).alias("text"),
    )
    return (
        substring_fingerprint_pairs(docs.unionByName(twins))
    )


_DEDUP_SUBSTRING_SQL = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         'fresh preamble text that shares nothing ' || substr(text, 10, 80)
         || ' and an unrelated tail' AS text
  FROM documents WHERE doc_id % 13 = 0
),
fps AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, {_MD5I.format(s="g")} AS h FROM (
      SELECT doc_id, UNNEST(list_transform(
        range(1, greatest(length(text) - 31, 1) + 1),
        i -> substr(text, i, 32))) AS g
      FROM all_docs WHERE text IS NOT NULL AND length(text) >= 32)
  ) WHERE h % 8 = 0
),
bsize AS (SELECT h, COUNT(*) AS n FROM fps GROUP BY h),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_fps
  FROM fps a
  JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
  JOIN bsize s ON s.h = a.h
  WHERE s.n BETWEEN 2 AND 1000
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared_fps FROM pairs ORDER BY id_a, id_b
"""

SPARK_QUERIES["dedup_substring"] = dedup_substring
ORACLE_SQL["dedup_substring"] = _DEDUP_SUBSTRING_SQL


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (llmdata/graph.pagerank_int), 3 power
    iterations over the customer->supplier purchase graph (suppliers
    offset into a disjoint id space).  Returns the top-20 nodes by rank
    — the importance-propagation primitive behind graph-based corpus
    curation (e.g. ranking domains by link mass before crawl
    selection)."""
    from ..llmdata.graph import pagerank_int

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank_int(edges, iters=3)
    return pr.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(20)


def _pagerank_oracle_sql(iters: int = 3, scale: int = 10**9) -> str:
    base = (scale * 15) // 100
    parts = [
        """e AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
nodes AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e),
outdeg AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u),
pr0 AS (SELECT node, CAST(%d AS BIGINT) AS pr FROM nodes)""" % scale
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
  SELECT e.v AS node,
         CAST(SUM(CAST(FLOOR(p.pr * 85 / (100 * d.deg)) AS BIGINT)) AS BIGINT)
           AS inflow
  FROM e JOIN pr{i - 1} p ON p.node = e.u JOIN outdeg d ON d.u = e.u
  GROUP BY e.v
),
pr{i} AS (
  SELECT n.node, CAST({base} + COALESCE(c{i}.inflow, 0) AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, pr FROM pr{iters} ORDER BY pr DESC, node ASC LIMIT 20"
    )


SPARK_QUERIES["graph_pagerank"] = graph_pagerank
ORACLE_SQL["graph_pagerank"] = _pagerank_oracle_sql()


def sim_hardneg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: per
    query vector, the top-5 most-similar vectors whose LABEL DIFFERS —
    the near-miss negatives that carry the training signal (easy
    negatives are uninformative; same-label neighbors are positives).
    Same broadcast-queries / single-corpus-pass shape as sim_topk with
    one extra label predicate in the join."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").alias("v"), "label")
    queries = base.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = base.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("qlabel")),
    ).withColumn("cos", F.round(np_cosine()(F.col("qv"), F.col("v")), 6))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("neg_label"),
            "cos",
            "rank",
        )
    )


_SIM_HARDNEG_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, e.vec_id AS negative_id, e.label AS neg_label,
         ROUND({_COS.format(a='q.qv', b='e.embedding')}, 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id AND e.label != q.qlabel
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, negative_id ASC) AS rank
  FROM scored
)
SELECT query_id, negative_id, neg_label, cos, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""

SPARK_QUERIES["sim_hardneg"] = sim_hardneg
ORACLE_SQL["sim_hardneg"] = _SIM_HARDNEG_SQL


def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF ANN index against the brute-force ground
    truth — the eval every ANN deployment runs before trusting its
    index (nprobe/cells tuning reads directly off this number).  Both
    sides are the registered, oracle-checked operators; recall is the
    per-query overlap of their top-5 sets.

    100 TB shape: ground truth on the FULL corpus is the expensive
    side (one corpus pass per query batch, broadcast queries); in
    production it runs on a sampled query set exactly like this
    10-query panel, while the IVF side only ever scans nprobe cells."""
    emb = load(spark, sf_dir, "embeddings")
    brute = brute_force_topk(emb, _QUERY_IDS, k=5).select(
        "query_id", "neighbor_id"
    )
    ivf = _ivf_topk_std(spark, sf_dir).select(
        F.col("query_id").alias("i_qid"), F.col("neighbor_id").alias("i_nid")
    )
    joined = brute.join(
        ivf,
        (F.col("query_id") == F.col("i_qid"))
        & (F.col("neighbor_id") == F.col("i_nid")),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("i_nid").alias("n_overlap"),
            (F.count("i_nid").cast("double") / 5).alias("recall_at_5"),
        )
    )


_SIM_IVF_RECALL_SQL = f"""
SELECT b.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(i.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
FROM ({_SIM_TOPK_SQL}) b
LEFT JOIN ({_SIM_IVF_SQL}) i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id
"""

SPARK_QUERIES["sim_ivf_recall"] = sim_ivf_recall
ORACLE_SQL["sim_ivf_recall"] = _SIM_IVF_RECALL_SQL
