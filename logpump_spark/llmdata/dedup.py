"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these over naive pairwise):
- exact: one hash-shuffle on the key; the canonical-winner rule
  (min id) keeps results deterministic
- MinHash LSH: n_docs x n_shingles explode -> per-doc signature (one
  shuffle), band-bucket join generates candidates ~ O(sum bucket^2) which
  LSH keeps tiny; NEVER materializes the n^2 pair space
- SimHash: one explode + one 64-way aggregation; near-dup candidates by
  signature band equality, verified by Hamming distance (bit_count(xor))
- n-gram Jaccard: exact verification metric, computed only over a
  candidate-bounded pair set
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact duplicate groups: canonical keeper = min id, plus multiplicity.
    `dropDuplicates` alone keeps an arbitrary row; min-id is deterministic
    and therefore oracle-checkable and idempotent across retries."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def shingles_col(toks: Column, k: int = 3) -> Column:
    """Overlapping k-token shingles as strings.  Documents shorter than k
    tokens contribute their full token string as a single shingle."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    xxhash64(shingle, i).  One explode + one grouped aggregation; the
    shuffle carries (doc, shingle-hash) pairs only."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(tokens_col(text_col))).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"mh{i}" for i in range(n_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH, scored by estimated
    Jaccard (fraction of agreeing minhash positions).

    rows_per_band = n_hashes/n_bands; a pair collides in a band iff that
    band's slice of the signature matches exactly, so the candidate join
    is a plain equi-join on (band_no, band_hash) — shuffle-friendly and
    skew-bounded (a pathological bucket can be salted; not needed at
    these sizes).
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes)
    bands = sig.select(
        F.col(id_col),
        F.col("signature"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_no"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "signature", "band.band_no", "band.band_hash")

    left = bands.select(
        F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"), "band_no", "band_hash"
    )
    right = bands.select(
        F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"), "band_no", "band_hash"
    )
    cand = (
        left.join(right, ["band_no", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: (a == b).cast("int")),
                lambda x: x == 1,
            )
        )
        / F.lit(float(n_hashes))
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens: bit i of the signature is the sign of
    sum over tokens of (+1 if bit i of xxhash64(token) else -1).

    One explode + 64 conditional-sum aggregates in a single grouped pass
    (Catalyst fuses them into one HashAggregate)."""
    tok = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(id_col, sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of
    ``n_bands`` 16-bit signature bands (pigeonhole: any pair within
    Hamming distance < n_bands must agree on some band), verified by
    exact Hamming distance via bit_count(xor)."""
    sig = simhash(df, id_col, text_col)
    width = 64 // n_bands
    # shift amounts are compile-time constants -> unroll the band structs
    # in Python (shiftright takes a literal bit count)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_no"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_val"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        id_col, "simhash", F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, "simhash", "band.band_no", "band.band_val")
    left = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band_no", "band_val")
    right = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band_no", "band_val")
    return (
        left.join(right, ["band_no", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_keys: list[str] | None = None,
    max_len_diff: int = 20,
    len_col: str = "n_chars",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact token-set Jaccard over a bounded candidate space: pairs must
    share every ``pair_keys`` column and sit within ``max_len_diff`` of
    each other — the deterministic stand-in for an upstream LSH candidate
    stage, chosen so a SQL oracle can reproduce it exactly."""
    pair_keys = pair_keys or ["source"]
    tok = df.select(
        F.col(id_col), *pair_keys, F.col(len_col),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"),
    )
    sizes = df.select(
        F.col(id_col), F.size(F.array_distinct(tokens_col(text_col))).alias("n_tok")
    )
    a = tok.select(
        F.col(id_col).alias("id_a"), *[F.col(k).alias(f"{k}_a") for k in pair_keys],
        F.col(len_col).alias("len_a"), "tok",
    )
    b = tok.select(
        F.col(id_col).alias("id_b"), *[F.col(k).alias(f"{k}_b") for k in pair_keys],
        F.col(len_col).alias("len_b"), "tok",
    )
    cond = [a.tok == b.tok] + [
        F.col(f"{k}_a") == F.col(f"{k}_b") for k in pair_keys
    ]
    shared = (
        a.join(b, cond)
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_len_diff)
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    # unrounded: one IEEE division of identical ints is engine-exact
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )
