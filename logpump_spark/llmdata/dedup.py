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

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.materialize import materialize as _mat


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


def md5_hash60(col: Column) -> Column:
    """Oracle-replayable 60-bit string hash: hex chars 2..16 of md5 as a
    nonnegative long.  Spark (conv) and DuckDB (CAST '0x…' AS BIGINT)
    produce the identical integer — unlike xxhash64, whose seed-42
    variant exists only in Spark.  This is what upgrades MinHash/SimHash
    from rows-only checks to full value-checked oracles; md5 costs ~2x
    xxhash64 per string, the price of cross-engine verifiability."""
    return F.conv(F.substring(F.md5(col), 2, 15), 16, 10).cast("long")


def ordered_pair_structs(arr: Column, make) -> Column:
    """All ordered pairs (earlier, later) of a SORTED array column,
    expanded in place — the bucket-collect pair idiom every *_pairs
    operator shares (pairs form inside the collected bucket, so a
    bucket of n members costs n^2/2 rows ONCE, never an occurrence
    self-join).  ``make(a, b)`` builds the per-pair struct; the i + 2
    slice start is 1-based-slice + skip-self."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: make(x, y),
            ),
        )
    )


def shingles_col(toks: Column, k: int = 3) -> Column:
    """Overlapping k-token shingles as strings.  Documents shorter than k
    tokens contribute their full token string as a single shingle."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))


# universal-hash permutation constants: p prime > 2^32; a,b < 2^30 keep
# a*h32+b below 2^62 (no ANSI overflow).  Fixed seed -> deterministic
# signatures across runs/engines.
_MH_P = 4_294_967_311
_MH_PARAMS: list[tuple[int, int]] = []
_state = 0x9E3779B9
for _ in range(64):
    _state = (_state * 6364136223846793005 + 1442695040888963407) % (1 << 62)
    _a = (_state >> 16) % ((1 << 30) - 1) + 1
    _state = (_state * 6364136223846793005 + 1442695040888963407) % (1 << 62)
    _b = (_state >> 16) % (1 << 30)
    _MH_PARAMS.append((_a, _b))


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    pi_i(md5_hash60(shingle) mod p) with pi_i(h) = (a_i*h + b_i) mod p.

    A signature is a function of ONE document, so this is a single
    Arrow-batched projection — no corpus x shingle explode, no shuffle
    (the old shape shuffled (doc, shingle) rows corpus-wide for a
    per-doc aggregate).  hashlib.md5 produces the identical digest to
    Spark's md5()/DuckDB's md5(), so the values stay exactly the
    oracle-replayable md5_hash60 domain; the n permutations are one
    numpy (n_hashes x n_shingles) int64 matrix op (a<2^30, h<2^32 keeps
    products under 2^62).

    The signature projection is the plane's CPU (python md5 per shingle),
    so it is fanned out across the session's cores first
    (operators/fanout.py): a single-row-group input otherwise feeds ONE
    Arrow-batched Python worker while the other cores idle (measured
    1.7 -> 1.2 s on dedup_minhash_lsh at sf0.1)."""
    import hashlib

    from ..operators.fanout import fan_out

    A = np.array([a for a, _ in _MH_PARAMS[:n_hashes]], dtype=np.int64)
    B = np.array([b for _, b in _MH_PARAMS[:n_hashes]], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = t.split(" ")
            # overlapping 3-token shingles; short docs contribute their
            # full token string (same clamp as shingles_col); the SET is
            # fine — min over a multiset equals min over its set
            shingles = {
                " ".join(words[i : i + 3]) for i in range(max(len(words) - 2, 1))
            }
            H = np.array(
                [
                    int(hashlib.md5(s.encode("utf-8")).hexdigest()[1:16], 16) % _MH_P
                    for s in shingles
                ],
                dtype=np.int64,
            )
            out.append(((A[:, None] * H[None, :] + B[:, None]) % _MH_P).min(axis=1).tolist())
        return pd.Series(out)

    return fan_out(
        df.filter(F.col(text_col).isNotNull()), id_col, text_col
    ).select(F.col(id_col), _sig(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH, scored by estimated
    Jaccard (fraction of agreeing minhash positions).

    rows_per_band = n_hashes/n_bands; a pair is a candidate iff some
    band's signature slice matches exactly.  Candidates are generated by
    bucket-collect (see inline note) — one signature derivation, one
    shuffle, no self-join.
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
                    md5_hash60(
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

    # Bucket-collect instead of a self-join: a self-join would re-derive
    # the whole shingle->signature pipeline for BOTH sides (Catalyst does
    # not reuse the subplan) — i.e. two corpus scans at 100 TB.  Collecting
    # (id, signature) per bucket keeps ONE derivation and one shuffle;
    # pair generation happens inside each bucket with higher-order
    # functions.  LSH keeps buckets tiny by construction; a cap guards the
    # pathological all-identical-docs bucket (those pairs are exact dups —
    # exact_dedup is the right tool for them).
    members = (
        bands.groupBy("band_no", "band_hash")
        .agg(F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("id"), "signature"))).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= F.lit(max_bucket_size)))
    )
    pair_structs = ordered_pair_structs(
        F.col("ms"),
        lambda m, m2: F.struct(
            m["id"].alias("id_a"),
            m2["id"].alias("id_b"),
            m["signature"].alias("sig_a"),
            m2["signature"].alias("sig_b"),
        ),
    )
    # score after the explode: one flat zip_with per candidate row keeps
    # the generated code small (the nested-lambda variant compiles ~2x
    # slower for identical results)
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("p.sig_a"), F.col("p.sig_b"), lambda a, b: (a == b).cast("int")),
                lambda x: x == 1,
            )
        )
        / F.lit(float(n_hashes))
    )
    return (
        members.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def simhash_parts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over tokens, carried as two nonnegative 32-bit
    halves (sig_hi, sig_lo): bit i of the signature is the sign of
    sum over tokens of (+1 if bit i of the token hash else -1).

    The token hash is the md5-derived pair (hi = hex chars 1-8, lo =
    chars 9-16) so the DuckDB oracle replays identical signatures; the
    halves avoid 1<<63, which ANSI engines reject as overflow.

    A signature is a function of ONE document, so this stays a single
    projection — no corpus x token explode, no 64-aggregate shuffle.
    r15 (guide §4.2): token hashing moved INTO the JVM (the md5_hash60
    idiom: conv(substring(md5(w), ...), 16, 10) equals int(hex, 16) of
    the same chars), so the Arrow boundary carries int64 hash arrays and
    the Python side is pure vectorized numpy over the whole batch — the
    old per-row loop called hashlib once per TOKEN in interpreted
    Python.  Spark's split(text, ' ') and Python's str.split(' ') agree
    on empty/trailing tokens, so signatures are bit-identical."""
    toks = F.split(F.col(text_col), " ")
    # one md5 transform, two slice transforms (ADVICE r15): the old
    # form called F.md5(w) inside BOTH half-lambdas, where no common-
    # subexpression elimination crosses lambda bodies.  Hoisting the
    # hex array makes the md5 pass a single top-level subexpression;
    # measured ~neutral at the decade corpus (1.27 -> 1.24 s median —
    # the matmul fold, not md5, is the stage's wall), kept for the
    # halved hash work.  (Also measured and REJECTED: shipping 16-char
    # hex strings across Arrow and parsing in numpy — 1.27 -> 2.31 s,
    # the string batches cost more than the saved JVM conv.)
    md5s = F.transform(toks, F.md5)
    hi_arr = F.transform(
        md5s, lambda h: F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    )
    lo_arr = F.transform(
        md5s, lambda h: F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    )

    weights = np.int64(1) << np.arange(32, dtype=np.int64)

    @F.pandas_udf("sig_hi long, sig_lo long")
    def _sig(hi: pd.Series, lo: pd.Series) -> pd.DataFrame:
        n = len(hi)
        if n == 0:
            z = pd.Series([], dtype="int64")
            return pd.DataFrame({"sig_hi": z, "sig_lo": z})
        lens = np.fromiter((len(x) for x in hi), dtype=np.int64, count=n)
        # reduceat is only correct with non-empty segments (a zero-len
        # row would silently absorb a neighbor's fold) — unreachable
        # today because split() of non-null text yields >= 1 token,
        # but fail LOUDLY if a future caller feeds empty arrays
        # (ADVICE r15)
        if not (lens > 0).all():
            raise ValueError(
                "simhash fold requires >= 1 token per row; got an "
                "empty token array"
            )
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])

        def fold(arrs) -> np.ndarray:
            a = np.concatenate([np.asarray(x, dtype=np.int64) for x in arrs])
            sig = np.zeros(n, dtype=np.int64)
            # per bit: sum over tokens of +-1 = 2*popcount - n_tokens;
            # sign -> signature bit.  One T-length pass per bit keeps
            # memory O(total tokens), not O(tokens x 32).
            for i in range(32):
                cnt = np.add.reduceat((a >> i) & 1, starts)
                sig += (2 * cnt - lens > 0) * weights[i]
            return sig

        return pd.DataFrame({"sig_hi": fold(hi), "sig_lo": fold(lo)})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), _sig(hi_arr, lo_arr).alias("_s"))
        .select(id_col, "_s.sig_hi", "_s.sig_lo")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Single-long 64-bit SimHash (bits 32..63 = sig_hi, 0..31 = sig_lo).
    Spark composes the halves freely (long arithmetic wraps); operators
    that need oracle replay work on the halves via ``simhash_parts``."""
    parts = simhash_parts(df, id_col, text_col)
    return parts.select(
        id_col,
        F.shiftleft(F.col("sig_hi"), 32).bitwiseOR(F.col("sig_lo")).alias("simhash"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of
    ``n_bands`` 16-bit signature bands (pigeonhole: any pair within
    Hamming distance < n_bands must agree on some band), verified by
    exact Hamming distance via bit_count(xor) over the halves.
    ``max_bucket_size`` caps pathological all-identical buckets, same
    guard as the MinHash path."""
    sig = simhash_parts(df, id_col, text_col)
    width = 64 // n_bands
    half_bands = 32 // width
    # shift amounts are compile-time constants -> unroll the band structs
    # in Python (shiftright takes a literal bit count)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_no"),
            F.shiftright(
                F.col("sig_lo" if b < half_bands else "sig_hi"), (b % half_bands) * width
            )
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_val"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        id_col, "sig_hi", "sig_lo", F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, "sig_hi", "sig_lo", "band.band_no", "band.band_val")
    # bucket-collect, for the same one-derivation reason as MinHash LSH
    members = (
        bands.groupBy("band_no", "band_val")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), "sig_hi", "sig_lo")
                )
            ).alias("ms")
        )
        .filter((F.size("ms") >= 2) & (F.size("ms") <= F.lit(max_bucket_size)))
    )
    pair_structs = ordered_pair_structs(
        F.col("ms"),
        lambda m, m2: F.struct(
            m["id"].alias("id_a"),
            m2["id"].alias("id_b"),
            (
                F.bit_count(m["sig_hi"].bitwiseXOR(m2["sig_hi"]))
                + F.bit_count(m["sig_lo"].bitwiseXOR(m2["sig_lo"]))
            ).alias("hamming"),
        ),
    )
    return (
        members.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
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
    stage, chosen so a SQL oracle can reproduce it exactly.

    r15: the token stream is materialized ONCE (localCheckpoint, the
    ranged_blocks precedent) — it feeds both sides of the self-join,
    and the per-doc distinct-token sizes are re-aggregated from it
    (count of the already-distinct exploded tokens == the old
    size(array_distinct(...)); a NULL-text doc emits no tok rows and
    no sizes row, but it cannot appear in `shared` either, so the
    inner joins see identical keys).  The old shape ran the
    split+distinct+explode tokenization FOUR times per call (a side,
    b side, and the two sizes branches).  Interleaved A/B at sf0.1:
    2.70 -> 2.23 s (0.82x) on the planted-dups corpus, pairs exact."""
    pair_keys = pair_keys or ["source"]
    band = F.floor(F.col(len_col) / max_len_diff)
    tok = df.select(
        F.col(id_col), *pair_keys, F.col(len_col), band.alias("band"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"),
    ).transform(_mat)
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    # length-band bucketing: |len_a - len_b| <= W implies the bands differ
    # by at most 1, so probing band-1/band/band+1 turns the length window
    # into an EQUI-join key — hash buckets shrink by the band count and
    # the residual |diff|<=W filter only sees near-length candidates.
    # At 100 TB this is the difference between joining on (source, token)
    # (hot common tokens explode) and (source, token, band).
    a = tok.select(
        F.col(id_col).alias("id_a"), *[F.col(k).alias(f"{k}_a") for k in pair_keys],
        F.col(len_col).alias("len_a"), "tok",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band_probe"),
    )
    b = tok.select(
        F.col(id_col).alias("id_b"), *[F.col(k).alias(f"{k}_b") for k in pair_keys],
        F.col(len_col).alias("len_b"), "tok", F.col("band").alias("band_b"),
    )
    cond = [a.tok == b.tok, a.band_probe == b.band_b] + [
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


def edit_distance_pairs(
    docs: DataFrame,
    prefix_len: int = 12,
    max_dist: int = 2,
    bucket_chars: int = 3,
    max_bucket_size: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Edit-distance near-duplicate pairs over short keys (title /
    leading-prefix dedup — catches typo-level variants the token-set
    measures miss).  Key = the first ``prefix_len`` chars; candidates
    come from (first ``bucket_chars`` chars, key length) buckets, then
    ``levenshtein(k_a, k_b) <= max_dist`` verifies — both engines define
    levenshtein identically (unit-cost insert/delete/substitute).

    Recall contract (the LSH-style tradeoff, stated): pairs differing
    inside the first ``bucket_chars`` chars or in key length by more
    than 0 land in different buckets and are MISSED; buckets larger
    than ``max_bucket_size`` are dropped whole (a degenerate prefix
    would otherwise go quadratic).  Scale shape: one bucket-key shuffle;
    the quadratic step is per-bucket and capped."""
    key = F.substring(F.col(text_col), 1, prefix_len)
    t = docs.select(
        F.col(id_col).alias("_id"),
        key.alias("k"),
        F.concat(
            F.substring(key, 1, bucket_chars), F.lit("|"), F.length(key)
        ).alias("bkt"),
    )
    w = W.partitionBy("bkt")
    capped = (
        t.withColumn("bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("bsz") <= max_bucket_size)
        .drop("bsz")
    )
    a = capped.select(
        F.col("_id").alias("id_a"), F.col("k").alias("ka"), "bkt"
    )
    b = capped.select(
        F.col("_id").alias("id_b"), F.col("k").alias("kb"), "bkt"
    )
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("ka", "kb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def substring_fingerprint_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    mod: int = 8,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Exact-substring duplicate pairs: docs sharing any k-char run whose
    fingerprint survives MOD-sampling — the scalable analog of the
    suffix-array exact-substring dedup of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499), which
    a distributed engine cannot build globally.

    Content-defined sampling is the load-bearing choice: every char
    k-gram is hashed (md5_hash60 — oracle-replayable) and kept iff
    h % mod == 0, so selection depends only on the BYTES of the gram —
    two docs sharing a substring sample the SAME positions inside it
    (positional striding would misalign).  A shared run of length L
    contains L-k+1 grams and is detected with prob 1-(1-1/mod)^(L-k+1):
    ~96% at L = k+24 with mod=8, ->1 for long plagiarized runs.

    Scale shape mirrors the MinHash path: per-doc gram selection is one
    projection (higher-order functions, no UDF) fanned out across the
    session's cores (the gram/md5 plane is the cost — single-row-group
    inputs otherwise run it on one task; operators/fanout.py); one
    shuffle groups selected fingerprints; pairs expand inside each
    fingerprint bucket (collect_set bounded by max_bucket_size — a gram
    shared by everyone is boilerplate, exact_dedup territory); the pair
    count per doc pair aggregates bucket hits.  No DISTINCT pass on the
    fingerprint stream: collect_set dedups (id, h) inside the one
    groupBy — an explicit distinct() was a second corpus-sized exchange
    for results that are provably identical (r15)."""
    from ..operators.fanout import fan_out

    n = F.length(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(F.col(text_col), i, k))
    fps = (
        fan_out(df.filter(F.col(text_col).isNotNull() & (n >= k)), id_col, text_col)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, md5_hash60(F.col("g")).alias("h"))
        .filter(F.col("h") % mod == 0)
    )
    buckets = (
        fps.groupBy("h")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    pair_structs = ordered_pair_structs(
        F.col("ids"),
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")),
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
