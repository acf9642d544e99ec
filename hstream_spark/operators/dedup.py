"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

LLM-data-pipeline extensions (no counterpart in the reference). The
scale story, per operator:

- **exact**: hash-groupBy on md5(text) — one shuffle keyed by a 128-bit
  digest (no skew: digests are uniform), map-side combine.
- **minhash_lsh**: shingle → 31-bit hash → k permutations → band
  signatures. Candidate generation is a self-join on (band, signature)
  — i.e. a shuffle keyed by the band bucket, which is the whole point
  of LSH: at 100 TB the candidate set is ~linear in the number of true
  near-dups, never O(n²). Verification re-computes exact Jaccard only
  for candidates.
- **simhash**: 32-bit signature per doc via bitwise majority vote of
  token hashes (explode + 32 conditional sums, map-side combined);
  near-dup pairs block on 8-bit bands (Hamming ≤ 3 ⇒ at least one of
  four bands equal) then filter by bit_count(xor) — again shuffle only
  on small band keys.
- **ngram_jaccard**: exact word-bigram Jaccard within explicit blocks
  (e.g. same language) — the brute-force baseline; quadratic within a
  block, so blocks must be bounded (LSH is the scale path).

All hashing is md5-derived (engine-agnostic, reproducible) — see
operators/text.py. Everything is Catalyst expressions; no Python UDFs.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hstream_spark.operators.text import P31, token_hash, tokens

# Deterministic MinHash permutation parameters: perm i maps h to
# (A_i * h + B_i) mod P31 with odd multipliers.
MINHASH_PERMS = 16
BANDS = 4
ROWS_PER_BAND = MINHASH_PERMS // BANDS


def _perm_a(i: int) -> int:
    return 2 * i + 1


def _perm_b(i: int) -> int:
    return (7919 * (i + 1)) % P31


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: digest, representative (min id),
    count. Only groups with >1 member are duplicates."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (space-joined token windows)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + 1 + k) for k in range(n)]),
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 31-bit shingle hashes per document."""
    return F.array_distinct(F.transform(shingles(text, n), token_hash))


def minhash_signature(text: Column, n: int = 3, perms: int = MINHASH_PERMS) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    (A_i*h + B_i) mod P31. Empty shingle set → P31 sentinel."""
    hashes = shingle_hashes(text, n)

    def _permed(a: int, b: int):
        # factory so the pyspark lambda keeps a single-arg signature
        return F.transform(hashes, lambda h: (h * a + b) % P31)

    sig = []
    for i in range(perms):
        permed = _permed(_perm_a(i), _perm_b(i))
        sig.append(F.coalesce(F.array_min(permed), F.lit(P31)).alias(f"mh{i}"))
    return F.array(*sig)


def minhash_bands(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """(doc_id, band, signature-string) — the LSH bucketing key."""
    sig = minhash_signature(F.col(text_col), n)
    d = docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))
    bands = []
    for b in range(BANDS):
        lo = b * ROWS_PER_BAND
        parts = [F.element_at(F.col("sig"), lo + r + 1) for r in range(ROWS_PER_BAND)]
        bands.append(
            d.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("-", *[p.cast("string") for p in parts]).alias("band_sig"),
            )
        )
    return _reduce(DataFrame.unionByName, bands)


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct candidate pairs sharing at least one band signature."""
    b = minhash_bands(docs, text_col, id_col, n)
    left = b.select(F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_a"))
    right = b.select(F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for the given candidate pairs.

    Set algebra on sorted hash arrays: |∩| via array_intersect on
    distinct hashes; |∪| = |A| + |B| − |∩|.
    """
    sets = docs.select(F.col(id_col).alias("doc_id"),
                       shingle_hashes(F.col(text_col), n).alias("hs"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size(F.col("hs_a")) + F.size(F.col("hs_b")) - inter
    return joined.select(
        "doc_a",
        "doc_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.5,
                            text_col: str = "text", id_col: str = "doc_id",
                            n: int = 3) -> DataFrame:
    """Full MinHash-LSH pipeline: bucket → candidates → verify ≥ threshold."""
    cands = minhash_candidate_pairs(docs, text_col, id_col, n)
    verified = jaccard_pairs(docs, cands, text_col, id_col, n)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: majority vote per bit over token
    hashes (+1 if bit set, −1 otherwise; bit set in signature iff sum>0).

    explode → conditional sums is one shuffle on doc_id with map-side
    partial aggregation; signature assembly is a projection.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(tokens(F.col(text_col)), token_hash)).alias("h"),
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sig = _reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ],
    )
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming, blocked on 8-bit bands.

    With 4 bands and Hamming ≤ 3, pigeonhole guarantees an equal band,
    so blocking loses no true pair while keeping the join keyed.
    """
    sh = simhash(docs, text_col, id_col)
    banded = []
    for band in range(4):
        key = F.shiftright(F.col("simhash"), band * 8).bitwiseAND(F.lit(255))
        banded.append(sh.select("doc_id", "simhash", F.lit(band).alias("band"), key.alias("bkey")))
    b = _reduce(DataFrame.unionByName, banded)
    left = b.select("band", "bkey", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    right = b.select("band", "bkey", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def ngram_jaccard_pairs(docs: DataFrame, block_cols: list[str], threshold: float = 0.3,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 2) -> DataFrame:
    """Exact word-n-gram Jaccard over all pairs within a block.

    Brute-force baseline: O(block²) — callers must bound block size
    (use minhash_near_duplicates for unblocked corpora).
    """
    sets = docs.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("doc_id"),
        shingle_hashes(F.col(text_col), n).alias("hs"),
    )
    a = sets.select(*block_cols, F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = sets.select(*block_cols, F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    joined = a.join(b, block_cols).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size(F.col("hs_a")) + F.size(F.col("hs_b")) - inter
    jac = inter.cast("double") / union.cast("double")
    return joined.select(*block_cols, "doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )
