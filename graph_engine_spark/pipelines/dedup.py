"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:
  * exact: sha256 group-by — one hash aggregation, map-side combine.
  * minhash LSH: shingle → minhash signature (vectorized, JVM-side
    hash/aggregate — no Python) → band buckets → candidate pairs from
    bucket join → Jaccard verify. The band join is an equi-join on
    (band, bucket-hash): at 100 TB this is THE way to avoid the O(n²)
    pair space; bucket sizes bound the quadratic blow-up per key.
  * simhash: 64-bit signature from md5(token) bit-votes; near-dups =
    signatures at small Hamming distance found via band equi-join on
    16-bit chunks (Charikar'02 / Manku et al.'07 pattern).
  * n-gram Jaccard: explicit pairwise verify for a candidate set.
  * embedding cosine: see similarity.py.

Hashing is selectable per call: hash_mode="md5" (default) derives every
hash from md5 so each operator has a bit-identical DuckDB oracle — the
correctness-gate mode; hash_mode="xxhash64" swaps in Spark's native
xxhash64 (same plan, same 60-bit mix family, ~an order of magnitude
cheaper per shingle) for production corpus-scale runs.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

_MASK60 = (1 << 60) - 1


def _md5_long(c: Column, salt: int) -> Column:
    """Deterministic 60-bit integer hash from md5 — reproducible in any
    engine with md5 + hex parse (DuckDB oracle-compatible)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(salt) + ":"), c).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")


def _base_hash(c: Column, salt: int, hash_mode: str) -> Column:
    """60-bit base hash for the minhash/simhash families.

    hash_mode="md5": md5-derived (bit-identical DuckDB oracle — the
    correctness-gate mode). hash_mode="xxhash64": Spark's native
    xxhash64 masked to 60 bits — same downstream mix arithmetic, ~10×
    cheaper per shingle; the production mode for corpus-scale runs
    where no cross-engine oracle is replayed."""
    if hash_mode == "xxhash64":
        return F.xxhash64(F.concat(F.lit(str(salt) + ":"), c)).bitwiseAND(
            F.lit(_MASK60)
        )
    if hash_mode == "md5":
        return _md5_long(c, salt)
    raise ValueError(f"unknown hash_mode {hash_mode!r} (md5|xxhash64)")


_MASK30 = (1 << 30) - 1


def mix_constants(i: int) -> tuple[int, int, int]:
    """Deterministic split-mix constants for hash family member i —
    driver-side Python (sha256 of the index), identical in the engine
    and in any oracle that imports this function."""
    import hashlib

    h = hashlib.sha256(f"minhash:{i}".encode()).digest()
    a = (int.from_bytes(h[0:4], "big") & ((1 << 29) - 1)) | 1
    b = (int.from_bytes(h[4:8], "big") & ((1 << 29) - 1)) | 1
    c = int.from_bytes(h[8:15], "big") & ((1 << 56) - 1)
    return a, b, c


def mix_hash(base: Column, i: int) -> Column:
    """Affine split-mix of a 60-bit base hash: family member i is
    a_i·(H>>30) + b_i·(H&mask30) + c_i. All terms stay below 2^61, so
    the arithmetic never overflows a signed 64-bit integer — the same
    expression is exact in Spark longs and DuckDB BIGINTs (no engine-
    specific wraparound semantics to reconcile). One md5 per input row
    serves the whole hash family (8-32x less hashing than salted md5)."""
    a, b, c = mix_constants(i)
    return (
        F.lit(a) * F.shiftright(base, 30)
        + F.lit(b) * base.bitwiseAND(F.lit(_MASK30))
        + F.lit(c)
    ).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """One survivor per identical content: min(key) per sha256(text)."""
    return (
        docs.groupBy(F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha"))
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("dup_count"))
        .select(key_col, "content_sha", "dup_count")
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of whitespace/case-normalized text."""
    words = F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")
    n = F.size(words)
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 5,
    hash_mode: str = "md5",
) -> DataFrame:
    """(key, sig array<long>) minhash signature table.

    Shape: explode shingles → num_hashes md5-derived hash columns → one
    hash aggregation of mins per key. All JVM-side; the group-by gets
    map-side partial aggregation, so the shuffle carries one row per
    (key-partition, key) — the scalable formulation.

    Deliberately NOT expressed as parallel ``transform(...array_min...)``
    column expressions: composing many higher-order functions over one
    shared lambda-produced array triggers a PySpark/Catalyst lambda-
    variable collision (observed on 4.1.2: the 8 salted transforms
    cross-talk and yield partitioning-dependent garbage; regression test
    tests/test_pipelines.py::test_minhash_signature_matches_hashlib).
    """
    sh = docs.select(
        F.col(key_col).alias("key"), F.explode(shingles(F.col(text_col), k)).alias("s")
    )
    based = sh.select("key", _base_hash(F.col("s"), 0, hash_mode).alias("H"))
    hashed = based.select(
        "key", *[mix_hash(F.col("H"), i).alias(f"h{i}") for i in range(num_hashes)]
    )
    agg = hashed.groupBy("key").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "key", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    hash_mode: str = "md5",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded minhash.

    max_bucket_size is the degenerate-bucket guard — standard big-corpus
    MinHash hygiene: a bucket shared by m documents contributes m²/2
    pairs to the self-join, and real corpora always contain boilerplate/
    near-empty documents that collapse into one signature (an LSH bucket
    of 10^6 empty docs is 5·10^11 pairs from one key). Buckets larger
    than the cap are dropped from candidate generation — their members
    can still pair through their other (bands−1) buckets — and the drop
    is logged with the bucket count so recall loss is observable. None
    disables the guard (the correctness-gate configuration, where the
    DuckDB oracle replays the identical uncapped join).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, key_col, num_hashes, k, hash_mode)
    banded = sig.select(
        "key",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(
                    "_", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        # localCheckpoint, NOT persist: the banded table is read three
        # times (cap scan + both sides of the self-join), so it must be
        # materialized once — but df.persist() registers in the session
        # CacheManager and, with the result returned lazily, nothing
        # ever unpersists it (round-2 leak: every capped call in a
        # long-lived session accumulated two cached tables). An eager
        # local checkpoint materializes the same blocks while staying
        # OUT of the CacheManager; the ContextCleaner frees them as
        # soon as the caller drops the returned plan. over_cap is a
        # tiny agg over the checkpointed blocks — recomputing it twice
        # is cheaper than owning another cache entry.
        banded = banded.localCheckpoint(eager=True)
        over_cap = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket_size)
        )
        drop_stats = over_cap.agg(
            F.count("*").alias("n_buckets"), F.max("n").alias("worst")
        ).first()
        if drop_stats["n_buckets"]:
            logger.warning(
                "minhash_lsh: dropping %d degenerate bucket(s) over cap %d "
                "(largest holds %d keys) — members still pair via their "
                "other bands",
                drop_stats["n_buckets"],
                max_bucket_size,
                drop_stats["worst"],
            )
        banded = banded.join(over_cap.select("band", "bucket"), ["band", "bucket"], "left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact Jaccard over word k-shingles for candidate pairs
    (key_a, key_b) — the verify stage after LSH blocking."""
    sh = docs.select(
        F.col(key_col).alias("key"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("key", "key_a").withColumnRenamed("sh", "sh_a"), "key_a")
        .join(sh.withColumnRenamed("key", "key_b").withColumnRenamed("sh", "sh_b"), "key_b")
        .select(
            "key_a",
            "key_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )


def simhash_table(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = 32,
    hash_mode: str = "md5",
) -> DataFrame:
    """Simhash signatures (Charikar'02): per-token md5-derived hash bits
    vote +1/-1 per position; the signature packs the positive votes.

    Spark shape: explode distinct tokens → one hash aggregation per doc
    with `bits` conditional sums (map-side combine; no UDF, no window).
    Near-dup search = band equi-join on signature chunks (Manku'07).
    """
    tokens = docs.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", " ")), r"\s+"),
                    lambda t: t != "",
                )
            )
        ).alias("token"),
    ).withColumn("h", _base_hash(F.col("token"), 1, hash_mode))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i) % 2 == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tokens.groupBy("key").agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select(F.col("key").alias(key_col), sig.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    hash_mode: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs by simhash Hamming distance ≤ max_hamming —
    the Manku et al. (WWW'07) banded search, not an all-pairs scan.

    Pigeonhole: split the signature into (max_hamming+1) chunks; any
    two signatures within Hamming distance h must agree EXACTLY on at
    least one chunk. Candidate generation is therefore an equi-join on
    (chunk index, chunk value) — worst key is one chunk bucket, never
    the corpus — followed by an exact popcount(xor) verify. Returns
    (key_a, key_b, hamming) with key_a < key_b.
    """
    n_chunks = max_hamming + 1
    width = bits // n_chunks
    sig = simhash_table(docs, text_col, key_col, bits, hash_mode).select(
        F.col(key_col).alias("key"), "simhash"
    )
    chunk_cols = []
    for c in range(n_chunks):
        lo = c * width
        w = bits - lo if c == n_chunks - 1 else width  # last chunk takes remainder
        chunk_cols.append(
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", lo).bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
            )
        )
    chunked = sig.select(
        "key", "simhash", F.explode(F.array(*chunk_cols)).alias("c")
    ).select("key", "simhash", "c.chunk", "c.val")
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    hash_mode: str = "md5",
    chunk_positions: int = 65_536,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every character k-gram of the normalized
    text, slide a window of `window` consecutive k-gram hashes, keep
    each window's minimum, dedupe. Guarantees any shared substring of
    length ≥ k + window − 1 yields at least one shared fingerprint.

    Returns (key, fingerprint) exploded rows.

    Shape: k-grams are POSEXPLODED to rows and the per-window minimum is
    a running `min() OVER (ROWS BETWEEN CURRENT AND window-1 FOLLOWING)`
    — one pass, linear work. (The tempting all-array formulation —
    transform over sequence with array_min(slice(...)) — inlines the
    whole upstream expression tree into every window position after
    projection collapse, exploding codegen to O(len²) per document;
    measured 40 s for 20 documents vs sub-second here.)

    The running-min window partitions by (key, CHUNK), not key alone:
    gram positions are segmented into ``chunk_positions``-sized chunks,
    with the first window−1 positions of each chunk replicated into the
    previous one so every in-chunk window start sees its full lookahead.
    A crawl-scale 10 MB document therefore spreads over ~160 tasks
    instead of serializing ~10 M one-window rows into one (round-2
    weak point); fingerprints are bit-identical to the unchunked form
    (the overlap preserves every window, the guard below drops the
    replicated context rows from being window STARTS twice). Valid
    window starts come from the precomputed per-document gram count —
    no per-key max() window, which was itself a one-task-per-document
    serialization.
    """
    from pyspark.sql import Window as W

    C = max(int(chunk_positions), window)
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    n = F.length(norm)
    n_grams = F.when(n < k, F.lit(1)).otherwise(n - k + 1)
    # Gram extraction is O(k·n) per document: split to a char array
    # ONCE, then zip k shifted slices so element j of the zipped array
    # is exactly gram j, and concat each struct's k fields. The naive
    # form — transform(sequence(1, n-k+1), i -> norm.substr(i, k)) —
    # inlines the WHOLE norm subtree (a regexp_replace over the full
    # text) into the lambda, re-evaluating it per array element:
    # O(n²) with a regex constant (a 22 KB document stalled an
    # executor for minutes; the short sf0.01 oracle docs merely hid
    # it). substr is also an O(position) codepoint scan on UTF8String,
    # a second quadratic term the array slices avoid.
    chars = F.split(norm, "")
    zipped = F.arrays_zip(*[F.slice(chars, i + 1, n_grams) for i in range(k)])
    grams = F.when(n < k, F.array(norm)).otherwise(
        F.transform(
            zipped, lambda s: F.concat_ws("", *[s[str(i)] for i in range(k)])
        )
    )
    pos_grams = docs.select(
        F.col(key_col).alias("key"),
        F.posexplode(grams).alias("pos", "g"),
    )
    hashed = pos_grams.select(
        "key", "pos", _base_hash(F.col("g"), 2, hash_mode).alias("h")
    )
    own_chunk = F.floor(F.col("pos") / C).cast("int")
    # head-of-chunk rows double as tail context for the previous chunk
    chunk_ids = F.when(
        (F.col("pos") >= C) & (F.col("pos") % C < window - 1),
        F.array(own_chunk, own_chunk - 1),
    ).otherwise(F.array(own_chunk))
    chunked = hashed.select("key", "pos", "h", F.explode(chunk_ids).alias("_chunk"))
    run = W.partitionBy("key", "_chunk").orderBy("pos").rowsBetween(0, window - 1)
    per_chunk = W.partitionBy("key", "_chunk")
    mins = chunked.select(
        "key",
        "pos",
        "_chunk",
        F.min("h").over(run).alias("fingerprint"),
        F.max("pos").over(per_chunk).alias("_mx"),
    )
    # Valid window starts: globally pos ≤ n_grams−window, expressed PER
    # CHUNK as pos ≤ max(pos)−window+1 over (key, chunk). The overlap
    # construction makes the two identical: every non-last chunk's max
    # extends exactly window−1 context positions past its own range (so
    # all its own starts pass), while the last chunk's max is the
    # document end (so its final window−1 starts fail) — including the
    # boundary case where the document ends inside the context range.
    # Deriving validity from the partition max keeps the plan free of
    # any per-row document-level expression: carrying a computed
    # n_grams column through the explode lets CollapseProject inline
    # its defining regexp_replace(text) subtree into the filter,
    # re-running a full-document regex PER GRAM ROW — measured 39 s of
    # a 48 s total on 8×22 KB docs. The per-chunk max shares the min's
    # partitioning (no extra shuffle, chunk-bounded sort).
    return (
        mins.filter(
            # context rows replicated from the next chunk are lookahead
            # only, never window starts of this chunk
            (F.floor(F.col("pos") / C).cast("int") == F.col("_chunk"))
            # greatest(...,0): a document shorter than window keeps its
            # clipped pos-0 window
            & (F.col("pos") <= F.greatest(F.col("_mx") - window + 1, F.lit(0)))
        )
        .select("key", "fingerprint")
        .distinct()
    )
