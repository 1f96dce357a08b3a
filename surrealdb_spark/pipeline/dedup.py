"""Deduplication operators for training-data pipelines.

Tiers (each a standalone DataFrame transformation):
  * exact        — md5 fingerprint groupBy (hash-dedup)
  * jaccard      — word-set Jaccard, prefix-filtered AllPairs (exact near-dup)
  * minhash_lsh  — MinHash signatures + banded bucketing + Jaccard verify:
                   the 100 TB path (shuffle keyed on (band, bucket), no
                   full cross product)
  * simhash      — 32-plane sign fingerprint (hamming-space near-dup)

Determinism: all hashes are md5 (stable everywhere); MinHash is min-over-
md5-hex (string order), SimHash planes read hex digits of md5(word) — so an
external SQL engine reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from surrealdb_spark.pipeline.text import distinct_words, fingerprint


def doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) distinct pairs — the set representation of each doc.

    Dedup happens INSIDE the row (array_distinct before the explode), not
    with a (doc, w)-keyed ``.distinct()`` after it: the per-doc word set is
    tiny, so the set semantics cost nothing row-locally and the downstream
    consumer (simhash/minhash groupBy doc) shuffles once instead of twice
    (r12 optimization, guide §2.4 — dedup_simhash plan: 2 Exchange → 1).
    """
    return df.select(
        F.col(id_col).alias("doc"), F.explode(distinct_words(text_col)).alias("w")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: canonical (min id) per normalized-text fingerprint."""
    return (
        df.select(F.col(id_col).alias("doc"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc").alias("canonical"), F.count(F.lit(1)).alias("n_copies"))
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float,
    max_doc_freq: int | None = None, allow_quadratic: bool = False
) -> DataFrame:
    """All pairs with word-set Jaccard ≥ threshold (exact, prefix-filtered).

    O(N²)-CLASS VERIFY PRIMITIVE — refuses to run unless
    ``allow_quadratic=True``: even prefix-filtered, worst-case candidate
    count is quadratic (near-identical corpora), and the primitive is meant
    for small verify scopes.  The scale path is ``minhash_lsh_pairs``
    (banded LSH candidates, exact Jaccard re-score on candidates only).
    Candidates come from a rarity-ordered PREFIX token join (Bayardo et
    al., "Scaling Up All Pairs Similarity Search" — exact for any
    threshold, see inline proof), not the full token self-join.

    ``max_doc_freq`` prunes ultra-common words before the join — at scale
    the hot-word skew dominates; dropping words in >X% of docs is the
    standard fix (they contribute little to Jaccard discrimination anyway).
    """
    if not allow_quadratic:
        raise ValueError(
            "jaccard_pairs is an O(N²) all-pairs primitive; pass "
            "allow_quadratic=True for small verify scopes, or use "
            "minhash_lsh_pairs for the scale path"
        )
    dw = doc_words(df, id_col, text_col)
    # Prefix-filtered AllPairs (r13, Bayardo/Chaudhuri prefix principle;
    # guide §3.2 "reduce the big side before shuffling it", §8.4 "decide
    # with light rows").  Candidate generation no longer self-joins EVERY
    # (doc, word) row — only each doc's PREFIX tokens join.  Order all
    # words by global rarity (document frequency asc, word asc — a total
    # order); for J(x,y) ≥ t, |x∩y| ≥ ⌈t·|x|⌉ =: αx (t·|x∪y| ≥ t·|x|), and
    # the smallest shared word w* has ≥ αx intersection words at-or-after
    # it inside x, so w* sits within x's first |x|−αx+1 words — and
    # symmetrically within y's first |y|−αy+1.  Joining on prefix tokens
    # therefore finds EVERY qualifying pair (exact, not approximate); at
    # t = 0.99 the prefix is 1-2 rare tokens per doc instead of the whole
    # word set, and rarity-first ordering keeps per-token join groups near
    # singleton (the hot-word quadratic blow-up of the naive join is the
    # skew §2.5 warns about).  ⌈t·n⌉ is computed as ceil(t·n − 1e-9): a
    # float t·n that lands a hair ABOVE an exact integer k would otherwise
    # ceil to k+1 and shorten the prefix below the sound length — the
    # epsilon only ever lengthens the prefix (more candidates, never
    # fewer), so exactness is preserved for any threshold.
    wdf = dw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    if max_doc_freq is not None:
        # Word-level document-frequency prune (unchanged semantics); the df
        # column doubles as the rarity sort key below, computed once.
        wdf = wdf.filter(F.col("df") <= max_doc_freq)
    docs = (
        dw.join(wdf, "w")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "w"))).alias("sw"))
        .select(
            "doc",
            F.expr("transform(sw, x -> x.w)").alias("ws"),
            F.size("sw").alias("n"),
        )
        .select(
            "doc",
            "ws",
            "n",
            F.expr(
                f"slice(ws, 1, n - CAST(ceil({threshold} * n - 1e-9) AS INT) + 1)"
            ).alias("pfx"),
        )
    )
    pf = docs.select("doc", "n", F.explode("pfx").alias("w"))
    c1 = pf.select(F.col("doc").alias("id1"), F.col("n").alias("n1"), "w")
    c2 = pf.select(F.col("doc").alias("id2"), F.col("n").alias("n2"), "w")
    # Size-compatibility inside the token join (J ≤ min|set|/max|set|, so a
    # size ratio below t can never qualify), then one distinct over the few
    # surviving candidates (a pair can share several prefix tokens).
    cand = (
        c1.join(c2, "w")
        .filter(
            (F.col("id1") < F.col("id2"))
            & (
                F.least("n1", "n2").cast("double")
                >= F.lit(threshold) * F.greatest("n1", "n2").cast("double")
            )
        )
        .select("id1", "id2", "n1", "n2")
        .distinct()
    )
    # Exact verify on the candidates only: word arrays ride one row per doc
    # (same shape as minhash_lsh_pairs' verify); ws is built from the SAME
    # dw rows the old explode-join counted (max_doc_freq filtering
    # included), so size(array_intersect) ≡ the old per-pair join count and
    # the jaccard division sees identical operands — bit-identical output.
    wsets = docs.select("doc", "ws")
    return (
        cand.join(
            wsets.select(F.col("doc").alias("id1"), F.col("ws").alias("ws1")), "id1"
        )
        .join(wsets.select(F.col("doc").alias("id2"), F.col("ws").alias("ws2")), "id2")
        .select(
            "id1",
            "id2",
            "n1",
            "n2",
            F.size(F.array_intersect("ws1", "ws2")).alias("c"),
        )
        .select(
            "id1",
            "id2",
            (
                F.col("c").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("c")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(dw: DataFrame, n_hashes: int) -> DataFrame:
    """(doc, seed, minhash): min of md5("seed|word") per doc per seed.

    Min-over-md5-hex is a valid MinHash family (each seed permutes the word
    universe independently); hex-string min is engine-portable.

    Shape (r12, guide §2.3 "shuffle fewer bytes"): one MIN aggregate per
    seed over a single groupBy(doc) — the old form exploded every (doc, w)
    row ×n_hashes and shuffled the seeded tokens to a (doc, seed) grouping,
    i.e. n_hashes× the shuffle rows and an extra exchange, for the same
    minima.  Map-side partial MIN now reduces each doc's tokens before any
    shuffle.  (sf0.1: dedup_minhash_lsh 36 s → see OPTIMIZATION_r12.md.)
    The (doc, seed, mh) long shape is restored with one stack() for
    callers; values are bit-identical (min over the same md5 set).
    """
    wide = dw.groupBy("doc").agg(
        *[
            F.min(F.md5(F.concat_ws("|", F.lit(str(s)), F.col("w")))).alias(f"mh{s}")
            for s in range(n_hashes)
        ]
    )
    stack = ", ".join(f"{s}, mh{s}" for s in range(n_hashes))
    return wide.selectExpr(
        "doc", f"stack({n_hashes}, {stack}) AS (seed, mh)"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified.

    shingle→minhash→band→bucket-join: docs sharing ANY band bucket are
    candidates; candidates are verified with exact word-set Jaccard and
    filtered by ``threshold``.  Only candidate pairs ever join on words, so
    the full cross product never materializes — the LSH contract.
    """
    rows = n_hashes // bands
    dw = doc_words(df, id_col, text_col)
    # Wide per-doc signature (one groupBy(doc), map-side partial MIN — see
    # minhash_signatures), banded directly from the n_hashes min columns:
    # no seeded explode, no (doc, seed) shuffle, no second (doc, band)
    # aggregation.  Bucket strings identical to the old collect_list path
    # (mh values concatenated in seed order).
    wide = dw.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.min(F.md5(F.concat_ws("|", F.lit(str(s)), F.col("w")))).alias(f"mh{s}")
            for s in range(n_hashes)
        ]
    )
    band_hashes = ", ".join(
        "xxhash64(concat_ws(',', {cols}))".format(
            cols=", ".join(f"mh{s}" for s in range(b * rows, (b + 1) * rows))
        )
        for b in range(bands)
    )
    # Each bucket row carries the doc's FULL per-band bucket-hash array so
    # the join can test earlier bands in-row (see cand below).  64-bit
    # xxhash64 of the bucket string replaces the ~100-byte md5-concat
    # string as both join key and equality probe (guide §2.3 narrower
    # shuffle keys); a hash collision only ever ADDS a candidate pair
    # (verify filters it), never drops one — the emission rule uses the
    # same hashed values on both sides.
    buckets = wide.selectExpr(
        "doc", "n", f"array({band_hashes}) AS __bh"
    ).selectExpr("doc", "n", "__bh", "posexplode(__bh) AS (band, bh)")
    b1 = buckets.select(F.col("doc").alias("id1"), F.col("n").alias("n1"),
                        F.col("__bh").alias("__bh1"), "band", "bh")
    b2 = buckets.select(F.col("doc").alias("id2"), F.col("n").alias("n2"),
                        F.col("__bh").alias("__bh2"), "band", "bh")
    # Size-compatibility prefilter (r12): J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
    # so a pair whose set sizes differ by more than the threshold ratio can
    # NEVER qualify — drop it straight out of the bucket join, before the
    # candidate distinct and the word joins.  The banding threshold curve
    # ((1/b)^(1/r) ≈ 0.63 at 4×3) admits far more candidates than a 0.99
    # verify keeps; measured at sf0.1 this cut the verify join input from
    # ~166M rows to the near-dup survivors (results identical: only
    # provably-sub-threshold pairs are dropped).  |set| rides the same
    # signature aggregation (one more count per doc) — no size table, no
    # corpus-sized broadcast (guide §3.1).
    # First-matching-band emission (r13): a pair is emitted ONLY from the
    # lowest band where its buckets agree — earlier-band equality rejects
    # re-emissions — so each candidate pair appears exactly once and the
    # r12 shape's pair-level `.distinct()` (a full extra Exchange over
    # every candidate row) disappears.  Same pairs:
    # emitted-at-first-band ≡ distinct-over-all-bands.
    # The predicate is UNROLLED to scalar comparisons (band = i OR
    # bh1[i] != bh2[i] nesting): the earlier exists(zip_with(slice, slice))
    # form allocated three transient arrays per joined bucket row, and at
    # the 10x layout the bucket self-join streams tens of millions of rows
    # through this filter — the unroll cut the candidate stage 9.7 → 2.4 s
    # at sf1 with the identical 6,897,390-candidate output (same
    # first-match semantics: C(band) = AND_{i<band} bh1[i] != bh2[i]).
    first_band = "true"
    for i in range(bands - 2, -1, -1):
        first_band = f"(band = {i} OR (__bh1[{i}] != __bh2[{i}] AND {first_band}))"
    cand = (
        b1.join(b2, ["band", "bh"])
        .filter(
            (F.col("id1") < F.col("id2"))
            & (
                F.least("n1", "n2").cast("double")
                >= F.lit(threshold) * F.greatest("n1", "n2").cast("double")
            )
            & F.expr(first_band)
        )
        .select("id1", "id2", "n1", "n2")
    )
    # Exact-Jaccard verify via per-doc word ARRAYS (r13, guide §2.3/§8:
    # decide with light rows, never expand).  The old verify exploded every
    # candidate by id1's word list and equi-joined id2's words — candidates
    # × words joined rows (1.6B at the 10x layout, where the fixed 4×3
    # banding admits ~32M candidates for ~356k survivors).  Each doc's word
    # set instead rides ONE row (the same distinct_words array doc_words
    # explodes), attached to the candidate pair by two joins on narrow
    # rows, and the intersection is counted in-row.  doc_words is distinct
    # per doc, so size(array_intersect(ws1, ws2)) ≡ the old equi-join
    # count, and jaccard = c/(n1+n2-c) sees identical operands —
    # bit-identical output (verified: same pair set at sf0.1 and on the
    # oracle).  The word-array side is corpus-sized (broadcastable here;
    # at scale the planner shuffles candidates + arrays once — still
    # strictly fewer bytes than the candidate×words expansion).
    ws = df.select(F.col(id_col).alias("doc"), distinct_words(text_col).alias("ws"))
    return (
        cand.join(ws.select(F.col("doc").alias("id1"), F.col("ws").alias("ws1")),
                  "id1")
        .join(ws.select(F.col("doc").alias("id2"), F.col("ws").alias("ws2")),
              "id2")
        .select(
            "id1",
            "id2",
            "n1",
            "n2",
            F.size(F.array_intersect("ws1", "ws2")).alias("c"),
        )
        .select(
            "id1",
            "id2",
            (
                F.col("c").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("c")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash(df: DataFrame, id_col: str, text_col: str, n_planes: int = 32) -> DataFrame:
    """(doc, simhash): sign fingerprint over ``n_planes`` ≤ 32 hyperplanes.

    Plane j's projection of word w is +1 if hex digit j of md5(w) has its
    top bit set, else −1; the fingerprint bit is the sign of the sum over
    the doc's word set.  Integer sums → order-independent and portable.
    """
    dw = doc_words(df, id_col, text_col)
    # Bit j of the fingerprint is set iff Σ±1 ≥ 0 ⇔ 2·Σbit_j ≥ n, where
    # bit_j is the top bit of md5 hex digit j.  Decode md5 into four 32-bit
    # chunks ONCE per word (a shared projection), then each aggregate is a
    # shift+mask — vs 32 per-plane substring+isin trees, which made Catalyst
    # analysis dominate the first run (bench: 7.9 s → ~3 s at sf0.1).
    h = F.md5(F.col("w"))
    chunked = dw.select(
        "doc",
        *[F.conv(F.substring(h, 8 * c + 1, 8), 16, 10).cast("bigint").alias(f"h{c}")
          for c in range((n_planes + 7) // 8)],
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(n_planes):
        chunk, shift = j // 8, 4 * (7 - j % 8) + 3
        aggs.append(
            F.sum(F.shiftright(F.col(f"h{chunk}"), shift).bitwiseAND(F.lit(1)))
            .alias(f"s{j}")
        )
    sums = chunked.groupBy("doc").agg(*aggs)
    bits = [
        F.when(2 * F.col(f"s{j}") >= F.col("n"), F.lit("1")).otherwise(F.lit("0"))
        for j in range(n_planes)
    ]
    return sums.select("doc", F.concat(*bits).alias("simhash"))
