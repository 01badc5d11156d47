"""Deduplication family (north-star LLM-pipeline operators).

Exact (key + content-hash), MinHash+LSH fuzzy, SimHash hamming, blocked
character-n-gram Jaccard, and embedding-cosine near-dup — each expressed
as the composition a 100 TB corpus run needs:

* candidate generation is ALWAYS an equality join on a bounded blocking
  key (LSH band bucket, SimHash band, length bucket, coarse label) —
  never a cartesian product;
* the exact verify step (true Jaccard / cosine) runs only on candidate
  pairs;
* everything is `pyspark.sql.functions` composition — no UDFs, no
  collect(), shuffle keys explicit in the plan.

Portable polynomial hashes keep every query DuckDB-oracle-checkable; the
production tier swaps in ``xxhash64`` with the identical pipeline shape
(see ``hadoop_fs_ceph_spark.functions``). The reference repo has no
dedup analog (it is a FileSystem connector, SURVEY.md §0); these
operators are the engine layer above it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.barrier import eager_barrier
from hadoop_fs_ceph_spark.functions.similarity import (
    N_BANDS,
    ROWS_PER_BAND,
    cosine,
    sql_cosine,
    band_hash,
    minhash_signature,
    simhash,
    sql_band_hash,
    sql_minhash_signature,
    sql_simhash,
)
from hadoop_fs_ceph_spark.functions.text import (
    hashed_shingles,
    poly_hash,
    sql_hashed_shingles,
    sql_poly_hash,
    sql_token_hashes,
    tokens,
)
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t

# Shared SQL fragment (single source for query + oracle parity).
_SQL_TOK = "string_split(text, chr(32))"


@query(
    "dedup_exact_keep_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("dedup", "exact", "window"),
)
def dedup_exact_keep_latest(spark, sf_dir):
    """Exact dedup by key with keep-latest semantics: one surviving row
    per user_id (newest ts, event_id as the deterministic tie-break) —
    the `dropDuplicates`-with-an-ordering-contract shape, done as a
    ranking window so the survivor is well-defined at any parallelism."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "dedup_exact_content",
    oracle=f"""
    SELECT {sql_poly_hash("text")} AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper
    FROM documents
    GROUP BY content_hash
    """,
    tags=("dedup", "exact", "hash"),
)
def dedup_exact_content(spark, sf_dir):
    """Exact content dedup: group documents by full-text hash, keep the
    lowest doc_id. One shuffle on the hash; at 100 TB the hash (8 bytes)
    replaces the document text as the shuffle key."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(poly_hash(F.col("text")).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
    )


def _minhash_docs(spark, sf_dir, cap=None):
    """documents → (doc_id, sh: distinct 3-word shingles, sig: MinHash-16).

    Built as *stacked projections* so Catalyst keeps each expensive alias a
    single computed column (CollapseProject only inlines cheap or
    single-use aliases): the shingle set and the hash array are computed
    once per document, and the 16 signature slots read the hash array —
    not 16 inlined copies of the whole pipeline. The result is persisted
    because the LSH plan references it four times (both sides of the band
    self-join + the two verify joins); without it Spark would recompute
    the signature pipeline per reference. At production scale this
    materialization is the "signatures table" of a dedup run."""
    d = t(spark, sf_dir, "documents")
    if cap is not None:
        # bound BEFORE the shingle/signature pipeline: persist() below is
        # an optimizer barrier, so a filter above it would still tokenize
        # and MinHash-sign the whole corpus
        d = d.filter(F.col("doc_id") < cap)
    # NOT spread with a pre-pipeline repartition (the dedup_simhash /
    # record-linkage fix): that exchange would carry the raw text column —
    # at scale a full-corpus shuffle with no quadratic fan-out downstream
    # to amortize it (banding bounds the pair stream), and the local A/B
    # measured a wash (LSH heads within noise, keeper −25% only).
    return (
        d.select("doc_id", F.transform(tokens("text"), lambda s: poly_hash(s)).alias("th"))
        .select("doc_id", F.array_distinct(hashed_shingles(F.col("th"), 3)).alias("sh"))
        .select(
            "doc_id",
            "sh",
            F.size("sh").alias("n_sh"),
            minhash_signature(F.col("sh")).alias("sig"),
        )
        .persist()
    )


def _bands(docs):
    """(doc_id, band, bh): the N_BANDS slim banding rows per signature —
    the ONE construction every MinHash-LSH candidate stage joins on (a
    banding retune edits this helper plus the SQL template, nothing
    else)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_hash(F.col("sig"), b).alias("bh"))
                for b in range(N_BANDS)
            ])
        ).alias("k"),
    ).select("doc_id", "k.band", "k.bh")


def _pair_sides(docs):
    """Left/right aliases of the signature relation for pair-verify
    joins: (doc_a, sh_a, na) and (doc_b, sh_b, nb)."""
    x = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    y = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    return x, y


_SQL_MINHASH_DOCS = f"""
    SELECT doc_id, sh, {sql_minhash_signature("sh")} AS sig
    FROM (
      SELECT doc_id, list_distinct({sql_hashed_shingles("th")}) AS sh
      FROM (
        SELECT doc_id, {sql_token_hashes(_SQL_TOK)} AS th FROM documents
      )
    )
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.sh, y.sh))
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
      FROM cand c
      JOIN docs x ON x.doc_id = c.doc_a
      JOIN docs y ON y.doc_id = c.doc_b
    ) WHERE jaccard >= 0.8
    """,
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark, sf_dir):
    """Fuzzy dedup, the full MinHash+LSH pipeline: per-token hash (one
    char-level fold over the text) → 3-gram shingle hashes (3 integer ops
    each — never re-hashing the tripled shingle text) → 16-hash MinHash
    signature → 4 bands × 4 rows → candidate pairs via equality join on
    (band, band-hash) → exact hashed-shingle-set Jaccard verify at ≥ 0.8
    (int-set intersection, the standard hashed-shingle formulation).

    Scale shape: the bands relation is (doc_id, band, hash) — 4 slim rows
    per document; candidates come from a shuffle on the band hash, so the
    all-pairs blowup is bounded by bucket sizes. Only candidate pairs
    (≪ n²) ever touch the shingle arrays again, via two hash joins back
    to the signature relation."""
    docs = _minhash_docs(spark, sf_dir)
    bands = _bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x, y = _pair_sides(docs)
    # |A∩B| / (|A| + |B| - |A∩B|): one array op per pair (the union array
    # is never materialized — set sizes are exact ints, so the jaccard
    # double is bit-identical to the intersect/union form)
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
            "na",
            "nb",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


_SQL_SIMHASH_DOCS = f"""
    SELECT doc_id,
           {sql_simhash(f"list_transform(list_distinct({_SQL_TOK}), s -> {sql_poly_hash('s')})")} AS sim
    FROM documents
"""


@query(
    "dedup_simhash",
    oracle=f"""
    WITH docs AS ({_SQL_SIMHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, sim, {b} AS band, (sim >> {4 * b}) & 15 AS nib FROM docs" for b in range(4))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.sim, b.sim)) AS hamming
      FROM bands a JOIN bands b ON a.band = b.band AND a.nib = b.nib
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup: 16-bit majority-vote fingerprint over distinct
    token hashes; candidates share at least one 4-bit band (pigeonhole:
    hamming ≤ 3 over 4 bands guarantees a clean band), verified by
    popcount(xor) ≤ 3.

    Scale note: expected band-bucket population is n / 2^band_bits, so
    band width must GROW with the corpus (here 4 bits for 500–5000 docs;
    a 64-bit simhash with 16-bit bands at warehouse scale — the
    permuted-prefix-table formulation of Manku et al.'s web dedup).
    Band width is the knob that keeps the candidate join sub-quadratic;
    the fingerprint stays one BIGINT however wide the input."""
    d = t(spark, sf_dir, "documents")
    # Round-12 (guide §1.2 per-row work, measured): the token-hash array
    # is lambda-bound (transform over a 1-element array) so it evaluates
    # ONCE per document. As a separate select it was CollapseProject-ed
    # back into simhash's 16 per-bit votes, re-running the whole
    # per-char poly_hash fold over every token 16× per doc — 8.4 s at
    # sf0.1 for 5000 docs on the single-file scan; bound once, 2.0 s.
    docs = (
        d.select(
            "doc_id",
            F.element_at(
                F.transform(
                    F.array(
                        F.transform(
                            F.array_distinct(tokens("text")), lambda s: poly_hash(s)
                        )
                    ),
                    lambda th: simhash(th),
                ),
                1,
            ).alias("sim"),
        )
        # One hash exchange spreads the single-file scan across executor
        # cores BEFORE the band self-join: the broadcast join preserves
        # its streamed side's layout, so without this the ~19M joined
        # pairs and their pair-grain partial aggregation all ran in ONE
        # task (16.5 s of the 8.4 s cold / measured in isolation).
        # defaultParallelism is cluster-derived, not a local constant.
        .repartition(max(8, spark.sparkContext.defaultParallelism), "doc_id")
        .persist()  # referenced by both sides of the band self-join
    )
    bands = docs.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("sim", 4 * b).bitwiseAND(F.lit(15)).alias("nib"),
                )
                for b in range(4)
            ])
        ).alias("k"),
    ).select("doc_id", "sim", "k.band", "k.nib")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.nib") == F.col("b.nib")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, length(text) - 3),
                           i -> text[i : i + 3])) AS g
      FROM documents
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.g, y.g))
               / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) AS jaccard
      FROM cand c
      JOIN grams x ON x.doc_id = c.doc_a
      JOIN grams y ON y.doc_id = c.doc_b
    ) WHERE jaccard >= 0.5
    """,
    tags=("dedup", "ngram", "jaccard"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Character-4-gram Jaccard near-dup: candidates from the MinHash-LSH
    bands (reusing the persisted signature relation — bounded bucket
    sizes at ANY corpus size), verified with the exact char-gram metric.
    Complements dedup_minhash_lsh by verifying on a different similarity
    granularity (character-level catches word-reordering edits that word
    shingles overweight).

    An attribute-bucket blocking (e.g. by document length) was rejected:
    its bucket populations grow linearly with the corpus, so the in-block
    quadratic verify melts at scale — hash-diverse LSH buckets don't."""
    docs = _minhash_docs(spark, sf_dir)
    bands = _bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    grams = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 3),
                lambda i: F.substr("text", i, F.lit(4)),
            )
        ).alias("g"),
    )
    x = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    y = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ga", "gb")).alias("ni"),
            F.size("ga").alias("na"),
            F.size("gb").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


_CC_MAX_ROUNDS = 50

# Transitive-closure truth for BOTH connected-components formulations
# (label propagation and star contraction): smallest doc_id reachable
# through verified near-dup edges.
_SQL_CC_ORACLE = f"""
    WITH RECURSIVE docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN docs x ON x.doc_id = c.doc_a
                  JOIN docs y ON y.doc_id = c.doc_b
      WHERE len(list_intersect(x.sh, y.sh))
              / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    )
    SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    """


@query(
    "dedup_cluster_cc",
    oracle=_SQL_CC_ORACLE,
    tags=("dedup", "cluster", "iterative"),
)
def dedup_cluster_cc(spark, sf_dir):
    """Duplicate clustering: connected components over the verified
    MinHash-LSH near-dup pairs via min-label propagation iterated to
    FIXPOINT — each document's cluster id is the smallest doc_id
    reachable through dup edges, i.e. the canonical keeper its group
    dedups to.

    Each round is pure DataFrame joins (labels ⋈ edges → min per node);
    the min label spreads one hop per round, so convergence needs
    rounds ≥ the component diameter — which is data-dependent and
    unknowable up front (near-dup CHAINS A~B~C~D occur in real corpora
    even at a 0.8 threshold). The loop therefore checks convergence
    every round: a single count of changed labels, stopping at zero.
    ``localCheckpoint`` (eager) truncates the per-round lineage so the
    plan does not grow with the diameter; on a cluster, point
    ``sparkContext.setCheckpointDir`` at durable storage and use
    ``checkpoint()`` for executor-loss resilience. ``_CC_MAX_ROUNDS``
    bounds a pathological chain (diameter ≥ 50 would mean the corpus
    is one giant near-dup snake); hitting it raises rather than
    returning silently-wrong cluster ids. The oracle is a
    recursive-CTE transitive closure over the same pairs."""
    # persist the pair relation itself: the symmetric union references it
    # twice, and without the cache each branch re-runs the whole LSH
    # candidate+verify pipeline
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .transform(eager_barrier)
    )
    for _round in range(_CC_MAX_ROUNDS):
        nbr_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.doc_a, "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .transform(eager_barrier)  # eager: materializes + cuts lineage
        )
        changed = updated.filter(F.col("label") != F.col("old_label")).count()
        labels = updated.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_cluster_cc: no fixpoint after {_CC_MAX_ROUNDS} rounds "
            "(component diameter exceeds the bound — raise _CC_MAX_ROUNDS)"
        )
    edges.unpersist()
    pairs.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@query(
    "dedup_cluster_cc_star",
    oracle=_SQL_CC_ORACLE,
    tags=("dedup", "cluster", "iterative", "star-contraction"),
)
def dedup_cluster_cc_star(spark, sf_dir):
    """Duplicate clustering via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the formulation whose round count is O(log n) in the
    component size rather than O(diameter), i.e. the one a 100 TB corpus
    with long near-dup chains actually wants (label propagation
    — ``dedup_cluster_cc`` — needs one round per hop).

    Edges are kept canonically as (child > parent); each phase is one
    shuffle (groupBy node + join back):

    * large-star(u): every neighbor v > u re-points to
      m = min(Γ(u) ∪ {u}) — emit (v, m);
    * small-star(u): u and its smaller neighbors all re-point to
      m = min of that set — emit (u, m) and (v, m) for v < u, v ≠ m.

    Both phases preserve connectivity and strictly flatten the forest;
    at the fixpoint (checked per round: equal edge count + one-sided
    ``exceptAll`` containment ⇒ multiset equality) every component is a
    star centered on its minimum doc_id. Each round's
    edge set is ``localCheckpoint``-ed (eager) to cut lineage; labels
    fall directly out of the final stars. Oracle: the same recursive
    transitive closure as dedup_cluster_cc; equality of the two
    formulations is additionally pinned in tests/test_invariants.py."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    # canonical child>parent orientation: doc_a < doc_b by construction
    edges = (
        pairs.select(F.col("doc_b").alias("c"), F.col("doc_a").alias("p"))
        .distinct()
        .transform(eager_barrier)
    )

    def _sym(e):
        return e.select(F.col("c").alias("u"), F.col("p").alias("v")).unionByName(
            e.select(F.col("p").alias("u"), F.col("c").alias("v"))
        )

    def _large_star(e):
        sym = _sym(e)
        mn = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mn = mn.select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        return (
            sym.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("c"), F.col("m").alias("p"))
            .distinct()
        )

    def _small_star(e):
        # group children's smaller neighbors: canonical edges already
        # point child -> parent with parent < child
        mn = e.groupBy("c").agg(F.min("p").alias("m"))
        repointed = (
            e.join(mn, "c")
            .filter(F.col("p") != F.col("m"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
        )
        self_edges = mn.select(F.col("c"), F.col("m").alias("p"))
        return repointed.unionByName(self_edges).distinct()

    prev_n = None
    for _round in range(_CC_MAX_ROUNDS):
        nxt = eager_barrier(_small_star(_large_star(edges)))
        n = nxt.count()
        # equal cardinality + one-sided multiset containment ⇒ equality
        same = prev_n == n and nxt.exceptAll(edges).count() == 0
        edges, prev_n = nxt, n
        if same:
            break
    else:
        raise RuntimeError(
            f"dedup_cluster_cc_star: no fixpoint after {_CC_MAX_ROUNDS} rounds"
        )
    pairs.unpersist()
    roots = edges.select(F.col("p").alias("doc_id"), F.col("p").alias("cluster_id"))
    members = edges.select(F.col("c").alias("doc_id"), F.col("p").alias("cluster_id"))
    return members.unionByName(roots).distinct()


@query(
    "dedup_minhash_lsh_prod",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.sh, y.sh))
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
      FROM cand c
      JOIN docs x ON x.doc_id = c.doc_a
      JOIN docs y ON y.doc_id = c.doc_b
    ) WHERE jaccard >= 0.8
    """,
    tags=("dedup", "minhash", "lsh", "production"),
    bench=True,
)
def dedup_minhash_lsh_prod(spark, sf_dir):
    """The PRODUCTION tier of dedup_minhash_lsh: identical pipeline shape
    (token hash → shingle combine → MinHash-16 → 4×4 LSH bands →
    candidate join → exact hashed-shingle Jaccard ≥ 0.8) with xxhash64
    as the token hash — one JVM codegen'd call per token instead of a
    per-character fold. This is the tier a 100 TB run uses; the portable
    polynomial tier exists so the SAME pipeline stays DuckDB-checkable.

    Driver-checkable shape: candidates still come from the xxhash64
    banding, but the verify stage computes the emitted Jaccard over the
    PORTABLE polynomial-hash shingle sets (hash-function-independent:
    both hashes are injective on shingles modulo astronomically unlikely
    collisions), and the oracle is the portable LSH pipeline. Tier
    parity is PROBABILISTIC, not by construction: the two band families
    hash different signatures, so each catches a true near-dup pair
    independently — at Jaccard j the per-family miss probability is
    (1−j⁴)⁴ (4×4 bands), i.e. ~1.4% at j=0.90 and ~0.03% at j=0.95,
    vanishing as j→1. The current fixtures' weakest pair is j=0.90 and
    both families catch all 25 pairs (deterministic for FIXED texts;
    tier equality is asserted in tests/test_extensions.py) — but
    regenerated fixtures with pairs near the 0.8 threshold could make
    one family miss a pair the other catches, a recall property of LSH
    itself, not an engine bug. A pure production run skips the portable
    pass and verifies on the xxhash shingles (same values)."""
    d = t(spark, sf_dir, "documents")
    # pmod bounds the 64-bit hash into the combine-safe domain (< 2^31),
    # keeping the shingle arithmetic overflow-free under ANSI semantics
    docs = (
        d.select(
            "doc_id",
            F.transform(
                tokens("text"), lambda s: F.pmod(F.xxhash64(s), F.lit(2_147_483_647))
            ).alias("th"),
        )
        .select("doc_id", F.array_distinct(hashed_shingles(F.col("th"), 3)).alias("sh"))
        .select(
            "doc_id",
            "sh",
            F.size("sh").alias("n_sh"),
            minhash_signature(F.col("sh")).alias("sig"),
        )
        .persist()
    )
    bands = _bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x, y = _pair_sides(docs)
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
            "na",
            "nb",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


@query(
    "dedup_hybrid_signal",
    oracle=f"""
    WITH j AS (
      SELECT d.doc_id, d.source, e.label, e.embedding,
             list_distinct(string_split(lower(d.text), ' ')) AS toks
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {sql_cosine("a.embedding", "b.embedding")} AS cos_sim,
           len(list_intersect(a.toks, b.toks))
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             AS jaccard
    FROM j a JOIN j b
      ON a.label = b.label AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE {sql_cosine("a.embedding", "b.embedding")} > 0.3
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "hybrid", "embedding", "jaccard"),
)
def dedup_hybrid_signal(spark, sf_dir):
    """Hybrid near-dup signal: semantic (embedding cosine) AND lexical
    (distinct-token Jaccard) evidence on the same candidate pair — the
    two-signal policy real training-data dedup uses (cosine alone merges
    paraphrases; Jaccard alone merges boilerplate). Pairs are blocked on
    (embedding label × crawl source), so block population stays bounded
    as the corpus grows (labels ≈ coarse IVF cells, sources grow with the
    crawl); the cosine filter prunes before the costlier token
    intersection. Joining documents to embeddings on doc_id = vec_id is
    the multimodal-column pattern: per-modality tables co-keyed by
    document id."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    e = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), "label", "embedding"
    )
    j = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "source", "label", "embedding", "toks"
    )
    a = j.select(
        F.col("doc_id").alias("doc_a"), "source", "label",
        F.col("embedding").alias("ea"), F.col("toks").alias("ta"),
    )
    b = j.select(
        F.col("doc_id").alias("doc_b"), "source", "label",
        F.col("embedding").alias("eb"), F.col("toks").alias("tb"),
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    return (
        a.join(b, ["label", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") > 0.3)
        .select(
            "doc_a",
            "doc_b",
            "cos_sim",
            (inter / (F.size("ta") + F.size("tb") - inter)).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_containment",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    toksets AS (
      SELECT doc_id, list_distinct(string_split(text, chr(32))) AS ts
      FROM documents
    )
    SELECT doc_a, doc_b, containment FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(x.ts, y.ts))
               / CAST(least(len(x.ts), len(y.ts)) AS DOUBLE) AS containment
      FROM cand c
      JOIN toksets x ON x.doc_id = c.doc_a
      JOIN toksets y ON y.doc_id = c.doc_b
    ) WHERE containment >= 0.9
    """,
    tags=("dedup", "containment"),
)
def dedup_containment(spark, sf_dir):
    """Containment near-dup: |A∩B| / min(|A|,|B|) over word-token SETS —
    the metric that catches a document EMBEDDED in a longer one, which
    Jaccard under-scores (the union term punishes length mismatch).
    Candidates reuse the same persisted MinHash-LSH band relation as the
    Jaccard/char-gram verifiers, so the quadratic verify stays bounded
    by hash-diverse bucket sizes at any corpus size; only the verify
    metric differs."""
    docs = _minhash_docs(spark, sf_dir)
    bands = _bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    toksets = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    x = toksets.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ta"))
    y = toksets.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("tb"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("ta", "tb"))
                / F.least(F.size("ta"), F.size("tb")).cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= 0.9)
    )


@query(
    "dedup_normalized_content",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                            ' +', ' ', 'g') AS canon
      FROM documents
    )
    SELECT canon_id, n_members FROM (
      SELECT MIN(doc_id) AS canon_id, COUNT(*) AS n_members
      FROM norm GROUP BY canon
    ) WHERE n_members >= 1
    ORDER BY canon_id
    """,
    tags=("dedup", "normalize", "exact"),
)
def dedup_normalized_content(spark, sf_dir):
    """Normalization-then-exact-dedup: lowercase, strip non-alphanumerics,
    collapse whitespace, then group identical canonical forms — the
    cheap first pass every dedup pipeline runs before fuzzy matching
    (catches case/punctuation-only re-crawls at hash-groupBy cost, no
    pair generation at all). Emits one row per canonical cluster with
    its representative (min doc_id) and size; at scale this is a single
    shuffle on the canonical-text hash."""
    d = t(spark, sf_dir, "documents")
    canon = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")),
        " +",
        " ",
    )
    return (
        d.select("doc_id", canon.alias("canon"))
        .groupBy("canon")
        .agg(F.min("doc_id").alias("canon_id"), F.count(F.lit(1)).alias("n_members"))
        .select("canon_id", "n_members")
        .orderBy("canon_id")
    )


_SQL_LSH_PAIR_CTES = f"""
    docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    lsh_pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN docs x ON x.doc_id = c.doc_a
                  JOIN docs y ON y.doc_id = c.doc_b
      WHERE len(list_intersect(x.sh, y.sh))
              / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.8
    )
"""

_CURATE_LANGS = ("en", "es", "fr")


@query(
    "pipeline_curation_funnel",
    oracle=f"""
    WITH {_SQL_LSH_PAIR_CTES},
    base AS (
      SELECT doc_id, lang, text,
             len(string_split(text, chr(32))) AS n_tok
      FROM documents
      WHERE lang IN {_CURATE_LANGS!r}
    ),
    filt AS (
      SELECT * FROM base WHERE n_tok BETWEEN 20 AND 1000
    ),
    exact AS (
      SELECT * FROM filt
      QUALIFY row_number() OVER (PARTITION BY {sql_poly_hash("text")}
                                 ORDER BY doc_id) = 1
    ),
    final AS (
      SELECT * FROM exact e
      WHERE NOT EXISTS (SELECT 1 FROM lsh_pairs p WHERE p.doc_b = e.doc_id)
    )
    SELECT b.lang,
           CAST(MAX(b.n_raw) AS BIGINT) AS n_raw,
           CAST(MAX(COALESCE(q.n_quality, 0)) AS BIGINT) AS n_quality,
           CAST(MAX(COALESCE(x.n_exact, 0)) AS BIGINT) AS n_exact,
           CAST(MAX(COALESCE(f.n_final, 0)) AS BIGINT) AS n_final,
           CAST(MAX(COALESCE(f.tokens_final, 0)) AS BIGINT) AS tokens_final
    FROM (SELECT lang, COUNT(*) AS n_raw FROM base GROUP BY lang) b
    LEFT JOIN (SELECT lang, COUNT(*) AS n_quality FROM filt GROUP BY lang) q USING (lang)
    LEFT JOIN (SELECT lang, COUNT(*) AS n_exact FROM exact GROUP BY lang) x USING (lang)
    LEFT JOIN (SELECT lang, COUNT(*) AS n_final, SUM(n_tok) AS tokens_final
               FROM final GROUP BY lang) f USING (lang)
    GROUP BY b.lang
    ORDER BY b.lang
    """,
    tags=("pipeline", "curation", "funnel", "dedup", "composite"),
)
def pipeline_curation_funnel(spark, sf_dir):
    """END-TO-END curation funnel — the composed pipeline a training-data
    run executes, as ONE declared query with one oracle: target-language
    selection → token-count quality gate (20..1000) → exact-content
    dedup (keep min doc_id per text hash) → near-dup drop (any doc that
    is the doc_b of a verified MinHash-LSH pair — the canonical-keeper
    convention), reporting the per-language funnel (raw → quality →
    exact-deduped → final) plus surviving token volume.

    Scale shape: every stage is the already-proven operator shape —
    map-side gates, one window on the content hash, the LSH pair set
    reused as a signature-store artifact (left_anti on its doc_b side),
    and 5-row funnel aggregates left-joined at the end. Stages never
    re-scan: flags cascade on one pass of the documents relation. The
    funnel counts make the pipeline self-auditing (monotone
    n_raw ≥ n_quality ≥ n_exact ≥ n_final — pinned in
    tests/test_extensions.py)."""
    d = t(spark, sf_dir, "documents")
    base = d.filter(F.col("lang").isin(*_CURATE_LANGS)).select(
        "doc_id", "lang", "text", F.size(F.split("text", " ")).alias("n_tok")
    )
    filt = base.filter((F.col("n_tok") >= 20) & (F.col("n_tok") <= 1000))
    wx = Window.partitionBy(poly_hash(F.col("text"))).orderBy("doc_id")
    exact = (
        filt.withColumn("rn", F.row_number().over(wx)).filter(F.col("rn") == 1).drop("rn")
    )
    dropb = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    final = exact.join(dropb, "doc_id", "left_anti")

    n_raw = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n_raw"))
    n_quality = filt.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    n_exact = exact.groupBy("lang").agg(F.count(F.lit(1)).alias("n_exact"))
    n_final = final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_tok").cast("long").alias("tokens_final"),
    )
    return (
        n_raw.join(n_quality, "lang", "left")
        .join(n_exact, "lang", "left")
        .join(n_final, "lang", "left")
        .select(
            "lang",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.coalesce("tokens_final", F.lit(0)).alias("tokens_final"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_incremental_batch",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
      WHERE doc_id % 10 <> 7
    ),
    batch AS (
      SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
      WHERE doc_id % 10 = 7
    ),
    in_batch_first AS (
      SELECT doc_id, h FROM batch
      QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
    ),
    verdicts AS (
      SELECT b.doc_id,
             CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                  WHEN f.doc_id IS NULL THEN 'dup_in_batch'
                  ELSE 'accept' END AS verdict
      FROM batch b
      LEFT JOIN (SELECT DISTINCT h FROM corpus) c ON c.h = b.h
      LEFT JOIN in_batch_first f ON f.doc_id = b.doc_id
    )
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
           list_sort(list(doc_id)) AS doc_ids
    FROM verdicts GROUP BY verdict ORDER BY verdict
    """,
    tags=("dedup", "incremental", "ingest"),
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental ingest dedup — the DAILY shape of a production corpus:
    an incoming batch (here the doc_id%10==7 slice) is deduped in two
    passes, (1) against the EXISTING corpus by content-hash anti/semi
    join, (2) within itself keeping the first occurrence per hash; each
    batch doc gets an explicit verdict (accept / dup_of_corpus /
    dup_in_batch), the audit trail an ingest pipeline persists.

    Scale shape: the corpus side reduces to DISTINCT 8-byte hashes
    before the join (never text); both joins are hash-equality on that
    key; the within-batch pass is a window over the (much smaller)
    batch. At 100 TB the corpus hash set is exactly the "seen-content"
    index a dedup service maintains — this query IS its batch-refresh
    plan, and re-running it is idempotent (accepted docs join the
    corpus; their dups then classify as dup_of_corpus)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", poly_hash(F.col("text")).alias("h")
    )
    corpus_h = d.filter(F.col("doc_id") % 10 != 7).select("h").distinct()
    batch = d.filter(F.col("doc_id") % 10 == 7)
    w = Window.partitionBy("h").orderBy("doc_id")
    flagged = (
        batch.join(corpus_h.withColumn("in_corpus", F.lit(1)), "h", "left")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
            .when(F.col("rn") > 1, "dup_in_batch")
            .otherwise("accept")
            .alias("verdict"),
        )
    )
    return (
        flagged.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .orderBy("verdict")
    )


@query(
    "dedup_keeper_selection",
    oracle=f"""
    WITH clusters AS ({_SQL_CC_ORACLE}),
    sized AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX_BY(doc_id, n_chars * 100000 + doc_id) AS keeper_doc_id,
           CAST(MAX(n_chars) AS BIGINT) AS keeper_n_chars,
           list_sort(list(doc_id)) AS member_ids
    FROM sized GROUP BY cluster_id
    HAVING COUNT(*) >= 2
    ORDER BY cluster_id
    """,
    tags=("dedup", "cluster", "keeper", "policy"),
)
def dedup_keeper_selection(spark, sf_dir):
    """The keeper-policy step that completes the dedup pipeline: given
    the connected near-dup clusters (`dedup_cluster_cc`), choose WHICH
    copy survives by a QUALITY criterion — here longest text, doc_id as
    the deterministic tie-break — rather than the min-id convention the
    clustering itself labels with. Production corpora keep the best
    copy (longest, highest quality score, most recent crawl), and this
    argmax-per-cluster join is exactly that selection, emitted with the
    member list so the drop set is auditable.

    Scale shape: clusters are (doc, cluster) pairs — already ≪ corpus;
    one equality join attaches the quality signal; MAX_BY folds
    map-side (lexicographic integer key keeps the argmax exact and
    deterministic in both engines). Only multi-member clusters emit —
    singletons need no keeper decision."""
    clusters = dedup_cluster_cc(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sized = clusters.join(d, "doc_id")
    return (
        sized.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by("doc_id", F.col("n_chars") * 100000 + F.col("doc_id")).alias(
                "keeper_doc_id"
            ),
            F.max("n_chars").alias("keeper_n_chars"),
            F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("cluster_id")
    )


_RECALL_CAP = 200  # absolute doc_id bound for the calibration cohort
# Planted-variant cohort (VERDICT r8 item 3): the natural truth set under
# the cap holds only 3 pairs at sf0.01 (25 corpus-wide), all at ja≈1.0 —
# binomially vacuous at every grid threshold. Each sampled document
# instead gets ONE deterministic variant shingle set per level: keep a
# shingle iff (v·131+77) mod 1000 < fppt, replace each dropped shingle
# with a fresh deterministic hash — keeping fraction f of |S| and adding
# (1−f)|S| new shingles lands Jaccard at f/(2−f), so fppt = ⌊1000·2J/(1+J)⌋
# targets each grid J. The EXACT per-pair Jaccard is still computed (the
# target only positions pairs in bands), giving ~200 true pairs per level
# at sf0.01 instead of 3.
_RECALL_LEVELS = (
    (0.5, 667, 1),
    (0.6, 750, 2),
    (0.7, 824, 3),
    (0.8, 889, 4),
    (0.9, 947, 5),
)
_SQL_RECALL_LEVELS = ", ".join(
    f"(CAST({tja} AS DOUBLE), {fppt}, {lvl})" for tja, fppt, lvl in _RECALL_LEVELS
)
_SQL_VSH = """list_distinct(list_concat(
           list_filter(sh, v -> (v * 131 + 77) % 1000 < fppt),
           list_transform(list_filter(sh, v -> (v * 131 + 77) % 1000 >= fppt),
                          v -> (v * 48271 + 1000003 * (lvl + 1)) % 1000000007)
         ))"""
_SQL_BAND_HIT = " OR ".join(
    f"({sql_band_hash('sig', b)}) = ({sql_band_hash('vsig', b)})"
    for b in range(N_BANDS)
)


@query(
    "dedup_lsh_recall_report",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    s AS (
      SELECT doc_id, sh, sig FROM docs
      WHERE doc_id < {_RECALL_CAP} AND len(sh) > 0
    ),
    levels AS (
      SELECT * FROM (VALUES {_SQL_RECALL_LEVELS}) AS v(tja, fppt, lvl)
    ),
    planted AS (
      SELECT doc_id, tja, fppt, lvl, sh, sig, {_SQL_VSH} AS vsh
      FROM s CROSS JOIN levels
    ),
    pairs AS (
      SELECT tja, lvl, sig, {sql_minhash_signature("vsh")} AS vsig,
             CAST(len(list_intersect(sh, vsh)) AS DOUBLE)
               / (len(sh) + len(vsh) - len(list_intersect(sh, vsh))) AS ja
      FROM planted WHERE len(vsh) > 0
    ),
    m AS (
      SELECT tja, lvl, ja,
             CASE WHEN {_SQL_BAND_HIT} THEN 1 ELSE 0 END AS hit,
             1.0 - (1.0 - ja*ja*ja*ja) * (1.0 - ja*ja*ja*ja)
                 * (1.0 - ja*ja*ja*ja) * (1.0 - ja*ja*ja*ja) AS p
      FROM pairs WHERE ja >= 0.5
    )
    SELECT tja AS target_ja,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_hit,
           CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm,
           ROUND(SUM(p), 6) AS expected_hits,
           ROUND(SQRT(SUM(p * (1.0 - p))), 6) AS sigma,
           CAST(ABS(CAST(SUM(hit) AS DOUBLE) - ROUND(SUM(p), 6))
                < 4.0 * ROUND(SQRT(SUM(p * (1.0 - p))), 6) + 1.5
                AS BOOLEAN) AS within_tolerance
    FROM m GROUP BY tja, lvl ORDER BY tja
    """,
    tags=("dedup", "minhash", "lsh", "recall", "quality"),
)
def dedup_lsh_recall_report(spark, sf_dir):
    """LSH recall calibration with STATISTICAL content (VERDICT r8
    item 3) — the measurement that justifies a MinHash banding config
    before a production dedup run. The natural corpus holds too few
    mid-similarity pairs to calibrate on (3 under the cap, all ja≈1.0),
    so every capped document gets a deterministic planted VARIANT per
    grid level: a keep/replace split of its hashed-shingle set tuned so
    Jaccard lands near each target (keep fraction f ⇒ J = f/(2−f)); the
    exact per-pair Jaccard is then computed and the banding stage's
    empirical catch rate is compared to the S-curve theory
    1-(1-ja⁴)⁴ for the deployed r=4, b=4, with a binomial verdict
    |hits − Σp| < 4σ + 1.5 (σ = √Σp(1−p); same tolerance pattern as
    `profile_bloom_fpp_calibration`). ~200 true pairs per level at
    sf0.01 — the n ≥ 30 the calibration claim needs.

    Float parity: ja is a ratio of exact integers (one IEEE division —
    bit-identical cross-engine) and the S-curve is an explicit
    multiplication chain (never pow), so per-pair p is bit-identical;
    sums are rounded to 6 digits to absorb summation-order ulps.

    Scale shape: O(n) — each document meets only its own 5 variants
    (the previous all-pairs truth join is gone entirely); the band-hit
    test is a per-row column comparison, not a join; the report is a
    5-row aggregate. At 100 TB the cohort cap simply widens."""
    docs = _minhash_docs(spark, sf_dir, cap=_RECALL_CAP).filter(F.size("sh") > 0)
    levels = F.array(
        *[
            F.struct(
                F.lit(tja).alias("tja"),
                F.lit(fppt).alias("fppt"),
                F.lit(lvl).alias("lvl"),
            )
            for tja, fppt, lvl in _RECALL_LEVELS
        ]
    )

    def keep(v):
        return F.pmod(v * 131 + 77, F.lit(1000)) < F.col("fppt")

    vsh = F.array_distinct(
        F.concat(
            F.filter("sh", keep),
            F.transform(
                F.filter("sh", lambda v: ~keep(v)),
                lambda v: F.pmod(
                    v * 48271 + F.lit(1000003) * (F.col("lvl") + 1),
                    F.lit(1_000_000_007),
                ),
            ),
        )
    )
    planted = (
        docs.select("doc_id", "sh", "sig", F.explode(levels).alias("L"))
        .select("doc_id", "sh", "sig", "L.tja", "L.fppt", "L.lvl")
        .withColumn("vsh", vsh)
        .filter(F.size("vsh") > 0)
    )
    inter = F.size(F.array_intersect("sh", "vsh"))
    ja = inter.cast("double") / (F.size("sh") + F.size("vsh") - inter)
    hit = F.lit(False)
    for b in range(N_BANDS):
        hit = hit | (
            band_hash(F.col("sig"), b) == band_hash(minhash_signature(F.col("vsh")), b)
        )
    m = planted.select(
        "tja", "lvl", ja.alias("ja"), hit.cast("long").alias("hit")
    ).filter(F.col("ja") >= 0.5)
    s4 = F.col("ja") * F.col("ja") * F.col("ja") * F.col("ja")
    u = F.lit(1.0) - s4
    p = (F.lit(1.0) - u * u * u * u).alias("p")
    agg = (
        m.select("tja", "lvl", "hit", p)
        .groupBy("tja", "lvl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("hit").cast("long").alias("n_hit"),
            F.round(F.sum("p"), 6).alias("expected_hits"),
            F.round(F.sqrt(F.sum(F.col("p") * (1.0 - F.col("p")))), 6).alias(
                "sigma"
            ),
        )
    )
    return agg.select(
        F.col("tja").alias("target_ja"),
        "n_pairs",
        "n_hit",
        F.expr("n_hit * 1000000 div n_pairs").alias("recall_ppm"),
        "expected_hits",
        "sigma",
        (
            F.abs(F.col("n_hit").cast("double") - F.col("expected_hits"))
            < 4.0 * F.col("sigma") + 1.5
        ).alias("within_tolerance"),
    ).orderBy("target_ja")


# Signature width DERIVED from the shared banding constants, so a banding
# retune can never desynchronize the estimator from the signatures it
# calibrates (sigma ~ sqrt(J(1-J)/K)).
_SIG_K = N_BANDS * ROWS_PER_BAND

@query(
    "dedup_minhash_estimator_quality",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_filter(list_transform(generate_series(1, {_SIG_K}),
                  i -> x.sig[i] = y.sig[i]), v -> v)) AS INTEGER) AS sig_matches,
           CAST(len(list_filter(list_transform(generate_series(1, {_SIG_K}),
                  i -> x.sig[i] = y.sig[i]), v -> v)) AS DOUBLE) / {_SIG_K}.0
             AS jaccard_est,
           len(list_intersect(x.sh, y.sh))
             / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
             AS jaccard_exact,
           ABS(CAST(len(list_filter(list_transform(generate_series(1, {_SIG_K}),
                  i -> x.sig[i] = y.sig[i]), v -> v)) AS DOUBLE) / {_SIG_K}.0
               - len(list_intersect(x.sh, y.sh))
                 / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))))
             AS abs_err
    FROM cand c
    JOIN docs x ON x.doc_id = c.doc_a
    JOIN docs y ON y.doc_id = c.doc_b
    """,
    tags=("dedup", "minhash", "estimator", "quality"),
)
def dedup_minhash_estimator_quality(spark, sf_dir):
    """MinHash ESTIMATION quality — the third leg of the calibration
    suite (recall: `dedup_lsh_recall_report`; threshold:
    `sim_threshold_calibration`): for every banding candidate pair, the
    signature-agreement Jaccard estimate (matching slots / K, the
    number MinHash actually promises, E[matches]/K = J) against the
    exact hashed-shingle Jaccard, with the absolute error per pair —
    the readout that decides whether K suffices for the corpus's
    similarity profile or the signature must widen (σ ≈ √(J(1−J)/K)).
    K = N_BANDS·ROWS_PER_BAND is DERIVED from the shared banding
    constants (``_SIG_K``), so a banding retune retunes this
    calibrator with it.

    Scale shape: identical to the LSH pipeline — candidates from the
    banding equality join, two hash joins back to the persisted
    signature relation, all comparisons map-side; slot agreement is an
    integer count and both Jaccards are ratios of exact integers, so
    every column hash-matches. Unordered output (no sort of any
    kind)."""
    docs = _minhash_docs(spark, sf_dir)
    bands = _bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("na"), F.col("sig").alias("sig_a"),
    )
    y = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("nb"), F.col("sig").alias("sig_b"),
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda p, q: p == q), lambda v: v
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    ja = inter / (F.col("na") + F.col("nb") - inter)
    est = matches.cast("double") / F.lit(float(_SIG_K))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            matches.cast("int").alias("sig_matches"),
            est.alias("jaccard_est"),
            ja.alias("jaccard_exact"),
            F.abs(est - ja).alias("abs_err"),
        )
    )


@query(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN docs x ON x.doc_id = c.doc_a
                  JOIN docs y ON y.doc_id = c.doc_b
      WHERE len(list_intersect(x.sh, y.sh))
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.8
    )
    SELECT LEAST(sx.source, sy.source) AS source_a,
           GREATEST(sx.source, sy.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           sx.source <> sy.source AS cross_source
    FROM pairs p
    JOIN documents sx ON p.doc_a = sx.doc_id
    JOIN documents sy ON p.doc_b = sy.doc_id
    GROUP BY 1, 2, 4
    ORDER BY 1, 2
    """,
    tags=("dedup", "minhash", "lsh", "provenance", "pipeline"),
)
def dedup_cross_source_matrix(spark, sf_dir):
    """Cross-SOURCE near-duplicate matrix: the verified MinHash-LSH
    pair set rolled up by (source_a, source_b) with sources order-
    normalized — the provenance readout a corpus run reads BEFORE
    choosing a keeper policy. Diagonal cells (cross_source = false)
    are intra-source redundancy (mirrors, re-crawls — safe to dedup
    aggressively); off-diagonal cells are cross-source contamination
    (the same text syndicated into nominally independent sources —
    the cell that silently breaks 'held-out source' eval splits and
    inflates mixture weights if ignored).

    Scale shape: the pair relation is the already-bounded LSH output
    (banded candidates, verified on candidates only — never n²); the
    two provenance joins are hash joins on doc_id against a 2-column
    projection of documents; the rollup groups |sources|² cells at
    most. Counts are exact integers — fully hash-matched."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    d = t(spark, sf_dir, "documents")
    sx = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sy = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sx, "doc_a")
        .join(sy, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("source_a", "source_b", "n_pairs", "cross_source")
        .orderBy("source_a", "source_b")
    )


@query(
    "dedup_incremental_bloom",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
      WHERE doc_id % 10 <> 7
    ),
    batch AS (
      SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
      WHERE doc_id % 10 = 7
    ),
    in_batch_first AS (
      SELECT doc_id, h FROM batch
      QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
    ),
    verdicts AS (
      SELECT b.doc_id,
             CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                  WHEN f.doc_id IS NULL THEN 'dup_in_batch'
                  ELSE 'accept' END AS verdict
      FROM batch b
      LEFT JOIN (SELECT DISTINCT h FROM corpus) c ON c.h = b.h
      LEFT JOIN in_batch_first f ON f.doc_id = b.doc_id
    )
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
           list_sort(list(doc_id)) AS doc_ids
    FROM verdicts GROUP BY verdict ORDER BY verdict
    """,
    tags=("dedup", "incremental", "ingest", "bloom"),
)
def dedup_incremental_bloom(spark, sf_dir):
    """Bloom-prefiltered incremental ingest dedup — `dedup_incremental_batch`
    re-planned for the 100 TB corpus: instead of semi-joining EVERY batch
    doc against the corpus hash index, the corpus hashes are folded into
    an 8 KiB Bloom bitmap (`join_bloom_prefilter`'s build, keyed on the
    content hash) that is broadcast to the batch; docs that MISS the
    bloom are definitely-new (no false negatives) and skip the corpus
    join entirely — only bloom HITS pay the exact semi-join confirm that
    clears false positives. Verdicts are therefore IDENTICAL to the
    exact plan (same oracle), but the corpus index is probed by the
    expected-duplicate fraction of the batch instead of all of it — on
    a mostly-novel firehose that is a ~10-100× reduction of the join
    input, and the bitmap replaces shuffling the multi-billion-row hash
    index per batch.

    In-batch dedup (keep-first per hash) is unchanged — the bloom only
    short-circuits the corpus membership test."""
    from hadoop_fs_ceph_spark.operators.joins import (
        _BLOOM_BITS,
        _BLOOM_K,
        _bloom_positions,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", poly_hash(F.col("text")).alias("h")
    )
    corpus_h = d.filter(F.col("doc_id") % 10 != 7).select("h").distinct()
    batch = d.filter(F.col("doc_id") % 10 == 7)

    pos = corpus_h.select(
        F.explode(
            F.array(*_bloom_positions(F.col("h"), _BLOOM_BITS, _BLOOM_K))
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )
    probed = batch.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for i in range(_BLOOM_K):
        cond = cond & F.expr(
            f"(coalesce(element_at(bloom, pmod(xxhash64(h, {i}),"
            f" {_BLOOM_BITS}) div 64), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod(pmod(xxhash64("
            f"h, {i}), {_BLOOM_BITS}), 64) AS INT))) != 0"
        )
    hits = probed.filter(cond).drop("bloom")
    misses = probed.filter(~cond).drop("bloom").withColumn(
        "in_corpus", F.lit(None).cast("int")
    )
    confirmed = hits.join(corpus_h.withColumn("in_corpus", F.lit(1)), "h", "left")
    flagged = confirmed.select("h", "doc_id", "in_corpus").unionByName(
        misses.select("h", "doc_id", "in_corpus")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    verdicts = flagged.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("accept")
        .alias("verdict"),
    )
    return (
        verdicts.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .orderBy("verdict")
    )


@query(
    "dedup_prefix_filter_join",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, inter,
           CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE 10 * inter >= 6 * (sa.n + sb.n - inter)
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "jaccard", "prefix-filter", "ppjoin"),
)
def dedup_prefix_filter_join(spark, sf_dir):
    """EXACT Jaccard similarity join (threshold t = 0.6) via PPJoin-style
    prefix filtering (Xiao et al., WWW'08 — public) — the third candidate
    generator next to MinHash-LSH (probabilistic) and length-bucket
    blocking (rejected in `dedup_ngram_jaccard` notes): deterministic,
    recall-1.0 by theorem, and still never all-pairs.

    Prefix-filter theorem: order every document's token set by a global
    total order (document frequency ascending, token as tie-break —
    rarest first), keep only the first |x| − ⌈t·|x|⌉ + 1 tokens as the
    PREFIX; any pair with J ≥ t must collide on ≥ 1 prefix token. So
    candidates come from an equality join on prefix tokens only, and
    rare-token prefixes keep buckets small exactly where df would blow
    them up. Verification is exact: intersection of the full sorted
    token arrays, thresholded in INTEGER form (10·∩ ≥ 6·∪ avoids any
    float compare); jaccard emitted as one exact-int division. The
    DuckDB oracle is the naive quadratic join — a hash match therefore
    *proves* the filter's completeness on this corpus, not just its
    precision.

    Scale: df is one map-combined count over (doc, token) pairs; the
    per-doc sort is array_sort over that document's own tokens (bounded
    by doc length, not corpus); the candidate join shuffles (prefix_tok,
    doc_id) pairs — prefix length is sublinear in doc length and buckets
    are rare-token-biased. The collect_list is per-document (allowlisted:
    bounded by the longest document, the same bound every text op here
    carries).

    Round-13 (VERDICT r12 item 7): full PPJoin positional machinery —
    asymmetric mid-prefix for the size-smaller role, pair-grain
    min-positional-bound pruning before the verify joins, and the
    overlap decomposition (collision count = shared-prefix overlap, so
    verification intersects only the suffixes after the last shared
    prefix token). Measured at sf0.1: collision rows 77.9M → 53.6M,
    candidates 9.81M → 9.69M, cold 9.8 → 8.05 s. The literature's 2-4×
    candidate cut does NOT materialize here because the corpus is dense
    (7.1M of 12.5M doc pairs genuinely qualify, so ~73% of candidates
    are true positives that no exact filter may drop) — the remaining
    wall is the inherent verify + 7.1M-row sorted output."""
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok"),
        )
    )
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        toks.join(df_tok, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("ordered"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "doc_id",
            "n",
            F.transform(F.col("ordered"), lambda s: s["tok"]).alias("toks_rare_first"),
            # probing-prefix length = n - ceil(0.6 n) + 1, in pure ints
            # (div, the repo's integer-division convention — no double
            # round-trip)
            (F.col("n") - F.expr("(n * 6 + 9) div 10") + 1).alias("plen"),
            # INDEX (mid-)prefix for the size-SMALLER role (round-13,
            # PPJoin's asymmetric prefix): when n_a ≤ n_b, the required
            # overlap α = ⌈3(n_a+n_b)/8⌉ ≥ ⌈2t/(1+t)·n_a⌉ = ⌈0.75·n_a⌉,
            # so the smaller doc only needs its first n − ⌈0.75n⌉ + 1
            # tokens in the collision join
            (F.col("n") - F.expr("(n * 3 + 3) div 4") + 1).alias("plen_s"),
        )
    )
    # Round-12 (guide §2.4, the dedup_simhash fix): spread the per-doc
    # relation across executor cores BEFORE the prefix self-join. The
    # groupBy above leaves control-plane-sized partitions that AQE
    # coalesces to ONE, the broadcast self-join preserves its streamed
    # side's layout, and so the ~78M prefix-collision rows AND the
    # 9.8M-key pair-grain partial distinct all ran in a single task
    # (21-68 s isolated, GC-bound). One hash exchange of the ~5k-row
    # per-doc relation is noise; defaultParallelism is cluster-derived,
    # not a local constant.
    per_doc = per_doc.repartition(
        max(8, spark.sparkContext.defaultParallelism), "doc_id"
    ).persist()
    prefixes = per_doc.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("toks_rare_first", F.lit(1), F.col("plen"))).alias(
            "pidx", "ptok"
        ),
    )
    # the size-smaller role probes with its shorter mid-prefix only —
    # collision rows scale with plen_s·plen instead of plen², and the
    # prefix-filter guarantee still holds per side (α ≥ ⌈0.75·n_a⌉ for
    # the smaller doc, α ≥ ⌈0.6·n_b⌉ for the larger; both role prefixes
    # are supersets of the (n − α + 1)-prefixes the theorem needs)
    shorts = per_doc.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("toks_rare_first", F.lit(1), F.col("plen_s"))).alias(
            "pidx", "ptok"
        ),
    )
    # Round-12 (guide §2.2 shuffle fewer bytes): PPJoin's LENGTH filter at
    # candidate generation — J ≥ 0.6 forces 10·i ≥ 6·(n_a + n_b − i) with
    # i ≤ min(n_a, n_b), hence 3·(n_a + n_b) ≤ 8·min(n_a, n_b); any pair
    # failing this integer test cannot reach the threshold, so dropping it
    # BEFORE the pair-grain distinct is exact (recall-1.0 preserved by the
    # same algebra the verification step applies). Measured at sf0.1:
    # 88.8M → 77.9M generated rows, 12.4M → 9.8M candidate pairs (the
    # dropped 2.6M also skip the verify intersect); wall a WASH locally
    # (17.0 vs 17.1 s — this corpus is dense, 7.1M of 12.5M doc pairs
    # really qualify, so output cost dominates) — kept for the 21%
    # candidate cut where the verify join is a real shuffle.
    # Round-13 (VERDICT r12 item 7 — PPJoin's positional machinery on top
    # of the length filter). Both token lists are sorted by the SAME
    # strict total order (df asc, tok as tie-break), which yields two
    # exact facts about a pair's shared PREFIX tokens (Xiao et al.,
    # WWW'08):
    #
    # * POSITIONAL BOUND — a token at 1-based positions (pa, pb) bounds
    #   the whole overlap by min(pa−1, pb−1) + 1 + min(n_a−pa, n_b−pb)
    #   (tokens before it in a can only match tokens before it in b, and
    #   likewise after). J ≥ 0.6 forces overlap ≥ ⌈3(n_a+n_b)/8⌉ (10·i ≥
    #   6·(n_a+n_b−i) ⇔ 16·i ≥ 6·(n_a+n_b)), so a pair whose TIGHTEST
    #   (min) bound misses α cannot qualify — pruned before the verify
    #   joins. (The row-grain variant — filter collisions, then distinct —
    #   was measured first: 9.81M → 9.79M candidates on this corpus, a
    #   0.2% cut, because most candidate pairs genuinely qualify; the
    #   pair-grain min is strictly stronger and costs one agg column.)
    # * OVERLAP DECOMPOSITION — let w be the LAST shared prefix token,
    #   at positions (pa*, pb*) = (max pa, max pb) (the same token gives
    #   both maxima; positions are monotone in the shared order). Every
    #   shared token u ≤ w sits inside BOTH prefixes (its positions are
    #   < pa* ≤ plen_a and < pb* ≤ plen_b), so the collision-row COUNT o
    #   is exactly |{shared u ≤ w}|; every shared u > w sits strictly
    #   after both positions. Hence inter = o + |toks_a[pa*+1..] ∩
    #   toks_b[pb*+1..]| — the verify step intersects only the SUFFIXES
    #   after the last shared prefix token instead of the full arrays.
    #
    # All arithmetic stays in exact integers; the DuckDB oracle is the
    # naive quadratic join, so the hash match proves recall 1.0 AND the
    # decomposition on this corpus.
    pa = F.col("a.pidx") + 1
    pb = F.col("b.pidx") + 1
    ubound = (
        F.least(pa - 1, pb - 1)
        + 1
        + F.least(F.col("a.n") - pa, F.col("b.n") - pb)
    )
    # role order: a = size-smaller doc (doc_id as tie-break), so a's
    # mid-prefix suffices and the length filter's min() side is a.n
    cand = (
        shorts.alias("a")
        .join(prefixes.alias("b"), F.col("a.ptok") == F.col("b.ptok"))
        .filter(
            (
                (F.col("a.n") < F.col("b.n"))
                | (
                    (F.col("a.n") == F.col("b.n"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (3 * (F.col("a.n") + F.col("b.n")) <= 8 * F.col("a.n"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("o"),
            F.max(pa).alias("pa_last"),
            F.max(pb).alias("pb_last"),
            F.min(ubound).alias("ub"),
        )
        .filter(F.col("ub") >= F.expr("(3 * (n_a + n_b) + 7) div 8"))
    )
    sides = per_doc.select("doc_id", "toks_rare_first")
    verified = (
        cand.join(sides.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("toks_rare_first", "ta"), "doc_a")
        .join(sides.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("toks_rare_first", "tb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            (
                F.col("o")
                + F.size(
                    F.array_intersect(
                        F.slice(
                            "ta",
                            F.col("pa_last") + 1,
                            F.col("n_a") - F.col("pa_last"),
                        ),
                        F.slice(
                            "tb",
                            F.col("pb_last") + 1,
                            F.col("n_b") - F.col("pb_last"),
                        ),
                    )
                )
            ).cast("long").alias("inter"),
        )
        .filter(10 * F.col("inter") >= 6 * (F.col("n_a") + F.col("n_b") - F.col("inter")))
        # re-orient from size-role order to the declared doc_a < doc_b
        # output order (inter/jaccard are symmetric; n follows its doc)
        .select(
            F.when(F.col("doc_a") < F.col("doc_b"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("out_a"),
            F.when(F.col("doc_a") < F.col("doc_b"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("out_b"),
            F.when(F.col("doc_a") < F.col("doc_b"), F.col("n_a"))
            .otherwise(F.col("n_b"))
            .alias("out_na"),
            F.when(F.col("doc_a") < F.col("doc_b"), F.col("n_b"))
            .otherwise(F.col("n_a"))
            .alias("out_nb"),
            "inter",
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .select(
            F.col("out_a").alias("doc_a"),
            F.col("out_b").alias("doc_b"),
            F.col("out_na").alias("n_a"),
            F.col("out_nb").alias("n_b"),
            "inter",
            "jaccard",
        )
        # Round-12 (guide §5.3 persist what is referenced twice): the
        # global ORDER BY's range partitioner runs a SAMPLING job over its
        # child, so everything past the last shuffle — both verify BHJs
        # and the array_intersect over 9.8M candidate pairs — executed
        # TWICE (+6-7 s measured at sf0.1, ~40% of the wall). The verified
        # relation is the query's own 7.1M-row output: persisting it turns
        # the sampling pass into the single real computation and the range
        # exchange into a cache read. (Reordering the sort BEFORE the
        # verify joins was A/B-measured instead and REJECTED: 70-343 s —
        # the early range exchange forces the planner into re-sorted /
        # resampled cascades downstream.)
        .persist()
        .orderBy("doc_a", "doc_b")
    )
    return verified


_SQL_INC_JACCARD = (
    "len(list_intersect(x.sh, y.sh))"
    " / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))"
)


@query(
    "dedup_minhash_lsh_incremental",
    oracle=f"""
    WITH docs AS ({_SQL_MINHASH_DOCS}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {sql_band_hash('sig', b)} AS bh FROM docs" for b in range(N_BANDS))}
    ),
    corpus_bands AS (SELECT * FROM bands WHERE doc_id % 10 <> 7),
    batch_bands AS (SELECT * FROM bands WHERE doc_id % 10 = 7),
    cand_corpus AS (
      SELECT DISTINCT b.doc_id AS doc_a, c.doc_id AS doc_b
      FROM batch_bands b JOIN corpus_bands c ON b.band = c.band AND b.bh = c.bh
    ),
    dup_corpus AS (
      SELECT DISTINCT c.doc_a AS doc_id
      FROM cand_corpus c
      JOIN docs x ON x.doc_id = c.doc_a
      JOIN docs y ON y.doc_id = c.doc_b
      WHERE {_SQL_INC_JACCARD} >= 0.8
    ),
    cand_batch AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM batch_bands a JOIN batch_bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    ),
    dup_batch AS (
      SELECT DISTINCT c.doc_b AS doc_id
      FROM cand_batch c
      JOIN docs x ON x.doc_id = c.doc_a
      JOIN docs y ON y.doc_id = c.doc_b
      WHERE {_SQL_INC_JACCARD} >= 0.8
    ),
    verdicts AS (
      SELECT d.doc_id,
             CASE WHEN dc.doc_id IS NOT NULL THEN 'near_dup_of_corpus'
                  WHEN db.doc_id IS NOT NULL THEN 'near_dup_in_batch'
                  ELSE 'accept' END AS verdict
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
      LEFT JOIN dup_corpus dc ON dc.doc_id = d.doc_id
      LEFT JOIN dup_batch db ON db.doc_id = d.doc_id
    )
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
           list_sort(list(doc_id)) AS doc_ids
    FROM verdicts GROUP BY verdict ORDER BY verdict
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "ingest"),
)
def dedup_minhash_lsh_incremental(spark, sf_dir):
    """Incremental FUZZY ingest dedup — the daily-crawl shape at the
    near-dup tier: the incoming batch (the doc_id%10==7 slice) is LSH-
    probed against the EXISTING corpus's band index and then within
    itself, so each batch doc gets the same auditable verdict ledger as
    the exact tier (`dedup_incremental_batch`) but under Jaccard ≥ 0.8
    semantics: near_dup_of_corpus (a verified corpus partner exists),
    near_dup_in_batch (no corpus partner, but a verified partner with a
    smaller doc_id arrived in the same batch — greedy keep-earliest,
    deterministic without fuzzy transitivity), else accept.

    Scale shape — the reason this is the production form of a corpus
    refresh: the corpus side appears ONLY as its banding relation
    (doc_id, band, bh — 4 slim rows/doc, exactly the persisted LSH
    index a dedup service maintains between batches) plus candidate-only
    shingle lookups; the batch's bands PROBE it by equality join, so no
    corpus self-join ever runs and the Σ|bucket|² cost of a full
    re-dedup is never paid — per-batch candidate work is the batch's
    bucket CONTACT (Σ |batch∩bucket|·|bucket|, linear in the batch),
    then exact Jaccard on candidates only. Both verdict sources ride
    ONE probe join: the admissible-partner predicate (corpus member OR
    earlier batch member) sits beside the band equality, and a single
    per-batch-doc max-flag aggregate classifies — one candidate join,
    one verify join, one aggregation (measured at sf0.1: the two-stage
    form paid 4 joins of fixed stage overhead for 59 candidates; this
    form matches the full run's stage count on ~1/5 its candidates).
    Re-running after accepting is idempotent: accepted docs' bands join
    the index; their future near-dups then classify as
    near_dup_of_corpus."""
    docs = _minhash_docs(spark, sf_dir)
    bands = _bands(docs)
    batch_bands = bands.filter(F.col("doc_id") % 10 == 7)
    x, y = _pair_sides(docs)
    probe = (
        batch_bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            # admissible partners: any corpus doc, or an EARLIER batch doc
            # (greedy keep-earliest within the batch)
            & (
                (F.col("b.doc_id") % 10 != 7)
                | (F.col("b.doc_id") < F.col("a.doc_id"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact hashed-shingle Jaccard on candidate pairs only, same int-set
    # formulation as dedup_minhash_lsh (bit-identical doubles)
    verified = (
        probe.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
            "na",
            "nb",
        )
        .filter(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")) >= 0.8)
    )
    flags = verified.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.max(F.when(F.col("doc_b") % 10 != 7, 1).otherwise(0)).alias("in_corpus"),
        F.max(F.when(F.col("doc_b") % 10 == 7, 1).otherwise(0)).alias("in_batch"),
    )
    batch_docs = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id")
    verdicts = batch_docs.join(flags, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("in_corpus") == 1, "near_dup_of_corpus")
        .when(F.col("in_batch") == 1, "near_dup_in_batch")
        .otherwise("accept")
        .alias("verdict"),
    )
    return (
        verdicts.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .orderBy("verdict")
    )
