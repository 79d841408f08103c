"""Scale-path operators: the techniques that change the cost curve at
100 TB — runtime Bloom-filter join pruning, mergeable HLL sketch rollups,
deterministic dataset splitting — each demonstrated on the fixture tables
with the same semantics they'd have on a cluster.

These register AFTER the round's CHECK_PRIORITY window and rotate into the
external correctness gate in a later round; until then the repo's own
oracle harness (tests/test_oracle_parity.py) checks them at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bifrost_spark.operators.bloom import BLOOM_DEMO_CONFS, compile_with_confs
from bifrost_spark.queries._util import dsum, sql_dsum
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table


@query(
    "q_bloom_prune",
    oracle=f"""
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with Catalyst runtime Bloom-filter pruning: urgent
    orders (selective dim filter) joined to lineitem, revenue per return
    flag.  The optimizer injects ``might_contain(bloom, xxhash64(key))``
    into the lineitem SCAN, so non-urgent line items are dropped before
    the shuffle — at 100 TB that is the difference between shuffling the
    full fact table and shuffling the ~20% that joins.

    Semantics are identical to the plain join (a Bloom filter only
    over-approximates the key set; the join still decides), which is why
    an exact oracle applies.  The plan is compiled under
    BLOOM_DEMO_CONFS (operators/bloom.py) because Spark's size gates for
    the rule are tuned for clusters, not fixtures;
    tests/test_plans.py asserts the injected filter is present.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )
    return compile_with_confs(joined, BLOOM_DEMO_CONFS)


@query("q_hll_rollup", oracle=None)  # DataSketches-specific bytes → rows-only
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: per-day HLL sketches of active
    users, merged to per-month estimates WITHOUT rescanning raw events —
    the pattern that makes 100 TB distinct-count dashboards incremental
    (store the daily sketch bytes, union them for any period).

    Spark 4's Apache DataSketches functions (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate) are partially aggregated and
    merge by register-max — commutative and idempotent, so the merged
    estimate is independent of partition layout (the single-sketch HIP
    estimator path is order-dependent; the union path used here is not).
    tests/test_sketch_quality.py gates the estimate against exact
    COUNT(DISTINCT) and pins partition-invariance of the merged rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        daily.groupBy(F.date_trunc("month", "day").cast("date").alias("month"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


# deterministic md5-bucket split: hex prefixes are engine-portable (Spark
# and DuckDB md5 produce identical lowercase hex; fixed-length hex compares
# lexicographically = numerically).  2 hex chars = 256 buckets:
# train < 'e6' (230/256 ≈ 89.8%), val < 'f3' (13/256 ≈ 5.1%), else test.
_SPLIT_TRAIN_HI = "e6"
_SPLIT_VAL_HI = "f3"


@query(
    "q_dataset_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN b < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN b < '{_SPLIT_VAL_HI}' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
              FROM documents)
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (≈90/5/5) by md5 bucket of
    the document id: stable across runs, engines, partitionings, and
    dataset growth (a doc's split never changes when other docs arrive) —
    the property random splits lack and training reproducibility needs.
    Pure per-row expression; no shuffle, no RNG."""
    d = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(b < _SPLIT_TRAIN_HI, "train")
        .when(b < _SPLIT_VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


# per-stratum sampling rates (rebalance class skew for training): 4 hex
# chars = 65536 buckets; keep a row iff its bucket < the stratum threshold.
# rate 1.0 keeps the stratum unconditionally — format(65536) would be the
# 5-char "10000", which compares LOWER than most 4-char buckets ('f...' >
# '1...') and silently sampled ~6% instead of 100%.
_STRATA_RATES = {"view": 0.02, "click": 0.10, "purchase": 1.0}
_STRATA_HEX = {
    k: (None if v >= 1.0 else format(int(v * 65536), "04x"))
    for k, v in _STRATA_RATES.items()
}


def _stratum_sql(stratum: str, hi: str | None) -> str:
    cond = f"event_type = '{stratum}'"
    return cond if hi is None else f"({cond} AND b < '{hi}')"


@query(
    "q_stratified_sample",
    oracle=f"""
        SELECT event_id, event_type
        FROM (SELECT event_id, event_type,
                     substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS b
              FROM events)
        WHERE {" OR ".join(_stratum_sql(k, v) for k, v in _STRATA_HEX.items())}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: each event stratum keeps its
    own md5-bucket fraction (views 2%, clicks 10%, purchases 100%) — the
    class-rebalancing sampler for training data, reproducible across runs
    and engines because the keep-decision is a pure hash of the row key
    (no RNG, no sampleBy seed drift).  Scan-speed per-row predicate; the
    sample is taken BEFORE any shuffle so downstream stages only pay for
    kept rows."""
    ev = load_table(spark, sf_dir, "events")
    b = F.substring(F.md5(F.col("event_id").cast("string")), 1, 4)
    keep = None
    for stratum, hi in _STRATA_HEX.items():
        cond = F.col("event_type") == stratum
        if hi is not None:
            cond = cond & (b < hi)
        keep = cond if keep is None else keep | cond
    return ev.filter(keep).select("event_id", "event_type")


# pipeline constants: quality gates, language whitelist, token budget
_PIPE_MIN_TOKENS = 30
_PIPE_MIN_CHARS = 150
_PIPE_MIN_UNIQ = 0.4  # distinct-token ratio — repetition junk filter
_PIPE_LANGS = ("en", "es", "de")
_PIPE_BUDGET = 15_000  # total token budget for the selected corpus


@query(
    "q_pipeline_e2e",
    oracle=f"""
        WITH sig AS (
          SELECT doc_id, text, lang,
                 len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tokens,
                 len(list_distinct(list_filter(string_split(text, ' '),
                                               t -> t <> ''))) AS n_uniq,
                 octet_length(encode(text)) AS n_chars
          FROM documents
        ),
        quality AS (
          SELECT * FROM sig
          WHERE n_tokens >= {_PIPE_MIN_TOKENS}
            AND n_chars >= {_PIPE_MIN_CHARS}
            AND CAST(n_uniq AS DOUBLE) / n_tokens >= {_PIPE_MIN_UNIQ}
            AND lang IN {_PIPE_LANGS!r}
        ),
        dedup AS (
          SELECT doc_id, n_tokens,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY n_tokens DESC, doc_id) AS rn
          FROM quality
        ),
        kept AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
                   AS cum_tokens
          FROM dedup WHERE rn = 1
        )
        SELECT doc_id, n_tokens, cum_tokens
        FROM kept WHERE cum_tokens <= {_PIPE_BUDGET}
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep as ONE composed DataFrame plan:
    quality gates (token/char floors, distinct-token ratio against
    repetition junk) → language whitelist → exact dedup keeping the
    longest copy → deterministic token-budget selection (cumulative sum in
    doc_id order, cut at the budget).

    Scale shape: signals and filters are scan-side per-row expressions
    (pushdown-friendly, no Python); the dedup shuffles md5 fingerprints +
    metadata only (text never moves past its scan); the budget cumsum runs
    on the post-filter METADATA (doc_id, n_tokens) — a single-partition
    window over ids and counts, fine at billions of docs, while the text
    itself is never globally ordered.  Every step is exact and
    engine-portable → full oracle."""
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.octet_length("text").alias("n_chars"),
    )
    quality = d.filter(
        (F.col("n_tokens") >= _PIPE_MIN_TOKENS)
        & (F.col("n_chars") >= _PIPE_MIN_CHARS)
        & (F.col("n_uniq").cast("double") / F.col("n_tokens") >= _PIPE_MIN_UNIQ)
        & F.col("lang").isin(list(_PIPE_LANGS))
    )
    from pyspark.sql.window import Window

    dedup_w = Window.partitionBy(F.md5("text")).orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    kept = (
        quality.withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"))
    )
    cum_w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        kept.withColumn("cum_tokens", F.sum("n_tokens").over(cum_w))
        .filter(F.col("cum_tokens") <= _PIPE_BUDGET)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


@query(
    "q_recursive_cte",
    oracle="""
        WITH RECURSIVE anc(part, node, depth) AS (
          SELECT p_partkey, p_partkey // 2, CAST(1 AS BIGINT)
          FROM part WHERE p_partkey >= 2
          UNION ALL
          SELECT part, node // 2, depth + 1 FROM anc WHERE node >= 2
        )
        SELECT part, CAST(MAX(depth) AS BIGINT) AS depth_to_root
        FROM anc GROUP BY part
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): ancestor-chain walk over a
    synthetic binary hierarchy on part keys (parent = key div 2), emitting
    each part's depth to the root — the BOM-explosion / org-chart
    traversal shape SQL engines historically needed iterative drivers for.

    Spark executes the recursion as iterative UNION ALL steps inside ONE
    SQL statement (depth here ≈ log₂ max key ≈ 15 rounds); each round is a
    distributed scan+filter, so the pattern holds at any fan-out.  The
    driver-loop twin (operators/dedup.py connected_components) remains the
    right tool when per-round dedup/aggregation must bound state."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("brc_part")
    return spark.sql(
        """
        WITH RECURSIVE anc(part, node, depth) AS (
          SELECT p_partkey, p_partkey div 2, CAST(1 AS BIGINT)
          FROM brc_part WHERE p_partkey >= 2
          UNION ALL
          SELECT part, node div 2, depth + 1 FROM anc WHERE node >= 2
        )
        SELECT part, MAX(depth) AS depth_to_root
        FROM anc GROUP BY part
        """
    )


# fuzzy decontamination: benchmark set = every 10th doc (deterministic
# stand-in for an eval suite); flag corpus docs whose MinHash est_jaccard
# vs ANY benchmark doc crosses the threshold.
_DECON_THRESHOLD = 0.5


@query("q_decontaminate_fuzzy", oracle=None)  # hash-family → rows-only
def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy eval-set decontamination: MinHash+LSH near-dup detection of
    corpus docs against a benchmark set (here: doc_id ≡ 7 mod 10), flagging
    near-copies that exact decontamination (q_decontaminate) misses when
    the leaked text is lightly edited.

    One signature pass over corpus ∪ benchmark, LSH banding, then
    candidates filtered to corpus×benchmark pairs — candidate volume
    tracks true contamination, not |corpus|×|benchmark|.
    tests/test_sketch_quality.py gates recall against the exact-Jaccard
    contamination set."""
    from bifrost_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(
        d, "text", "doc_id", num_hashes=64, winnow_mod=2, shingle="word"
    )
    pairs = lsh_candidate_pairs(sig, "doc_id", bands=16, rows_per_band=4).filter(
        F.col("est_jaccard") >= _DECON_THRESHOLD
    )
    is_bench_a = F.col("id_a") % 10 == 7
    is_bench_b = F.col("id_b") % 10 == 7
    flagged = (
        pairs.filter(is_bench_a != is_bench_b)
        .select(
            F.when(is_bench_b, F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id")
        )
        .distinct()
    )
    return flagged.select("doc_id").orderBy("doc_id")


@query(
    "q_triangle_count",
    oracle="""
        WITH edges AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        tri AS (
          SELECT e1.a, e1.b, e2.b AS c
          FROM edges e1
          JOIN edges e2 ON e2.a = e1.b
          JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS node FROM tri UNION ALL
              SELECT b FROM tri UNION ALL
              SELECT c FROM tri)
        GROUP BY node
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the co-purchase support graph —
    the clustering-coefficient primitive of distributed graph analytics.
    Degree-oriented enumeration (the standard distributed-triangle
    optimization, cf. Suri & Vassilvitskii 2011): every edge is DIRECTED
    from its lower-(degree, id) endpoint to the higher one, wedges are
    generated only at each edge's smaller-degree source, and a third join
    closes them.  Wedge volume is Σ out-deg² with out-degrees bounded by
    orientation — a hub of degree d generates O(d) oriented wedges
    instead of O(d²) unoriented ones, which is the difference between a
    tractable and an exploding candidate set on power-law graphs.  All
    joins stay key-equi (shuffle-hash-able, AQE skew-splittable); each
    triangle is found exactly once (at its minimum-degree vertex), and
    per-node credit flows through one in-row explode."""
    from bifrost_spark.queries._util import spread

    # _util.spread + one checkpointed frame for both self-join sides: the
    # pair fan-out + count partials otherwise run in the scan's single
    # input split (guide §2.5; the q_copurchase device — same edge shape)
    l = spread(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    ).localCheckpoint(eager=True)
    a = l.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
        # consumed by the degree count AND the orientation join; the edge
        # build is a lineitem self-join + aggregation — without the
        # checkpoint each consumer recomputed it (18 parquet scans in the
        # executed plan of the unoriented spelling; 0 in the final plan now)
        .localCheckpoint(eager=True)
    )
    # undirected degree per node, then orient each edge low→high by
    # (degree, id) — a total order, so orientation is deterministic
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ka = F.struct(F.col("deg_a"), F.col("a"))
    kb = F.struct(F.col("deg_b"), F.col("b"))
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(
                ka < kb,
                F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n")),
            )
            .otherwise(F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n")))
            .alias("dstk"),
        )
        .localCheckpoint(eager=True)  # consumed 3x: both wedge legs + closer
    )
    w1 = oriented.select("src", F.col("dstk").alias("vk"))
    w2 = oriented.select("src", F.col("dstk").alias("wk"))
    closer = oriented.select(
        F.col("src").alias("v"), F.col("dstk.n").alias("w")
    )
    tri = (
        w1.join(w2, "src")
        .filter(F.col("vk") < F.col("wk"))  # each wedge once
        .select(
            "src",
            F.col("vk.n").alias("v"),
            F.col("wk.n").alias("w"),
        )
        .join(closer, ["v", "w"])
        .select(F.col("src").alias("a"), F.col("v").alias("b"), F.col("w").alias("c"))
    )
    # each triangle credits its 3 vertices: explode INSIDE the row — a
    # 3-way unionAll of projections would evaluate the triangle join 3x
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "q_join_skew_salted",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join as a first-class query: the large side's key is
    salted (deterministic xxhash64 of row content, 8 salts), the small
    side replicated once per salt, joined on (key, salt) — spreading any
    hot key across 8 tasks.  The oracle is the PLAIN join aggregate:
    salting must never change semantics, and the deterministic salt makes
    task retries reproduce identical output (operators/skew.py; AQE's
    skew-join split handles most cases, salting is the explicit fallback
    for broadcast-ineligible power-law keys)."""
    from bifrost_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        l.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on="k",
        num_salts=8,
        salt_source=("k",),
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_items"))


@query(
    "q_lm_score",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS tok
          FROM documents
        ),
        freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round(log2((SELECT t FROM tot))
                     - CAST(SUM(CAST(round(log2(f.c), 12)
                                     AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*), 9) AS avg_neg_log2_p
        FROM tok JOIN freq f USING (tok)
        GROUP BY doc_id
    """,
)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, avg_neg_log2_p) — the shared surprisal frame
    behind q_lm_score and llm_clean.q_ccnet_bucket; see q_lm_score for
    the determinism contract."""
    from bifrost_spark.queries._util import spread

    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    # _util.spread + checkpoint: the token explode feeds the dictionary
    # build AND the probe join — one spread materialization instead of two
    # single-split derivations (guide §2.5/§5)
    tok = (
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", F.explode(toks).alias("tok"))
        .localCheckpoint(eager=True)
    )
    # the term dictionary is Zipf-bounded (≪ corpus size) — checkpoint it
    # so the corpus total below is just Σc over the dictionary, not a
    # third full pass; measured 1.39 → 1.21 s at sf0.1 on q_ccnet_bucket
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    total = freq.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t"))
    per_doc = (
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.round(F.log2("c"), 12).cast("decimal(28,12)")
            ).alias("sum_log"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log2("t") - F.col("sum_log").cast("double") / F.col("n_tokens"),
            9,
        ).alias("avg_neg_log2_p"),
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal score per document —
    avg −log₂ p(token) under the corpus unigram distribution, the
    perplexity-style quality signal (low = templated/common text, high =
    rare-token or noisy text).  Two scan-side shuffles: corpus token
    counts, then per-doc aggregation of log-counts.

    Determinism: the score decomposes as log₂T − (Σ log₂ c_t)/n, where
    c_t are INTEGER counts — each log₂(c_t) is rounded to 12 dp and
    accumulated in DECIMAL(28,12) (order-independent), and the output is
    rounded at 9 dp, far above both the per-addend 1-ulp cross-engine
    log divergence (≤1e-12 after addend rounding) and the final division
    ulp."""
    return unigram_surprisal(spark, sf_dir)


@query(
    "q_dataset_split_grouped",
    oracle=f"""
        SELECT doc_id, source,
               CASE WHEN b < '{_SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN b < '{_SPLIT_VAL_HI}' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, source, substr(md5(source), 1, 2) AS b
              FROM documents)
    """,
)
def q_dataset_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: the md5 bucket hashes the SOURCE
    (domain/site/provider), so every document from one source lands in the
    SAME split — the leakage guard plain per-doc splitting lacks (near-dup
    documents cluster within a source; splitting them across train and
    test inflates eval).  Same scan-speed, RNG-free determinism as
    q_dataset_split."""
    d = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5("source"), 1, 2)
    return d.select(
        "doc_id",
        "source",
        F.when(b < _SPLIT_TRAIN_HI, "train")
        .when(b < _SPLIT_VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


@query("q_theta_overlap", oracle=None)  # DataSketches bytes → rows-only
def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap set algebra on theta sketches: distinct users per
    event segment, then |A∩B| / |A∪B| / |A∖B| ESTIMATED FROM THE SKETCHES
    for every segment pair — the cross-segment question HLL cannot answer
    (HLL only unions).  At 100 TB: one sketch per segment per partition
    (mergeable, bytes-sized), pairwise algebra on the driver-sized final
    sketches, raw users never re-scanned per pair.
    tests/test_sketch_quality.py gates the estimates against exact
    distinct-intersection counts."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    a = sk.select(F.col("event_type").alias("seg_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("seg_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    return pairs.select(
        "seg_a",
        "seg_b",
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("n_both"),
        F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b"))).alias(
            "n_either"
        ),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).alias("n_only_a"),
    )


@query("q_heavy_hitters", oracle=None)  # sketch order/ties → rows-only
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items (heavy hitters) over the document token stream via
    ``approx_top_k`` — the mergeable top-k sketch for 100 TB vocabularies
    where an exact groupBy-then-sort of every distinct token is the
    bottleneck.  The sketch state is maxItemsTracked counters (mergeable
    across partitions); output is exploded to scalar (item, count) rows.
    tests/test_sketch_quality.py checks every reported count against the
    exact token counts and the reported set against the true top-k."""
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(toks).alias("tok")
    )
    tok.createOrReplaceTempView("brc_tokens")
    sketch = spark.sql(
        "SELECT approx_top_k(tok, 10, 10000) AS top FROM brc_tokens"
    )
    return sketch.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("n")
    )


_HH_SUPPORT = 0.005  # exact heavy-hitter support threshold


@query(
    "q_heavy_hitters_exact",
    oracle=f"""
        WITH tok AS (
          SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS tok
          FROM documents
        ),
        counts AS (
          SELECT tok AS item, CAST(COUNT(*) AS BIGINT) AS n
          FROM tok GROUP BY tok
        ),
        tot AS (SELECT SUM(n) AS total FROM counts)
        SELECT item, n
        FROM counts
        WHERE CAST(n AS DECIMAL(38,3)) * 1000
                > CAST({int(_HH_SUPPORT * 1000)} AS DECIMAL(38,3))
                  * (SELECT total FROM tot)
    """,
)
def q_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters: every token whose count exceeds {s} of the
    total token stream — the oracle-checkable twin of q_heavy_hitters'
    approx_top_k sketch.  The sketch is the 100 TB default (bounded
    state); this exact spelling is what validates it, and is itself
    viable whenever the DISTINCT vocabulary fits a shuffle (true for
    word-level tokens even at corpus scale — vocabulary grows ~Heaps'
    law, not linearly).

    The support comparison is exact integer/decimal arithmetic
    (n·1000 > 5·total avoids any float threshold), so membership is
    engine-identical even for counts landing exactly on the boundary.
    One map-side-combined count shuffle; the total folds back over the
    checkpointed counts frame — no second corpus scan."""
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    counts = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)  # consumed by total AND the filter
    )
    tot = counts.agg(F.sum("n").alias("total"))
    thousandths = int(_HH_SUPPORT * 1000)
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n").cast("decimal(38,3)") * 1000
            > F.lit(thousandths).cast("decimal(38,3)") * F.col("total")
        )
        .select("item", "n")
    )


_NEG_K = 5  # negatives to emit per user
_NEG_DRAWS = 20  # hash draws per user (margin over positives + collisions)
_NEG_A, _NEG_B, _NEG_M = 2654435761, 40503, 4294967296


@query(
    "q_negative_sampling",
    oracle=f"""
        WITH inter AS (
          SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        np AS (SELECT COUNT(*) AS n_parts FROM part),
        draws AS (
          SELECT c_custkey,
                 CAST(i AS BIGINT) AS i,
                 (c_custkey * {_NEG_A} + CAST(i AS BIGINT) * {_NEG_B})
                   % {_NEG_M} % (SELECT n_parts FROM np) AS p
          FROM customer, UNNEST(range(0, {_NEG_DRAWS})) AS t(i)
        ),
        dedup AS (
          SELECT c_custkey, p, MIN(i) AS i
          FROM draws GROUP BY c_custkey, p
        ),
        neg AS (
          SELECT d.c_custkey, d.p, d.i
          FROM dedup d
          WHERE NOT EXISTS (
            SELECT 1 FROM inter x WHERE x.c = d.c_custkey AND x.p = d.p
          )
        )
        SELECT c_custkey, CAST(p AS BIGINT) AS part_key,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
          SELECT c_custkey, p,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY i) AS rnk
          FROM neg
        ) WHERE rnk <= {_NEG_K}
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling — the contrastive/recsys training
    step: for every customer, {K} parts they did NOT purchase, drawn
    pseudo-randomly but REPRODUCIBLY (hash-derived draws, not rand():
    a retried stage regenerates the identical sample — the same property
    q_dsir_resample relies on).

    The scalable spelling draws {D} hash candidates per user
    (p = (c·A + i·B) mod M mod |catalog|), dedups collided draws
    (keep lowest draw index), LEFT-ANTI joins the interaction set, and
    keeps the first {K} survivors by draw order — O(D·|users|) candidate
    rows instead of the |users|×|catalog| cross join the naive anti-join
    spelling materializes.  Users whose interaction density eats >
    (D−K)/D of the draws emit fewer than {K} rows (production re-draws
    with a second hash constant; at real catalog sizes — millions — the
    collision rate makes this a non-event).

    Shapes: one shuffle for the distinct interaction pairs, one for the
    candidate anti join (both keyed on user), a per-user rank window over
    ≤{D} rows.  All arithmetic is int64-exact (draws bounded by
    |users|·A + D·B < 2^63), so membership and order are
    engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    inter = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n_parts = load_table(spark, sf_dir, "part").count()
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    draws = c.select(
        "c_custkey",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(_NEG_DRAWS - 1).cast("bigint"))
        ).alias("i"),
    ).select(
        "c_custkey",
        "i",
        (
            (F.col("c_custkey") * _NEG_A + F.col("i") * _NEG_B)
            % _NEG_M
            % F.lit(int(n_parts))
        ).alias("p"),
    )
    dedup = draws.groupBy("c_custkey", "p").agg(F.min("i").alias("i"))
    neg = dedup.join(inter, ["c_custkey", "p"], "left_anti")
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_custkey").orderBy("i")
    return (
        neg.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _NEG_K)
        .select("c_custkey", F.col("p").cast("bigint").alias("part_key"), "rnk")
    )


_EMBARGO_T1 = "2024-01-20 00:00:00"  # train/test boundary
_EMBARGO_T2 = "2024-01-22 00:00:00"  # test starts after the embargo gap


@query(
    "q_temporal_split",
    oracle=f"""
        SELECT event_id,
               CASE WHEN ts < TIMESTAMP '{_EMBARGO_T1}' THEN 'train'
                    ELSE 'test' END AS split
        FROM events
        WHERE ts < TIMESTAMP '{_EMBARGO_T1}'
           OR ts >= TIMESTAMP '{_EMBARGO_T2}'
    """,
)
def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an EMBARGO gap (the time-series CV
    discipline, e.g. de Prado 2018 §7): train strictly before T1, test
    strictly from T2, rows inside [T1, T2) dropped entirely — the guard
    against look-ahead leakage through labels/features whose computation
    windows straddle the boundary (a plain date split leaks whenever a
    feature aggregates a trailing window).

    Contrast with q_dataset_split (hash-random, exchangeable data) and
    q_dataset_split_grouped (leakage via group identity): temporal +
    embargo is the correct split whenever rows are a time series.  Pure
    pushed-down filter + literal CASE — scan speed, zero shuffle, and
    the split is a pure function of the timestamp (reproducible on any
    cluster, trivially)."""
    e = load_table(spark, sf_dir, "events")
    t1 = F.lit(_EMBARGO_T1).cast("timestamp")
    t2 = F.lit(_EMBARGO_T2).cast("timestamp")
    return e.filter((F.col("ts") < t1) | (F.col("ts") >= t2)).select(
        "event_id",
        F.when(F.col("ts") < t1, "train").otherwise("test").alias("split"),
    )


@query(
    "q_skew_report",
    oracle="""
        WITH c AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY o_custkey
        ),
        r AS (
          SELECT n,
                 ROW_NUMBER() OVER (ORDER BY n, o_custkey) AS i,
                 COUNT(*) OVER () AS k,
                 SUM(n) OVER () AS tot
          FROM c
        )
        SELECT CAST(MIN(k) AS BIGINT) AS n_keys,
               CAST(MIN(tot) AS BIGINT) AS n_rows,
               CAST(MAX(n) AS BIGINT) AS max_n,
               -- floor, not CAST: DuckDB CAST(1.5 AS BIGINT) rounds to 2
               -- while Spark's cast truncates to 1 — divergent lower-middle
               -- rank whenever the key count is EVEN (fuzzer finding)
               CAST(MAX(CASE WHEN i = CAST(floor((k + 1) / 2.0) AS BIGINT)
                             THEN n END) AS BIGINT) AS median_n,
               round(CAST(MAX(n) AS DOUBLE)
                     / MAX(CASE WHEN i = CAST(floor((k + 1) / 2.0) AS BIGINT)
                                THEN n END), 9) AS skew_ratio,
               round(CAST(SUM(CAST((2 * i - k - 1)
                                   AS DECIMAL(38,0)) * n) AS DOUBLE)
                     / (MIN(k) * CAST(MIN(tot) AS DOUBLE)), 9) AS gini
        FROM r
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for orders.o_custkey — the DETECTOR
    paired with q_join_skew_salted's fixer: per-key row counts reduced to
    the numbers a capacity planner reads before a big join — max key
    size, exact median key size (lower-middle rank — integer-exact, no
    percentile interpolation), their ratio (the "how many salts do I
    need" number), and the Gini coefficient of the key-size distribution
    (0 = uniform, →1 = one hub key owns the table).

    Gini via the rank identity G = Σ(2i−k−1)·x₍ᵢ₎ / (k·Σx) over the
    ascending counts — an INTEGER numerator (DECIMAL(38,0): rank×count
    products overflow int64 beyond ~10⁹ keys), one final division.

    Shape: one map-side-combined count shuffle to the distinct-key
    frame; the rank window runs over that frame (|keys|, not |rows| —
    same bounded-frame argument as q_ks_drift), with a unique (n, key)
    order so ranks are engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    c = o.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wr = Window.orderBy("n", "o_custkey")
    r = c.select(
        "n",
        F.row_number().over(wr).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("k"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("tot"),
    )
    # floor, not bare cast (fuzzer finding): with an EVEN key count the
    # lower-middle rank is (k+1)/2 = x.5, which Spark's cast truncates but
    # DuckDB's CAST rounds — floor() is the engine-portable spelling
    med = F.max(
        F.when(
            F.col("i") == F.floor((F.col("k") + 1) / 2.0).cast("bigint"),
            F.col("n"),
        )
    )
    gini_num = F.sum(
        (2 * F.col("i") - F.col("k") - 1).cast("decimal(38,0)") * F.col("n")
    )
    return r.agg(
        F.min("k").alias("n_keys"),
        F.min("tot").alias("n_rows"),
        F.max("n").alias("max_n"),
        med.cast("bigint").alias("median_n"),
        F.round(F.max("n").cast("double") / med, 9).alias("skew_ratio"),
        F.round(
            gini_num.cast("double")
            / (F.min("k") * F.min("tot").cast("double")),
            9,
        ).alias("gini"),
    )


# Mergeable equi-depth quantile sketch: K summary points per day; the
# weekly rollup merges daily sketches by weighted rank, never re-scanning
# raw events.  Rank-error bound: each daily point's true rank is known
# within its bucket width n_day/K, so any merged-quantile estimate sits
# within 1/K relative rank per contributing day (gated in
# tests/test_sketch_quality.py against exact quantiles).
_QSK_K = 64
_QSK_PCTS = (50, 90, 99)


@query(
    "q_quantile_sketch_rollup",
    oracle=f"""
        WITH base AS (
          SELECT date_trunc('day', ts) AS day,
                 CAST(date_trunc('week', ts) AS DATE) AS week,
                 value,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
          FROM events WHERE value IS NOT NULL
        ),
        sk AS (
          SELECT day, MIN(week) AS week,
                 ((rn - 1) * {_QSK_K}) // n AS bucket,
                 arg_max(value, rn) AS pv,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM base GROUP BY day, ((rn - 1) * {_QSK_K}) // n
        ),
        merged AS (
          SELECT week, pv,
                 SUM(w) OVER (PARTITION BY week
                              ORDER BY pv, day, bucket) AS cum,
                 SUM(w) OVER (PARTITION BY week) AS total
          FROM sk
        ),
        q AS (SELECT CAST(unnest([{", ".join(str(p) for p in _QSK_PCTS)}])
                          AS BIGINT) AS q_pct)
        SELECT week, q_pct,
               MIN(CASE WHEN 100 * cum >= q_pct * total THEN pv END)
                 AS est_value
        FROM merged, q
        GROUP BY week, q_pct
    """,
)
def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile-sketch rollup — the q_hll_rollup twin for
    percentiles (VERDICT r6 item 5c): per-day equi-depth sketches
    (64 weighted summary points: each bucket's right-edge value
    carrying the bucket's row count) merged to per-week p50/p90/p99 by
    weighted rank, WITHOUT rescanning raw events.  This is the pattern
    that makes 100 TB latency/size dashboards incremental: store the K
    points per (day, metric), answer any period's percentiles from
    days·K points — and unlike hll_sketch_agg's opaque bytes, the
    summary is plain (value, weight) rows, so the merge is ordinary SQL
    and the driver can hash-check it exactly.

    Scale shape: the daily sketch is one window pass partitioned by day
    (rank + count; the shuffle carries (day,value) pairs once) followed
    by a groupBy to day·64 rows; the weekly merge then works on
    days·64 rows only.  At 100 TB the window stage is the scan-
    bound step, and day-partitioned parquet makes it partition-local.

    Determinism: bucket assignment is pure integer arithmetic
    (((rn−1)·K) div n), the point value is max_by over the unique
    in-day rank, the merge orders by (value, day, bucket) — a total
    order, values being raw parquet doubles compared bit-identically —
    and quantile selection is the integer threshold 100·cum ≥ pct·total.
    No float is ever computed, only routed.

    The daily sketch is the SHARED ``daily_value_sketch`` helper — one
    spelling for this rollup, q_sketch_drift, and the streaming monitor
    (streaming/sketch_drift.py), so their by-construction parity cannot
    drift apart under edits (ADVICE r8)."""
    from pyspark.sql.window import Window

    sk = daily_value_sketch(load_table(spark, sf_dir, "events"))
    wweek = Window.partitionBy("week")
    merged = sk.select(
        "week",
        "pv",
        F.sum("w").over(wweek.orderBy("pv", "day", "bucket")).alias("cum"),
        F.sum("w").over(wweek).alias("total"),
    )
    qd = merged.select(
        "week",
        "pv",
        "cum",
        "total",
        F.explode(
            F.array(*[F.lit(p).cast("bigint") for p in _QSK_PCTS])
        ).alias("q_pct"),
    )
    return qd.groupBy("week", "q_pct").agg(
        F.min(
            F.when(F.lit(100) * F.col("cum") >= F.col("q_pct") * F.col("total"), F.col("pv"))
        ).alias("est_value")
    )


# ---------------------------------------------------------------------------
# q_sketch_drift — daily KS alarm over mergeable quantile sketches
# ---------------------------------------------------------------------------

_DEC_RANK = "decimal(38,0)"  # exact cross products of cumulative ranks

# Alarm when the sketch-estimated KS distance exceeds 1/5 — compared in
# exact integers (5 * max|cum_d*tb - cum_b*td| > td*tb), never a float
# threshold.
_SKD_ALARM_NUM = 5



def daily_value_sketch(ev):
    """(day, week, bucket, pv, w): the shared 64-point equi-depth daily
    sketch (the q_quantile_sketch_rollup summary), factored out so the
    batch drift query and the streaming monitor
    (streaming/sketch_drift.py) sketch identically by construction."""
    from pyspark.sql.window import Window

    wday = Window.partitionBy("day")
    base = ev.filter(F.col("value").isNotNull()).select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").cast("date").alias("week"),
        "value",
        "event_id",
    ).select(
        "day",
        "week",
        "value",
        F.row_number().over(wday.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wday).alias("n"),
    )
    return (
        base.withColumn("bucket", F.expr(f"((rn - 1) * {_QSK_K}) DIV n"))
        .groupBy("day", "bucket")
        .agg(
            F.min("week").alias("week"),
            F.max_by("value", "rn").alias("pv"),
            F.count(F.lit(1)).cast("bigint").alias("w"),
        )
    )


def score_days_against_baseline(scoring, bl):
    """Per-day KS of (day, pv, w) sketch rows against a (pv, wb) baseline
    sketch: exact DECIMAL(38,0) CDF cross products over the union grid.
    ``scoring`` and ``bl`` are summary frames (days·K and ≤7·K rows) —
    nothing here touches raw data."""
    from pyspark.sql.window import Window

    days = scoring.select("day").distinct()
    pts = scoring.select(
        "day",
        F.col("pv").alias("v"),
        F.col("w").alias("wd"),
        F.lit(0).cast("bigint").alias("wb"),
    ).unionByName(
        days.crossJoin(F.broadcast(bl)).select(
            "day",
            F.col("pv").alias("v"),
            F.lit(0).cast("bigint").alias("wd"),
            F.col("wb"),
        )
    )
    cells = pts.groupBy("day", "v").agg(
        F.sum("wd").alias("wd"), F.sum("wb").alias("wb")
    )
    wc = Window.partitionBy("day").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("day")
    cum = cells.select(
        "day",
        "v",
        F.sum("wd").over(wc).alias("cum_d"),
        F.sum("wb").over(wc).alias("cum_b"),
        F.sum("wd").over(wt).alias("td"),
        F.sum("wb").over(wt).alias("tb"),
    )
    gap = F.abs(
        F.col("cum_d").cast(_DEC_RANK) * F.col("tb")
        - F.col("cum_b").cast(_DEC_RANK) * F.col("td")
    )
    agg = cum.groupBy("day").agg(
        F.min("td").cast("bigint").alias("n_day"),
        F.min("tb").cast("bigint").alias("n_base"),
        F.max(gap).alias("maxgap"),
        F.min("td").cast(_DEC_RANK).alias("_tdd"),
        F.min("tb").cast(_DEC_RANK).alias("_tbd"),
    )
    return agg.select(
        "day",
        "n_day",
        "n_base",
        (
            F.round(
                F.col("maxgap").cast("double")
                / (F.col("n_day").cast("double") * F.col("n_base")),
                9,
            )
            + F.lit(0.0)
        ).alias("ks_d"),
        F.when(
            F.lit(_SKD_ALARM_NUM) * F.col("maxgap") > F.col("_tdd") * F.col("_tbd"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("alarm"),
    )


@query(
    "q_sketch_drift",
    oracle=f"""
        WITH base AS (
          SELECT date_trunc('day', ts) AS day,
                 CAST(date_trunc('week', ts) AS DATE) AS week,
                 value,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
          FROM events WHERE value IS NOT NULL
        ),
        sk AS (
          SELECT day, MIN(week) AS week,
                 ((rn - 1) * {_QSK_K}) // n AS bucket,
                 arg_max(value, rn) AS pv,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM base GROUP BY day, ((rn - 1) * {_QSK_K}) // n
        ),
        w0 AS (SELECT MIN(week) AS min_week FROM sk),
        bl AS (
          SELECT pv, CAST(SUM(w) AS BIGINT) AS wb
          FROM sk, w0 WHERE week = min_week GROUP BY pv
        ),
        days AS (
          SELECT DISTINCT day FROM sk, w0 WHERE week > min_week
        ),
        pts AS (
          SELECT day, pv AS v, w AS wd, CAST(0 AS BIGINT) AS wb
          FROM sk, w0 WHERE week > min_week
          UNION ALL
          SELECT d.day, b.pv AS v, CAST(0 AS BIGINT) AS wd, b.wb
          FROM days d, bl b
        ),
        cells AS (
          SELECT day, v, SUM(wd) AS wd, SUM(wb) AS wb
          FROM pts GROUP BY day, v
        ),
        cum AS (
          SELECT day, v,
                 SUM(wd) OVER (PARTITION BY day ORDER BY v) AS cum_d,
                 SUM(wb) OVER (PARTITION BY day ORDER BY v) AS cum_b,
                 SUM(wd) OVER (PARTITION BY day) AS td,
                 SUM(wb) OVER (PARTITION BY day) AS tb
          FROM cells
        )
        SELECT day,
               CAST(MIN(td) AS BIGINT) AS n_day,
               CAST(MIN(tb) AS BIGINT) AS n_base,
               round(CAST(MAX(abs(CAST(cum_d AS DECIMAL(38,0)) * tb
                                  - CAST(cum_b AS DECIMAL(38,0)) * td))
                          AS DOUBLE)
                     / (CAST(MIN(td) AS DOUBLE) * MIN(tb)), 9) + 0.0
                 AS ks_d,
               CAST(CASE WHEN {_SKD_ALARM_NUM}
                              * MAX(abs(CAST(cum_d AS DECIMAL(38,0)) * tb
                                        - CAST(cum_b AS DECIMAL(38,0)) * td))
                              > CAST(MIN(td) AS DECIMAL(38,0)) * MIN(tb)
                         THEN 1 ELSE 0 END AS BIGINT) AS alarm
        FROM cum GROUP BY day
    """,
)
def q_sketch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distribution-drift alarm over MERGEABLE quantile sketches
    (VERDICT r7 item 4c): each day's 64-point equi-depth sketch (the
    q_quantile_sketch_rollup summary) is KS-scored against the first
    week's merged baseline sketch — max |F_day − F_base| over the union
    of sketch points — alarming past 0.2.  This is how a 100 TB metrics
    store monitors distribution shift WITHOUT rescanning raw history:
    days·K summary rows answer every day-vs-baseline comparison (the
    rank-error of the estimate is bounded by the sketches' 1/K, the
    q_quantile_sketch_rollup gate).

    Scale shape: after the shared daily-sketch window pass, everything
    runs on days·K summary rows — the baseline is ≤ 7·K points
    replicated per scoring day (a bounded |days| x K cross join), then
    one (day, v) aggregate and per-day cumulative windows.  The raw
    scan never re-runs for any number of day-vs-baseline questions.

    Determinism: sketch points/weights are exact (the rollup's
    argument); CDF gaps compare as exact DECIMAL(38,0) cross products
    |cum_d·tb − cum_b·td|, the alarm is the exact integer condition
    5·max > td·tb, and ks_d divides two exact-integer double images,
    rounded at 9 dp.  The streaming twin (streaming/sketch_drift.py)
    scores the same summaries per micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    sk = daily_value_sketch(ev).localCheckpoint(
        eager=True
    )  # feeds baseline + scoring + min-week
    w0 = sk.agg(F.min("week").alias("min_week"))
    skw = sk.crossJoin(F.broadcast(w0))
    bl = (
        skw.filter(F.col("week") == F.col("min_week"))
        .groupBy("pv")
        .agg(F.sum("w").cast("bigint").alias("wb"))
    )
    scoring = skw.filter(F.col("week") > F.col("min_week"))
    return score_days_against_baseline(scoring, bl)


# ---------------------------------------------------------------------------
# q_rendezvous_shard — highest-random-weight shard assignment (round 10)
# ---------------------------------------------------------------------------

_RDV_SHARDS = 8


@query(
    "q_rendezvous_shard",
    oracle=f"""
        WITH assigned AS (
          SELECT d.doc_id, LENGTH(COALESCE(d.text, '')) AS nc,
                 arg_max(s.s, md5(CAST(d.doc_id AS VARCHAR) || ':'
                                  || CAST(s.s AS VARCHAR))) AS shard
          FROM documents d,
               (SELECT UNNEST(range({_RDV_SHARDS})) AS s) s
          GROUP BY d.doc_id, LENGTH(COALESCE(d.text, ''))
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned)
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nc) AS BIGINT) AS n_chars,
               round(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 9)
                 + 0.0 AS doc_share
        FROM assigned GROUP BY shard
    """,
)
def q_rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment with a balance report: every document hashes
    against each of 8 shard ids and lands on the shard with the
    lexicographically-largest md5(doc_id:shard) weight.  Rendezvous
    beats `hash(doc) % S` for corpus management because resizing to
    S+1 shards moves only ~1/(S+1) of documents (only those whose NEW
    shard wins their rendezvous) instead of reshuffling (S−1)/S of the
    corpus — the property that makes incremental shard splits and
    shard-affine caches cheap at 100 TB.  The report is the balance
    audit: per shard, document count, byte load, and share.

    Determinism: md5 is the engine-portable hash (the q_sample_mixture
    device); the per-document argmax is a max over 8 (weight, shard)
    structs — md5 collisions across the 8 candidates would need a
    128-bit collision, so the winner is total.  Counts exact; the share
    is one int/int division rounded at 9 dp.

    Scale shape: the argmax is an in-row fold over a 8-element array
    (scan-local, no explode reaches the shuffle); ONE hash aggregate to
    ≤8 shard rows; the share fold broadcasts a 1-row total."""
    d = load_table(spark, sf_dir, "documents")
    cand = F.transform(
        F.sequence(F.lit(0), F.lit(_RDV_SHARDS - 1)),
        lambda s: F.struct(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    s.cast("string"),
                )
            ).alias("w"),
            s.alias("s"),
        ),
    )
    assigned = d.select(
        F.array_max(cand)["s"].cast("bigint").alias("shard"),
        F.length(F.coalesce("text", F.lit(""))).alias("nc"),
    )
    shards = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nc").cast("bigint").alias("n_chars"),
    )
    shards = shards.localCheckpoint(eager=True)  # totals fold + output
    tot = shards.agg(F.sum("n_docs").cast("bigint").alias("n"))
    return shards.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_chars",
        (
            F.round(F.col("n_docs").cast("double") / F.col("n"), 9)
            + F.lit(0.0)
        ).alias("doc_share"),
    )
