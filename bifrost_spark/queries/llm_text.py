"""Text-analysis operators for training-data pipelines (SURVEY.md §2 Part B +
driver mandate): token counting, language ID, quality scoring, fingerprinting.

All four stay entirely JVM-side (split/filter/regexp built-ins inside
whole-stage codegen) — at 100 TB these run at scan speed with zero Python.
The ``documents`` fixture is the corpus stand-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bifrost_spark.operators.dedup import contamination_hits, contamination_hits_sql
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

# Tiny deterministic English stopword set shared by lang-ID and quality.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# BPE-ish token pattern: word / number / single non-alnum symbol.  Kept to a
# dialect-neutral subset (no \s, no lookaround) so Java regex and RE2 agree.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "q_text_stats",
    oracle="""
        SELECT doc_id, lang, source,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
        FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics: char count, whitespace token count,
    distinct-token count (vocabulary size)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
    )


@query(
    "q_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS bpe_ish_tokens
        FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (words / numbers / symbols) — the standard pre-tokenizer budget estimate
    for training-data sizing."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("bigint").alias("ws_tokens"),
        F.regexp_count("text", F.lit(TOKEN_RE)).cast("bigint").alias("bpe_ish_tokens"),
    )


@query(
    "q_lang_id",
    oracle=f"""
        SELECT doc_id, lang AS lang_label,
               CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                         t -> t IN {_SW_SQL})) * 20
                         >= len(string_split(text, ' '))
                    THEN 'en' ELSE 'unk' END AS lang_pred
        FROM documents
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit-ratio classifier (≥5% of tokens in
    the English stopword list → 'en').  A real n-gram model slots into the
    same shape (per-doc score expression); the point is the operator stays a
    scan-speed expression, not a UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ", -1)
    sw_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_toks = F.size(F.split("text", " ", -1))
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(sw_hits * 20 >= n_toks, "en").otherwise("unk").alias("lang_pred"),
    )


@query(
    "q_quality_score",
    oracle=f"""
        SELECT doc_id,
               CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / LENGTH(text) AS alpha_ratio,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    t -> t IN {_SW_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' '))
                 AS mean_token_len
        FROM documents
        WHERE LENGTH(text) > 0
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: alphabetic-character ratio, stopword ratio,
    mean token length.  Each is one exact int/int double division →
    bit-stable across engines.  Downstream filtering composes as plain
    predicates over these columns."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chars = F.length("text")
    toks_lower = F.split(F.lower("text"), " ", -1)
    n_toks = F.size(F.split("text", " ", -1))
    alpha_chars = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    sw_hits = F.size(F.filter(toks_lower, lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        (sw_hits.cast("double") / n_toks).alias("stopword_ratio"),
        (n_chars.cast("double") / n_toks).alias("mean_token_len"),
    )


# Engine-portable deterministic bucket 0..99: md5 is the only hash both
# engines share, so derive the bucket from the first two hex bytes.
_BUCKET_SQL = (
    "(ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 1)) * 256"
    " + ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 2, 1))) % 100"
)


def _bucket_col() -> Column:
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")))
    return (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100


@query(
    "q_sample_mixture",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_BUCKET_SQL} <
              CASE lang WHEN 'en' THEN 80 WHEN 'zh' THEN 50 ELSE 25 END
    """,
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixing: keep 80%
    of English, 50% of Chinese, 25% of everything else, by hashing each
    document into a stable 0..99 bucket (content-derived md5 — the one hash
    both engines share, so the sample is exactly reproducible anywhere).
    Hash-bucket sampling beats rand(): retried tasks, re-runs, and different
    partitionings all select the SAME documents — a requirement for
    reproducible training sets.  Pure scan-side predicate, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 80)
        .when(F.col("lang") == "zh", 50)
        .otherwise(25)
    )
    return d.filter(_bucket_col() < rate).select("doc_id", "lang", "source")


@query(
    "q_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fingerprint,
               CAST(LENGTH(regexp_replace(lower(text), ' +', ' ', 'g')) AS BIGINT)
                 AS norm_len
        FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined document fingerprint: md5 over whitespace-normalized,
    case-folded text.  The exact-dedup key at scale — fingerprints shuffle
    (16 bytes/doc), never the documents themselves."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower("text"), " +", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


@query(
    "q_tfidf",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n FROM documents)
        SELECT doc_id, term, rnk FROM (
          SELECT tf.doc_id, tf.term,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC,
                            tf.term
                 ) AS BIGINT) AS rnk
          FROM tf JOIN df USING (term) CROSS JOIN n
        ) WHERE rnk <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (tf · ln(N/df), whitespace
    tokens, case-folded).

    Scale shape: tf is ONE shuffle on (doc_id, term) with map-side combine;
    df derives from tf (never re-reads text) and its term dictionary is
    Zipf-bounded, so the df↔tf join broadcasts; N is a plan-time literal
    (one count job), avoiding a cross-join stage.  The final per-doc top-3
    window shuffles only (doc_id, term, score) triples — bytes ∝ token
    vocabulary, not corpus text.

    Determinism: tf/df/N are exact integers; the score is kept OUT of the
    compared output (Java's Math.log and DuckDB's std::log may differ in
    the last ulp) while the RANK is ulp-robust — integer-derived log scores
    are well separated, and exact score ties (equal tf and df) break by
    term.  Same discipline as the cosine-ranking queries."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = float(d.count())
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
        ).alias("term"),
    )
    # tf feeds BOTH the df derivation and the scored join; un-checkpointed,
    # each consumer re-ran the text scan + token explode (2 corpus scans
    # measured).  Local-timing gain is small (~7% at sf0.1 — the explode
    # is cheap here) but the second 100 TB corpus scan it removes is not.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(n_docs) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.select(
            "doc_id", "term", F.row_number().over(w).cast("bigint").alias("rnk")
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_repetition",
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
                   AS bigrams
          FROM t WHERE len(toks) >= 2
        )
        SELECT doc_id,
               CAST(len(bigrams) AS BIGINT) AS n_bigrams,
               1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
                 AS dup_bigram_frac
        FROM g
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher/C4-style filter): fraction of
    duplicated word bigrams per document — high values flag boilerplate
    and degenerate generations before they reach a training mix.

    Pure per-row array expressions (no shuffle, no Python): bigrams via an
    indexed transform over the token array, dup fraction from exact
    distinct/total integer counts (single IEEE division → engine-stable).
    The two-arg lambda receives (element, index) — index is 0-based over
    the sliced array, and element_at is 1-based, hence the i+2 lookup."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    with_t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    bigrams = F.transform(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("toks"), i + 2)),
    )
    g = with_t.select("doc_id", bigrams.alias("bigrams"))
    return g.select(
        "doc_id",
        F.size("bigrams").cast("bigint").alias("n_bigrams"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("bigrams")).cast("double") / F.size("bigrams")
        ).alias("dup_bigram_frac"),
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 25


@query(
    "q_chunking",
    oracle=f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents
        )
        SELECT doc_id,
               CAST(idx AS BIGINT) AS chunk_idx,
               array_to_string(toks[s : s + {CHUNK_TOKENS} - 1], ' ') AS chunk_text,
               CAST(least({CHUNK_TOKENS}, len(toks) - s + 1) AS INT) AS n_chunk_tokens
        FROM (
          SELECT doc_id, toks,
                 generate_subscripts(range(1, len(toks) + 1, {CHUNK_STRIDE}), 1) AS idx,
                 unnest(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS s
          FROM t WHERE len(toks) > 0
        )
    """,
)
def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token windows, stride 25) — the
    RAG/embedding preprocessing step: each document becomes overlapping
    chunks with stable (doc_id, chunk_idx) identity.

    posexplode over a stride ``sequence()`` generates the chunk starts
    INSIDE the row (no join, no shuffle; output rows ∝ tokens/stride);
    slice + array_join materialize each chunk.  Chunk boundaries are pure
    integer arithmetic — deterministic everywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    exploded = t.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))
        ).alias("pos", "s"),
    )
    return exploded.select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("chunk_idx"),
        F.array_join(F.slice("toks", F.col("s"), CHUNK_TOKENS), " ").alias(
            "chunk_text"
        ),
        F.least(
            F.lit(CHUNK_TOKENS), F.size("toks") - F.col("s") + 1
        ).cast("int").alias("n_chunk_tokens"),
    )


@query(
    "q_pii_redact",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
                   'g'),
                 '[0-9]{4,}', '<NUM>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT)
                 AS n_long_numbers
        FROM documents
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: mask email addresses and long digit runs (IDs,
    phone numbers) before a corpus enters a training mix, with per-doc
    match counts for the audit log.

    Patterns stay in the Java∩RE2 common subset (char classes, bounded
    quantifiers — no backrefs/lookarounds) so Spark and DuckDB agree
    exactly.  Pure per-row codegen'd expressions — no shuffle, no Python;
    at 100 TB this runs at parquet-scan speed."""
    d = load_table(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    num = r"[0-9]{4,}"
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), num, "<NUM>"
        ).alias("redacted"),
        F.regexp_count("text", F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count("text", F.lit(num)).cast("bigint").alias("n_long_numbers"),
    )


PACK_BUDGET = 256  # tokens per packed training sequence


@query(
    "q_pack_sequences",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS BIGINT) AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id
        FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: contiguous greedy packing of each
    source's documents into {PACK_BUDGET}-token bins — the data-loader step
    that turns ragged documents into dense fixed-budget training sequences
    (bin_id ↔ one packed sample).

    Streaming-contiguous packing (what an actual loader does), NOT optimal
    bin packing: docs are taken in stable (doc_id) order and a running
    token cumsum assigns bin = floor(tokens-before / budget).  One window
    shuffle on source; integer arithmetic end to end → exact parity."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", " ", -1), lambda t: t != "")).cast(
        "bigint"
    )
    t = d.select("doc_id", "source", toks.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("bin_id"),
    )


BENCH_DOC_MAX = 20  # doc_id < 20 stand in for the held-out benchmark set


@query(
    "q_decontaminate",
    oracle=f"""
        WITH {contamination_hits_sql(BENCH_DOC_MAX)}
        SELECT d.doc_id,
               CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id >= {BENCH_DOC_MAX}
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag every training document sharing ANY
    10-character gram with the held-out benchmark set (doc_id < {BENCH_DOC_MAX}
    stands in) — the directional contamination check run before training,
    distinct from symmetric near-dup detection.

    Scale shape: benchmark grams are a SMALL distinct set (benchmarks are
    tiny relative to corpora) → broadcast semi join against the training
    side's gram stream; training docs shuffle nothing, and the gram
    explosion streams through the scan.  Exact char-grams (not sketches):
    contamination wants zero false negatives.  The gram/bench/hits kernel
    is the SHARED operators/dedup.contamination_hits (one spelling across
    q_decontaminate / q_contamination_report / q_contamination_drift)."""
    d = load_table(spark, sf_dir, "documents")
    hits = contamination_hits(d, BENCH_DOC_MAX)
    return (
        d.filter(F.col("doc_id") >= BENCH_DOC_MAX)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("hit", F.lit(0)).cast("int").alias("contaminated")
        )
    )


@query(
    "q_entropy",
    oracle="""
        WITH chars AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS ch,
                 LENGTH(text) AS n
          FROM documents WHERE LENGTH(text) > 0
        ),
        freq AS (
          SELECT doc_id, ch, n, CAST(COUNT(*) AS DOUBLE) AS c
          FROM chars WHERE ch <> '' GROUP BY doc_id, ch, n
        )
        SELECT doc_id,
               -- + 0.0 canonicalizes IEEE negative zero: a single-character
               -- doc yields -1*log2(1) = -0.0 here but +0.0 in Spark
               round(-SUM((c / n) * log2(c / n)), 9) + 0.0 AS char_entropy,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
        FROM freq
        GROUP BY doc_id
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal: Shannon entropy of the per-doc
    character distribution — low entropy flags repeated-character junk,
    high entropy flags random/binary garbage; both ends get filtered from
    training mixes.

    The (doc, char) frequency shuffle carries ≤ |alphabet| rows per doc.
    p = c/n is an exact integer ratio; log2 may differ by 1 ulp between
    libm builds AND the float-term SUM is order-sensitive at the last
    ulp — so the output rounds to 9 decimals: accumulated error ~1e-15
    vs a 5e-10 rounding boundary makes a flip essentially impossible,
    while any useful entropy threshold needs ~2 decimals."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = d.select(
        "doc_id",
        F.length("text").cast("double").alias("n"),
        F.explode(F.split(F.lower("text"), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch", "n").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    p = F.col("c") / F.col("n")
    return freq.groupBy("doc_id").agg(
        # + 0.0 canonicalizes IEEE -0.0 (single-char docs; fuzzer finding)
        (F.round(-F.sum(p * F.log2(p)), 9) + F.lit(0.0)).alias("char_entropy"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
    )


# BM25 retrieval constants (Robertson/Sparck Jones defaults) and a fixed
# query-term set drawn from the fixture vocabulary.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("vector", "hash", "scan")
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in BM25_TERMS) + ")"


_BM25_SQL = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
          FROM documents
        ),
        dl AS (SELECT doc_id, len(ws) AS dl, ws FROM t),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM dl
        ),
        tf AS (
          SELECT doc_id, dl,
                 len(list_filter(ws, x -> x = 'vector')) AS tf_vector,
                 len(list_filter(ws, x -> x = 'hash'))   AS tf_hash,
                 len(list_filter(ws, x -> x = 'scan'))   AS tf_scan
          FROM dl
        ),
        df AS (
          SELECT CAST(COUNT(*) FILTER (WHERE tf_vector > 0) AS DOUBLE) AS df_vector,
                 CAST(COUNT(*) FILTER (WHERE tf_hash > 0)   AS DOUBLE) AS df_hash,
                 CAST(COUNT(*) FILTER (WHERE tf_scan > 0)   AS DOUBLE) AS df_scan
          FROM tf
        ),
        scored AS (
          SELECT doc_id,
                 CAST((tf_vector > 0)::INT + (tf_hash > 0)::INT
                      + (tf_scan > 0)::INT AS BIGINT) AS n_terms_matched,
                 CAST(round(ln(1 + (n - df_vector + 0.5) / (df_vector + 0.5))
                        * (tf_vector * ({BM25_K1} + 1))
                        / (tf_vector + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
                      12) AS DECIMAL(28,12))
                 + CAST(round(ln(1 + (n - df_hash + 0.5) / (df_hash + 0.5))
                        * (tf_hash * ({BM25_K1} + 1))
                        / (tf_hash + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
                      12) AS DECIMAL(28,12))
                 + CAST(round(ln(1 + (n - df_scan + 0.5) / (df_scan + 0.5))
                        * (tf_scan * ({BM25_K1} + 1))
                        / (tf_scan + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
                      12) AS DECIMAL(28,12)) AS score
          FROM tf CROSS JOIN stats CROSS JOIN df
          WHERE tf_vector + tf_hash + tf_scan > 0
        )
        SELECT doc_id, n_terms_matched,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS rnk
        FROM scored
        ORDER BY rnk LIMIT 20
    """


@query("q_bm25", oracle=_BM25_SQL)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document retrieval (Robertson et al., Okapi): rank the corpus
    against a fixed query-term set with the classic
    idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) score, k1=1.2 b=0.75.

    Scale shape: with a bounded query-term set the whole score is
    SCAN-LOCAL — per-term tf comes from `F.size(F.filter(ws, ...))`
    column expressions (no explode, no (doc,term) shuffle), df/N/avgdl
    are one tiny scalar aggregate collected once and folded back as
    plan literals.  The only distributed ordering work is the global
    top-20, which Spark executes as TakeOrderedAndProject (per-partition
    heaps + driver merge of 20-row heads) — never a full sort.  At
    100 TB the corpus text is read once, nothing else moves.

    Determinism: tf/dl/df/N are exact integers and avgdl is a single
    IEEE division of exact values, so both engines feed identical
    doubles into ln(); each per-term addend is rounded to 12 dp (beyond
    any 1-ulp libm divergence) and summed in DECIMAL(28,12)
    (order-free), making the rank exact — ties break by doc_id.  The
    float score itself stays OUT of the compared output, same
    discipline as q_tfidf."""
    tfq, stats = _retrieval_tf_stats(spark, sf_dir)
    return _bm25_ranked(tfq, stats)


def _retrieval_tf_stats(spark: SparkSession, sf_dir: str):
    """Shared (tf-frame, stats-row) base of q_bm25 / q_qlm / q_rrf_fusion:
    ONE tokenize pass builds the per-doc (dl, tf_t...) frame with RAW NULL
    semantics (NULL text → NULL dl/tf — each leg then applies its own
    coalescing so leg-level results are bit-identical to the standalone
    spellings), checkpointed because the stats fold AND both scoring legs
    consume it; one scalar aggregate serves both retrievers' collection
    statistics (all exact integers, so the values each leg reads are the
    ones it computed before the fusion — guide §2.3/§5; the fused
    q_rrf_fusion plan runs one corpus scan instead of four)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "").alias(
            "ws"
        ),
    ).select("doc_id", "ws", F.size("ws").alias("dl"))

    def _count_of(term: str):
        # one-arg lambda on purpose: a second parameter would make PySpark
        # pass the element INDEX, not the captured term
        return F.size(F.filter("ws", lambda x: x == F.lit(term)))

    tfq = toks.select(
        "doc_id", "dl", *[_count_of(t).alias(f"tf_{t}") for t in BM25_TERMS]
    ).localCheckpoint(eager=True)
    bm = [
        F.coalesce(F.col(f"tf_{t}"), F.lit(0)).alias(f"tf_{t}")
        for t in BM25_TERMS
    ]
    stats = tfq.select(F.coalesce("dl", F.lit(0)).alias("dl"), *bm).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}") for t in BM25_TERMS],
        *[F.sum(f"tf_{t}").alias(f"cf_{t}") for t in BM25_TERMS],
    ).first()
    return tfq, stats


def _bm25_ranked(tfq, stats):
    """BM25 ranking leg over the shared tf frame — identical arithmetic to
    the pre-fusion standalone spelling (see q_bm25's docstring): the
    coalesces reproduce its 'NULL text tokenizes to the empty list'
    semantics (fuzzer finding) on the raw frame."""
    tf = tfq.select(
        "doc_id",
        F.coalesce("dl", F.lit(0)).alias("dl"),
        *[
            F.coalesce(F.col(f"tf_{t}"), F.lit(0)).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    if not stats["n"]:  # empty corpus: nothing to rank (fuzzer finding)
        return tf.select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_terms_matched"),
            F.lit(0).cast("bigint").alias("rnk"),
        ).limit(0)
    n = float(stats["n"])
    avgdl = float(stats["sdl"]) / float(stats["n"])

    def addend(t: str) -> Column:
        tf_c = F.col(f"tf_{t}")
        df_t = float(stats[f"df_{t}"])
        idf = F.lit(float('nan')) if n == 0 else F.log(
            F.lit(1.0) + (F.lit(n) - F.lit(df_t) + 0.5) / (F.lit(df_t) + 0.5)
        )
        tfn = (tf_c * (BM25_K1 + 1)) / (
            tf_c + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
        )
        return F.round(idf * tfn, 12).cast("decimal(28,12)")

    matched = tf.filter(
        sum(F.col(f"tf_{t}") for t in BM25_TERMS) > 0
    ).select(
        "doc_id",
        sum((F.col(f"tf_{t}") > 0).cast("int") for t in BM25_TERMS)
        .cast("bigint")
        .alias("n_terms_matched"),
        sum(addend(t) for t in BM25_TERMS).alias("score"),
    )
    top = matched.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        top.select(
            "doc_id",
            "n_terms_matched",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .orderBy("rnk")
    )


_BIGRAM_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS words
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
      FROM toks,
           UNNEST(generate_series(1, CAST(len(words) AS BIGINT) - 1)) AS g(i)
      WHERE len(words) >= 2
    ),
    bg AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cbg
      FROM pairs GROUP BY w1, w2
    ),
    uni AS (
      SELECT w1, CAST(SUM(cbg) AS BIGINT) AS cw1 FROM bg GROUP BY w1
    ),
    v AS (
      SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS vsz
      FROM (SELECT w1 AS t FROM bg UNION SELECT w2 FROM bg)
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(CAST(round(log2(u.cw1 + (SELECT vsz FROM v)), 12)
                              AS DECIMAL(28,12))
                          - CAST(round(log2(b.cbg + 1), 12)
                                 AS DECIMAL(28,12)))
                      AS DOUBLE) / COUNT(*), 9) AS avg_neg_log2_p
    FROM pairs p
    JOIN bg b USING (w1, w2)
    JOIN uni u USING (w1)
    GROUP BY p.doc_id
"""


@query("q_lm_bigram", oracle=_BIGRAM_SQL)
def q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprisal per document — avg −log₂
    p(w2|w1) under the corpus bigram distribution with add-1 smoothing
    (p = (c(w1,w2)+1)/(c(w1)+V)); the next step up from q_lm_score's
    unigram signal and the same class of perplexity filter CCNet's KenLM
    plays at full strength.  Repetitive/templated text scores low,
    rare-transition text scores high.

    Shape: bigrams are generated IN-ROW (arrays_zip of the token array
    with its own tail — no window, no self-join), the bigram-count model
    is one groupBy, checkpointed because THREE consumers need it (the
    unigram-left margin, the vocab size, and the probe join — see the
    no-subtree-reuse pin in tests/test_scan_counts.py); the unigram
    margin derives from the bigram counts by summation, and V (distinct
    bigram participants) collapses to a driver literal.  Probe side
    shuffles (w1, w2) pairs against the Zipf-bounded model — fact text
    never travels with the model.

    Determinism: integer counts → log₂ rounded at 12 dp, accumulated in
    DECIMAL(28,12) (order-free), output rounded at 9 dp — the exact
    q_lm_score/DSIR device."""
    from bifrost_spark.queries._util import spread

    # _util.spread: the bigram explode runs twice (model build + probe) and
    # lives in the scan's single input split otherwise (guide §2.5)
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    t = d.select("doc_id", toks.alias("w")).filter(F.size("w") >= 2)
    pairs = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, F.size("w") - 1).alias("w1"),
                F.slice("w", 2, F.size("w") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # NOT checkpointed (A/B-measured ~0.07 s): materializing the raw
    # (w1, w2) STRING stream to save the second explode trades against the
    # hashes-not-payloads checkpoint discipline at 100 TB; the spread
    # re-derivation is the right shape.
    bg = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cbg"))
        .localCheckpoint(eager=True)
    )
    uni = bg.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    vsz = (
        bg.select(F.explode(F.array("w1", "w2")).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    addend = F.round(F.log2(F.col("cw1") + F.lit(int(vsz))), 12).cast(
        "decimal(28,12)"
    ) - F.round(F.log2(F.col("cbg") + 1), 12).cast("decimal(28,12)")
    return (
        pairs.join(bg, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(addend).alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("s").cast("double") / F.col("n_bigrams"), 9
            ).alias("avg_neg_log2_p"),
        )
    )


_COLLOC_MIN_COUNT = 5
_COLLOC_TOPK = 20


@query(
    "q_collocations",
    oracle=f"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), t -> t <> '')
                   AS ws
          FROM documents
        ),
        uni AS (
          SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT unnest(ws) AS t FROM w) GROUP BY t
        ),
        big AS (
          SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c
          FROM w, UNNEST(range(1, len(ws))) AS t(i)
          GROUP BY 1, 2
        ),
        tots AS (
          SELECT (SELECT SUM(c) FROM uni) AS n,
                 (SELECT SUM(c) FROM big) AS b
        ),
        scored AS (
          SELECT b.w1, b.w2, b.c AS n_pair,
                 round(CAST(
                     CAST(round(log2(b.c), 12) AS DECIMAL(28,12))
                   - CAST(round(log2((SELECT b FROM tots)), 12)
                          AS DECIMAL(28,12))
                   - CAST(round(log2(u1.c), 12) AS DECIMAL(28,12))
                   - CAST(round(log2(u2.c), 12) AS DECIMAL(28,12))
                   + 2 * CAST(round(log2((SELECT n FROM tots)), 12)
                              AS DECIMAL(28,12))
                   AS DOUBLE), 9) AS pmi
          FROM big b
          JOIN uni u1 ON u1.tok = b.w1
          JOIN uni u2 ON u2.tok = b.w2
          WHERE b.c >= {_COLLOC_MIN_COUNT}
        )
        SELECT w1, w2, n_pair, pmi FROM scored
        ORDER BY pmi DESC, w1, w2 LIMIT {_COLLOC_TOPK}
    """,
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation (phrase) mining by pointwise mutual information
    (Church & Hanks 1990; the word2phrase step that turns "new york" into
    a unit before tokenizer/embedding training): top-{k} adjacent word
    pairs by PMI = log₂[p(xy) / (p(x)p(y))], with a min-count gate
    (rare pairs have unboundedly inflated PMI — the classic failure the
    gate exists for).

    Determinism: PMI decomposes into log₂s of INTEGER counts
    (log₂ c_xy − log₂ B − log₂ c_x − log₂ c_y + 2·log₂ N); each term is
    rounded to 12 dp and the sum runs in DECIMAL(28,12) (exact), so the
    9-dp score and the (pmi desc, w1, w2) top-{k} order are
    engine-identical.  N and B fold back as plan literals (two bounded
    scalar collects over the checkpointed aggregates).

    Scale shape: bigram construction is IN-ROW (slice+arrays_zip — no
    window, no self-join); one shuffle each for the bigram and unigram
    count aggregates; the two margin joins key on tokens (vocabulary
    grows by Heaps' law — shuffle-joinable at any corpus size); top-{k}
    is TakeOrderedAndProject, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    w = d.select(toks.alias("ws"))
    uni = (
        w.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # consumed by N-total + two margin joins
    )
    pairs = (
        w.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                    F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .localCheckpoint(eager=True)  # consumed by B-total + scoring
    )
    # `or 1`: an empty corpus (or one with no bigrams) yields NULL totals;
    # the scored frame is empty in that case whatever the literals say,
    # but int(None)/log2(0) must not crash plan construction
    # (adversarial-fuzzer finding).
    n_total = uni.agg(F.sum("c")).collect()[0][0] or 1
    b_total = big.agg(F.sum("n_pair")).collect()[0][0] or 1

    def r12(col):
        return F.round(F.log2(col), 12).cast("decimal(28,12)")

    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.filter(F.col("n_pair") >= _COLLOC_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                (
                    r12(F.col("n_pair"))
                    - r12(F.lit(int(b_total)))
                    - r12(F.col("c1"))
                    - r12(F.col("c2"))
                    # 2·log2(N) spelled as two adds: a decimal PRODUCT of
                    # two (28,12)s needs scale 24 / precision >38, which
                    # Spark resolves by truncating the scale — addition
                    # keeps the full 12-dp scale exactly
                    + r12(F.lit(int(n_total)))
                    + r12(F.lit(int(n_total)))
                ).cast("double"),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(_COLLOC_TOPK)


# Dirichlet smoothing mass for query-likelihood retrieval — fixture docs
# average ~100 words, so mu is set to that scale (the classic heuristic:
# mu ≈ average document length; 2000 for web-length docs).
QLM_MU = 100.0

_QLM_SQL = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
          FROM documents
        ),
        dl AS (SELECT doc_id, len(ws) AS dl, ws FROM t),
        coll AS (
          SELECT CAST(SUM(len(list_filter(ws, x -> x = 'vector'))) AS BIGINT)
                   AS cf_vector,
                 CAST(SUM(len(list_filter(ws, x -> x = 'hash'))) AS BIGINT)
                   AS cf_hash,
                 CAST(SUM(len(list_filter(ws, x -> x = 'scan'))) AS BIGINT)
                   AS cf_scan,
                 CAST(SUM(dl) AS BIGINT) AS total
          FROM dl
        ),
        scored AS (
          -- unseen-term handling: a query term with cf = 0 has zero
          -- smoothed mass (ln would be -inf / an error) and is DROPPED
          -- from the sum (the ELSE-0 addend), the standard LM-retrieval
          -- treatment; a collection with no tokens scores nothing
          -- (WHERE total > 0)
          SELECT doc_id,
                 CAST((len(list_filter(ws, x -> x = 'vector')) > 0)::INT
                      + (len(list_filter(ws, x -> x = 'hash')) > 0)::INT
                      + (len(list_filter(ws, x -> x = 'scan')) > 0)::INT
                      AS BIGINT) AS n_terms_matched,
                 CASE WHEN cf_vector > 0 THEN
                   CAST(round(ln((len(list_filter(ws, x -> x = 'vector'))
                                  + {QLM_MU} * (cf_vector * 1.0 / total))
                                 / (dl + {QLM_MU})), 12) AS DECIMAL(28,12))
                 ELSE CAST(0 AS DECIMAL(28,12)) END
                 + CASE WHEN cf_hash > 0 THEN
                   CAST(round(ln((len(list_filter(ws, x -> x = 'hash'))
                                  + {QLM_MU} * (cf_hash * 1.0 / total))
                                 / (dl + {QLM_MU})), 12) AS DECIMAL(28,12))
                 ELSE CAST(0 AS DECIMAL(28,12)) END
                 + CASE WHEN cf_scan > 0 THEN
                   CAST(round(ln((len(list_filter(ws, x -> x = 'scan'))
                                  + {QLM_MU} * (cf_scan * 1.0 / total))
                                 / (dl + {QLM_MU})), 12) AS DECIMAL(28,12))
                 ELSE CAST(0 AS DECIMAL(28,12)) END
                   AS score
          FROM dl CROSS JOIN coll WHERE total > 0
        )
        SELECT doc_id, n_terms_matched,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS rnk
        FROM scored
        ORDER BY rnk LIMIT 20
"""


@query("q_qlm", oracle=_QLM_SQL)
def q_qlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft
    1998; Zhai & Lafferty 2001) against the same fixed query-term set as
    q_bm25: score(d) = Σ_t log[(tf + μ·p(t|C)) / (dl + μ)] — the
    language-modelling counterpart to BM25's probabilistic ranking, and
    the second leg of the classic hybrid-retrieval stack q_rrf_fusion
    combines.

    Same scan-local shape as q_bm25: per-term tf via array-filter
    expressions (no explode), collection frequencies and total length as
    ONE scalar aggregate folded back as plan literals, global top-20 via
    TakeOrderedAndProject.  Smoothing means every document scores (a
    no-match doc gets pure background mass) — ranks are still total via
    the doc_id tiebreak.

    Determinism: tf/dl/cf/total are exact integers; μ·cf/total and the
    final ratio are short chains of IEEE ops on identical operands; each
    per-term addend rounds at 12 dp into DECIMAL(28,12) (order-free
    sum) — the q_bm25 discipline exactly."""
    tfq, stats = _retrieval_tf_stats(spark, sf_dir)
    return _qlm_ranked(tfq, stats)


def _qlm_ranked(tfq, stats):
    """QLM ranking leg over the shared tf frame — identical arithmetic to
    the pre-fusion standalone spelling (see q_qlm's docstring): the raw
    NULL tf/dl columns flow through unchanged (NULL-text docs score NULL
    and sort last, exactly as before); stats["sdl"] equals the old
    SUM(dl) total because NULL dls summed as skipped values and coalesced
    0s add nothing."""
    tf = tfq
    total = int(stats["sdl"] or 0)
    # Unseen-term handling (adversarial-fuzzer finding): a query term
    # with cf = 0 has zero smoothed mass — ln(0) — and is DROPPED from
    # the score (standard LM-retrieval treatment; oracle mirrors with
    # ELSE-0 addends); an empty collection scores no documents at all.
    present = [t for t in BM25_TERMS if int(stats[f"cf_{t}"] or 0) > 0]
    if total == 0:
        return tf.select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_terms_matched"),
            F.lit(0).cast("bigint").alias("rnk"),
        ).limit(0)

    def addend(t: str) -> Column:
        bg = QLM_MU * (float(int(stats[f"cf_{t}"])) * 1.0 / float(total))
        return F.round(
            F.log(
                (F.col(f"tf_{t}") + F.lit(bg)) / (F.col("dl") + F.lit(QLM_MU))
            ),
            12,
        ).cast("decimal(28,12)")

    score = (
        sum(addend(t) for t in present)
        if present
        else F.lit(0).cast("decimal(28,12)")
    )
    scored = tf.select(
        "doc_id",
        sum((F.col(f"tf_{t}") > 0).cast("int") for t in BM25_TERMS)
        .cast("bigint")
        .alias("n_terms_matched"),
        score.alias("score"),
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "n_terms_matched",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@query(
    "q_rrf_fusion",
    oracle=f"""
        WITH bm AS ({_BM25_SQL}),
        qm AS ({_QLM_SQL}),
        fused AS (
          SELECT COALESCE(bm.doc_id, qm.doc_id) AS doc_id,
                 bm.rnk AS bm25_rnk,
                 qm.rnk AS qlm_rnk,
                 COALESCE(1.0 / ({RRF_K} + bm.rnk), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + qm.rnk), 0.0) AS rrf
          FROM bm FULL OUTER JOIN qm ON bm.doc_id = qm.doc_id
        )
        SELECT doc_id, bm25_rnk, qlm_rnk,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
                 AS fused_rnk
        FROM fused
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the BM25 and
    query-likelihood rankings: rrf(d) = Σ_r 1/(k + rank_r(d)), k={k} —
    the standard hybrid-retrieval combiner (in production: lexical BM25
    fused with the ANN cosine ranking; here both legs are
    oracle-checkable, which a float-cosine leg would not be).

    Rank lists are tiny (top-20 each) so the fusion is a broadcast-size
    full outer join; all the heavy lifting happened inside the two
    retrieval plans.  rrf is a sum of at most two exact-operand
    divisions — deterministic — and stays OUT of the output; the fused
    rank with doc_id tiebreak is what's compared."""
    # one shared tf frame + stats job for both legs (see
    # _retrieval_tf_stats): the fused plan reads the corpus once
    tfq, stats = _retrieval_tf_stats(spark, sf_dir)
    bm = _bm25_ranked(tfq, stats).select(
        "doc_id", F.col("rnk").alias("bm25_rnk")
    )
    qm = _qlm_ranked(tfq, stats).select(
        "doc_id", F.col("rnk").alias("qlm_rnk")
    )
    fused = bm.join(qm, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rnk",
        "qlm_rnk",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("bm25_rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("qlm_rnk")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return fused.select(
        "doc_id",
        "bm25_rnk",
        "qlm_rnk",
        F.row_number().over(w).cast("bigint").alias("fused_rnk"),
    )


@query(
    "q_tokenizer_fertility",
    oracle="""
        WITH w AS (
          SELECT lang,
                 CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                      AS BIGINT) AS n_tokens,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CASE WHEN SUM(n_tokens) > 0
                    THEN round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 9)
               END AS chars_per_token
        FROM w GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (chars per token under the
    whitespace stand-in tokenizer) — the mixing-time diagnostic: a
    language whose fertility is 2× pays 2× the sequence length for the
    same text, which skews any token-budgeted mixture (the reason
    mixture weights are set in tokens, not documents — see
    q_mixture_weights).  Swap the splitter for a real BPE via
    q_token_count's regex to get production numbers.

    Scan-local measures + one tiny groupBy(lang); the ratio is one
    integer-operand division rounded at 9 dp — engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    w = d.select(
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return w.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        # NULL fertility for a zero-token language (fuzzer finding):
        # Spark ANSI throws on the division where DuckDB floats to inf
        F.when(
            F.sum("n_tokens") > 0,
            F.round(F.sum("n_chars").cast("double") / F.sum("n_tokens"), 9),
        ).alias("chars_per_token"),
    )


# The vocabulary-growth curve SQL, shared with q_heaps_fit
# (corpus_stats.py), which fits the Heaps power law over this curve.
VOCAB_GROWTH_SQL = """
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS t
          FROM documents
        ),
        mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
        first_seen AS (
          SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY t
        ),
        tok_dec AS (
          -- document-based (not unnest-based): a decile whose docs are all
          -- zero-token still appears on the curve with n_tokens = 0,
          -- matching the plan's scan-local size() aggregation
          SELECT CAST(floor(doc_id * 10.0 / (SELECT m FROM mx)) AS BIGINT) AS decile,
                 CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                          t -> t <> ''))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1
        ),
        voc_dec AS (
          SELECT CAST(floor(first_doc * 10.0 / (SELECT m FROM mx)) AS BIGINT) AS decile,
                 CAST(COUNT(*) AS BIGINT) AS n_new_types
          FROM first_seen GROUP BY 1
        )
        SELECT t.decile,
               CAST(SUM(t.n_tokens) OVER (ORDER BY t.decile) AS BIGINT)
                 AS tokens_cum,
               CAST(SUM(COALESCE(v.n_new_types, 0)) OVER (ORDER BY t.decile)
                    AS BIGINT) AS vocab_cum
        FROM tok_dec t LEFT JOIN voc_dec v USING (decile)
"""


@query("q_vocab_growth", oracle=VOCAB_GROWTH_SQL)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct token types
    vs cumulative tokens after each doc_id decile of the corpus — the
    tokenizer-sizing diagnostic (how fast does the type inventory still
    grow? when does a fixed vocab stop paying?) and the sanity check
    that a "new" crawl drop actually adds novel language.

    The expanding-distinct is NOT computed as a distinct-over-prefix
    (quadratic): each type contributes at its FIRST-occurrence decile
    (one min-per-token aggregate), and the curve is a running sum over
    the 10-row decile frame — the same first-occurrence trick as
    incremental dedup.  All counts integers; one token shuffle for the
    min, one scan-local decile aggregate."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]  # bounded scalar
    if mx is None:  # empty corpus: no curve (fuzzer finding)
        return d.select(
            F.lit(0).cast("bigint").alias("decile"),
            F.lit(0).cast("bigint").alias("tokens_cum"),
            F.lit(0).cast("bigint").alias("vocab_cum"),
        ).limit(0)
    m = mx + 1
    words = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    # explicit floor: DuckDB CAST(float AS BIGINT) rounds-to-nearest
    # while Spark cast truncates — floor() is the portable spelling
    decile_of = lambda c: F.floor(F.col(c) * 10.0 / m).cast("bigint")  # noqa: E731
    # token counts never need the explode: size(words) per row is
    # scan-local, so only the first-occurrence side pays the token
    # explode + shuffle (one exploded derivation instead of two).
    tok_dec = d.select(
        decile_of("doc_id").alias("decile"), F.size(words).alias("n")
    ).groupBy("decile").agg(F.sum("n").cast("bigint").alias("n_tokens"))
    toks = d.select("doc_id", F.explode(words).alias("t"))
    first_seen = toks.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    voc_dec = first_seen.groupBy(decile_of("first_doc").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_types")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tok_dec.join(voc_dec, "decile", "left")
        .select(
            "decile",
            F.col("n_tokens"),
            F.coalesce("n_new_types", F.lit(0)).alias("n_new_types"),
        )
        .select(
            "decile",
            F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
            F.sum("n_new_types").over(w).cast("bigint").alias("vocab_cum"),
        )
    )
