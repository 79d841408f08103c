"""Web-crawl curation operators: URL-level dedup and paragraph-level
exact dedup — the two passes every crawl pipeline runs BEFORE the
document-level dedup family (llm_dedup.py):

* **q_url_dedup** — canonicalize URLs (scheme/fragment/port/www/tracking
  params/param order) and keep one document per canonical URL.  The
  canonicalizer (operators/web.py) is a pure JVM Column expression; the
  dedup is a single hash aggregation on the canonical key.
* **q_dedup_paragraph** — MassiveText/RefinedWeb-style exact paragraph
  dedup: repeated paragraphs (boilerplate, navigation, license headers)
  are removed corpus-wide keeping the first occurrence, and documents are
  reassembled from their surviving paragraphs.

The fixture's documents table has no URL column, so q_url_dedup
synthesizes deterministic URL variants (scheme case, www, default port,
trailing slash, param order, tracking params, fragments) from
(doc_id, source) IDENTICALLY in Spark and the DuckDB oracle — the
hash-check then verifies the whole canonicalization chain cross-engine.

Scale notes (100 TB): both operators are one shuffle each — URL dedup
hash-aggregates on the canonical URL; paragraph dedup shuffles once on
the paragraph text for the keep-first window and once on doc_id for
reassembly, with paragraph text replaced by its 128-bit hash as the
shuffle key candidate (see q_dedup_paragraph docstring).  No Python
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bifrost_spark.operators.web import canonicalize_url
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

# paragraph = non-overlapping run of PARA_WORDS tokens (the synthetic
# fixture is one line of space-separated words; real crawls would split on
# '\n\n' — the downstream dedup is identical either way)
PARA_WORDS = 20

_URL_SQL = r"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END
         || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END
         || '.example.com'
         || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
         || '/a/' || CAST(doc_id % 25 AS VARCHAR)
         || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 2 = 0 THEN '?x=1&y=2&utm_source=rss'
                 ELSE '?y=2&ref=feed&x=1' END
         || CASE WHEN doc_id % 4 = 0 THEN '#top' ELSE '' END AS url
  FROM documents
),
b AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
                        '#.*$', '') AS bare
  FROM u
),
p AS (
  SELECT doc_id,
         regexp_replace(bare, '\?.*$', '') AS hostpath,
         CASE WHEN strpos(bare, '?') > 0
              THEN substr(bare, strpos(bare, '?') + 1) ELSE '' END AS q
  FROM b
),
c AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(
             lower(regexp_replace(hostpath, '/.*$', '')),
             '^www\.', ''), ':(80|443)$', '') AS host,
         regexp_replace(
             CASE WHEN strpos(hostpath, '/') > 0
                  THEN substr(hostpath, strpos(hostpath, '/')) ELSE '' END,
             '/$', '') AS path,
         array_to_string(
             list_sort(list_filter(string_split(q, '&'),
                 t -> t <> '' AND NOT regexp_matches(
                     t, '^(utm_[a-z]+|ref|fbclid|gclid)='))),
             '&') AS cq
  FROM p
)
SELECT host || path || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END
           AS canonical_url,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM c
GROUP BY 1
"""


@query("q_url_dedup", oracle=_URL_SQL)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level crawl dedup: canonicalize, then keep the first document
    (min doc_id) per canonical URL with its duplicate count.

    The canonicalizer (operators/web.py) is regexp/array built-ins only —
    whole-stage codegen, zero Python — so this is scan + ONE hash
    aggregation on the canonical key.  At 100 TB that is the cheapest
    possible dedup pass and the reason every pipeline runs it first:
    it typically removes 30-50%% of a raw crawl before any content pass.
    min()-as-argmin keeps map-side partial aggregation (a window
    row_number spelling would force a full sort per key group instead)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def m(k: int):
        return F.col("doc_id") % k

    url = F.concat(
        F.when(m(2) == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(m(3) == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(m(7) == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com"),
        F.when(m(5) == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/a/"),
        m(25).cast("string"),
        F.when(m(2) == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(m(2) == 0, F.lit("?x=1&y=2&utm_source=rss")).otherwise(
            F.lit("?y=2&ref=feed&x=1")
        ),
        F.when(m(4) == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", canonicalize_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("bigint").alias("doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
    )


_PARA_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS words
  FROM documents
),
paras AS (
  SELECT doc_id,
         CAST((s - 1) // {PARA_WORDS} AS BIGINT) AS para_idx,
         array_to_string(words[s : s + {PARA_WORDS - 1}], ' ') AS para
  FROM toks,
       UNNEST(generate_series(1, CAST(len(words) AS BIGINT), {PARA_WORDS}))
           AS g(s)
  WHERE len(words) > 0
),
flagged AS (
  SELECT doc_id, para_idx, para,
         CASE WHEN row_number() OVER (
                  PARTITION BY para ORDER BY doc_id, para_idx) = 1
              THEN 1 ELSE 0 END AS keep
  FROM paras
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN keep = 1 THEN para END, ' '
                           ORDER BY para_idx), '') AS clean_text
FROM flagged
GROUP BY doc_id
"""


@query("q_dedup_paragraph", oracle=_PARA_SQL)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (MassiveText §A.2.3 / RefinedWeb):
    drop repeated paragraphs corpus-wide, keeping the FIRST occurrence
    (lowest doc_id, then position), and reassemble each document from its
    surviving paragraphs.

    Shape: paragraphs are generated scan-locally (posexplode over a
    stride sequence — no join); the keep-first decision is ONE window
    shuffle partitioned by paragraph text; reassembly is ONE hash
    aggregation by doc_id (collect_list + array_sort — order-insensitive
    input, deterministic output).  At 100 TB the window key would be
    xxhash64(para) pairs rather than the text itself to keep shuffle
    rows small — the text column here doubles as the collision-free key
    at fixture scale AND the payload reassembly needs it anyway, so
    hashing would add a self-join; the documented trade is the same one
    q_dup_spans makes (hash keys, semi-join back).

    Unlike document-level exact dedup (q_dedup_exact), this removes
    boilerplate EMBEDDED in otherwise-unique pages — the dominant form of
    crawl duplication — at the cost of one window over all paragraphs."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    paras = t.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(PARA_WORDS))
        ).alias("pos", "s"),
        "toks",
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("para_idx"),
        F.array_join(F.slice("toks", F.col("s"), PARA_WORDS), " ").alias("para"),
    )
    w = Window.partitionBy("para").orderBy("doc_id", "para_idx")
    flagged = paras.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    )
    kept_sorted = F.transform(
        F.filter(
            F.array_sort(F.collect_list(F.struct("para_idx", "keep", "para"))),
            lambda s: s.keep == 1,
        ),
        lambda s: s.para,
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.array_join(kept_sorted, " ").alias("clean_text"),
    )
