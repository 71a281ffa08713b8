"""Query registry — text analysis, dedup, corpus curation, packing/sharding.

Mechanically split from the former single-module queries.py (r15,
VERDICT #7): zero behavior change, every query re-registers through
the same @query decorator in ``queries._shared``; the package
__init__ imports every domain module so ``from
value_at_risk_spark.queries import QUERIES, ORACLES`` is unchanged.
"""

from value_at_risk_spark.queries._shared import *  # noqa: F401,F403


@query(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
FROM documents GROUP BY 1
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a 128-bit digest; shuffle carries
    (digest, id) only — the body never moves."""
    return exact_dedup(_t(spark, sf_dir, "documents"))

@query(
    "dedup_stats",
    """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_removed
FROM documents
""",
)
def dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias("n_removed"),
    )

@query(
    "text_quality_stats",
    "WITH "
    + SQL_TOKS
    + """
SELECT doc_id,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT t) AS n_distinct,
       ROUND(AVG(LENGTH(t)), 6) AS avg_token_len,
       ROUND(SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS stopword_ratio
FROM toks GROUP BY doc_id
""",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals (north-star text analysis): token count,
    type count, mean token length, stopword ratio — all JVM-side."""
    d = _t(spark, sf_dir, "documents")
    # per-row higher-order expressions: zero shuffle (the explode+groupBy
    # formulation re-keys 300 rows per doc through an exchange for no
    # semantic gain; at 100 TB this stays embarrassingly parallel)
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("_tk"))
    n = F.size("_tk")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(F.col("_tk"), lambda t: F.array_contains(sw, t)))
    total_len = F.aggregate(
        F.transform(F.col("_tk"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_tk")).cast("long").alias("n_distinct"),
        F.round(total_len / n, 6).alias("avg_token_len"),
        F.round(n_sw / n, 6).alias("stopword_ratio"),
    )

@query(
    "language_id_heuristic",
    "WITH "
    + SQL_TOKS
    + """,
r AS (
  SELECT doc_id,
         SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                  THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS ratio
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, d.lang AS lang_label,
       CASE WHEN r.ratio >= 0.05 THEN 'en' ELSE 'und' END AS lang_pred
FROM documents d JOIN r ON r.doc_id = d.doc_id
""",
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (n-gram heuristic family): flag text
    as English when function-word density clears a threshold."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    base = d.select("doc_id", F.col("lang").alias("lang_label"), toks.alias("_tk"))
    ratio = F.size(F.filter(F.col("_tk"), lambda t: F.array_contains(sw, t))) / F.size(
        "_tk"
    )
    return base.select(
        "doc_id",
        "lang_label",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )

@query(
    "langid_eval_report",
    "WITH "
    + SQL_TOKS
    + """,
r AS (
  SELECT doc_id,
         SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                  THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS ratio
  FROM toks GROUP BY doc_id
),
p AS (
  SELECT CASE WHEN d.lang = 'en' THEN 'en' ELSE 'und' END AS gold,
         CASE WHEN r.ratio >= 0.05 THEN 'en' ELSE 'und' END AS pred
  FROM documents d JOIN r ON r.doc_id = d.doc_id
),
cells AS (SELECT gold, pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
support AS (SELECT gold AS label, SUM(n) AS support FROM cells GROUP BY 1),
pred_n AS (SELECT pred AS label, SUM(n) AS pred_n FROM cells GROUP BY 1),
tp AS (SELECT gold AS label, n AS tp FROM cells WHERE gold = pred),
base AS (
  SELECT COALESCE(s.label, pn.label, t.label) AS label,
         CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(pn.pred_n, 0) AS BIGINT) AS pred_n
  FROM support s
  FULL OUTER JOIN pred_n pn ON s.label = pn.label
  FULL OUTER JOIN tp t ON COALESCE(s.label, pn.label) = t.label
)
SELECT label, support, tp, pred_n,
       ROUND(tp * 1.0 / NULLIF(pred_n, 0), 6) + 0 AS precision,
       ROUND(tp * 1.0 / NULLIF(support, 0), 6) + 0 AS recall,
       ROUND(2.0 * (tp * 1.0 / NULLIF(pred_n, 0)) * (tp * 1.0 / NULLIF(support, 0))
             / NULLIF(tp * 1.0 / NULLIF(pred_n, 0) + tp * 1.0 / NULLIF(support, 0), 0),
             6) + 0 AS f1
FROM base
""",
)
def langid_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation IN the engine — per-class precision /
    recall / F1 for the stopword-density language-ID heuristic against
    the gold ``lang`` labels (binarized en vs und, matching what the
    heuristic can express). The entire evaluation is one confusion-cell
    aggregate (≤ |classes|² rows leave the shuffle no matter the corpus
    size) + equi-join stitching on the tiny cell table
    (functions/evalmetrics.classification_report) — the distributed
    form of a sklearn classification_report, which is how a 100 TB
    curation loop scores its cheap filters against labeled samples."""
    from value_at_risk_spark.functions.evalmetrics import classification_report

    preds = QUERIES["language_id_heuristic"](spark, sf_dir).select(
        F.when(F.col("lang_label") == "en", "en").otherwise("und").alias("gold"),
        F.col("lang_pred").alias("pred"),
    )
    return classification_report(preds, "gold", "pred")

@query(
    "token_count_regex",
    """
SELECT doc_id,
       CAST(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_regex_tokens
FROM documents
""",
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting via regex matches (JVM regexp_count)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit("[a-z0-9]+"))
        .cast("long")
        .alias("n_regex_tokens"),
    )

@query(
    "multimodal_features",
    f"""
WITH src AS (
  SELECT doc_id, text || chr(31) || '0' AS t FROM documents
),
vocab AS (SELECT DISTINCT t FROM src),
{xxh64_cte("vocab")}
SELECT s.doc_id AS media_id,
       CASE CAST(s.doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
       END AS media_type,
       ROUND({xxh64_signed("hsh.hu")} / 9223372036854775808.0, 6) + 0
         AS f0
FROM src s JOIN hsh USING (t)
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (north-star), ORACLE-checked (r13
    graduation, was rows-only): documents masquerade as media
    payloads; Arrow-batched mapInPandas feature extraction with a
    deterministic stub kernel (real codecs absent in this container)
    whose lanes are XXH64-derived — so the DuckDB oracle recomputes
    lane 0 through the xxh64_cte scaffold and hash equality proves
    the mapInPandas batching kept every payload aligned with its
    media_id (the misalignment class a wrong batch iterator
    introduces), not just the row count."""
    from value_at_risk_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").alias("payload"),
        F.lit(64).cast("long").alias("width"),
        F.lit(64).cast("long").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media, dim=16)
    return feats.select(
        "media_id",
        "media_type",
        (F.round(F.element_at("feature", 1), 6) + F.lit(0.0)).alias("f0"),
    )

@query(
    "multimodal_binary_ingest",
    """
SELECT * FROM (VALUES
  ('a_16k_stereo_1s.wav', 'wav', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
   CAST(16000 AS BIGINT), CAST(2 AS BIGINT), CAST(1000 AS BIGINT), CAST(64044 AS BIGINT)),
  ('b_44k_mono_half.wav', 'wav', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
   CAST(44100 AS BIGINT), CAST(1 AS BIGINT), CAST(500 AS BIGINT), CAST(44144 AS BIGINT)),
  ('c_64x48.bmp', 'bmp', CAST(64 AS BIGINT), CAST(48 AS BIGINT),
   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(9270 AS BIGINT)),
  ('d_8x8.bmp', 'bmp', CAST(8 AS BIGINT), CAST(8 AS BIGINT),
   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(246 AS BIGINT)),
  ('e_unknown.bin', 'unknown', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(16 AS BIGINT))
) AS t(file_name, format, width, height, sample_rate_hz, channels, duration_ms, length)
""",
)
def multimodal_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file multimodal ingest via Spark's ``binaryFile`` source —
    the path 100 TB of images/audio actually ARRIVES on: one row per
    object-store file (path, length, content), metadata harvested by
    the stdlib header parser before any pixel/sample decode. The
    fixture set is synthesized deterministically (spec-valid WAV/BMP
    bytes from operators/multimodal.synth_*, idempotent writes), so
    the oracle is a golden VALUES table and the gate hash-checks real
    end-to-end file ingest. At scale: pathGlobFilter prunes at listing
    time, length/path predicates push into the listing (never opening
    oversized blobs), and content bytes cross into Python only inside
    Arrow batches."""
    import os
    import tempfile

    from value_at_risk_spark.operators.multimodal import (
        parse_media_headers,
        write_media_fixture_dir,
    )
    from value_at_risk_spark.sources.registry import read_binary

    media_dir = os.path.join(tempfile.gettempdir(), "var_media_fixture")
    names = sorted(write_media_fixture_dir(media_dir))
    raw = read_binary(spark, media_dir).select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("length"),
        F.col("content").alias("payload_bytes"),
    )
    id_expr = F.lit(None).cast("long")
    for i, n in enumerate(names):
        id_expr = F.when(F.col("file_name") == n, F.lit(i + 1)).otherwise(id_expr)
    keyed = raw.withColumn("media_id", id_expr.cast("long"))
    parsed = parse_media_headers(keyed.select("media_id", "payload_bytes"))
    return (
        parsed.join(
            F.broadcast(keyed.select("media_id", "file_name", "length")),
            "media_id",
        )
        .select(
            "file_name",
            "format",
            "width",
            "height",
            "sample_rate_hz",
            "channels",
            "duration_ms",
            "length",
        )
    )

@query(
    "filter_by_token_count",
    "WITH "
    + SQL_TOKS
    + """
SELECT doc_id, COUNT(*) AS n_toks FROM toks
GROUP BY doc_id HAVING COUNT(*) > 60
""",
)
def filter_by_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-size predicate (P8; F.size('volatility') > 1 at
    01_var_market_etl.py:177): keep docs whose token array exceeds a
    size threshold."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    return (
        d.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") > 60)
        .select("doc_id", F.size("_toks").cast("long").alias("n_toks"))
    )

@query(
    "gbm_context_demo",
    """
SELECT 'DEMO' AS instrument,
       CAST(-0.013815 AS DOUBLE) AS var,
       CAST(-0.02893  AS DOUBLE) AS shortfall
""",
)
def gbm_context_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """00_var_context.py distributed: GBM paths for one instrument,
    VaR-95/ES of terminal returns. ORACLE-pinned as LITERALS: the
    per-trial seed contract (montecarlo.gbm_price_paths — trial t's
    path is bit-identical to numpy default_rng(seed+t)) makes the
    whole result a deterministic constant of (s0, mu, sigma, days,
    n_paths, seed) — independent of sf_dir, partitioning, and task
    retries — so the oracle pins the exact rounded values. A
    partitioning-dependent RNG would flake this row immediately; a
    determinism pytest guards the same contract at module level."""
    from value_at_risk_spark.montecarlo import context_var_demo

    return context_var_demo(spark, n_paths=2000, days=120).select(
        "instrument",
        F.round("var", 6).alias("var"),
        F.round("shortfall", 6).alias("shortfall"),
    )

@query(
    "doc_quality_scores",
    """
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
    FROM documents
  ) WHERE t <> ''
),
sig AS (
  SELECT doc_id,
         COUNT(*) AS n,
         COUNT(DISTINCT t) AS nd,
         SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                  THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS swr
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       ROUND((
         (CASE WHEN COALESCE(s.n, 0) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN COALESCE(s.swr, 0.0) >= 0.05
                  AND COALESCE(s.swr, 0.0) <= 0.6 THEN 1.0 ELSE 0.0 END)
         + COALESCE(s.nd, 0) * 1.0 / GREATEST(COALESCE(s.n, 0), 1)
       ) / 3.0, 6) AS quality
FROM documents d LEFT JOIN sig s USING (doc_id)
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (functions.text.quality_score): length
    band + stopword-density band + type/token ratio."""
    from value_at_risk_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))

@query(
    "gopher_quality_filters",
    """
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
    FROM documents
  ) WHERE t <> ''
),
sig AS (
  SELECT doc_id,
         COUNT(*) AS n,
         SUM(LENGTH(t)) * 1.0 / COUNT(*) AS mean_len,
         SUM(CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS alpha_frac,
         COUNT(DISTINCT CASE WHEN t IN ('the','a','of','and','to','in',
                                        'is','on','for','with')
                             THEN t END) AS n_stop
  FROM toks GROUP BY doc_id
),
flags AS (
  -- LEFT JOIN + COALESCE mirror the engine's greatest(n, 1) guard: a
  -- zero-token document must still be COUNTED per source (all rules
  -- fail except symbol_ratio, whose numerator is 0 for empty text)
  SELECT d.source,
         (COALESCE(s.n, 0) BETWEEN 50 AND 100000) AS word_count_ok,
         (COALESCE(s.mean_len, 0.0) >= 3.0
          AND COALESCE(s.mean_len, 0.0) <= 10.0) AS mean_word_len_ok,
         (((LENGTH(lower(d.text)) - LENGTH(REPLACE(lower(d.text), '#', '')))
           + (LENGTH(lower(d.text))
              - LENGTH(REPLACE(lower(d.text), '...', ''))) / 3)
          * 1.0 / GREATEST(COALESCE(s.n, 0), 1) <= 0.1) AS symbol_ratio_ok,
         (COALESCE(s.alpha_frac, 0.0) >= 0.8) AS alpha_ratio_ok,
         (COALESCE(s.n_stop, 0) >= 2) AS stopwords_ok
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(CASE WHEN word_count_ok AND mean_word_len_ok
                      AND symbol_ratio_ok AND alpha_ratio_ok
                      AND stopwords_ok THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN word_count_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_word_count,
       CAST(SUM(CASE WHEN mean_word_len_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_mean_word_len,
       CAST(SUM(CASE WHEN symbol_ratio_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_symbol_ratio,
       CAST(SUM(CASE WHEN alpha_ratio_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_alpha_ratio,
       CAST(SUM(CASE WHEN stopwords_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_stopwords,
       ROUND(SUM(CASE WHEN word_count_ok AND mean_word_len_ok
                       AND symbol_ratio_ok AND alpha_ratio_ok
                       AND stopwords_ok THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) + 0 AS kept_share
FROM flags GROUP BY source
""",
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality-rule set (Rae et al. 2021 App. A —
    the filters FineWeb/Dolma ship) over the corpus, reported as the
    per-source keep/fail attribution a curation run tunes against:
    which rule drops how many documents per source, and what share
    survives the conjunction. One scan; every rule is a pure Catalyst
    expression inside whole-stage codegen
    (functions/text.gopher_quality_flags) — at 100 TB this is a
    map-only pass followed by a tiny per-source hash-agg. Not in the
    reference (no string surface beyond equality, SURVEY §2.8); this
    is the engine's LLM-pipeline extension tier."""
    from value_at_risk_spark.functions.text import gopher_quality_flags

    d = _t(spark, sf_dir, "documents")
    g = F.col("g")
    kept = (
        g["word_count_ok"]
        & g["mean_word_len_ok"]
        & g["symbol_ratio_ok"]
        & g["alpha_ratio_ok"]
        & g["stopwords_ok"]
    )
    flagged = d.select(
        "source", gopher_quality_flags("text").alias("g")
    ).select(
        "source",
        kept.cast("long").alias("_keep"),
        (~g["word_count_ok"]).cast("long").alias("_f_wc"),
        (~g["mean_word_len_ok"]).cast("long").alias("_f_mwl"),
        (~g["symbol_ratio_ok"]).cast("long").alias("_f_sym"),
        (~g["alpha_ratio_ok"]).cast("long").alias("_f_alpha"),
        (~g["stopwords_ok"]).cast("long").alias("_f_stop"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("_keep").alias("kept"),
        F.sum("_f_wc").alias("fail_word_count"),
        F.sum("_f_mwl").alias("fail_mean_word_len"),
        F.sum("_f_sym").alias("fail_symbol_ratio"),
        F.sum("_f_alpha").alias("fail_alpha_ratio"),
        F.sum("_f_stop").alias("fail_stopwords"),
        F.round(F.sum("_keep") / F.count(F.lit(1)), 6).alias("kept_share"),
    )

@query(
    "doc_fingerprints_rolling",
    """
WITH docs AS (
  SELECT doc_id,
         list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT doc_id, md5(array_to_string(ts[i:i+4], ' ')) AS h
  FROM docs, UNNEST(range(1, greatest(len(ts) - 4, 1) + 1)) AS t(i)
),
sel AS (
  SELECT doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS r
  FROM sh
)
SELECT doc_id, string_agg(h, ',' ORDER BY h) AS fingerprint
FROM sel WHERE r <= 8 GROUP BY 1
""",
)
def doc_fingerprints_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: hash every 5-gram
    shingle, keep each document's k smallest hashes as its fingerprint
    set (a bottom-k sketch — the content-defined sampling used for
    plagiarism/near-dup detection at corpus scale). Formerly
    rows-only under xxhash64; the hash is md5 here so DuckDB computes
    the identical bottom-k and the gate hash-checks the fingerprints —
    bottom-k only needs hash-order stability, not any particular
    function, so the portable choice costs nothing semantically (at
    100 TB you'd keep xxhash64 for speed; same plan)."""
    from value_at_risk_spark.functions.text import shingles
    from value_at_risk_spark.operators.skew import spread_small_input

    # md5-per-shingle runs in the scan stage: spread-guard the
    # single-split fixture scan (r16, guide §2.5). When the guard
    # fires, the doc_id partitioning also satisfies the bottom-k
    # window below, so no second exchange appears.
    d = spread_small_input(_t(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(shingles("text", 5)).alias("_s")
    ).select("doc_id", F.md5("_s").alias("_h"))
    w = Window.partitionBy("doc_id").orderBy("_h")
    return (
        sh.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 8)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("_h")).alias("fingerprint"))
        .select(
            "doc_id",
            F.concat_ws(",", "fingerprint").alias("fingerprint"),
        )
    )

def _lsh_verified_pairs(d: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Shared LSH-candidate → exact-Jaccard-verified pair stage of the
    near-dedup family (near_dedup_survivors, dedup_clusters): 32-hash
    signatures, 16x2 banding, candidate pairs, then exact xxhash64-
    shingle-set Jaccard >= ``threshold`` on the candidates only.

    r16 optimization (guide §2.4 / §3): the candidate-pair frame is
    localCheckpointed ONCE — lazily, the whole signature pipeline
    (tokenize + shingle explode + 32-min agg + banded self-join) would
    re-execute for each of its references; and the verify stage builds
    shingle arrays only for CANDIDATE docs via a broadcast semi-join
    (the measured ~3x cut the minhash_lsh_pairs gate row documents),
    so the corpus-wide tokenize+hash pass runs once, in the
    signatures. localCheckpoint (RDD-identity), never persist (plan-
    matching cache) — a fresh call recomputes from the source."""
    from value_at_risk_spark.functions.text import shingles, tokens
    from value_at_risk_spark.operators.skew import spread_small_input

    sigs = minhash_signatures(d, num_hashes=32, shingle_n=3)
    pairs = minhash_lsh_pairs(
        sigs, num_bands=16, num_hashes=32
    ).localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    # Docs with < 3 tokens yield no 3-shingles in the oracle (WHERE
    # len(ts) >= 3) but ONE truncated shingle from shingles() — exclude
    # them so the inner joins below drop candidate pairs touching a
    # short doc (both engines then agree on every fixture).
    # spread-guard (r16, guide §2.5): the candidate docs' tokenize +
    # shingle + array_distinct + xxhash64 runs in the scan stage (the
    # semi-join is broadcast), so a single-split input serializes it.
    # Guard the RAW SCAN, not the joined frame (r17, ADVICE): probing
    # .rdd on a plan containing exchanges makes AQE eagerly execute
    # its query stages — at this site that ran the broadcast collect
    # (and the candidate-distinct above it) as a throwaway job. The
    # scan-only probe runs no job, and the broadcast semi-join
    # preserves the spread's partitioning.
    sh = (
        spread_small_input(d, "doc_id")
        .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .filter(F.size(tokens("text")) >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(shingles("text", 3), lambda sg: F.xxhash64(sg))
            ).alias("sh"),
        )
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = pairs.join(a, "id_a").join(b, "id_b")
    return jaccard_similarity(
        cand, "sh_a", "sh_b", out_col="jacc", tokenize=False
    ).filter(F.col("jacc") >= threshold)


@query(
    "near_dedup_survivors",
    """
WITH RECURSIVE docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, len(ts) - 1)) AS t(i)
  WHERE len(ts) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id > a.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN cnt ca ON ca.doc_id = id_a
  JOIN cnt cb ON cb.doc_id = id_b
  WHERE ni * 1.0 / (ca.n + cb.n - ni) >= 0.8
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
""",
)
def near_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite near-dedup pipeline, EXACT and oracle-pinned (was
    rows-only with a direct-neighborhood-min survivor rule): MinHash-LSH
    candidates → exact 3-gram-shingle Jaccard verify (≥ 0.8, recall
    pinned by lsh_recall_high_jaccard) → connected components → keep
    the smallest doc_id per component. Min-per-component makes the
    survivor rule transitive — direct-neighborhood min can keep two
    survivors in a sprawling cluster like {A-C, B-C} (pinned in
    tests/test_operators.py). The DuckDB twin computes true shingle-
    Jaccard pairs + recursive transitive closure, so hash equality
    asserts the end-to-end dedup flow, not just the pair stage.
    Scale form: the verify stage intersects xxhash64 shingle SETS, not
    string sets — the candidate join's array payload shrinks ~4× and
    Jaccard over hashes equals Jaccard over strings modulo a 2^-64
    collision tail (measured 8.9 s → 6.4 s at sf0.1, identical
    output; the oracle hash-match pins it per-value)."""
    from value_at_risk_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    verified = _lsh_verified_pairs(d)
    cc = connected_components(
        verified.select("id_a", "id_b"), src="id_a", dst="id_b"
    )
    dupes = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return d.select("doc_id").join(dupes, "doc_id", "left_anti")

@query(
    "clean_text",
    """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS clean,
       LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS approx_words
FROM documents
""",
)
def clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lowercase, strip non-alphanumerics, collapse
    whitespace) — the first stage of every LLM-data text pipeline, all
    JVM regex."""
    d = _t(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    words = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    return d.select(
        "doc_id", clean.alias("clean"), words.cast("long").alias("approx_words")
    )

@query(
    "sample_stratified",
    """
SELECT lang, TRUE AS rate_ok, TRUE AS rerun_same
FROM documents GROUP BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling per language (sampleBy) — the
    corpus-balancing primitive for training-data mixes — ORACLE-pinned
    on its CONTRACT rather than its RNG draw (which is engine- and
    partitioning-specific; the reproducible-by-construction variant is
    sample_stratified_hash): per stratum, (a) the realized sample rate
    sits within ±0.25 of the requested fraction (≥5σ of the binomial
    at the smallest sf0.01 stratum, so only gross errors — sampling
    everything, nothing, or the wrong stratum — trip it), and (b) a
    SECOND sampleBy with the same seed over the same frame returns the
    identical id set (seeded determinism, task-retry safety)."""
    d = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.3, "es": 0.3, "zh": 0.2, "fr": 0.2}
    s1 = d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")
    s2 = d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    rates = (
        s1.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .join(totals, "lang")
        .select(
            "lang",
            (
                F.abs(
                    F.col("n_sampled") / F.col("n_total")
                    - frac[F.col("lang")]
                )
                <= 0.25
            ).alias("rate_ok"),
        )
    )
    diff = s1.exceptAll(s2).union(s2.exceptAll(s1))
    rerun_same = diff.groupBy().count().select(
        (F.col("count") == 0).alias("rerun_same")
    )
    return rates.crossJoin(F.broadcast(rerun_same))

@query(
    "docs_with_long_tokens",
    """
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), t -> LENGTH(t) > 9)) > 0 AS has_long,
       len(string_split(lower(text), ' ')) =
         len(list_filter(string_split(lower(text), ' '), t -> LENGTH(t) < 20)) AS all_short
FROM documents
""",
)
def docs_with_long_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates (exists / forall) — the lambda
    surface Catalyst evaluates without Python."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    return d.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 9).alias("has_long"),
        F.forall(toks, lambda t: F.length(t) < 20).alias("all_short"),
    )

@query(
    "tfidf_top_terms",
    """
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT t, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.t,
         ROUND(tf.tf * LN(n.n_docs * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df ON df.t = tf.t CROSS JOIN n
)
SELECT doc_id, t AS term, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, t) AS rnk
  FROM scored
) WHERE rnk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document — term weighting for
    retrieval/quality pipelines. TF and DF are two hash aggs off one
    explode; IDF joins back broadcast (term dictionary ≪ corpus). The
    document count enters as a lazy 1-row aggregate broadcast (same
    pattern as ``token_cooccurrence_pmi``) — no eager driver-side
    ``count()`` job, and the count subtree prunes to a zero-column
    parquet metadata scan."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t"),
    )
    tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("t").agg(F.count_distinct("doc_id").alias("df"))
    ndocs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "t",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("t"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("t").alias("term"), "tfidf")
    )

@query(
    "chunk_documents",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
n AS (
  SELECT doc_id, ts,
         GREATEST(CAST(CEIL((len(ts) - 16) / 48.0) AS BIGINT), 1) AS nc
  FROM docs
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(ts[i*48+1 : i*48+64], ' ') AS chunk,
       CAST(len(ts[i*48+1 : i*48+64]) AS INT) AS n_tokens
FROM n, UNNEST(range(0, nc)) AS t(i)
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM training-data chunking: overlapping 64-token windows with
    stride 48 (overlap 16) per document — functions/text.chunk_tokens,
    built from higher-order functions (per-row, shuffle-free, linear
    in tokens), then one posexplode to chunk granularity. The
    document → chunk fan-out is the canonical pre-tokenization step of
    a training-data pipeline."""
    from value_at_risk_spark.functions.text import chunk_tokens

    d = _t(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id",
        F.explode(chunk_tokens("text", chunk_size=64, overlap=16)).alias("c"),
    )
    return ch.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
        F.size(F.split(F.col("c.chunk"), " ")).alias("n_tokens"),
    )

@query(
    "sample_stratified_hash",
    """
SELECT doc_id, lang
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang
        WHEN 'en' THEN '80000000'
        WHEN 'de' THEN '4ccccccc'
        WHEN 'es' THEN '4ccccccc'
        WHEN 'zh' THEN '33333333'
        ELSE '33333333'
      END
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by hash threshold: a row is
    in-sample iff the first 8 hex chars of md5(doc_id) fall below the
    stratum's rate threshold (en 50%, de/es 30%, others 20%). Unlike
    RNG `sampleBy` (kept as `sample_stratified`, rows-only), the
    hash rule is reproducible across engines, task retries, and
    repartitioning — the sampling you ship in a 100 TB pipeline, and
    it oracle-checks exactly."""
    d = _t(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("lang") == "en", F.lit("80000000"))
        .when(F.col("lang").isin("de", "es"), F.lit("4ccccccc"))
        .otherwise(F.lit("33333333"))
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return d.filter(bucket < threshold).select("doc_id", "lang")

@query(
    "dedup_clusters",
    """
WITH RECURSIVE docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, len(ts) - 1)) AS t(i)
  WHERE len(ts) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id > a.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN cnt ca ON ca.doc_id = id_a
  JOIN cnt cb ON cb.doc_id = id_b
  WHERE ni * 1.0 / (ca.n + cb.n - ni) >= 0.8
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
)
SELECT node AS doc_id, MIN(r) AS component
FROM reach GROUP BY node
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS, not just pairs: verified near-dup pairs
    (3-gram Jaccard ≥ 0.8 on LSH candidates — recall pinned by
    lsh_recall_high_jaccard) become a graph; iterative min-label
    propagation (operators/dedup.connected_components) finds each
    node's component = smallest reachable doc_id. The DuckDB twin
    computes the same components by recursive transitive closure —
    an exact oracle for an ITERATIVE distributed algorithm."""
    from value_at_risk_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    verified = _lsh_verified_pairs(d)
    cc = connected_components(
        verified.select("id_a", "id_b"), src="id_a", dst="id_b"
    )
    return cc.select(F.col("node").alias("doc_id"), "component")

@query(
    "heavy_hitter_tokens",
    """
WITH toks AS (
  SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents
)
SELECT tok, COUNT(*) AS cnt
FROM toks WHERE tok <> ''
GROUP BY tok
HAVING COUNT(*) > (SELECT COUNT(*) FROM toks WHERE tok <> '') / 100.0
""",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent tokens (count > n/100) over the document corpus
    via the two-pass Misra-Gries operator: per-partition MG summaries
    (mapInPandas, <= 100 counters each) give a guaranteed-superset
    candidate set; an exact count pass over just the candidates
    (broadcast semi-join) yields the exact answer without shuffling
    the full vocabulary — the heavy-hitters shape for a 100 TB token
    stream. Oracle is the plain exact GROUP BY/HAVING; results agree
    because pass 2 is exact and the MG pigeonhole guarantee makes the
    candidate set complete (operators/heavyhitters.py docstring)."""
    from value_at_risk_spark.operators.heavyhitters import exact_heavy_hitters

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok")
    )
    return exact_heavy_hitters(toks, "tok", k=100, count_alias="cnt")

@query(
    "streaming_dedup_events",
    """
SELECT event_type,
       COUNT(DISTINCT event_id) AS n_unique_events
FROM events GROUP BY 1
""",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup at the gate, HASH-CHECKED against the batch
    distinct counts (every duplicate arrives within the horizon in a
    bounded replay, so the deduped result is deterministic — the
    parity the pytest asserts, now oracle-enforced): the events
    fixture staged TWICE into one source dir — an at-least-once
    redelivery — replayed through ``dropDuplicatesWithinWatermark`` on
    event_id. The deduped stream lands in a memory sink; per-type
    counts over the sink equal DuckDB's COUNT(DISTINCT event_id),
    proving the redelivered copy was dropped. State is one row per
    in-horizon event_id — bounded, unlike stream ``dropDuplicates``."""
    import shutil
    import tempfile

    from value_at_risk_spark.streaming.windows import (
        dedup_stream,
        read_events_stream,
    )

    src = tempfile.mkdtemp(prefix="dedup_stream_")
    try:
        e = _t(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type"
        )
        # two staged copies = deterministic duplicate delivery
        e.write.mode("overwrite").parquet(f"{src}/a")
        e.write.mode("overwrite").parquet(f"{src}/b")
        stream = (
            spark.readStream.schema(e.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        if dict(e.dtypes).get("ts") == "timestamp_ntz":
            # withWatermark requires TIMESTAMP; naive wall clock → UTC instant
            stream = stream.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
        deduped = dedup_stream(stream, ["event_id"], watermark="2 days")
        sink = f"gate_streaming_dedup_{uuid.uuid4().hex[:8]}"
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError(
                "streaming_dedup_events: bounded replay exceeded 180s"
            )
        return (
            spark.table(sink)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique_events"))
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)

@query(
    "pii_scrub_documents",
    f"""
WITH aug AS (
  SELECT doc_id,
         text || ' reach user' || CAST(doc_id AS VARCHAR)
              || '@mail.example or call 555-123-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(LEN(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
FROM aug
""",
)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the document corpus — a mandatory pass in any
    training-data pipeline. The fixture text carries no PII, so a
    deterministic synthetic email+phone is appended per doc (both
    engines append the identical string) and then scrubbed: per-doc
    match counts + the redacted text, all via JVM regexp (RE2-safe
    patterns — identical semantics on Spark's Java regex and DuckDB's
    RE2). Scale shape: pure per-row narrow ops — no shuffle at all;
    the scan streams straight through whole-stage codegen."""
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ).alias("scrubbed"),
    )

@query(
    "group_sample_deterministic_k",
    """
SELECT event_type, event_id
FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
  FROM events
)
WHERE rn <= 20
""",
)
def group_sample_deterministic_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k deterministic per-group sample (the reservoir-sample
    contract without RNG state): keep each group's k rows with the
    smallest md5(id) — a uniform, seedless, engine-portable draw that
    any worker can recompute (the property that makes the sample
    joinable downstream). Complements sample_stratified (fractional,
    seeded RNG) and sample_stratified_hash (fractional, hash
    threshold): those give Bernoulli fractions; this gives exact k.
    Scale shape: one shuffle on the group key; rank-truncation prunes
    everything past k per group before the final projection. For few
    huge groups the two-phase variant (per-partition bottom-k then
    merge, as in heavyhitters.py) drops the sort to O(n log k)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.md5(F.col("event_id").cast("string")))
    return (
        e.select("event_type", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("event_type", "event_id")
    )

@query(
    "sequence_packing_assignments",
    """
WITH RECURSIVE toks AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text),' '), x -> x <> ''))
           AS n_tokens,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              ::UBIGINT % 16 AS INT) AS bucket
  FROM documents
),
numbered AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM toks
),
pack AS (
  SELECT bucket, rn, doc_id, n_tokens,
         0 AS seq_emit,
         n_tokens AS run_emit,
         n_tokens > 256 AS oversize,
         CASE WHEN n_tokens > 256 THEN 1 ELSE 0 END AS seq_state,
         CASE WHEN n_tokens > 256 THEN 0 ELSE n_tokens END AS acc_state
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.bucket, n.rn, n.doc_id, n.n_tokens,
         CASE WHEN n.n_tokens > 256 THEN
                CASE WHEN p.acc_state > 0 THEN p.seq_state + 1
                     ELSE p.seq_state END
              WHEN p.acc_state + n.n_tokens > 256 THEN p.seq_state + 1
              ELSE p.seq_state END AS seq_emit,
         CASE WHEN n.n_tokens > 256 THEN n.n_tokens
              WHEN p.acc_state + n.n_tokens > 256 THEN n.n_tokens
              ELSE p.acc_state + n.n_tokens END AS run_emit,
         n.n_tokens > 256 AS oversize,
         CASE WHEN n.n_tokens > 256 THEN
                (CASE WHEN p.acc_state > 0 THEN p.seq_state + 1
                      ELSE p.seq_state END) + 1
              WHEN p.acc_state + n.n_tokens > 256 THEN p.seq_state + 1
              ELSE p.seq_state END AS seq_state,
         CASE WHEN n.n_tokens > 256 THEN 0
              WHEN p.acc_state + n.n_tokens > 256 THEN n.n_tokens
              ELSE p.acc_state + n.n_tokens END AS acc_state
  FROM numbered n JOIN pack p ON n.bucket = p.bucket AND n.rn = p.rn + 1
)
SELECT doc_id, bucket, CAST(seq_emit AS BIGINT) AS seq_in_bucket,
       CAST(run_emit AS BIGINT) AS seq_tokens_so_far, oversize
FROM pack
""",
)
def sequence_packing_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing over the document corpus — each doc
    lands in exactly one packed sequence of <= 256 tokens, named by
    (bucket, seq_in_bucket). One shuffle on the bucket key + an
    O(1)-state Arrow pass per bucket. Formerly rows-only; next-fit's
    sequential state IS expressible to DuckDB as a recursive CTE
    (state row per (bucket, rank)), so the gate now hash-checks the
    full assignment — with the bucket hash switched to the md5-derived
    form both engines compute identically (the operator default stays
    xxhash64, JVM-fastest; the parameter exists exactly for cross-
    engine parity). The packing invariants remain pytest-asserted."""
    from value_at_risk_spark.functions.text import tokens
    from value_at_risk_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    portable_bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 16
    )
    return pack_sequences(
        d,
        id_col="doc_id",
        tokens_col="n_tokens",
        max_tokens=256,
        buckets=16,
        bucket_by=portable_bucket,
    )

@query(
    "incremental_dedup_new_docs",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, len(ts) - 1)) AS t(i)
  WHERE len(ts) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_l, b.doc_id AS id_r, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
  GROUP BY 1, 2
),
matches AS (
  SELECT id_l, MIN(id_r) AS nearest
  FROM inter
  JOIN cnt ca ON ca.doc_id = id_l
  JOIN cnt cb ON cb.doc_id = id_r
  WHERE ni * 1.0 / (ca.n + cb.n - ni) >= 0.8
  GROUP BY 1
)
SELECT d.doc_id, (m.nearest IS NOT NULL) AS is_dup, m.nearest AS nearest_corpus_id
FROM documents d LEFT JOIN matches m ON d.doc_id = m.id_l
WHERE d.doc_id % 10 = 0
""",
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dedup — the streaming-corpus form: a new batch
    (docs with doc_id % 10 = 0, standing in for today's crawl) is
    checked against the existing corpus (the rest) WITHOUT any
    corpus-corpus self-join: both sides MinHash with the identical hash
    family, band-join across frames only (minhash_lsh_pairs_cross),
    exact-Jaccard verify on the collisions, min corpus match per new
    doc. EXACT and oracle-pinned (the DuckDB twin computes true
    shingle-Jaccard batch x corpus pairs); same banding params as
    near_dedup_survivors, whose oracle already pins >= 0.8 recall for
    this corpus. At scale this is the per-increment cost profile you
    want: signatures for the batch only, the corpus side reusable from
    a stored signature table."""
    from value_at_risk_spark.functions.text import shingles, tokens
    from value_at_risk_spark.operators.dedup import minhash_lsh_pairs_cross

    d = _t(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    sig_b = minhash_signatures(batch, num_hashes=32, shingle_n=3)
    sig_c = minhash_signatures(corpus, num_hashes=32, shingle_n=3)
    cand = minhash_lsh_pairs_cross(sig_b, sig_c, num_bands=16, num_hashes=32)
    # Checkpoint the bounded id-pair frame (its lineage is BOTH 32-hash
    # signature pipelines) and build verify shingles only for docs that
    # appear in some candidate pair — the batch-1 candidate-bounded
    # verify pattern (this query predated it; plan was 10 parquet
    # scans: the sh subtree re-derived per join side).
    cand = cand.localCheckpoint(eager=True)
    cand_ids = (
        cand.select(F.col("id_left").alias("doc_id"))
        .union(cand.select(F.col("id_right").alias("doc_id")))
        .distinct()
    )
    # short docs (<3 tokens) have no 3-shingles in the oracle — same
    # exclusion as near_dedup_survivors so both engines agree
    sh = d.join(F.broadcast(cand_ids), "doc_id", "left_semi").filter(
        F.size(tokens("text")) >= 3
    ).select(
        "doc_id",
        # xxhash64 shingle sets: same Jaccard, ~4x smaller join payload
        # (the near_dedup_survivors scale form; oracle pins equality)
        F.array_distinct(
            F.transform(shingles("text", 3), lambda sg: F.xxhash64(sg))
        ).alias("sh"),
    )
    l = sh.select(F.col("doc_id").alias("id_left"), F.col("sh").alias("sh_l"))
    r = sh.select(F.col("doc_id").alias("id_right"), F.col("sh").alias("sh_r"))
    verified = jaccard_similarity(
        cand.join(l, "id_left").join(r, "id_right"),
        "sh_l",
        "sh_r",
        out_col="jacc",
        tokenize=False,
    ).filter(F.col("jacc") >= 0.8)
    matches = verified.groupBy("id_left").agg(
        F.min("id_right").alias("nearest_corpus_id")
    )
    return (
        batch.select("doc_id")
        .join(matches, batch["doc_id"] == matches["id_left"], "left")
        .select(
            "doc_id",
            F.col("nearest_corpus_id").isNotNull().alias("is_dup"),
            "nearest_corpus_id",
        )
    )

@query(
    "decontaminate_training_docs",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS g
  FROM docs, UNNEST(range(1, len(ts) - 3)) AS t(i)
  WHERE len(ts) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
shared AS (
  SELECT gr.doc_id, COUNT(DISTINCT gr.g) AS n_shared
  FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 17 <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       (COALESCE(s.n_shared, 0) > 0) AS contaminated
FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
WHERE d.doc_id % 17 <> 0
""",
)
def decontaminate_training_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the n-gram overlap check every
    serious training corpus runs before training: docs sharing any
    5-gram with the held-out benchmark set (docs with doc_id % 17 = 0
    standing in for the eval suite) are flagged, with the count of
    distinct shared 5-grams as evidence. Scale shape: the benchmark's
    distinct n-gram set is SMALL by construction (eval suites are) —
    broadcast it; the training side streams through one explode +
    broadcast-hash semi-reduce + one grouped count, no all-pairs
    anything. At 100 TB swap the broadcast for a bloom filter of the
    benchmark grams and keep the same plan."""
    from value_at_risk_spark.functions.text import shingles
    from value_at_risk_spark.operators.skew import spread_small_input

    d = _t(spark, sf_dir, "documents")
    # the gram build (tokenize + 5-shingle + distinct + xxhash64) runs
    # in the scan stage and executes TWICE (bench-set build + training
    # stream): spread-guard the single-split fixture scan so both
    # passes parallelize (r16, guide §2.5; no-op on a parallel scan)
    d = spread_small_input(d, "doc_id")
    # xxhash64 gram keys: the broadcast set and the count-distinct
    # shuffle carry 8-byte longs, not 5-gram strings (oracle-equal)
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(shingles("text", 5), lambda sg: F.xxhash64(sg))
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 17 == 0).select("g").distinct()
    )
    shared = (
        grams.filter(F.col("doc_id") % 17 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )
    train = d.filter(F.col("doc_id") % 17 != 0).select("doc_id")
    return (
        train.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )

@query(
    "data_quality_audit",
    """
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
         CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
         CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS dup_pk
  FROM lineitem
),
o AS (
  SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n,
         CAST((SELECT COUNT(*) FROM orders LEFT JOIN customer ON o_custkey = c_custkey
               WHERE c_custkey IS NULL) AS BIGINT) AS orphans
)
SELECT 'lineitem.null_quantity' AS check_name, null_qty AS n_violations, n AS n_rows, null_qty = 0 AS passed FROM li
UNION ALL SELECT 'lineitem.nonpositive_quantity', bad_qty, n, bad_qty = 0 FROM li
UNION ALL SELECT 'lineitem.discount_out_of_range', bad_disc, n, bad_disc = 0 FROM li
UNION ALL SELECT 'lineitem.tax_out_of_range', bad_tax, n, bad_tax = 0 FROM li
UNION ALL SELECT 'lineitem.nonpositive_price', bad_price, n, bad_price = 0 FROM li
UNION ALL SELECT 'lineitem.duplicate_pk', dup_pk, n, dup_pk = 0 FROM li
UNION ALL SELECT 'orders.orphan_custkey', orphans, n, orphans = 0 FROM o
""",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the constraint/expectation sweep (Deequ /
    dbt-test style) a pipeline runs before admitting a batch: column
    null checks, domain bounds, ordering invariants, primary-key
    uniqueness, and cross-table referential integrity, each reported as
    (check_name, n_violations, n_rows, passed). Scale shape: ALL
    single-table checks ride ONE scan of the fact table as conditional
    partial aggregates (no per-check jobs — at 100 TB one pass vs
    seven is the whole game); PK uniqueness shares that same scan via
    count_distinct; the RI check is one anti-join against the
    dimension, broadcast when small. The result is seven 1-row frames
    unioned — bytes — so downstream can gate ingestion on
    ``passed`` without re-touching the data."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_quantity").isNull(), 1).otherwise(0)
        ).alias("null_qty"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        ).alias("bad_disc"),
        F.sum(
            F.when((F.col("l_tax") < 0) | (F.col("l_tax") > 1), 1).otherwise(0)
        ).alias("bad_tax"),
        F.sum(
            F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)
        ).alias("bad_price"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("dup_pk"),
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    o = orders.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        orders.join(
            F.broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphans"))
    )

    def _checks(frame, n_col, pairs):
        return frame.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("check_name"),
                            F.col(col).cast("long").alias("n_violations"),
                            F.col(n_col).cast("long").alias("n_rows"),
                            (F.col(col) == 0).alias("passed"),
                        )
                        for name, col in pairs
                    ]
                )
            ).alias("c")
        ).select("c.*")

    li_checks = _checks(
        a,
        "n",
        [
            ("lineitem.null_quantity", "null_qty"),
            ("lineitem.nonpositive_quantity", "bad_qty"),
            ("lineitem.discount_out_of_range", "bad_disc"),
            ("lineitem.tax_out_of_range", "bad_tax"),
            ("lineitem.nonpositive_price", "bad_price"),
            ("lineitem.duplicate_pk", "dup_pk"),
        ],
    )
    o_checks = _checks(o, "n", [("orders.orphan_custkey", "orphans")])
    return li_checks.unionByName(o_checks)

@query(
    "decontaminate_bloom_prefilter",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS g
  FROM docs, UNNEST(range(1, len(ts) - 3)) AS t(i)
  WHERE len(ts) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
shared AS (
  SELECT gr.doc_id, COUNT(DISTINCT gr.g) AS n_shared
  FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 17 <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       (COALESCE(s.n_shared, 0) > 0) AS contaminated
FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
WHERE d.doc_id % 17 <> 0
""",
)
def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a BLOOM-FILTER prefilter — the
    100 TB form promised in ``decontaminate_training_docs``'s docstring,
    now an actual plan: the benchmark's distinct 5-grams are folded
    into a ~16 KB bit array (operators/bloom.build_bloom — one narrow
    agg, nothing reaches the driver), every training-side gram is
    screened by pure codegen bit math (no join, no shuffle), and only
    the bloom survivors reach the exact verify join. Bloom filters
    have zero false negatives, so the final answer is EXACT and the
    oracle is the same SQL as the broadcast-join variant — the filter
    only prunes the probe stream, which is the entire point: at 100 TB
    the corpus-side explode output shrinks by ~the contamination rate
    before any join machinery runs, and the reference set costs
    1.2 bytes/gram instead of a broadcast string hash-table."""
    from value_at_risk_spark.functions.text import shingles
    from value_at_risk_spark.operators.bloom import bloom_contains, build_bloom

    num_bits, k = 1 << 17, 3
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 5))).alias("g")
    )
    bench = grams.filter(F.col("doc_id") % 17 == 0).select("g").distinct()
    # Two consumers (the bloom fold and the exact-verify broadcast)
    # re-derived the benchmark-side explode+distinct; checkpoint the
    # bounded bench-gram set once (guide §2.4 — the benchmark suite is
    # the small side by construction).
    bench = bench.localCheckpoint(eager=True)
    bloom = build_bloom(bench, "g", num_bits=num_bits, num_hashes=k)
    candidates = (
        grams.filter(F.col("doc_id") % 17 != 0)
        .crossJoin(F.broadcast(bloom))
        .filter(bloom_contains("bloom", F.col("g"), num_bits, k))
        .drop("bloom")
    )
    shared = (
        candidates.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )
    train = d.filter(F.col("doc_id") % 17 != 0).select("doc_id")
    return train.join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )

@query(
    "streaming_heavy_hitters_demo",
    f"""
WITH tok AS (
  SELECT UNNEST(list_filter(string_split(lower(text),' '), x -> x <> ''))
         AS t
  FROM documents
),
vocab AS (SELECT DISTINCT t FROM tok),
{xxh64_cte("vocab")},
sh AS (
  SELECT tok.t,
         CAST(abs({xxh64_signed("hsh.hu")}) % 8 AS INTEGER) AS shard
  FROM tok JOIN hsh ON tok.t = hsh.t
),
cnt AS (SELECT shard, t, COUNT(*) AS n FROM sh GROUP BY 1, 2),
tot AS (SELECT shard, SUM(n) AS total FROM cnt GROUP BY 1)
SELECT cnt.shard AS shard, cnt.t AS token, CAST(cnt.n AS BIGINT) AS n
FROM cnt JOIN tot USING (shard)
WHERE 9 * cnt.n > tot.total
""",
)
def streaming_heavy_hitters_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries heavy hitters, ORACLE-checked (r13
    graduation, was rows-only): the document token stream is replayed
    availableNow through sharded bounded-state MG summaries
    (streaming/stateful.py — <= k counters per shard, mergeable-
    summary decrement), then the final candidate sets are VERIFIED
    against exact per-shard counts, the two-pass pattern the batch
    operator uses. The MG guarantee — every token with true shard
    count > shard_total/(k+1) survives eviction — is enforced with a
    loud raise (a superset violation fails the gate as an error, never
    a silent wrong answer), and the returned rows are the exact heavy
    hitters drawn FROM the streaming candidates, so the DuckDB oracle
    can recompute them: shard = abs(xxhash64(token)) % 8 replayed via
    the XXH64-in-SQL scaffold (functions/xxh64_sql.py), threshold as
    exact integer arithmetic (9*n > total). Bounded state regardless
    of stream length; the exact-count verify pass is a batch hash-agg
    sized by the shard vocabulary, never the stream."""
    import shutil
    import tempfile

    from value_at_risk_spark.functions.text import tokens as _tokens
    from value_at_risk_spark.streaming.stateful import streaming_heavy_hitters

    tok = _t(spark, sf_dir, "documents").select(
        F.explode(_tokens("text")).alias("token")
    )
    src = tempfile.mkdtemp(prefix="hh_stream_")
    try:
        tok.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("token string").parquet(src)
        hh = streaming_heavy_hitters(stream, k=8, nshards=8)
        sink = f"gate_streaming_hh_{uuid.uuid4().hex[:8]}"
        q = (
            hh.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError(
                "streaming_heavy_hitters_demo: replay exceeded 180s"
            )
        # keep each shard's LAST emit (the final summary) by the
        # state-carried batch_seq counter — a contract, not a scan-
        # order assumption — then explode to the candidate set
        emits = spark.table(sink)
        w = Window.partitionBy("shard").orderBy(F.desc("batch_seq"))
        cand = (
            emits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("shard", F.explode("tokens").alias("token"))
        )
        # exact per-shard counts (the batch verify pass of two-pass HH)
        exact = (
            tok.withColumn(
                "shard",
                (F.abs(F.xxhash64("token")) % 8).cast("int"),
            )
            .groupBy("shard", "token")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = exact.groupBy("shard").agg(F.sum("n").alias("total"))
        true_hh = (
            exact.join(F.broadcast(tot), "shard")
            .filter(F.lit(9) * F.col("n") > F.col("total"))
            .select("shard", "token", "n")
        )
        # BOTH sets are bounded artifacts (<= 8 tokens/shard: at most
        # 8 counts can each exceed total/9, and the MG summary holds
        # <= k counters) — collect ONCE so the verify pass and the
        # returned frame don't each re-evaluate the corpus-wide
        # count pipeline
        hh_rows = true_hh.collect()
        cand_set = {(r.shard, r.token) for r in cand.collect()}
        # MG superset guarantee, enforced loud: every true heavy hitter
        # must be present in its shard's final streaming summary
        missing = [
            (r.shard, r.token)
            for r in hh_rows
            if (r.shard, r.token) not in cand_set
        ]
        if missing:
            raise AssertionError(
                "streaming_heavy_hitters_demo: Misra-Gries superset "
                f"guarantee violated — true heavy hitter(s) {missing} "
                "missing from the final shard summaries"
            )
        # the returned set is the candidates' certified subset ==
        # exactly the true heavy hitters (given the assert above)
        return spark.createDataFrame(
            [(r.shard, r.token, r.n) for r in hh_rows],
            "shard int, token string, n long",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)

@query(
    "token_cooccurrence_pmi",
    """
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text),' '), x -> x <> '')) AS ts
  FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM docs),
n_docs AS (SELECT COUNT(*) AS nd FROM docs),
df AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY 1),
pairs AS (
  SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2
)
SELECT t1, t2, CAST(n_ab AS BIGINT) AS n_ab,
       ROUND(LN(n_ab * 1.0 * (SELECT nd FROM n_docs)
                / (da.n * 1.0 * db.n)), 6) + 0 AS pmi
FROM pairs
JOIN df da ON da.t = t1
JOIN df db ON db.t = t2
WHERE n_ab >= 50
""",
)
def token_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence with pointwise mutual
    information — collocation mining over the corpus. Distinct tokens
    per doc self-join WITHIN the doc (the join key is doc_id, so the
    shuffle is by document — no cross-doc pair explosion), pair counts
    reduce with map-side partials, and the document-frequency table
    joins back by broadcast. The n_ab floor bounds the output to pairs
    with real support. At 100 TB you'd pre-prune the vocabulary to the
    top-k tokens (heavy hitters pass) before pairing — that composed
    form is ``token_cooccurrence_pmi_pruned`` below; the plan shape is
    unchanged. The document count joins in as a lazy 1-row aggregate
    broadcast into the final select (no eager driver action, and the
    count subtree prunes to a zero-column parquet metadata scan),
    mirroring ``source_mix_report``'s total."""
    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    ndocs = d.groupBy().agg(F.count(F.lit(1)).alias("nd"))
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select("doc_id", F.col("t").alias("t1"))
    b = tok.select("doc_id", F.col("t").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 50)
    )
    da = dfreq.select(F.col("t").alias("t1"), F.col("n").alias("n_a"))
    db = dfreq.select(F.col("t").alias("t2"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(da), "t1")
        .join(F.broadcast(db), "t2")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "t1",
            "t2",
            "n_ab",
            (
                F.round(
                    F.log(
                        F.col("n_ab") * F.col("nd").cast("double")
                        / (F.col("n_a") * F.lit(1.0) * F.col("n_b"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )

@query(
    "token_cooccurrence_pmi_pruned",
    """
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text),' '), x -> x <> '')) AS ts
  FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM docs),
n_tok AS (SELECT COUNT(*) AS n FROM tok),
vocab AS (
  SELECT t FROM tok GROUP BY t
  HAVING COUNT(*) > (SELECT n FROM n_tok) / 400.0
),
ptok AS (SELECT doc_id, t FROM tok WHERE t IN (SELECT t FROM vocab)),
n_docs AS (SELECT COUNT(*) AS nd FROM docs),
df AS (SELECT t, COUNT(*) AS n FROM ptok GROUP BY 1),
pairs AS (
  SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_ab
  FROM ptok a JOIN ptok b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2
)
SELECT t1, t2, CAST(n_ab AS BIGINT) AS n_ab,
       ROUND(LN(n_ab * 1.0 * (SELECT nd FROM n_docs)
                / (da.n * 1.0 * db.n)), 6) + 0 AS pmi
FROM pairs
JOIN df da ON da.t = t1
JOIN df db ON db.t = t2
WHERE n_ab >= 50
""",
)
def token_cooccurrence_pmi_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``token_cooccurrence_pmi``: prune the
    vocabulary FIRST with the exact heavy-hitters pass (Misra-Gries
    candidates + exact verify, operators/heavyhitters.py), then pair
    only surviving tokens. The pairing self-join's cost is quadratic in
    per-document DISTINCT-token count, so dropping the long tail before
    the join — not after — is what bounds the shuffle on a real corpus;
    the heavy-hitter threshold (stream count > n/400) is deterministic
    and exact, so the DuckDB twin is the same PMI CTE with the
    equivalent frequency floor. Because any pair with n_ab >= 50 needs
    both tokens' document frequency >= 50, a floor below that loses
    nothing: the pruned result equals the unpruned result restricted to
    surviving tokens (pytest-asserted equivalence)."""
    from value_at_risk_spark.functions.text import tokens
    from value_at_risk_spark.operators.heavyhitters import (
        exact_heavy_hitters,
    )

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    vocab = exact_heavy_hitters(tok, "t", k=400).select("t")
    ptok = tok.join(F.broadcast(vocab), "t", "leftsemi")
    ndocs = d.groupBy().agg(F.count(F.lit(1)).alias("nd"))
    dfreq = ptok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a = ptok.select("doc_id", F.col("t").alias("t1"))
    b = ptok.select("doc_id", F.col("t").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 50)
    )
    da = dfreq.select(F.col("t").alias("t1"), F.col("n").alias("n_a"))
    db = dfreq.select(F.col("t").alias("t2"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(da), "t1")
        .join(F.broadcast(db), "t2")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "t1",
            "t2",
            "n_ab",
            (
                F.round(
                    F.log(
                        F.col("n_ab") * F.col("nd").cast("double")
                        / (F.col("n_a") * F.lit(1.0) * F.col("n_b"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )

@query(
    "duplicated_ngram_spans",
    """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)
),
gc AS (SELECT g, COUNT(DISTINCT doc_id) AS ndocs FROM grams GROUP BY 1),
marked AS (SELECT doc_id, ndocs FROM grams JOIN gc USING (g))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (WHERE ndocs >= 2) AS BIGINT) AS n_dup_spans,
       ROUND(COUNT(*) FILTER (WHERE ndocs >= 2) * 1.0 / COUNT(*), 6) + 0
         AS dup_ratio
FROM marked GROUP BY 1
HAVING COUNT(*) FILTER (WHERE ndocs >= 2) > 0
""",
)
def duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication detection — the span-granular pass
    of training-data dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL 2022): every 8-token span that
    appears in 2+ distinct documents is a duplicated span, and each
    document reports how much of it is covered by such spans. Two
    shuffles, both with map-side partials: spans reduce by gram (the
    cross-doc frequency), then rejoin and reduce by doc. The gram
    string is hashed to xxhash64 BEFORE the reduce — only equality
    matters, so an 8-byte key carries both shuffles instead of a
    60-byte string (the same measured ~25 % cut as
    remove_duplicated_spans; the oracle hash-match pins that the
    rewrite changes nothing)."""
    from value_at_risk_spark.functions.text import tokens

    n = 8
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("ts"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.array_join(F.slice("ts", i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g0"),
    ).select("doc_id", F.xxhash64("g0").alias("g"))
    # ONE pass over the corpus (r16, guide §2.4): the old
    # gc-agg-then-rejoin form re-executed the tokenize+explode subtree
    # twice (once for the gram counts, once for the join probe). Here
    # spans first reduce to per-(gram, doc) occurrence counts (map-side
    # partials collapse within-doc repeats), the cross-doc frequency is
    # a COUNT(*) window over the gram — same shuffle key the join used,
    # no second scan — and the per-doc report sums the weighted counts.
    gd = grams.groupBy("g", "doc_id").agg(F.count(F.lit(1)).alias("_c"))
    marked = gd.withColumn(
        # partitioned by the (high-cardinality) gram hash: bounded
        "ndocs", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_spans"),
            F.sum(
                F.when(F.col("ndocs") >= 2, F.col("_c")).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
        .filter(F.col("n_dup_spans") > 0)
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (
                F.round(F.col("n_dup_spans") * 1.0 / F.col("n_spans"), 6)
                + F.lit(0.0)
            ).alias("dup_ratio"),
        )
    )

@query(
    "cdc_chunk_dedup",
    f"""
WITH docs AS (
  SELECT doc_id, source, text, length(text) AS n FROM documents
),
w AS MATERIALIZED (
  SELECT doc_id, i, substring(text, i, 8) AS t
  FROM docs, UNNEST(range(2, greatest(n - 6, 2))) AS r(i)
),
vocab AS MATERIALIZED (SELECT DISTINCT t FROM w),
{xxh64_cte("vocab")},
hv AS MATERIALIZED (
  SELECT t, {xxh64_signed("hsh.hu")} AS h FROM hsh
),
b AS MATERIALIZED (
  SELECT w.doc_id, w.i FROM w JOIN hv USING (t) WHERE h % 64 = 0
),
bl AS (SELECT doc_id, list(i ORDER BY i) AS bs FROM b GROUP BY doc_id),
dd AS (
  SELECT d.doc_id, d.source, d.text, d.n, COALESCE(bl.bs, []) AS bs
  FROM docs d LEFT JOIN bl USING (doc_id)
),
ch AS (
  SELECT source,
         substring(text,
           CASE WHEN j = 1 THEN 1 ELSE bs[j - 1] END,
           (CASE WHEN j = len(bs) + 1 THEN n + 1 ELSE bs[j] END)
           - (CASE WHEN j = 1 THEN 1 ELSE bs[j - 1] END)) AS chunk
  FROM dd, UNNEST(range(1, len(bs) + 2)) AS q(j)
),
pc AS (SELECT source, chunk, COUNT(*) AS c FROM ch GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c * length(chunk)) AS BIGINT) AS total_chars,
       CAST(SUM(length(chunk)) AS BIGINT) AS distinct_chars,
       ROUND(SUM(c * length(chunk)) * 1.0 / SUM(length(chunk)), 4) + 0
         AS dedup_ratio
FROM pc GROUP BY source
""",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup, ORACLE-pinned (r13): documents
    split at content-keyed boundaries (operators/dedup.
    content_defined_chunks — xxhash64 of an 8-char sliding window,
    1/64 residue class), then chunk-level exact dedup per source —
    the storage/dataset dedup story (LBFS, FastCDC): repeated spans
    dedup at CHUNK granularity across documents even when their
    offsets differ, because boundaries move with content, not
    position. The dedup_ratio (total chars / distinct chars) is the
    compression a chunk-store would achieve. Hash equality with
    DuckDB replaying the boundary rule through the XXH64-in-SQL
    scaffold pins every boundary choice, chunk slice, and count —
    the whole pipeline, not a summary. The source join is doc-keyed
    (AQE picks broadcast at gate scale; at corpus scale it is a
    co-partitioned shuffle join — the id->source map is corpus-sized,
    never broadcastable)."""
    from value_at_risk_spark.operators.dedup import content_defined_chunks
    from value_at_risk_spark.operators.skew import spread_small_input

    # the sliding-window boundary hash + chunk slicing is the scan
    # stage's per-row work: spread-guard the single-split fixture scan
    # (r16, guide §2.5; no-op on a parallel corpus scan)
    d = spread_small_input(_t(spark, sf_dir, "documents"), "doc_id")
    ch = content_defined_chunks(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    pc = ch.groupBy("source", "chunk").agg(F.count(F.lit(1)).alias("c"))
    ln = F.length("chunk")
    return pc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * ln).cast("long").alias("total_chars"),
        F.sum(ln).cast("long").alias("distinct_chars"),
        (
            F.round(
                F.sum(F.col("c") * ln) / F.sum(ln), 4
            )
            + F.lit(0.0)
        ).alias("dedup_ratio"),
    )

@query(
    "train_val_test_split",
    """
WITH assigned AS (
  SELECT doc_id, source,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10
           AS bucket
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split
FROM assigned
""",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test corpus split (80/10/10) — the
    assignment rule every training pipeline needs to be REPRODUCIBLE
    and REPARTITION-INVARIANT: each document's bucket is a pure
    function of its id (md5-prefix mod 10 — the same cross-engine-
    verified integer idiom as weighted_sample_per_lang), so the split
    is identical across runs, cluster sizes, and data layouts, new
    documents land in splits without reshuffling old ones, and a
    downstream JOIN on doc_id can never leak val/test into train.
    Plan: a pure zero-shuffle projection — at 100 TB this is a
    map-only pass (contrast randomSplit(), whose sampling is
    partition-order-dependent and unrepeatable after a rewrite).
    Proportions are binomial around 80/10/10 per stratum; the exact-k
    variant for small strata is group_sample_deterministic_k's
    two-phase bottom-k."""
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10
    )
    return d.select(
        "doc_id",
        "source",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )

@query("bpe_encode_token_counts", bpe_token_counts_sql(12))
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer ROUND TRIP, oracle-checked per document: train 12
    BPE merges on the corpus, segment the distinct-word vocabulary
    under them (greedy rank-order fold), and encode every document —
    (doc_id, n_words, n_bpe_tokens). The corpus-scale path is
    operators/bpe.bpe_token_counts: segmentation runs once on the
    DISTINCT-word table and broadcast-joins back into the doc explode,
    so the per-word merge fold costs O(vocab), not O(corpus) — the
    token-budget accounting shape of a 100 TB pre-training run. The
    DuckDB oracle replays training AND encoding from the same unrolled
    round CTEs (functions/bpe_sql.bpe_token_counts_sql), so a one-token
    segmentation drift on any word reds the row."""
    from value_at_risk_spark.operators.bpe import bpe_token_counts, bpe_train

    d = _t(spark, sf_dir, "documents")
    merges = bpe_train(d, num_merges=12)
    return bpe_token_counts(d, merges)

@query(
    "lm_perplexity_scores",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
big AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM docs, UNNEST(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY 1),
v AS (SELECT COUNT(DISTINCT t) AS nv
      FROM (SELECT UNNEST(ts) AS t FROM docs))
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-LN((c2.n2 + 1.0) / (c1.n1 + v.nv))), 6) + 0
         AS avg_neg_logprob
FROM big b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY 1
""",
)
def lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring (the CCNet/KenLM filter pattern):
    train an add-one-smoothed bigram LM on the corpus in ONE pass
    (bigram + context count aggregates), then score every document by
    its mean negative log-probability — low = fluent/templated, high =
    noise; curation keeps the middle band. Plan shape: the bigram
    stream reduces by (w1,w2) and by w1 with map-side partials, the
    scoring join is keyed on those same columns (co-partitioned after
    the count shuffles), the vocabulary size is a 1-row broadcast, and
    the per-doc score is a final doc-keyed agg — every stage is an
    equi-keyed reduction, no windows, no driver state; at 100 TB the
    count tables are exactly what a distributed KenLM build emits."""
    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("ts"))
    big = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    v = (
        toks.select(F.explode("ts").alias("t"))
        .agg(F.count_distinct("t").alias("nv"))
    )
    neg_lp = -F.log((F.col("n2") + 1.0) / (F.col("n1") + F.col("nv")))
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.round(F.avg(neg_lp), 6) + F.lit(0.0)).alias("avg_neg_logprob"),
        )
    )

@query(
    "corpus_version_diff",
    """
WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
v2 AS (
  SELECT doc_id, md5(text || ' v2') AS h FROM documents
  WHERE doc_id % 17 <> 0 AND doc_id % 13 = 0
  UNION ALL
  SELECT doc_id, md5(text) FROM documents
  WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 5000000, md5(text) FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.h <> b.h THEN 'modified'
            ELSE 'unchanged' END AS status
FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
""",
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff (operators/diff.snapshot_diff): corpus v2
    is derived deterministically from the fixture (docs %17 dropped,
    %13 edited, %11 re-added under new ids) and every id is classified
    added / removed / modified / unchanged by ONE full-outer hash join
    over (id, md5-fingerprint) pairs — payload bytes never enter the
    shuffle, which is what makes diffing two 100 TB snapshots an
    id-keyed join of 16-byte digests instead of a content compare."""
    from value_at_risk_spark.operators.diff import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    v2 = (
        d.filter((F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 13 == 0))
        .select("doc_id", F.concat("text", F.lit(" v2")).alias("text"))
        .unionByName(
            d.filter(
                (F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 13 != 0)
            ).select("doc_id", "text")
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 5000000).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(d.select("doc_id", "text"), v2)

@query(
    "cms_token_frequency",
    """
WITH toks AS (
  SELECT UNNEST(list_filter(string_split(lower(text),' '), x -> x <> '')) AS t
  FROM documents
),
pos AS (
  SELECT t, r,
         ('0x' || substring(md5(t || '#' || CAST(r AS VARCHAR)), 1, 8))::UBIGINT
           % 1024 AS c
  FROM toks, UNNEST(range(0, 4)) AS q(r)
),
cms AS (SELECT r, c, COUNT(*) AS cnt FROM pos GROUP BY 1, 2),
probes AS (
  SELECT UNNEST(['spark','table','value','merge','window','xyzzy']) AS probe
),
est AS (
  SELECT probe, MIN(COALESCE(cms.cnt, 0)) AS cms_count
  FROM (SELECT probe, r,
               ('0x' || substring(md5(probe || '#' || CAST(r AS VARCHAR)), 1, 8))
                 ::UBIGINT % 1024 AS c
        FROM probes, UNNEST(range(0, 4)) AS q(r)) p
  LEFT JOIN cms ON cms.r = p.r AND cms.c = p.c
  GROUP BY 1
),
exact AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1)
SELECT probe, CAST(est.cms_count AS BIGINT) AS cms_count,
       COALESCE(exact.n, 0) AS exact_count
FROM est LEFT JOIN exact ON exact.t = est.probe
""",
)
def cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch token frequencies, ORACLE-pinned cell-for-cell:
    the 4×1024 sketch is built distributed (one explode + one hash-agg
    — ≤4096 rows leave the shuffle no matter the corpus size), probed
    for six tokens, and reported beside the exact counts so the
    over-estimate guarantee (cms_count ≥ exact_count, = for items with
    no colliding mass) is visible in the gated values. The DuckDB twin
    reconstructs the identical sketch from the same md5 hash family —
    the estimates are deterministic, so this sketch family gets a
    hash-checked gate entry rather than rows-only. Mergeability
    (halves sum to the whole, the 1000-executor reduction property) is
    pytest-pinned in test_operators."""
    from value_at_risk_spark.functions.text import tokens
    from value_at_risk_spark.operators.heavyhitters import (
        cms_build,
        cms_estimate,
    )

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("t"))
    sketch = cms_build(toks, "t", width=1024, depth=4)
    probes = spark.createDataFrame(
        [("spark",), ("table",), ("value",), ("merge",), ("window",), ("xyzzy",)],
        "probe string",
    )
    est = cms_estimate(sketch, probes, "probe", width=1024, depth=4)
    exact = toks.groupBy(F.col("t").alias("probe")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        est.join(exact, "probe", "left")
        .select(
            "probe",
            F.col("cms_count").cast("long").alias("cms_count"),
            F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
        )
    )

@query(
    "bm25_relevance_scores",
    """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
docs AS (SELECT doc_id, len(ts) AS dl, ts FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
tf AS (
  SELECT doc_id, dl, t, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(ts) AS t FROM docs)
  WHERE t IN ('spark', 'vector', 'stream')
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(SUM(
         LN((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
         * tf.tf * 2.2
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
       ), 6) + 0 AS bm25
FROM tf JOIN dfreq USING (t) CROSS JOIN stats
GROUP BY 1
""",
)
def bm25_relevance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) relevance of every document to a fixed
    query — the retrieval scoring used to mine topical subsets out of
    a crawl corpus. One explode pruned to the query terms BEFORE the
    grouped count (the filter reaches the scan side of the shuffle, so
    the shuffle carries only matching (doc, term) rows — at 100 TB
    that is |matches|, not |tokens|); corpus stats (N, avgdl) and the
    per-term document frequencies are 1-row / |Q|-row aggregates
    broadcast back into the scoring expression."""
    from value_at_risk_spark.functions.text import tokens

    terms = ["spark", "vector", "stream"]
    k1, b = 1.2, 0.75
    d = _t(spark, sf_dir, "documents")
    docs = d.select("doc_id", tokens("text").alias("ts")).select(
        "doc_id", F.size("ts").alias("dl"), "ts"
    )
    stats = docs.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("ts").alias("t"))
        .filter(F.col("t").isin(terms))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    score = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.round(F.sum(score), 6) + F.lit(0.0)).alias("bm25"),
        )
    )

@query(
    "apply_corpus_mix",
    """
WITH cells AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(lower(text),' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS all_toks, SUM(n_docs) AS all_docs FROM cells),
raised AS (
  SELECT cells.*, tot.all_docs,
         POWER(n_tokens * 1.0 / tot.all_toks, 0.5) AS q_un
  FROM cells, tot
),
z AS (SELECT SUM(q_un) AS z FROM raised),
tgt AS (
  SELECT source, n_docs,
         CAST(ROUND(q_un / (SELECT z FROM z) * all_docs) AS BIGINT) AS target_docs
  FROM raised
),
ranked AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS r
  FROM documents d
),
cop AS (
  SELECT ranked.doc_id, ranked.source,
         t.target_docs // t.n_docs
           + CASE WHEN r <= t.target_docs % t.n_docs THEN 1 ELSE 0 END AS copies
  FROM ranked JOIN tgt t USING (source)
),
resampled AS (
  SELECT doc_id, source
  FROM cop, UNNEST(range(1, copies + 1)) AS u(i)
  WHERE copies > 0
)
SELECT t.source, t.n_docs, t.target_docs,
       CAST(COUNT(res.doc_id) AS BIGINT) AS n_resampled
FROM tgt t LEFT JOIN resampled res ON res.source = t.source
GROUP BY 1, 2, 3
""",
)
def apply_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the temperature mix (the apply step after
    temperature_mix_weights): per-source doc targets from the α=0.5
    re-weighting, then EXACT-count deterministic resampling — every doc
    gets floor(target/n) copies and the remainder goes to the docs with
    the smallest md5 rank within their source (repartition-invariant,
    reproducible under retries), so SUM(copies) equals the target
    EXACTLY, not in expectation. The exploded resample is produced and
    re-aggregated so the gate checks the materialization itself. Scale
    shape: one corpus scan for stats, |sources|-row broadcasts, one
    rank window per source (sources are few; the huge-group escape is
    operators/sampling's two-phase bottom-k), explode bounded by
    copies."""
    from value_at_risk_spark.functions.text import tokens

    alpha = 0.5
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select("source", F.size(tokens("text")).alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    tot = cells.groupBy().agg(
        F.sum("n_tokens").alias("all_toks"), F.sum("n_docs").alias("all_docs")
    )
    raised = cells.crossJoin(F.broadcast(tot)).withColumn(
        "q_un", F.pow(F.col("n_tokens") / F.col("all_toks"), F.lit(alpha))
    )
    z = raised.groupBy().agg(F.sum("q_un").alias("z"))
    tgt = raised.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.col("q_un") / F.col("z") * F.col("all_docs"))
        .cast("long")
        .alias("target_docs"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select("doc_id", "source").withColumn(
        "r", F.row_number().over(w)
    )
    cop = ranked.join(F.broadcast(tgt), "source").select(
        "doc_id",
        "source",
        (
            F.expr("target_docs div n_docs")
            + F.when(
                F.col("r") <= F.col("target_docs") % F.col("n_docs"), 1
            ).otherwise(0)
        ).alias("copies"),
    )
    resampled = cop.filter(F.col("copies") > 0).select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("i"),
    )
    return (
        tgt.join(
            F.broadcast(
                resampled.groupBy("source").agg(
                    F.count(F.lit(1)).alias("n_resampled")
                )
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            "target_docs",
            F.coalesce("n_resampled", F.lit(0)).cast("long").alias("n_resampled"),
        )
    )

@query(
    "weighted_sample_per_lang",
    """
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ROUND(LN((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::UBIGINT + 0.5) / 4294967296.0) / n_chars, 9) + 0
           AS priority
  FROM documents
)
SELECT lang, doc_id, n_chars, priority, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY priority DESC, doc_id) AS rnk
  FROM keyed
) WHERE rnk <= 10
""",
)
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    (2006): each row's priority is ln(u)/w with u a DETERMINISTIC
    md5-derived uniform and w the row's weight (doc length here) —
    taking the top-k priorities per stratum draws a weight-
    proportional sample. The hash-derived u (same contract as
    sample_stratified_hash) makes the draw reproducible across
    engines, task retries, and repartitioning — RNG sampling cannot
    oracle-check and cannot survive a retry; this can, and is the form
    a 100 TB curation pipeline ships (weight = quality score). One
    scan + one per-stratum top-k window."""
    d = _t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    prio = F.round(F.log(u) / F.col("n_chars"), 9) + F.lit(0.0)
    keyed = d.select("lang", "doc_id", "n_chars", prio.alias("priority"))
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )

@query(
    "ks_two_sample_test",
    """
WITH s AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS f
  FROM events WHERE event_type IN ('click', 'view')
),
n AS (SELECT CAST(SUM(f) AS DOUBLE) AS n1,
             CAST(SUM(1 - f) AS DOUBLE) AS n2 FROM s),
g AS (SELECT value, SUM(f) AS c1, SUM(1 - f) AS c2 FROM s GROUP BY 1),
cdf AS (
  SELECT SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS a1,
         SUM(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS a2
  FROM g
),
d AS (SELECT MAX(ABS(a1 / n1 - a2 / n2)) AS ks FROM cdf, n)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(ks, 6) + 0 AS ks_stat,
       ROUND(LEAST(1.0, 2 * EXP(-2 * POWER(ks * SQRT(n1 * n2 / (n1 + n2)), 2))), 6) + 0
         AS p_value
FROM d, n
""",
)
def ks_two_sample_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the click and view
    value distributions — the drift detector a pipeline runs between
    yesterday's and today's feature distributions before retraining.
    Exact, not sampled: both empirical CDFs are evaluated at every
    distinct value via ONE running-sum window over the per-value
    count aggregate — the groupBy first collapses 100 TB of events to
    |distinct values| rows, and both CDF running sums then go through
    ``operators/ranks.global_running_sum`` (the two-level prefix-sum:
    value-bucket boundaries broadcast, per-bucket subtotals joined
    back as offsets, bucket-local windows) in ONE shared bucketing —
    no single-partition window even over the reduced domain, which for
    a continuous value column still grows with the data. Asymptotic
    p-value = 2*exp(-2*(D*sqrt(n1 n2/(n1+n2)))^2), clamped to 1."""
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("f"),
    )
    n = s.agg(
        F.sum("f").cast("double").alias("n1"),
        F.sum(F.lit(1) - F.col("f")).cast("double").alias("n2"),
    )
    g = s.groupBy("value").agg(
        F.sum("f").alias("c1"),
        F.sum(F.lit(1) - F.col("f")).alias("c2"),
    )
    from value_at_risk_spark.operators.ranks import global_running_sum

    cdf = global_running_sum(
        g, ["c1", "c2"], [("value", True)], out=["a1", "a2"]
    ).select("a1", "a2")
    d = cdf.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.abs(F.col("a1") / F.col("n1") - F.col("a2") / F.col("n2"))
        ).alias("ks")
    )
    en = F.sqrt(F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")))
    return d.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.round("ks", 6) + F.lit(0.0)).alias("ks_stat"),
        (
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(2.0)
                    * F.exp(F.lit(-2.0) * F.pow(F.col("ks") * en, 2)),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )

@query(
    "token_budget_report",
    """
WITH t AS (
  SELECT lang,
         CAST(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS tok
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN tok > 64 THEN 1 ELSE 0 END) AS BIGINT) AS docs_over_64,
       ROUND(SUM(GREATEST(tok - 64, 0)) / CAST(SUM(tok) AS DOUBLE), 6) + 0
         AS lost_frac_64,
       CAST(SUM(CASE WHEN tok > 256 THEN 1 ELSE 0 END) AS BIGINT) AS docs_over_256,
       ROUND(SUM(GREATEST(tok - 256, 0)) / CAST(SUM(tok) AS DOUBLE), 6) + 0
         AS lost_frac_256,
       CAST(SUM(CASE WHEN tok > 1024 THEN 1 ELSE 0 END) AS BIGINT) AS docs_over_1024,
       ROUND(SUM(GREATEST(tok - 1024, 0)) / CAST(SUM(tok) AS DOUBLE), 6) + 0
         AS lost_frac_1024
FROM t GROUP BY lang
""",
)
def token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length budget report per language: for each candidate
    training context length (64 / 256 / 1024 tokens), how many
    documents exceed it and what fraction of the corpus' tokens a
    hard truncation would discard — the measurement that decides
    chunking strategy vs truncation loss before a pretraining run.
    One scan, one codegen'd token count per row (regexp_count — no
    array materialization), one map-side-combining aggregate; every
    cutoff is a conditional sum inside the SAME aggregate, so adding
    cutoffs costs zero extra passes at 100 TB."""
    from value_at_risk_spark.functions.text import regex_token_count

    d = _t(spark, sf_dir, "documents").select(
        "lang", regex_token_count("text").cast("long").alias("tok")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
    ]
    for cut in (64, 256, 1024):
        aggs.append(
            F.sum(
                F.when(F.col("tok") > cut, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"docs_over_{cut}")
        )
        aggs.append(
            (
                F.round(
                    F.sum(F.greatest(F.col("tok") - cut, F.lit(0)))
                    / F.sum("tok").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias(f"lost_frac_{cut}")
        )
    return d.groupBy("lang").agg(*aggs)

@query(
    "shard_export_manifest",
    """
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS BIGINT) AS toks
  FROM documents
),
r AS (
  SELECT doc_id, toks,
         ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) AS rn
  FROM w
),
s AS (
  SELECT doc_id, toks, CAST((rn - 1) % 8 AS INTEGER) AS shard FROM r
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS total_tokens,
       CAST(MIN(toks) AS BIGINT) AS min_tokens,
       CAST(MAX(toks) AS BIGINT) AS max_tokens
FROM s GROUP BY shard
""",
)
def shard_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced export sharding — the final step of a curation run:
    assign every document to one of 8 shard files with near-equal
    token mass (longest-first round-robin, the LPT approximation),
    deterministically under any partitioning. The Spark side
    (operators/packing.balanced_shards) computes the global
    (tokens desc, id) rank with the DISTRIBUTED two-phase form — a
    per-weight histogram whose prefix sums are a bounded driver
    artifact, then a window partitioned BY WEIGHT — never the naive
    unpartitioned window Spark would execute as one task; the oracle
    replays it with exactly that naive window, which the two-phase
    rank equals by construction. An in-query certificate RAISES if
    shard token masses diverge more than 5% (LPT on this corpus lands
    within ~1%)."""
    from value_at_risk_spark.functions.text import token_count
    from value_at_risk_spark.operators.packing import balanced_shards

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("toks")
    )
    shards = balanced_shards(d, n_shards=8, weight_col="toks")
    out = shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.min("toks").alias("min_tokens"),
        F.max("toks").alias("max_tokens"),
    )
    cert = out.agg(
        F.max("total_tokens").alias("hi"), F.min("total_tokens").alias("lo")
    ).first()
    if cert.hi > 1.05 * cert.lo:
        raise ValueError(
            "shard_export_manifest: shard skew "
            f"{cert.hi}/{cert.lo} exceeds the 5% balance certificate"
        )
    return out

@query(
    "sql_text_interface",
    """
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) + 0 AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SECOND API surface: the same registry tables
    exposed as temp views and queried with a raw ANSI-SQL string via
    ``spark.sql`` — byte-for-byte the oracle's own text (minus
    dialect-free syntax), proving a reference user can port SQL
    workloads verbatim, not just DataFrame code. Catalyst plans the
    text identically to the DataFrame form (same broadcast join,
    same partial aggregation); view registration is name-spaced per
    call so concurrent gates don't collide."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    _t(spark, sf_dir, "customer").createOrReplaceTempView(f"customer_{tag}")
    _t(spark, sf_dir, "nation").createOrReplaceTempView(f"nation_{tag}")
    return spark.sql(
        f"""
        SELECT n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(c_acctbal), 2) + 0 AS total_balance
        FROM customer_{tag} JOIN nation_{tag} ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )

@query(
    "flesch_readability_scores",
    """
WITH scored AS (
  SELECT lang,
         CAST(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE)
           AS words,
         CAST(GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)
           AS sentences,
         CAST(GREATEST(LEN(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
           AS DOUBLE) AS syllables
  FROM documents
),
per_doc AS (
  SELECT lang,
         206.835 - 1.015 * (words / sentences)
                 - 84.6 * (syllables / GREATEST(words, 1)) AS flesch
  FROM scored
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(flesch), 4) + 0 AS mean_flesch,
       ROUND(quantile_cont(flesch, 0.5), 4) + 0 AS median_flesch,
       CAST(SUM(CASE WHEN flesch < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hard_docs
FROM per_doc GROUP BY lang
""",
)
def flesch_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language: 206.835 - 1.015*(words/
    sentence) - 84.6*(syllables/word), with sentences counted by
    terminal-punctuation runs and syllables by vowel-group runs (the
    standard dictionary-free approximation) — the readability band
    filter curation pipelines run next to quality_score and
    lm_perplexity (three INDEPENDENT quality axes: heuristic,
    statistical, readability). Pure regexp_count codegen per row, one
    grouped aggregate; floors guard the degenerate zero-sentence /
    zero-word documents instead of NaN-poisoning the mean."""
    d = _t(spark, sf_dir, "documents")
    words = F.regexp_count(F.lower("text"), F.lit("[a-z0-9]+")).cast(
        "double"
    )
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    ).cast("double")
    syllables = F.greatest(
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")), F.lit(1)
    ).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / F.greatest(words, F.lit(1.0)))
    )
    per_doc = d.select("lang", flesch.alias("flesch"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("flesch"), 4) + F.lit(0.0)).alias("mean_flesch"),
        (F.round(F.percentile("flesch", F.lit(0.5)), 4) + F.lit(0.0)).alias(
            "median_flesch"
        ),
        F.sum(
            F.when(F.col("flesch") < 30, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_hard_docs"),
    )

@query(
    "dedup_effectiveness_report",
    """
WITH toks AS (
  SELECT source, md5(text) AS h,
         CAST(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS tok,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs_before,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS docs_after,
       CAST(SUM(tok) AS BIGINT) AS tokens_before,
       CAST(SUM(CASE WHEN rn = 1 THEN tok ELSE 0 END) AS BIGINT)
         AS tokens_after,
       ROUND(1.0 - SUM(CASE WHEN rn = 1 THEN tok ELSE 0 END)
             / CAST(SUM(tok) AS DOUBLE), 6) + 0 AS token_savings
FROM toks GROUP BY source
""",
)
def dedup_effectiveness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ROI report per source: documents and tokens before vs
    after exact dedup (md5 content identity, min-doc_id survivor) and
    the token savings a dedup pass buys — the number that justifies
    the pipeline stage to whoever pays for training compute. One
    hash-partitioned window marks survivors (the same survivor rule
    as operators/dedup.exact_dedup), then per-source conditional sums
    in one aggregate; no second scan for the 'before' side because
    both sides are conditional views of the same marked frame."""
    from value_at_risk_spark.functions.text import regex_token_count

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    marked = d.select(
        "source",
        regex_token_count("text").cast("long").alias("tok"),
        F.row_number().over(w).alias("rn"),
    )
    keep = F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.lit(0))
    kept_tok = F.when(F.col("rn") == 1, F.col("tok")).otherwise(F.lit(0))
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_before"),
        F.sum(keep).alias("docs_after"),
        F.sum("tok").alias("tokens_before"),
        F.sum(kept_tok).alias("tokens_after"),
        (
            F.round(
                F.lit(1.0)
                - F.sum(kept_tok) / F.sum("tok").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("token_savings"),
    )

@query(
    "corpus_diversity_entropy",
    """
WITH mix AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')))
              AS DOUBLE) AS tok
  FROM documents GROUP BY 1
),
tot AS (
  SELECT source, n / SUM(n) OVER () AS p_docs,
         tok / SUM(tok) OVER () AS p_tok
  FROM mix
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
       ROUND(-SUM(p_docs * LN(p_docs)), 6) + 0 AS doc_entropy_nats,
       ROUND(EXP(-SUM(p_docs * LN(p_docs))), 4) + 0 AS effective_sources_docs,
       ROUND(-SUM(p_tok * LN(p_tok)), 6) + 0 AS token_entropy_nats,
       ROUND(EXP(-SUM(p_tok * LN(p_tok))), 4) + 0 AS effective_sources_tokens
FROM tot
""",
)
def corpus_diversity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix diversity: Shannon entropy of the source
    distribution (by documents AND by tokens — they diverge when a
    few sources carry long documents) and its exponential, the
    'effective number of sources' — the single number that says
    whether a 500-source corpus is really a 5-source corpus, and the
    quantity temperature_mix_weights moves when it flattens the mix.
    One scan for per-source masses, window-normalized shares, one
    1-row reduction. p*ln(p) is safe: a source present in the group
    frame has p > 0 by construction."""
    d = _t(spark, sf_dir, "documents")
    from value_at_risk_spark.functions.text import regex_token_count

    mix = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(regex_token_count("text")).cast("double").alias("tok"),
    )
    wall = Window.partitionBy(F.lit(1))
    tot = mix.select(
        (F.col("n") / F.sum("n").over(wall)).alias("p_docs"),
        (F.col("tok") / F.sum("tok").over(wall)).alias("p_tok"),
    )
    hd = -F.sum(F.col("p_docs") * F.log("p_docs"))
    ht = -F.sum(F.col("p_tok") * F.log("p_tok"))
    return tot.agg(
        F.count(F.lit(1)).alias("n_sources"),
        (F.round(hd, 6) + F.lit(0.0)).alias("doc_entropy_nats"),
        (F.round(F.exp(hd), 4) + F.lit(0.0)).alias("effective_sources_docs"),
        (F.round(ht, 6) + F.lit(0.0)).alias("token_entropy_nats"),
        (F.round(F.exp(ht), 4) + F.lit(0.0)).alias(
            "effective_sources_tokens"
        ),
    )

@query(
    "top_terms_per_source",
    """
WITH tok AS (
  SELECT source, UNNEST(list_filter(string_split(lower(text), ' '),
                                    x -> x <> '')) AS t
  FROM documents
),
tf AS (SELECT source, t, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM tok GROUP BY 1, 2),
tots AS (
  SELECT source, t, tf,
         SUM(tf) OVER (PARTITION BY source) AS tot_s,
         SUM(tf) OVER (PARTITION BY t) AS tf_all,
         SUM(tf) OVER () AS tot_all
  FROM tf
),
scored AS (
  SELECT source, t,
         ROUND(LN((tf / tot_s)
               / ((tf_all - tf + 0.5) / (tot_all - tot_s + 0.5))), 6) + 0
           AS keyness
  FROM tots WHERE tf >= 3
),
ranked AS (
  SELECT source, t, keyness,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY keyness DESC, t) AS rnk
  FROM scored
)
SELECT source, t AS term, keyness, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction per corpus source by smoothed LOG-ODDS
    keyness: ln of (term rate inside the source / its rate in the
    REST of the corpus, +0.5 smoothed), top 5 per source — the label
    a corpus browser shows next to each source. Why not TF-IDF: this
    fixture's synthetic vocabulary saturates at larger SFs (every
    term appears in every source), making idf identically 0 and the
    result set EMPTY — keyness measures overrepresentation, which
    survives df saturation (the corpus-linguistics standard for
    exactly this reason). One token explode, one (source, term)
    reduction; all four mass totals come from windows over that
    reduction — no second scan; min tf>=3 floors the rate noise."""
    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(tokens("text")).alias("t")
    )
    tf = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    ws = Window.partitionBy("source")
    wt = Window.partitionBy("t")
    # the corpus-wide total joins as a 1-row broadcast, not a
    # partitionBy(lit(1)) window: that window funnels the whole
    # (source, term) frame — which grows with the vocabulary — through
    # one task just to compute a scalar
    tot_all = tf.groupBy().agg(F.sum("tf").alias("tot_all"))
    tots = tf.crossJoin(F.broadcast(tot_all)).select(
        "source",
        "t",
        "tf",
        F.sum("tf").over(ws).alias("tot_s"),
        F.sum("tf").over(wt).alias("tf_all"),
        "tot_all",
    )
    scored = tots.filter(F.col("tf") >= 3).select(
        "source",
        "t",
        (
            F.round(
                F.log(
                    (F.col("tf") / F.col("tot_s"))
                    / (
                        (F.col("tf_all") - F.col("tf") + 0.5)
                        / (F.col("tot_all") - F.col("tot_s") + 0.5)
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("keyness"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("keyness"), F.asc("t"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", F.col("t").alias("term"), "keyness",
                F.col("rnk").cast("long").alias("rnk"))
    )

@query(
    "zipf_fit_tokens",
    """
WITH tok AS (
  SELECT UNNEST(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS t
  FROM documents
),
freq AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY 1),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, t) AS r FROM freq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens_fit,
       ROUND(-REGR_SLOPE(LN(f), LN(CAST(r AS DOUBLE))), 6) + 0
         AS zipf_alpha,
       ROUND(REGR_R2(LN(f), LN(CAST(r AS DOUBLE))), 6) + 0 AS fit_r2
FROM ranked WHERE r <= 500
""",
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: alpha = the
    negative slope of ln(freq) on ln(rank) for the top 500 tokens
    (natural text reads ~1; strong deviation flags synthetic or
    templated corpora — a one-number corpus-authenticity screen
    beside the quality/perplexity filters). One token reduction, then
    the 500-row head is cut with ``orderBy().limit(500)`` — Catalyst
    compiles that to TakeOrderedAndProject (per-partition partial
    top-k, one bounded merge), so the growing vocabulary frame never
    funnels through a single-task rank window; the row_number that
    follows runs on the bounded 500-row head. Closed-form regression
    on the head — the vocabulary never leaves the cluster, only the
    1-row fit does."""
    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    freq = d.select(F.explode(tokens("text")).alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    head = freq.orderBy(F.desc("f"), F.asc("t")).limit(500)
    w = Window.orderBy(F.desc("f"), F.asc("t"))  # bounded: ≤500 rows
    ranked = head.select("f", F.row_number().over(w).alias("r"))
    return ranked.select(
        F.log("f").alias("_lf"),
        F.log(F.col("r").cast("double")).alias("_lr"),
    ).agg(
        F.count(F.lit(1)).alias("n_tokens_fit"),
        (F.round(-F.expr("regr_slope(_lf, _lr)"), 6) + F.lit(0.0)).alias(
            "zipf_alpha"
        ),
        (F.round(F.expr("regr_r2(_lf, _lr)"), 6) + F.lit(0.0)).alias(
            "fit_r2"
        ),
    )

@query(
    "event_burstiness_memory",
    """
WITH seq AS (
  SELECT event_type, gap,
         LAG(gap) OVER (PARTITION BY event_type ORDER BY rn0) AS prev_gap
  FROM (
    SELECT event_type,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS rn0,
           CAST(FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER
                (PARTITION BY event_type ORDER BY ts, event_id)))
                AS DOUBLE) AS gap
    FROM events
  ) WHERE gap IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND((STDDEV_SAMP(gap) - AVG(gap))
             / (STDDEV_SAMP(gap) + AVG(gap)), 6) + 0 AS burstiness,
       ROUND(CORR(gap, prev_gap), 6) + 0 AS memory_coeff
FROM seq GROUP BY event_type
""",
)
def event_burstiness_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of
    inter-event gaps per event type (B ~ 0 Poisson, B -> 1 bursty,
    B < 0 regular/clock-like) plus the memory coefficient (lag-1
    correlation of consecutive gaps) — together they place each
    stream on the burstiness-memory plane that separates human
    activity from machine heartbeats, the dynamics companion to
    user_interarrival_stats' magnitude summary. Gaps come from one
    type-partitioned window; the consecutive-gap pairing is a second
    LAG over the same ordering; both engines share the tz-free epoch
    contract."""
    from value_at_risk_spark.functions.timeutil import epoch_seconds

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            epoch_seconds(F.col("ts"))
            - epoch_seconds(F.lag("ts").over(w))
        )
        .cast("double")
        .alias("gap"),
        F.row_number().over(w).alias("rn0"),
    ).filter(F.col("gap").isNotNull())
    w2 = Window.partitionBy("event_type").orderBy("rn0")
    seq = gaps.select(
        "event_type",
        "gap",
        F.lag("gap").over(w2).alias("prev_gap"),
    )
    sd = F.stddev_samp("gap")
    mu = F.avg("gap")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.round((sd - mu) / (sd + mu), 6) + F.lit(0.0)).alias(
            "burstiness"
        ),
        (F.round(F.corr("gap", "prev_gap"), 6) + F.lit(0.0)).alias(
            "memory_coeff"
        ),
    )

@query(
    "compression_ratio_scores",
    """
WITH g(k, lang, n_docs, mean_ratio, p10_ratio, p90_ratio) AS (VALUES
  (153156,  'de', 71,  0.538813, 0.428843, 0.689076),
  (153156,  'en', 193, 0.566676, 0.427566, 0.779766),
  (153156,  'es', 80,  0.557228, 0.425152, 0.774774),
  (153156,  'fr', 82,  0.539553, 0.422796, 0.709489),
  (153156,  'zh', 74,  0.552985, 0.428834, 0.802321),
  (149174,  'de', 70,  0.562248, 0.442253, 0.731495),
  (149174,  'en', 218, 0.559255, 0.430519, 0.75344),
  (149174,  'es', 73,  0.55256,  0.425005, 0.719041),
  (149174,  'fr', 64,  0.539822, 0.425124, 0.804985),
  (149174,  'zh', 75,  0.547718, 0.427081, 0.70583),
  (1485576, 'de', 702, 0.555302, 0.427129, 0.771132),
  (1485576, 'en', 2059, 0.558277, 0.427922, 0.768519),
  (1485576, 'es', 744, 0.555977, 0.428284, 0.752269),
  (1485576, 'fr', 742, 0.554578, 0.426058, 0.759547),
  (1485576, 'zh', 753, 0.574164, 0.430694, 0.803274))
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(mean_ratio AS DOUBLE) AS mean_ratio,
       CAST(p10_ratio AS DOUBLE) AS p10_ratio,
       CAST(p90_ratio AS DOUBLE) AS p90_ratio
FROM g WHERE k = (SELECT SUM(LENGTH(text)) FROM documents)
""",
)
def compression_ratio_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality filter, ORACLE-pinned as corpus-keyed
    golden literals: zlib level-6 is deterministic byte-for-byte, so
    the per-language ratio distribution is a pure function of the
    corpus — the oracle pins the exact rounded aggregates per SF,
    keyed on SUM(LENGTH(text)) (distinguishes sf0.001 from sf0.01,
    which share a 500-doc count but not content); the discrimination
    contract — templated/repetitive text compresses far better than
    diverse text — stays pytest-anchored. The score itself:
    per-language distribution of zlib-compressed/raw size, the cheap
    repetition detector production curation stacks run beside the
    token-level repetition_scores (zlib catches LONG-range and
    structural repetition that n-gram ratios miss). The Python
    boundary is a mapInPandas batch over (lang, text) only — level-6
    zlib at ~100 MB/s/core is scan-rate; the per-language reduction
    happens AFTER the Arrow boundary so only (lang, ratio) rows leave
    Python."""
    import pandas as _pd
    import zlib as _zlib
    from collections.abc import Iterator as _It

    d = _t(spark, sf_dir, "documents").select("lang", "text")

    def _ratios(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            ratios = [
                (len(_zlib.compress(b, 6)) / max(len(b), 1)) for b in raw
            ]
            yield _pd.DataFrame({"lang": pdf["lang"], "ratio": ratios})

    scored = d.mapInPandas(_ratios, schema="lang string, ratio double")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("ratio"), 6) + F.lit(0.0)).alias("mean_ratio"),
        (F.round(F.percentile("ratio", F.lit(0.1)), 6) + F.lit(0.0)).alias(
            "p10_ratio"
        ),
        (F.round(F.percentile("ratio", F.lit(0.9)), 6) + F.lit(0.0)).alias(
            "p90_ratio"
        ),
    )

@query(
    "effective_sample_size",
    "WITH "
    + SQL_RETS
    + """,
m AS (SELECT series, AVG(ret) AS mu FROM rets GROUP BY 1),
x AS (
  SELECT r.series, r.d, r.ret - m.mu AS x
  FROM rets r JOIN m USING (series)
),
l AS (
  SELECT series, x,
         LAG(x, 1) OVER (PARTITION BY series ORDER BY d) AS x1,
         LAG(x, 2) OVER (PARTITION BY series ORDER BY d) AS x2,
         LAG(x, 3) OVER (PARTITION BY series ORDER BY d) AS x3
  FROM x
)
SELECT series,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(COUNT(*) / GREATEST(1.0 + 2.0 * (
           SUM(x * x1) / SUM(x * x)
         + SUM(x * x2) / SUM(x * x)
         + SUM(x * x3) / SUM(x * x)), 0.1), 2) + 0 AS ess,
       ROUND(1.0 / GREATEST(1.0 + 2.0 * (
           SUM(x * x1) / SUM(x * x)
         + SUM(x * x2) / SUM(x * x)
         + SUM(x * x3) / SUM(x * x)), 0.1), 6) + 0 AS ess_ratio
FROM l GROUP BY series
""",
)
def effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size under serial correlation: ESS = n /
    (1 + 2*sum rho_k), the number of INDEPENDENT observations your n
    autocorrelated ones are worth — the bridge between the ACF
    diagnostics (acf_ljung_box) and every n-based inference in this
    file (calendar t-stats, VaR confidence bands, MDE): an
    ESS ratio far from 1 says those n's are lying. On this mean-
    reverting fixture the negative rho_1 makes ESS EXCEED n —
    anticorrelated draws carry more information than independent
    ones, the same effect var_horizon_scaling measures in VaR units.
    The truncated-ACF denominator can cross zero under strong
    anticorrelation (it did at sf0.001: sum rho ~ -0.5), so it is
    floored at 0.1 — the standard clip capping ESS at 10n instead of
    returning a meaningless negative. Identical dataflow to the ACF
    query: one mean broadcast, one lag window, one reduction."""
    rets = daily_returns(spark, sf_dir)
    mu = rets.groupBy("series").agg(F.avg("ret").alias("mu"))
    x = rets.join(F.broadcast(mu), "series").select(
        "series", "d", (F.col("ret") - F.col("mu")).alias("x")
    )
    w = Window.partitionBy("series").orderBy("d")
    lagged = x.select(
        "series",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    sxx = F.sum(F.col("x") * F.col("x"))
    rho_sum = sum(
        F.sum(F.col("x") * F.col(f"x{k}")) / sxx for k in (1, 2, 3)
    )
    n = F.count(F.lit(1))
    denom = F.greatest(F.lit(1.0) + 2.0 * rho_sum, F.lit(0.1))
    return lagged.groupBy("series").agg(
        n.alias("n_obs"),
        (F.round(n / denom, 2) + F.lit(0.0)).alias("ess"),
        (F.round(F.lit(1.0) / denom, 6) + F.lit(0.0)).alias("ess_ratio"),
    )


@query(
    "ngram_jaccard_near_dup_pairs",
    """
WITH ts AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, array_to_string(ts[ti.i:ti.i + 2], ' ') AS g
    FROM ts, UNNEST(range(1, GREATEST(len(ts) - 1, 1))) AS ti(i)
    WHERE len(ts) >= 3
  )
),
dfq AS (
  SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 50
),
capped AS (SELECT sh.doc_id, sh.g FROM sh JOIN dfq USING (g)),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(i / (sa.sz + sb.sz - i), 6) + 0 AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE ROUND(i / (sa.sz + sb.sz - i), 6) + 0 >= 0.5
""",
)
def ngram_jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-gram Jaccard near-dup pairs (r16) — the
    set-overlap leg of the near-dup family beside exact-hash, dense
    cosine, TF-IDF cosine, MinHash-LSH, and SimHash: the deterministic
    quantity MinHash APPROXIMATES, computed exactly over the df-capped
    shingle vocabulary via the same inverted-index postings-join shape
    as the TF-IDF leg (operators/dedup.ngram_jaccard_pairs) — distinct
    per-doc shingles, df>50 shingles pruned (the O(df2) postings
    guard, part of the contract), |A∩B| from one equi-join + hash-agg,
    |A∪B| by inclusion-exclusion from per-doc capped set sizes.
    Candidate volume Σ_g min(df_g, 50)² — linear in the corpus at the
    constant cap. Oracle replays shingling, pruning, the join, and the
    rounded threshold stage for stage."""
    from value_at_risk_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5, df_cap=50
    )

@query(
    "sparse_tfidf_near_dup_pairs",
    """
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
    FROM documents
  ) WHERE t <> ''
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks GROUP BY 1, 2
),
nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         GREATEST(1, (2 * COUNT(*)) // 5) AS cap
  FROM documents
),
dfq AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY t
  HAVING COUNT(*) <= (SELECT cap FROM nn)
),
w AS (
  -- same expression STRUCTURE as the engine: ln((n+1)/(df+1)) + 1,
  -- division inside the log (ln(a)-ln(b) is a different float)
  SELECT tf.doc_id, tf.t,
         tf.tf * (LN(((SELECT n FROM nn) + 1) / (dfq.df + 1)) + 1) AS w
  FROM tf JOIN dfq USING (t)
),
nrm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nn FROM w GROUP BY doc_id),
dot AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS d
  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b,
         ROUND(d / (na.nn * nb.nn), 6) + 0 AS cosine
  FROM dot
  JOIN nrm na ON na.doc_id = id_a
  JOIN nrm nb ON nb.doc_id = id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.9
""",
)
def sparse_tfidf_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARSE lexical near-duplicate pairs (r15): exact TF-IDF cosine
    via an inverted-index postings self-join with document-frequency
    pruning (operators/dedup.tfidf_cosine_pairs) — the third leg of
    the near-dup family beside dense embedding cosine and
    MinHash/SimHash: no embeddings, no hashing, exact over the
    df-capped vocabulary. The cap (40% of N) prunes ubiquitous tokens
    whose postings would contribute O(df²) candidate pairs at
    near-zero IDF weight — the standard sparse-all-pairs guard, part
    of the operator contract and replayed identically by the oracle.
    Every stage is an equi-keyed shuffle (explode -> tf hash-agg ->
    df filter -> postings join on the token -> pair hash-agg -> norm
    joins); nothing corpus-sized is broadcast or collected (N alone
    reaches the driver). The threshold filter applies to the ROUNDED
    cosine in both engines."""
    from value_at_risk_spark.operators.dedup import tfidf_cosine_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cap = max(1, (2 * d.count()) // 5)
    return tfidf_cosine_pairs(d, threshold=0.9, df_cap=cap)


@query(
    "gopher_repetition_filters",
    """
WITH docs_t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id, source, ts,
         CAST(COALESCE(list_sum(list_transform(ts, t -> LENGTH(t))), 0)
              AS BIGINT) AS total
  FROM docs_t
),
grams AS (
  SELECT doc_id, total, tn.n AS n,
         array_to_string(ts[ti.i:ti.i + tn.n - 1], ' ') AS gram
  FROM base,
       UNNEST([2,3,4,5,6,7,8,9,10]) AS tn(n),
       UNNEST(range(1, GREATEST(len(ts) - tn.n + 2, 1))) AS ti(i)
  WHERE len(ts) >= tn.n
),
cnt AS (
  SELECT doc_id, total, n, gram, COUNT(*) AS c,
         COUNT(*) * LENGTH(REPLACE(gram, ' ', '')) AS mass
  FROM grams GROUP BY 1, 2, 3, 4
),
top AS (
  SELECT doc_id, n,
         ROUND(mass * 1.0 / GREATEST(total, 1), 6) + 0 AS share
  FROM (
    SELECT doc_id, total, n, mass,
           ROW_NUMBER() OVER (PARTITION BY doc_id, n
                              ORDER BY c DESC, gram) AS rn
    FROM cnt WHERE n <= 4) t
  WHERE rn = 1
),
dup AS (
  SELECT doc_id, n,
         ROUND(SUM(mass) * 1.0 / GREATEST(MAX(total), 1), 6) + 0 AS share
  FROM cnt WHERE n >= 5 AND c >= 2
  GROUP BY doc_id, n
),
longf AS (SELECT * FROM top UNION ALL SELECT * FROM dup),
wide AS (
  SELECT b.doc_id, b.source,
         COALESCE(MAX(CASE WHEN n = 2 THEN share END), 0) AS s2,
         COALESCE(MAX(CASE WHEN n = 3 THEN share END), 0) AS s3,
         COALESCE(MAX(CASE WHEN n = 4 THEN share END), 0) AS s4,
         COALESCE(MAX(CASE WHEN n = 5 THEN share END), 0) AS s5,
         COALESCE(MAX(CASE WHEN n = 6 THEN share END), 0) AS s6,
         COALESCE(MAX(CASE WHEN n = 7 THEN share END), 0) AS s7,
         COALESCE(MAX(CASE WHEN n = 8 THEN share END), 0) AS s8,
         COALESCE(MAX(CASE WHEN n = 9 THEN share END), 0) AS s9,
         COALESCE(MAX(CASE WHEN n = 10 THEN share END), 0) AS s10
  FROM base b LEFT JOIN longf f USING (doc_id)
  GROUP BY 1, 2
),
flags AS (
  SELECT source,
         (s2 <= 0.20 AND s3 <= 0.18 AND s4 <= 0.16) AS top_ok,
         (s5 <= 0.15 AND s6 <= 0.14 AND s7 <= 0.13
          AND s8 <= 0.12 AND s9 <= 0.11 AND s10 <= 0.10) AS dup_ok
  FROM wide
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(CASE WHEN top_ok AND dup_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS kept,
       CAST(SUM(CASE WHEN top_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_top_ngram,
       CAST(SUM(CASE WHEN dup_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS fail_dup_ngram,
       ROUND(SUM(CASE WHEN top_ok AND dup_ok THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) + 0 AS kept_share
FROM flags GROUP BY source
""",
)
def gopher_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPETITION half of the published Gopher rule set (Rae et
    al. 2021 App. A — the n-gram rules; `gopher_quality_filters`
    carries the lexical half): per document, the character share of
    the single most frequent word n-gram (n = 2..4, thresholds
    0.20/0.18/0.16) and of all DUPLICATED word n-grams (n = 5..10,
    thresholds 0.15..0.10), reported as per-source keep/fail
    attribution (functions/text.repetition_signals). One explode
    emits all nine gram sizes in one corpus pass; one (doc, n, gram)
    hash-agg counts; everything after is bounded aggregates — the
    map-heavy shape that holds at 100 TB. Shares follow the published
    definition: overlapping repeats count every occurrence's
    characters, so a spam loop can exceed 1.0, and a very short
    document can trip a top-n-gram rule on a singleton (real
    pipelines conjoin with the word-count >= 50 rule from the lexical
    half). Rule flags here compare the ROUNDED (6-decimal) shares in
    both engines — the shares are small-integer ratios, so rounding
    is exact at fixture scales."""
    from value_at_risk_spark.functions.text import (
        REPETITION_DUP_THRESHOLDS,
        REPETITION_TOP_THRESHOLDS,
        repetition_signals,
    )

    d = _t(spark, sf_dir, "documents")
    sig = repetition_signals(d.select("doc_id", "text"))
    top_ok = None
    for n, thr in sorted(REPETITION_TOP_THRESHOLDS.items()):
        c = F.col(f"top{n}_share") <= thr
        top_ok = c if top_ok is None else (top_ok & c)
    dup_ok = None
    for n, thr in sorted(REPETITION_DUP_THRESHOLDS.items()):
        c = F.col(f"dup{n}_share") <= thr
        dup_ok = c if dup_ok is None else (dup_ok & c)
    joined = d.select("doc_id", "source").join(sig, "doc_id").select(
        "source",
        (top_ok & dup_ok).cast("long").alias("_keep"),
        (~top_ok).cast("long").alias("_f_top"),
        (~dup_ok).cast("long").alias("_f_dup"),
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("_keep").alias("kept"),
        F.sum("_f_top").alias("fail_top_ngram"),
        F.sum("_f_dup").alias("fail_dup_ngram"),
        (
            F.round(F.sum("_keep") / F.count(F.lit(1)), 6) + F.lit(0.0)
        ).alias("kept_share"),
    )


@query(
    "corpus_budget_selection",
    """
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
    FROM documents
  ) WHERE t <> ''
),
sig AS (
  SELECT doc_id,
         COUNT(*) AS n,
         COUNT(DISTINCT t) AS nd,
         SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                  THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS swr
  FROM toks GROUP BY doc_id
),
q AS (
  SELECT d.doc_id, d.source,
         ROUND((
           (CASE WHEN COALESCE(s.n, 0) BETWEEN 10 AND 10000
                 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN COALESCE(s.swr, 0.0) >= 0.05
                    AND COALESCE(s.swr, 0.0) <= 0.6 THEN 1.0 ELSE 0.0 END)
           + COALESCE(s.nd, 0) * 1.0 / GREATEST(COALESCE(s.n, 0), 1)
         ) / 3.0, 6) AS q,
         CAST(COALESCE(s.n, 0) AS BIGINT) AS toks
  FROM documents d LEFT JOIN sig s USING (doc_id)
),
b AS (SELECT CAST(SUM(toks) // 2 AS BIGINT) AS budget FROM q),
r AS (
  SELECT *, SUM(toks) OVER (ORDER BY q DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
),
sel AS (SELECT * FROM r WHERE cum <= (SELECT budget FROM b))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS tokens,
       ROUND(AVG(q), 6) + 0 AS avg_quality
FROM sel GROUP BY source
""",
)
def corpus_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (r15): the curation step that
    picks the HIGHEST-QUALITY prefix of the corpus fitting a global
    token budget (half the corpus mass here) — rank every document by
    (quality desc, id asc), take documents while the inclusive
    cumulative token count stays within budget, report the per-source
    composition of the selection. The cumulative sum is the
    DISTRIBUTED two-phase ``ranks.global_running_sum`` (value-bucketed
    local windows + broadcast offsets), never the single-task
    unpartitioned window the SQL oracle replays naively — same
    contract as shard_export_manifest. Determinism: quality is the
    6-decimal-rounded score (cross-engine equality proven by the
    doc_quality_scores oracle), token counts and the budget are exact
    integers, so the selection boundary is bit-exact."""
    from value_at_risk_spark.functions.text import quality_score, token_count
    from value_at_risk_spark.operators.ranks import global_running_sum

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        quality_score("text").alias("q"),
        token_count("text").cast("long").alias("toks"),
    )
    budget = d.agg(F.sum("toks")).first()[0] // 2
    ranked = global_running_sum(
        d, "toks", [("q", False), ("doc_id", True)], out="cum"
    )
    sel = ranked.filter(F.col("cum") <= budget)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("tokens"),
        (F.round(F.avg("q"), 6) + F.lit(0.0)).alias("avg_quality"),
    )
