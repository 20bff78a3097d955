"""Text-analysis operators over the documents corpus
(SURVEY.md §2.8 L7–L9, L11 + language-ID / token-count /
fingerprinting from the driver's extension surface).

Scale design: tokenization is split()+explode — one narrow transform
followed by a partial-aggregated groupBy on the token, so the shuffle
carries (token, partial_count), never documents.  TF-IDF is computed
explicitly (two aggregations + a broadcast-joined docfreq) instead of
spark.ml HashingTF/IDF so it stays oracle-checkable and hash-free.
Scores use only binary-exact weights (0.5/1.0/2.0) so double sums are
order-independent without the decimal detour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import (
    dec_avg,
    sql_dec_avg,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import fan_out, load


def tokens(col: str = "text"):
    """Whitespace tokenization, empty-safe (JVM-side)."""
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


_SQL_TOKENS = "list_filter(string_split({c}, ' '), t -> t <> '')"


# --- L7: word frequency ---------------------------------------------------

_L7_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_SQL_TOKENS.format(c='text')}) AS word FROM documents
),
counts AS (
  SELECT word, COUNT(*) AS n FROM tok GROUP BY word
)
SELECT word, n FROM counts ORDER BY n DESC, word LIMIT 20
"""


@query("l7_word_frequency", oracle=_L7_ORACLE, tags=("text",))
def l7_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: corpus word frequency — split+explode+groupBy; partial
    aggregation means the shuffle carries (word, count) pairs only.
    ``fan_out`` spreads the tokenize+explode stage across cores when
    the fixture's single-row-group file scans as one partition (no-op
    on a multi-file corpus); measured 1.16 s → 0.68 s at sf1."""
    docs = load(spark, sf_dir, "documents")
    return (
        fan_out(docs.select("text"))
        .select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


# --- L8: TF-IDF (explicit, oracle-checkable) ----------------------------------

_L8_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(c='text')}) AS word
  FROM documents WHERE doc_id < 20
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
),
alltok AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(c='text')}) AS word FROM documents
),
df AS (
  SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM alltok GROUP BY word
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, tf, df, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rn
  FROM scored
)
SELECT doc_id, word, tf, df, tfidf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""


@query("l8_tfidf_top_terms", oracle=_L8_ORACLE, tags=("text",))
def l8_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: explicit TF-IDF, top-5 terms per document (doc_id < 20).
    Document frequency is computed over the whole corpus and broadcast
    back onto term frequencies — at scale df is tiny (|vocab| rows)
    while tf is huge, so the join direction matters."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("word"))
    tf = (
        tok.filter(F.col("doc_id") < 20)
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a 1-row broadcast crossJoin (the tr_mix_weights
    # idiom) instead of a driver-side docs.count(): keeps the whole
    # plan lazy — one job, no separate count action.
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= 5
    )


# --- L9: lexicon scoring ---------------------------------------------------------

# Binary-exact weights (halves/units) → order-independent double sums.
_LEXICON = [
    ("fast", 1.0),
    ("slow", -1.0),
    ("error", -2.0),
    ("query", 0.5),
    ("data", 0.5),
    ("hash", 0.25),
    ("scan", -0.25),
]

_L9_ORACLE = f"""
WITH lexicon(word, score) AS (
  VALUES {', '.join(f"('{w}', {s})" for w, s in _LEXICON)}
),
tok AS (
  SELECT doc_id, lang, unnest({_SQL_TOKENS.format(c='text')}) AS word
  FROM documents
),
doc_scores AS (
  SELECT t.doc_id, t.lang,
         CAST(SUM(COALESCE(l.score, 0.0)) AS DOUBLE) AS score
  FROM tok t LEFT JOIN lexicon l USING (word)
  GROUP BY t.doc_id, t.lang
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(score) AS DOUBLE) AS total_score,
       CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
FROM doc_scores
GROUP BY lang
"""


@query("l9_lexicon_sentiment", oracle=_L9_ORACLE, tags=("text",))
def l9_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: lexicon-join scoring (the Spark-on-Twitter sentiment
    pattern): explode tokens ⟕ broadcast lexicon, sum per doc, roll up
    per lang.  Weights are binary-exact so sums commute."""
    docs = load(spark, sf_dir, "documents")
    lex = docs.sparkSession.createDataFrame(_LEXICON, ["word", "score"])
    tok = docs.select("doc_id", "lang", F.explode(tokens()).alias("word"))
    doc_scores = (
        tok.join(F.broadcast(lex), "word", "left")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.coalesce("score", F.lit(0.0))).alias("score"))
    )
    return doc_scores.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("score").alias("total_score"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_positive"),
    )


# --- L11 + token counting: quality filters ------------------------------------------

_L11_ORACLE = f"""
WITH scored AS (
  SELECT source,
         n_chars,
         len({_SQL_TOKENS.format(c='text')}) AS n_tokens,
         CASE WHEN n_chars BETWEEN 100 AND 500
               AND len({_SQL_TOKENS.format(c='text')}) >= 20
               AND lang IN ('en', 'de', 'fr')
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       {sql_dec_avg('n_tokens', 'avg_tokens')},
       {sql_dec_avg('n_chars', 'avg_chars')}
FROM scored
GROUP BY source
"""


@query("l11_quality_filter", oracle=_L11_ORACLE, tags=("text", "quality"))
def l11_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11: document-quality gating — length bounds, token-count
    threshold, language allowlist; reports keep-rates per source (the
    training-data funnel report)."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(tokens())
    keep = (
        F.col("n_chars").between(100, 500)
        & (n_tokens >= 20)
        & F.col("lang").isin("en", "de", "fr")
    )
    return (
        docs.select(
            "source",
            "n_chars",
            n_tokens.alias("n_tokens"),
            keep.cast("int").alias("keep"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
            dec_avg("n_tokens", "avg_tokens"),
            dec_avg("n_chars", "avg_chars"),
        )
    )


# --- language-ID heuristic ------------------------------------------------------------

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

_LANGID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         {_SQL_TOKENS.format(c='lower(text)')} AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(toks,
              t -> list_contains({_STOPWORDS!r}, t))) AS DOUBLE)
           / NULLIF(len(toks), 0) AS stop_ratio
  FROM tok
)
SELECT lang,
       CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'other' END AS detected,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(stop_ratio AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_stop_ratio
FROM scored
GROUP BY lang, detected
"""


@query("t_language_id", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def t_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword-hit ratio per doc,
    thresholded — compared against the corpus's lang tag (FIXTURES.md
    notes the text is English-vocab regardless of tag, so this also
    documents that the tags are synthetic)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    sw = F.array(*[F.lit(s) for s in _STOPWORDS])
    # NULLIF guard: an empty document must yield a NULL ratio, not a
    # divide-by-zero (Spark 4 runs ANSI mode; found by the generative
    # corpus tests)
    stop_ratio = F.size(
        F.filter(toks, lambda t: F.array_contains(sw, t))
    ).cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
    scored = docs.select(
        "lang",
        stop_ratio.alias("stop_ratio"),
        F.when(stop_ratio >= 0.05, "en").otherwise("other").alias("detected"),
    )
    return scored.groupBy("lang", "detected").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(F.col("stop_ratio").cast("decimal(38,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_stop_ratio"),
    )


# --- document fingerprinting -------------------------------------------------------------

_FP_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint
  FROM documents
),
groups AS (
  SELECT fingerprint, COUNT(*) AS sz, MIN(doc_id) AS canonical_doc
  FROM fp GROUP BY fingerprint
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collision_groups,
       CAST(MAX(sz) AS BIGINT) AS max_group,
       CAST(MIN(canonical_doc) AS BIGINT) AS first_canonical
FROM groups
"""


@query("t_fingerprint", oracle=_FP_ORACLE, tags=("text", "dedup"))
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonicalize (lowercase, collapse
    whitespace, trim) then md5 — the normalization-invariant identity
    used upstream of exact dedup."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace(F.col("text"), " +", " ")))
        ).alias("fingerprint"),
    )
    groups = fp.groupBy("fingerprint").agg(
        F.count("*").alias("sz"), F.min("doc_id").alias("canonical_doc")
    )
    return groups.agg(
        F.count("*").alias("n_fingerprints"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_collision_groups"),
        F.max("sz").cast("long").alias("max_group"),
        F.min("canonical_doc").alias("first_canonical"),
    )


# --- quality scoring: punctuation / char-per-token ratios ---------------------

_QS_ORACLE = f"""
WITH m AS (
  SELECT source,
         len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0
           / NULLIF(n_chars, 0) AS punct_ratio,
         n_chars * 1.0 / NULLIF(len({_SQL_TOKENS.format(c='text')}), 0)
           AS chars_per_token
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(punct_ratio AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(punct_ratio), 6) AS avg_punct_ratio,
       ROUND(CAST(SUM(CAST(chars_per_token AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(chars_per_token), 6) AS avg_chars_per_token,
       CAST(SUM(CASE WHEN punct_ratio > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_punct
FROM m
GROUP BY source
"""


@query("t_quality_score", oracle=_QS_ORACLE, tags=("text", "quality"))
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal ratios per document — punctuation density and
    chars-per-token (a gibberish/boilerplate tell), rolled up per
    source with a high-punctuation count.  Complements l11 (length /
    token / lang gates) and t_language_id (stopword ratio) to cover
    the standard pretraining quality-score trio.  All ratio math is
    per-row IEEE double; the roll-up goes through decimal-exact sums
    so results are partition-independent."""
    docs = load(spark, sf_dir, "documents")
    # NULLIF: empty documents (n_chars=0) must not divide by zero
    punct_ratio = (
        F.regexp_count(F.col("text"), F.lit("[^a-z0-9 ]")).cast("double")
        / F.nullif(F.col("n_chars").cast("double"), F.lit(0.0))
    )
    chars_per_token = F.col("n_chars").cast("double") / F.nullif(
        F.size(tokens()).cast("double"), F.lit(0.0)
    )

    def dec_ratio_avg(c: str, alias: str):
        total = F.sum(F.col(c).cast("decimal(38,9)")).cast("double")
        return F.round(total / F.count(c), 6).alias(alias)

    return (
        docs.select(
            "source",
            punct_ratio.alias("punct_ratio"),
            chars_per_token.alias("chars_per_token"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            dec_ratio_avg("punct_ratio", "avg_punct_ratio"),
            dec_ratio_avg("chars_per_token", "avg_chars_per_token"),
            F.sum(F.when(F.col("punct_ratio") > 0.05, 1).otherwise(0))
            .cast("long")
            .alias("n_high_punct"),
        )
    )


# --- t: repetition-ratio quality signal (Gopher/C4-style) -------------------

_REP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_SQL_TOKENS.format(c='text')}) AS word
  FROM documents
),
counts AS (
  SELECT doc_id, lang, word, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_ratio,
         1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac
  FROM counts GROUP BY 1, 2
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rep_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       {sql_dec_avg('rep_ratio', 'avg_rep_ratio')},
       {sql_dec_avg('dup_frac', 'avg_dup_frac')}
FROM per_doc
GROUP BY lang
"""


@query("t_repetition_ratio", oracle=_REP_ORACLE, tags=("text", "quality"))
def t_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher/C4 rule family):
    per document, the most-frequent-token share (rep_ratio) and the
    duplicate-token fraction (dup_frac); documents dominated by one
    token get flagged.  Two stacked aggregations — the shuffle carries
    (doc_id, word, count), never text — so the same plan holds on a
    100 TB crawl.  Ratio averages take the decimal detour for engine
    parity."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(tokens()).alias("word"))
    counts = tok.groupBy("doc_id", "lang", "word").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id", "lang").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "rep_ratio"
        ),
        (
            F.lit(1.0) - F.count("*").cast("double") / F.sum("c").cast("double")
        ).alias("dup_frac"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rep_ratio") > 0.1, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        dec_avg("rep_ratio", "avg_rep_ratio"),
        dec_avg("dup_frac", "avg_dup_frac"),
    )


# --- t: blocklist redaction (PII-scrub plumbing) -----------------------------

_REDACT_PAT = r"\b(spark|data|row)\b"

_REDACT_ORACLE = f"""
WITH scrubbed AS (
  SELECT lang,
         len(regexp_extract_all(text, '{_REDACT_PAT}')) AS n_hits,
         length(text) AS len_before,
         length(regexp_replace(text, '{_REDACT_PAT}', '[X]', 'g')) AS len_after
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_hit,
       CAST(SUM(n_hits) AS BIGINT) AS total_redactions,
       CAST(SUM(len_before - len_after) AS BIGINT) AS chars_removed
FROM scrubbed
GROUP BY lang
"""


@query("t_redact_blocklist", oracle=_REDACT_ORACLE, tags=("text", "privacy"))
def t_redact_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist redaction — the PII-scrub step of a corpus pipeline
    (here a term blocklist stands in for email/phone patterns; the
    plumbing — global regexp_replace + match counting, rolled up per
    language — is the production shape).  The pattern sticks to the
    regex subset Java (Spark) and RE2 (DuckDB) interpret identically:
    literal alternation + word boundaries.  One scan, no shuffle
    before the final rollup."""
    docs = load(spark, sf_dir, "documents")
    pat = F.lit(_REDACT_PAT)
    scrubbed = docs.select(
        "lang",
        F.size(F.regexp_extract_all(F.col("text"), pat, 0)).alias("n_hits"),
        F.length("text").alias("len_before"),
        F.length(F.regexp_replace(F.col("text"), _REDACT_PAT, "[X]")).alias(
            "len_after"
        ),
    )
    return scrubbed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_hit"),
        F.sum("n_hits").cast("long").alias("total_redactions"),
        F.sum(F.col("len_before") - F.col("len_after"))
        .cast("long")
        .alias("chars_removed"),
    )


# --- Tbpe: BPE merge-candidate pair counting -----------------------------------

_TBPE_ORACLE = f"""
WITH wc AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT unnest({_SQL_TOKENS.format(c='text')}) AS word FROM documents)
  GROUP BY word
),
pairs AS (
  SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, word, c
  FROM wc, UNNEST(range(1, length(word))) AS u(i)
  WHERE length(word) >= 2
)
SELECT pair,
       CAST(SUM(c) AS BIGINT) AS n_weighted,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_word_types
FROM pairs
GROUP BY pair
ORDER BY n_weighted DESC, pair
LIMIT 20
"""


@query("t_bpe_pair_counts", oracle=_TBPE_ORACLE, tags=("text", "training"))
def t_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tbpe: the first iteration of BPE merge learning — count every
    adjacent character pair over the corpus, weighted by word
    frequency, and return the top-20 merge candidates (the pair a BPE
    trainer would merge first, then recount).

    Scale shape — the trick that makes BPE training feasible on
    100 TB: collapse the corpus to its word VOCABULARY first (one
    map-side-combined groupBy; Heaps' law bounds |vocab| ≪ corpus),
    then explode character positions over vocabulary entries only.
    The pair explosion is O(|vocab| · word_len), independent of corpus
    size; corpus frequency rides along as the weight column.  The
    final top-20 is a partial-aggregated pair count plus a bounded
    TakeOrdered — nothing document-sized ever shuffles."""
    docs = load(spark, sf_dir, "documents")
    wc = (
        fan_out(docs.select("text"))
        .select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        wc.filter(F.length("word") >= 2)
        .select(
            "word",
            "c",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
        )
        .select(F.expr("substring(word, i, 2)").alias("pair"), "word", "c")
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("c").alias("n_weighted"),
            F.countDistinct("word").alias("n_word_types"),
        )
        .orderBy(F.col("n_weighted").desc(), "pair")
        .limit(20)
    )


# --- Tulm: unigram LM quality score (CCNet-style LM filtering) ------------------

_TULM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(c='text')}) AS word
  FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS c FROM tok GROUP BY word
),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v
  FROM wc
),
scored AS (
  SELECT t.doc_id,
         ROUND(LN((wc.c + 1.0) / (tot.n + tot.v)), 6) AS lp
  FROM tok t JOIN wc USING (word) CROSS JOIN tot
),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_tok,
         CAST(SUM(CAST(lp AS DECIMAL(38,6)) * 1000000) AS BIGINT) AS s6
  FROM scored
  GROUP BY doc_id
)
SELECT doc_id, n_tok,
       CAST(CASE WHEN s6 < 0
                 THEN -((2 * (-s6) + n_tok) // (2 * n_tok))
                 ELSE (2 * s6 + n_tok) // (2 * n_tok) END AS DOUBLE)
         / 1000000.0 AS avg_logprob
FROM agg
"""


@query("t_unigram_logprob", oracle=_TULM_ORACLE, tags=("text", "quality"))
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tulm: unigram language-model quality score — train add-one-
    smoothed unigram probabilities on the corpus itself and score each
    document by its mean token log-probability.  This is the shape of
    CCNet/LLM-pipeline LM filtering (there a KenLM 5-gram; here the
    unigram member of the same family, chosen because its arithmetic
    is exactly replayable): documents whose tokens are improbable
    under the corpus model (gibberish, boilerplate soup, wrong-
    language fragments) sink to the bottom and a percentile cut drops them.

    Scale shape: the model is the word-count table (|vocab| rows,
    Heaps-bounded) built by one map-side-combined groupBy and
    broadcast back onto the token stream; the two normalizing scalars
    ride a 1-row broadcast crossJoin; per-doc scoring is one grouped
    aggregation.  Per-token ln is rounded to 6 before the mean (libm
    parity) and the mean itself is a decimal-exact sum over rounded
    values (partition-order independence) — the established engine-
    parity discipline."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("word"))
    wc = tok.groupBy("word").agg(F.count("*").alias("c"))
    tot = wc.agg(
        F.sum("c").cast("double").alias("n"),
        F.count("*").cast("double").alias("v"),
    )
    scored = (
        tok.join(F.broadcast(wc), "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))), 6
            ).alias("lp"),
        )
    )
    # The mean of PRE-ROUNDED 6dp values can land exactly on a decimal
    # midpoint (e.g. Σ=-4.131307 over 2 tokens → -2.0656535), where the
    # engines' ROUND(double, 6) legitimately disagree: Spark rounds the
    # double's shortest decimal repr (BigDecimal HALF_UP) while DuckDB
    # rounds the exact binary value — a 1-in-the-6th-decimal split the
    # generative fuzz found.  So the mean is formed in EXACT integer
    # arithmetic instead: Σ(lp·1e6) as BIGINT, half-away-from-zero
    # integer division by n, one final identical IEEE division by 1e6.
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.col("lp").cast(f"decimal(38,6)") * 1_000_000)
        .cast("long")
        .alias("s6"),
    )
    return agg.select(
        "doc_id",
        "n_tok",
        F.expr(
            "CAST(CASE WHEN s6 < 0"
            " THEN -((2 * (-s6) + n_tok) div (2 * n_tok))"
            " ELSE (2 * s6 + n_tok) div (2 * n_tok) END AS DOUBLE)"
            " / 1000000.0"
        ).alias("avg_logprob"),
    )


# --- Toov: vocabulary coverage / OOV rate ----------------------------------------

_OOV_V = 500  # tokenizer vocabulary size (top corpus words)

_TOOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(c='text')}) AS word
  FROM documents
),
wc AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rn FROM wc
  ) WHERE rn <= {_OOV_V}
),
per AS (
  SELECT t.doc_id, COUNT(*) AS n_tok,
         SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (word)
  WHERE t.doc_id % 7 = 0
  GROUP BY t.doc_id
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST(n_oov * 1000000 // n_tok AS BIGINT) AS oov_ppm
FROM per
"""


@query("t_oov_rate", oracle=_TOOV_ORACLE, tags=("text", "quality"))
def t_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toov: per-document out-of-vocabulary rate against a top-500
    corpus vocabulary — the tokenizer-coverage metric a training-data
    pipeline checks before committing to a vocab: documents with high
    OOV under the deployment tokenizer fragment into byte-fallback
    soup and waste sequence length, so the OOV ppm feeds the same
    keep/drop gates as t_quality_score and the unigram LM filter
    (this is the VOCABULARY axis those two don't measure: a fluent
    document in an unsupported script scores fine on length/punct and
    terribly here).

    Shape: the vocabulary is one map-side-combined word count +
    top-k (Heaps-bounded, broadcast back); per-doc scoring is a
    broadcast left join flag and one grouped aggregation — the exact
    L25 pipeline shape with a membership test instead of a
    probability.  Rates are integer ppm floor divisions (parity
    rule); the %7 doc sample bounds the output, the vocabulary is
    trained on the FULL corpus."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("word"))
    w = Window.orderBy(F.col("c").desc(), "word")
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _OOV_V)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.filter(F.col("doc_id") % 7 == 0)
        .join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            F.expr("n_oov * 1000000 DIV n_tok").alias("oov_ppm"),
        )
    )
