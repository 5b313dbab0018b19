"""Text-analysis operators for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

All pure JVM-side column expressions (whole-stage codegen, no Python) — each
has an exact DuckDB-SQL oracle in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.functions import portable_hash32, words

# Tiny high-frequency stopword sets per language — the classic cheap lang-id
# signal (ratio of language-i stopwords among tokens).  Deterministic and
# identical in the SQL oracle.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
ES_STOPWORDS = ("el", "la", "de", "y", "que", "en", "un", "una", "los", "por")
FR_STOPWORDS = ("le", "la", "de", "et", "que", "en", "un", "une", "les", "pour")
DE_STOPWORDS = ("der", "die", "das", "und", "zu", "in", "ein", "eine", "mit", "von")


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured) — whitespace tokens + raw length."""
    return documents.select(
        "doc_id",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    ).orderBy("doc_id")


def _stopword_hits(language_words: tuple[str, ...]):
    toks = words(F.col("text"))
    arr = F.array(*[F.lit(w) for w in language_words])
    return F.size(F.array_intersect(F.transform(toks, F.lower), arr)).cast("long")


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, en_hits, es_hits, fr_hits, de_hits, predicted_lang) — distinct
    stopword hits per language; argmax with 'en' fallback on all-zero/tie.
    Tie-break order en > es > fr > de (greatest() picks the max; strictly-
    greater comparisons make the order explicit)."""
    en, es, fr, de = (
        _stopword_hits(EN_STOPWORDS),
        _stopword_hits(ES_STOPWORDS),
        _stopword_hits(FR_STOPWORDS),
        _stopword_hits(DE_STOPWORDS),
    )
    pred = (
        F.when((es > en) & (es >= fr) & (es >= de), F.lit("es"))
        .when((fr > en) & (fr > es) & (fr >= de), F.lit("fr"))
        .when((de > en) & (de > es) & (de > fr), F.lit("de"))
        .otherwise(F.lit("en"))
    )
    return documents.select(
        "doc_id",
        en.alias("en_hits"),
        es.alias("es_hits"),
        fr.alias("fr_hits"),
        de.alias("de_hits"),
        pred.alias("predicted_lang"),
    ).orderBy("doc_id")


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_word_len, stopword_ratio, quality) — the
    classic length/stopword quality gate (cf. C4/Gopher rules): score in
    [0,1] = 0.5*stopword_signal + 0.3*word_len_signal + 0.2*length_signal,
    rounded to 4dp for hash-stable comparison."""
    toks = words(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    mean_wl = (F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / n_tokens)
    stop_ratio = _stopword_hits(EN_STOPWORDS) / F.lit(len(EN_STOPWORDS))
    len_signal = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    wl_signal = F.when((mean_wl >= 3) & (mean_wl <= 10), 1.0).otherwise(0.0)
    quality = F.round(0.5 * stop_ratio + 0.3 * wl_signal + 0.2 * len_signal, 4)
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality"),
    ).orderBy("doc_id")


def winnow_fingerprint(
    documents: DataFrame, n: int = 3, window: int = 4
) -> DataFrame:
    """(doc_id, fp) rows — winnowing document fingerprints (Schleimer et al.,
    SIGMOD 2003): hash every n-gram shingle, slide a w-window over the hash
    sequence, keep each window's minimum, emit the distinct minima.

    Expressed relationally so it scales: posexplode the shingle sequence ->
    ONE portable hash per shingle -> window-min per doc ordered by position
    (single shuffle on doc_id) -> distinct.  The naive higher-order-function
    form (transform over window starts with array_min(slice(...)) inside the
    lambda) recomputes the hash array per window — O(shingles x windows) md5
    calls.  Short docs (< window full windows) fall back to the global min
    via the pos <= greatest(n_sh - window + 1, 1) bound."""
    from pyspark.sql import Window as W

    from pdf_parser_spark.functions import word_shingles

    sh = documents.select(
        "doc_id", F.posexplode(word_shingles(F.col("text"), n)).alias("pos", "s")
    ).select(
        "doc_id", "pos",
        portable_hash32(F.col("s")).alias("h"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n_sh"),
    )
    wmin = F.min("h").over(
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    )
    return (
        sh.withColumn("fp", wmin)
        .where(F.col("pos") <= F.greatest(F.col("n_sh") - window + 1, F.lit(1)) - 1)
        .select("doc_id", "fp")
        .distinct()
        .orderBy("doc_id", "fp")
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 of whitespace-normalized lowercase text: the exact
    dedup key.  md5 chosen for engine portability (see functions.portable_hash32)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return documents.select(
        "doc_id", F.md5(normalized).alias("fp")
    ).orderBy("doc_id")
