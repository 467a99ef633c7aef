"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All pure Column expressions — no Python in the data path, so these run at
full codegen speed over 100 TB of documents. Deterministic by construction
(stable hash functions, no RNG) so every operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: tiny embedded stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "is", "of", "and"],
    "fr": ["le", "la", "et", "un", "est"],
    "de": ["der", "die", "und", "ein", "ist"],
    "es": ["el", "la", "es", "un", "y"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (single projection)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: total, distinct, char/token ratio."""
    tok = tokens(F.col(text_col))
    # BIGINT casts: the sizes feed oracle-compared outputs (DuckDB len() is BIGINT)
    return df.select(
        "*",
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_uniq_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, mean word length, stopword ratio,
    uniqueness ratio — the standard pre-training quality filters."""
    tok = tokens(F.col(text_col))
    n_tok = F.size(tok)
    n_uniq = F.size(F.array_distinct(tok))
    stop_en = F.size(F.filter(tok, lambda x: x.isin(*STOPWORDS["en"])))
    nospace_len = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    return df.select(
        "*",
        F.length(text_col).cast("long").alias("n_chars_m"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(nospace_len / n_tok, 4).alias("mean_word_len"),
        F.round(stop_en / n_tok, 4).alias("stopword_ratio"),
        F.round(n_uniq / n_tok, 4).alias("uniq_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID. Votes = count of language-marker tokens;
    argmax with fixed precedence (en>fr>de>es) for determinism; 'unk' when
    all votes are zero."""
    tok = tokens(F.col(text_col))

    # factory, not a default-arg lambda (PySpark arity pitfall — see dedup.py)
    def in_list(ws: list[str]):
        return lambda x: x.isin(ws)

    votes = {
        lang: F.size(F.filter(tok, in_list(ws))) for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    pred = F.when(best == 0, F.lit("unk"))
    for lang in ["en", "fr", "de", "es"]:  # fixed precedence on ties
        pred = pred.when(votes[lang] == best, F.lit(lang))
    return df.select("*", pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key at scale (one hash per doc, no shuffle)."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select("*", F.md5(normalized).alias("fingerprint"))


#: BPE-ish pre-tokenizer: word runs OR single non-word-non-space marks —
#: the regex family GPT-2-style tokenizers use as the split pass.
BPE_TOKEN_REGEX = r"\w+|[^\w\s]"


def regex_token_count(text: Column, pattern: str = BPE_TOKEN_REGEX) -> Column:
    """Token count under a BPE-ish regex (JVM regexp_count — no UDF).
    A real BPE vocab multiplies this by a merges-per-word factor; the
    regex pass is the part that must scan every byte, so it's the one
    that matters at 100 TB."""
    return F.regexp_count(text, F.lit(pattern))


def tfidf_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tf: int = 2,
) -> DataFrame:
    """Per-document TF-IDF term weights: tf * ln(N / doc_freq).

    Three aggregates, all map-side combinable: term counts per doc
    (shuffles on (doc, term)), document frequency per term (shuffles the
    already-aggregated per-doc terms, not raw tokens), and the 1-row corpus
    size N, broadcast as a scalar. ``min_tf`` prunes the long tail of
    singleton terms BEFORE the doc-frequency join, which is what bounds the
    join input at 100 TB. No Python in the path — explode + groupBy only.
    """
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .where(F.col("tf") >= min_tf)
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            (
                F.col("tf")
                * F.ln(F.col("n_docs").cast("double") / F.col("doc_freq"))
            ).alias("tfidf"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS local
    fingerprinting algorithm): hash every k-char gram, slide a window of
    w consecutive gram hashes, and select each window's minimum hash
    with RIGHTMOST tie-break. Guarantee: any substring match of length
    >= w + k - 1 between two documents yields at least one shared
    selected fingerprint, while ~2/(w+1) of grams are kept.

    Returns one row per WINDOW: (id_col, pos, fp) where ``pos`` is the
    window-end gram position (1-based, pos >= w) and ``fp`` is the
    selected fingerprint PACKED as md5hex || zero-padded(10^12 - gram
    position): string order on the packed value == (hash asc, position
    desc), so a plain window min implements the rightmost-min tie-break.
    The 10^12 bias keeps the packed suffix non-negative (and the
    ordering intact) for any realistic document — the old 999999 bias
    went NEGATIVE past 1M chars and lpad truncated the '-' string,
    silently corrupting the tie-break (ADVICE r5). Precondition: doc
    length < 10^12 chars (a terabyte-scale single document) — far
    beyond anything a row-sized text column can hold
    portably (no struct-ordering semantics; DuckDB replays it with the
    same concat). Distinct fp values per doc are the document's
    fingerprint set; equal fp across docs == same gram hash (position
    suffix only disambiguates ties WITHIN a window).

    Scale: the explode is bounded by doc length; the only shuffle is the
    id_col hash for the doc-local window — at 100 TB that is one
    Exchange on the natural dedup key, and the fingerprint set feeds the
    same band-join machinery as MinHash (d4) for candidate pairing.

    Documents shorter than k + w - 1 chars produce no rows (no full
    window exists)."""
    n_grams = F.length(text_col) - (k - 1)
    g = df.where(F.length(text_col) >= k + w - 1).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
        F.col(text_col).alias("_t"),
    )
    packed = F.concat(
        F.md5(F.col("_t").substr(F.col("pos"), F.lit(k))),
        F.lpad(
            (F.lit(1_000_000_000_000) - F.col("pos")).cast("string"), 13, "0"
        ),
    )
    win = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    sel = g.select(
        F.col(id_col), "pos", F.min(packed).over(win).alias("fp")
    )
    return sel.where(F.col("pos") >= w)
