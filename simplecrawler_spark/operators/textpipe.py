"""Training-data pipeline operators over a document corpus.

These extend the crawl engine with the text-curation steps a large-scale
pretraining pipeline runs downstream of fetching (dedup, quality, language
ID, fingerprinting). All hot paths are pure ``pyspark.sql.functions``
column expressions (JVM, whole-stage codegen) — no Python UDFs — and each
has a DuckDB-expressible SQL twin registered in __spark_entry__.py.

Scale notes:
- shingling explodes to |doc| rows per document; ``prefix_len`` bounds the
  blow-up deterministically (same cap on the oracle side);
- MinHash-LSH candidate generation is a self-join on (band, band_key) —
  shuffle on the band key, skew-safe because bucket sizes are bounded by
  collision probability, not by host/domain popularity;
- SimHash packs to one 60-bit signature per doc: near-dup candidates join
  on rotated prefix buckets instead of all-pairs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

# small multilingual stopword seed lists for the n-gram language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "zu", "den", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}

PUNCT_RE = r"[^\w\s]"


def _tokens_col(col: str = "text"):
    # whitespace tokenization; empty strings removed (JS-/SQL-portable)
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != "")


# ---------------------------------------------------------------- exact dedupe
def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    cardinality and canonical (min) doc_id."""
    return (documents
            .withColumn("text_hash", F.md5(F.encode(F.col("text"), "utf-8")))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            )


def dedupe_keep_first(documents: DataFrame) -> DataFrame:
    """The curation form: keep the min-doc_id representative per text hash."""
    w = Window.partitionBy(F.md5(F.encode(F.col("text"), "utf-8"))) \
              .orderBy("doc_id")
    return (documents.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1").drop("__rn"))


# ------------------------------------------------------------------- shingles
def shingles(documents: DataFrame, n: int = 5, prefix_len: int = 200) -> DataFrame:
    """Character n-gram shingles over a deterministic text prefix:
    (doc_id, pos, shingle)."""
    prefix = F.substring(F.col("text"), 1, prefix_len)
    return (documents
            .select("doc_id", prefix.alias("_p"))
            .filter(F.length("_p") >= n)
            .select("doc_id",
                    F.explode(F.sequence(F.lit(1),
                                         F.length("_p") - (n - 1))).alias("pos"),
                    F.col("_p"))
            .select("doc_id", "pos",
                    F.expr(f"substring(_p, pos, {n})").alias("shingle")))


# ----------------------------------------------------------------- MinHash/LSH
def minhash_signatures(documents: DataFrame, num_hashes: int = 16,
                       n: int = 5, prefix_len: int = 200) -> DataFrame:
    """(doc_id, h, minhash): minhash h-th value = min over shingles of
    md5(shingle || ':' || h), as a 60-bit integer. Deterministic and
    DuckDB-twin-able (md5 + hex→int exist on both engines)."""
    sh = shingles(documents, n, prefix_len)
    return (sh.select("doc_id", "shingle",
                      F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1)))
                       .alias("h"))
            .select("doc_id", "h",
                    F.conv(F.substring(
                        F.md5(F.encode(
                            F.concat_ws(":", F.col("shingle"),
                                        F.col("h").cast("string")), "utf-8")),
                        1, 15), 16, 10).cast("long").alias("hv"))
            .groupBy("doc_id", "h")
            .agg(F.min("hv").alias("minhash")))


def minhash_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """LSH banding: (doc_id, band, band_key) where band_key = md5 of the
    ordered minhash values of the band."""
    return (signatures
            .withColumn("band", (F.col("h") / rows_per_band).cast("int"))
            .groupBy("doc_id", "band")
            .agg(F.md5(F.encode(F.concat_ws(",", F.array_sort(
                F.collect_list(F.concat_ws(":", F.col("h").cast("string"),
                                           F.col("minhash").cast("string"))))),
                "utf-8")).alias("band_key")))


def minhash_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Bucket self-join: docs sharing any band are near-dup candidates.
    (doc_a < doc_b, distinct)."""
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (left.join(right, ["band", "band_key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


# -------------------------------------------------------------------- SimHash
def simhash(documents: DataFrame, bits: int = 32,
            prefix_len: int = 200) -> DataFrame:
    """(doc_id, simhash): bit-vote fingerprint over whitespace tokens of a
    text prefix. Token hash = md5-derived 60-bit int; bit b of the
    signature is 1 iff the sum of votes (±1 per token) is positive."""
    toks = (documents
            .select("doc_id",
                    F.explode(_tokens_col()).alias("tok"))
            .select("doc_id",
                    F.conv(F.substring(F.md5(F.encode(F.col("tok"), "utf-8")),
                                       1, 15), 16, 10).cast("long").alias("hv")))
    votes = (toks.select("doc_id",
                         F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
                          .alias("b"), "hv")
             .withColumn("vote",
                         F.when(F.expr("(hv >> b) & 1") == 1, F.lit(1))
                          .otherwise(F.lit(-1)))
             .groupBy("doc_id", "b")
             .agg(F.sum("vote").alias("v")))
    return (votes
            .withColumn("bitval",
                        F.when(F.col("v") > 0, F.expr("shiftleft(1L, b)"))
                         .otherwise(F.lit(0).cast("long")))
            .groupBy("doc_id")
            .agg(F.sum("bitval").alias("simhash")))


# ----------------------------------------------------------- n-gram Jaccard
def jaccard_pairs(documents: DataFrame, pairs: DataFrame,
                  prefix_len: int = 200, n: int = 5) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (doc_a, doc_b) pairs —
    the verify stage after MinHash-LSH candidate generation."""
    sets_ = (shingles(documents, n, prefix_len)
             .select("doc_id", "shingle").distinct()
             .groupBy("doc_id")
             .agg(F.collect_set("shingle").alias("sh"),
                  F.count("*").alias("n_sh")))
    a = sets_.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                     F.col("n_sh").alias("n_a"))
    b = sets_.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                     F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (pairs.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b",
                    (inter / (F.col("n_a") + F.col("n_b") - inter))
                    .alias("jaccard")))


# ------------------------------------------------------------- text analysis
def token_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring features: token counts, char counts, punctuation and
    mean token length — all JVM column expressions."""
    toks = _tokens_col()
    n_tok = F.size(toks)
    n_char = F.length("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[\w\s]", ""))
    return documents.select(
        "doc_id",
        n_char.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        (n_char / F.greatest(n_tok, F.lit(1))).alias("chars_per_token"),
        (n_punct / F.greatest(n_char, F.lit(1)).cast("double"))
        .alias("punct_ratio"))


def quality_score(documents: DataFrame, lang: str = "en") -> DataFrame:
    """Stopword-ratio + length quality heuristic; score in [0,1]."""
    toks = _tokens_col()
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_tok = F.size(toks)
    n_sw = F.size(F.array_intersect(toks, sw))
    sw_ratio = n_sw / F.greatest(n_tok, F.lit(1)).cast("double")
    len_score = F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
    return documents.select(
        "doc_id", "lang",
        n_tok.alias("n_tokens"),
        sw_ratio.alias("stopword_ratio"),
        ((sw_ratio * 0.5) + (len_score * 0.5)).alias("quality"))


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-list language classifier: argmax over per-language distinct
    stopword hits (deterministic tie-break by language code)."""
    toks = _tokens_col()
    scores = []
    for code, words in sorted(LANG_STOPWORDS.items()):
        sw = F.array([F.lit(w) for w in words])
        scores.append(F.struct(
            F.size(F.array_intersect(toks, sw)).alias("score"),
            # tie-break: later alphabetical wins under greatest() only if
            # strictly greater score — encode as (score, negated rank)
            F.lit(code).alias("lang")))
    # greatest over structs compares score first, then lang string;
    # invert lang for deterministic "first alphabetical wins on ties"
    best = F.greatest(*[
        F.struct(sc["score"].alias("score"),
                 F.lit(-i).alias("pri"),
                 sc["lang"].alias("lang"))
        for i, sc in enumerate(scores)])
    return documents.select("doc_id", F.col("lang").alias("lang_true"),
                            best["lang"].alias("lang_pred"))


def fingerprint(documents: DataFrame) -> DataFrame:
    """Normalization fingerprint: md5 of the lowercased text with all
    non-alphanumerics removed — catches whitespace/punct-only variants."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    return documents.select(
        "doc_id", F.md5(F.encode(norm, "utf-8")).alias("fingerprint"))
