"""Text-analysis operators for large-scale training-data pipelines over the
`documents` table: token counting, quality scoring, n-gram-heuristic language
ID, and document fingerprinting.

All transforms are JVM-side column expressions (no Python in the hot path),
and every definition is reproducible in ANSI SQL so the driver's DuckDB
oracle can re-derive it exactly:
- tokens(text)  = non-empty pieces of lower(text) split on /\\s+/
- occurrences(s, t) = (len(s) - len(replace(s, t, ''))) / len(t)
- fingerprint   = md5(trim(collapse_ws(lower(text))))
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TEXT_COL = "text"
ID_COL = "doc_id"


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def token_count(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_chars — whitespace tokenization."""
    return docs.select(
        F.col(ID_COL),
        F.size(tokens(F.col(TEXT_COL))).cast("long").alias("n_tokens"),
        F.length(TEXT_COL).cast("long").alias("n_chars"),
    )


def _occurrences(s: Column, needle: str) -> Column:
    return (F.length(s) - F.length(F.replace(s, F.lit(needle), F.lit("")))) / len(needle)


STOPWORDS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " nicht "],
    "fr": [" les ", " une ", " est "],
    "es": [" los ", " una ", " que "],
}


def language_id(docs: DataFrame) -> DataFrame:
    """doc_id, pred_lang — argmax of per-language stopword occurrence counts
    (n-gram heuristic; ties broken by language code ascending; all-zero ->
    'und' i.e. undetermined, BCP-47 style)."""
    padded = F.concat(F.lit(" "), F.lower(F.col(TEXT_COL)), F.lit(" "))
    scores = [
        sum([_occurrences(padded, w) for w in ws], F.lit(0.0)).alias(f"score_{lang}")
        for lang, ws in sorted(STOPWORDS.items())
    ]
    df = docs.select(F.col(ID_COL), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # reversed so earlier langs win ties
        pred = F.when((F.col(f"score_{l}") == best) & (best > 0), F.lit(l)).otherwise(pred)
    return df.select(ID_COL, pred.alias("pred_lang"))


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality metrics per document: length, alpha/digit/space ratios,
    mean token length, and a [0,1] composite `quality_score` (heuristic
    pre-training filter in the Gopher/C4 style)."""
    t = F.col(TEXT_COL)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(t), "[^a-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(t, "[^ ]", "")).cast("double")
    n_tok = F.size(tokens(t)).cast("double")
    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    alpha_ratio = alpha / safe_n
    digit_ratio = digit / safe_n
    space_ratio = space / safe_n
    mean_tok_len = F.when(n_tok > 0, (n - space) / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.when(alpha_ratio > 0.6, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(digit_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_tok >= 10, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return docs.select(
        ID_COL,
        n.alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(quality, 2).alias("quality_score"),
    )


def normalized_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(docs: DataFrame) -> DataFrame:
    """doc_id, fp — md5 of whitespace-normalized lowercased text; the cheap
    canonical-document fingerprint for exact-after-normalization dedup."""
    return docs.select(
        ID_COL, F.md5(F.encode(normalized_text(F.col(TEXT_COL)), "UTF-8")).alias("fp")
    )
