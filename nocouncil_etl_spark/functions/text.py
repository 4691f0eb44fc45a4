"""Text-analysis scalar kernels (SURVEY.md §2.9 E11 + north-star text
analysis): language-ID heuristic, quality scoring, token counting, document
fingerprinting. Pure column expressions — portable to the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# n-gram/stopword heuristic tables. Tiny on purpose: they ride along in the
# plan (closed over as literals), no broadcast needed; a production table
# would be a broadcast join against a lexicon dimension.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}

TOKEN_RE = "[a-z0-9]+"  # BPE-ish lowercase alnum runs

# P7 keyword set (reference: newscrawler.py:48-57 KEYWORDS list; ours targets
# the synthetic documents vocabulary). Declared order is the report order.
KEYWORDS = ("spark", "query", "window", "stream", "vector")


def _lit_array(vals: tuple[str, ...]) -> Column:
    return F.array(*[F.lit(v) for v in vals])


def stopword_hits(ws: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    sw = _lit_array(STOPWORDS[lang])
    return F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))


def lang_scores(ws: Column) -> dict[str, Column]:
    return {lang: stopword_hits(ws, lang) for lang in STOPWORDS}


def predict_lang(ws: Column) -> Column:
    """Argmax over per-language stopword hits, deterministic tie-break
    (lexicographically last language code wins ties — struct-compare max,
    identical semantics in Spark and DuckDB); 'und' when nothing hits."""
    scores = lang_scores(ws)
    pairs = F.array(
        *[F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
          for lang in sorted(STOPWORDS)]
    )
    best = F.element_at(F.array_sort(pairs), -1)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_bpe_ish(text: Column | str) -> Column:
    """Count of lowercase-alnum runs — a deterministic BPE-ish proxy."""
    arr = F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )
    return F.size(arr)


def quality_features(text: Column | str, ws: Column) -> dict[str, Column]:
    """Length / word-shape / stopword-ratio features for quality filtering
    (the scaled analogue of the reference's min-length + keyword gates,
    newscrawler.py:382-384 / summarize.py:119-121)."""
    n_words = F.size(ws).cast("double")
    mean_wlen = F.aggregate(
        ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    ) / n_words
    en_ratio = stopword_hits(ws, "en").cast("double") / n_words
    uniq_ratio = F.size(F.array_distinct(ws)).cast("double") / n_words
    return {
        "n_words": F.size(ws),
        "mean_word_len": mean_wlen,
        "stopword_ratio": en_ratio,
        "unique_ratio": uniq_ratio,
    }


def quality_score(text: Column | str, ws: Column) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs, plausible word
    lengths, some stopwords, lexical diversity."""
    f = quality_features(text, ws)
    len_ok = F.when((f["n_words"] >= 20) & (f["n_words"] <= 1000), 1.0).otherwise(0.5)
    wlen_ok = F.when((f["mean_word_len"] >= 3.0) & (f["mean_word_len"] <= 10.0), 1.0).otherwise(0.5)
    stop_ok = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    return (len_ok + wlen_ok + stop_ok + f["unique_ratio"]) / 4.0


def fingerprint(ws: Column, gram: int = 5, width: int = 16) -> Column:
    """Rolling-hash document fingerprint: min md5 prefix over ``gram``-word
    windows (winnowing with window = whole doc). Stable under reordering of
    docs, sensitive to content edits."""
    idx = F.sequence(F.lit(1), F.size(ws) - (gram - 1))
    mk = lambda i: F.substring(  # noqa: E731
        F.md5(F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(gram)])), 1, width
    )
    return F.when(F.size(ws) >= gram, F.array_min(F.transform(idx, mk))).otherwise(
        F.substring(F.md5(F.concat_ws(" ", ws)), 1, width)
    )
