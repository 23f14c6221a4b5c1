"""Vectorized text primitives: normalization, shingling, tokenization,
language-ID, quality scoring, fingerprinting.

All pure Column expressions — these run inside whole-stage codegen and
never cross the JVM/Python boundary, which is what makes them viable in
the hot path of a 100 TB scan. Reference analogue: the per-value
transforms of pysql2neo4j's datatypes.py [recon:], generalized from
scalar casts to text analytics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------ normalize

def norm_text(col: Column | str) -> Column:
    """Normalization contract shared with corpus.normalize_surface:
    lowercase + collapse whitespace + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized string (array<string>)."""
    return F.split(norm_text(col), " ")


def word_tokens(col: Column | str) -> Column:
    """BPE-ish word/punct tokenization: words, numbers, or single
    punctuation marks (approximates subword pre-tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, r"(?=[^\w])|(?<=[^\w])")
    return F.filter(F.transform(arr, lambda s: F.trim(s)), lambda s: s != "")


def char_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct character k-shingles of a string (array<string>).
    Pure builtins: sequence over offsets + substring + array_distinct."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def ngram_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) of normalized text."""
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), cnt - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def positional_ngram_spans(toks: Column, n: int) -> Column:
    """ALL positional word n-gram spans of a token array (array<string>,
    one entry per start position, repeats kept) — the shared span
    window for span-level dedup, boilerplate flagging, and eval-set
    decontamination (operators/dedup.py). Callers must pre-filter
    ``size(toks) >= n``; ``ngram_shingles`` above is the DISTINCT
    variant used by the Jaccard family."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


# ------------------------------------------------------- set similarity

def jaccard(a: Column, b: Column) -> Column:
    """Plain Jaccard |A∩B|/|A∪B| of two array columns."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def containment(a: Column, b: Column) -> Column:
    """Overlap coefficient |A∩B|/min(|A|,|B|) — robust to alias
    abbreviation (a short alias contained in a longer canonical form
    scores ~1.0 where plain Jaccard collapses)."""
    inter = F.size(F.array_intersect(a, b))
    m = F.least(F.size(a), F.size(b))
    return F.when(m > 0, inter.cast("double") / m).otherwise(F.lit(0.0))


def adaptive_containment(a_str: Column, b_str: Column, short_cut: int = 7) -> Column:
    """Length-adaptive shingle containment (standard ER practice): short
    strings carry too few 3-shingles for a dropped-character typo to
    survive, so pairs where the shorter side is <= ``short_cut`` chars
    score on 2-shingles, longer pairs on 3-shingles."""
    short = F.least(F.length(a_str), F.length(b_str)) <= short_cut
    return F.when(
        short, containment(char_shingles(a_str, 2), char_shingles(b_str, 2))
    ).otherwise(containment(char_shingles(a_str, 3), char_shingles(b_str, 3)))


# --------------------------------------------------- document analytics

# Tiny per-language stopword lists for n-gram-heuristic language ID.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "los", "las", "que", "y", "es", "en", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "un", "une", "dans"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"],
}


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: count stopword hits per language over the
    token set, pick argmax (ties -> lexicographically first lang).
    Returns string code; 'und' when nothing matches."""
    toks = tokens(col)
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(_LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


_STOPWORDS_EN = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]


def quality_features(col: Column | str) -> Column:
    """Struct of cheap quality signals: n_chars, n_tokens, mean token
    length, punctuation ratio, stopword ratio, uppercase ratio."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _STOPWORDS_EN])))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        safe(F.length(F.regexp_replace(c, r"\s", "")), n_tokens).alias("mean_token_len"),
        safe(n_punct, n_chars).alias("punct_ratio"),
        safe(n_stop, n_tokens).alias("stopword_ratio"),
        safe(n_upper, n_chars).alias("upper_ratio"),
    )


def token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.size(word_tokens(col))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    normalized text (rolling-hash analogue, order-sensitive)."""
    return F.xxhash64(norm_text(col))


# PII patterns shared by the Spark expressions and the DuckDB oracle —
# kept RE2-compatible (no backrefs/lookarounds) so both engines agree.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_pii(col: Column | str):
    """PII scrubbing for training corpora: emails, phone numbers, and
    SSN-shaped ids replaced with typed placeholders, plus per-type hit
    counts — pure ``regexp_replace``/``regexp_count`` Columns (JVM,
    whole-stage codegen; no UDF). Returns (redacted, n_email, n_phone,
    n_ssn) columns to select alongside the id.

    Order matters: emails first (a phone regex must not eat the digits
    of an e-mail local part after partial replacement)."""
    c = F.col(col) if isinstance(col, str) else col
    counts = {k: F.regexp_count(c, F.lit(p)).cast("long") for k, p in PII_PATTERNS.items()}
    red = c
    for k in ("email", "phone", "ssn"):
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    return (
        red.alias("redacted"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ssn"].alias("n_ssn"),
    )
