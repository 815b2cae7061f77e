"""Text-analysis column builders for the documents table.

All pure Catalyst expressions (no Python in the hot path): language-ID
(stopword-marker heuristic), quality scoring (length/punct/stopword
ratios), token counting, document fingerprinting, shingling. Every
builder has deterministic, engine-portable semantics so the DuckDB
oracle can compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram-free lang-ID heuristic.
#: Chosen to be high-frequency and mutually exclusive across languages.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "est", "une"),
    "es": ("el", "los", "que", "es", "una"),
}

STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)

#: Explicit punctuation class — identical regex semantics in Spark and
#: DuckDB (avoid [[:punct:]], whose membership differs per engine).
PUNCT_CLASS = r"""[.,!?;:'"()\[\]{}-]"""


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens. Empty string → empty array."""
    col = F.col(col) if isinstance(col, str) else col
    t = F.split(F.lower(F.trim(col)), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the reference's 'words' measure)."""
    return F.size(tokens(col))


#: BPE-ish subword segmentation: letter runs, digit runs, symbol runs —
#: the class structure of the GPT-2 pre-tokenizer regex minus the
#: lookahead (RE2, DuckDB's engine, has none; keeping the pattern in the
#: common Java∩RE2 subset makes the oracle bit-identical). A real BPE
#: merges within these pieces, so this count upper-bounds BPE tokens
#: with the right shape (prose ≈ words, code/numbers blow up).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Array of BPE-ish subword pieces (pre-merge)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token count — the training-data budget measure."""
    return F.size(bpe_ish_tokens(col))


def char_count(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.length(col)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    col = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column | str,
                   stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(col: Column | str) -> Column:
    """Average token length — a cheap gibberish / boilerplate signal."""
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: long enough, low punct noise,
    plausible stopword density, sane mean word length. The formula is
    arbitrary but fixed — what matters is deterministic portability.
    """
    n_tok = token_count(col)
    length_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.3))
    mlen = mean_token_len(col)
    mlen_ok = F.when((mlen >= 2.5) & (mlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (length_ok * 0.4 + punct_ok * 0.2 + sw_ok * 0.2 + mlen_ok * 0.2)


def lang_score(col: Column | str, lang: str) -> Column:
    """Count of marker-stopword hits for ``lang`` among the tokens."""
    toks = tokens(col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of marker hits, 'und' if all zero.

    Ties break by fixed language order (en, de, fr, es) — strictly-
    greater comparison makes the argmax deterministic and portable.
    """
    scores = [(lang, lang_score(col, lang)) for lang in LANG_MARKERS]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in scores:
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (exact-dup key).

    md5 (not xxhash64) so the DuckDB oracle computes the identical hex.
    """
    return F.md5(normalized_text(col))


#: PII patterns, kept in the Java-regex ∩ RE2 common subset (no
#: lookaround, no backrefs) so Spark and the DuckDB oracle match the
#: identical spans. Greedy quantifiers + character classes only —
#: leftmost-longest (RE2) and leftmost-greedy (Java) coincide here.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+\d{7,15}\b", "[PHONE]"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (email / ipv4 / phone)."""
    col = F.col(col) if isinstance(col, str) else col
    return {kind: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
            for kind, (pat, _) in PII_PATTERNS.items()}


def redact_pii(col: Column | str) -> Column:
    """Text with every PII span replaced by its type tag ([EMAIL] /
    [IP] / [PHONE]) — the pre-training scrub step (applied before
    tokenization so tags survive as single units). Email runs first:
    an address's host part must not be half-eaten by the IP pattern.
    """
    col = F.col(col) if isinstance(col, str) else col
    out = col
    for kind in ("email", "ipv4", "phone"):
        pat, tag = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, tag)
    return out


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles of the normalized text, as an array of strings.

    Documents shorter than n tokens yield their whole text as the one
    shingle (so short docs still participate in near-dup detection).
    """
    toks = F.split(normalized_text(col), " ")
    k = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.when(k >= n + 0, shingled).otherwise(whole)
