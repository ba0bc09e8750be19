"""Text-analysis column expressions for large-scale corpus pipelines:
tokenization, language ID, quality scoring, fingerprinting, shingling.

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs:
at 100 TB a Python UDF here would dominate the job cost. Every
expression is deterministic so results are reproducible run-to-run
and engine-to-engine (DuckDB oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Tokenization / counting
# --------------------------------------------------------------------------

#: a token is a maximal run of non-whitespace (BPE-ish pre-tokenization
#: uses the same boundary); counting these is whitespace token count.
TOKEN_PATTERN = r"\S+"

#: "wordish" tokens: ASCII letter runs, BY DESIGN — word-level
#: operators (vocab, TF-IDF, BM25, BPE word histograms) tokenize
#: space-delimited ASCII text; CJK has no space boundaries and needs a
#: segmenter, which is out of scope, so CJK documents are deliberately
#: invisible to word-level indexing (the char-level operators —
#: char_entropy, doc_lang_id, the quality classes above — are the
#: CJK-aware surface).
WORD_PATTERN = r"[A-Za-z]+"


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/null-safe: '' → 0)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def word_tokens(text: Column) -> Column:
    """Array of lowercase word tokens (letters only)."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_PATTERN), 0)


#: BPE-ish pre-tokenization: contraction suffixes, letter runs, digit
#: runs, punctuation runs, whitespace runs — the GPT-2 pattern family
#: minus lookaheads (kept to the regex subset Java and RE2 evaluate
#: identically, for oracle parity). Counting these approximates
#: subword-tokenizer input segmentation far better than whitespace.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_pretoken_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (null-safe, '' → 0)."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_PATTERN))


def tokens_array(text: Column) -> Column:
    """Array of whitespace tokens. regexp_extract_all (not split):
    split('') yields [''] while extract-all yields [] — the latter is
    correct for empty docs and matches DuckDB's semantics exactly."""
    return F.regexp_extract_all(F.trim(text), F.lit(TOKEN_PATTERN), 0)


def shingles(tokens: Column, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles from a token array.

    Guarded for short docs: fewer than ``n`` tokens → empty array
    (F.sequence would otherwise generate a *descending* range).
    """
    make = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(sep, *[F.element_at(tokens, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(tokens) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


# --------------------------------------------------------------------------
# Language identification (stopword-marker heuristic)
# --------------------------------------------------------------------------

#: distinctive high-frequency markers per language. A real deployment
#: swaps in larger lists or char-n-gram profiles; the operator shape
#: (count markers → argmax with deterministic tiebreak) is the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "fr": ["le", "la", "les", "des", "une", "est", "et"],
    "es": ["el", "los", "las", "una", "es", "y", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "zh": ["的", "是", "在", "了", "和"],
}


#: Unicode-aware character classes, valid with IDENTICAL semantics in
#: Java regex (Spark) and RE2 (DuckDB oracle) — verified on CJK,
#: Cyrillic-adjacent accents, and ASCII. ASCII-only [A-Za-z] / [^\w\s]
#: misclassified every non-ASCII letter as punctuation, collapsing
#: quality_score to ~0 for the CJK documents LANG_MARKERS explicitly
#: supports.
#:
#: Whitespace is spelled EXPLICITLY, not as \s: Java's \s includes
#: vertical tab U+000B, RE2's does not, so a bare \s inside the class
#: would count VT as punctuation in the oracle but not in Spark. The
#: same 1-char divergence latently applies to every bare \s / \S in
#: cross-engine patterns (e.g. the \S+ token splitter); the current
#: testdata contains no VT at any SF and sanitize_text strips control
#: characters, so those sites are safe by corpus invariant — any new
#: class pattern should prefer this explicit spelling.
ALPHA_CHAR_RE = r"\p{L}"
PUNCT_CHAR_RE = "[^\\p{L}\\p{N}_ \\t\\n\\x0B\\f\\r]"


def lang_marker_pattern(lang: str) -> str:
    """Alternation over the language's markers, each escaped and
    boundary-wrapped PER MARKER: ASCII-word markers get \\b (whole-word
    matches); non-ASCII markers are bare — Java and RE2 both implement
    \\b at ASCII \\w transitions only, so a \\b-wrapped CJK marker can
    NEVER match inside pure Chinese text (zh would be undetectable),
    and Chinese is unsegmented so substring counting is the correct
    semantics there. Per-marker (not all-or-nothing) wrapping means a
    future mixed list — say French gaining "été" — cannot silently
    un-word-bound its short ASCII markers ('le' matching inside
    'apple'); re.escape guards against regex metacharacters in a
    marker."""
    import re as _re

    parts = []
    for m in LANG_MARKERS[lang]:
        if _re.fullmatch(r"[A-Za-z0-9_]+", m):
            parts.append(r"\b" + _re.escape(m) + r"\b")
        else:
            parts.append(_re.escape(m))
    return "(" + "|".join(parts) + ")"


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker hit count per language (lowercased input)."""
    low = F.lower(text)
    return {
        lang: F.regexp_count(low, F.lit(lang_marker_pattern(lang)))
        for lang in LANG_MARKERS
    }


def lang_id(text: Column) -> Column:
    """argmax over marker counts; ties break by the fixed language
    order of LANG_MARKERS (first wins) so the result is deterministic.
    Zero hits everywhere → 'und' (undetermined)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features. All ratios are
    per-row arithmetic over exact integer counts → deterministic."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_alpha = F.regexp_count(text, F.lit(ALPHA_CHAR_RE))
    n_punct = F.regexp_count(text, F.lit(PUNCT_CHAR_RE))
    n_stop = F.regexp_count(F.lower(text), F.lit(lang_marker_pattern("en")))
    denom_c = F.when(n_chars > 0, n_chars.cast("double"))
    denom_t = F.when(n_tokens > 0, n_tokens.cast("double"))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / denom_c,
        "punct_ratio": n_punct / denom_c,
        "stopword_ratio": n_stop / denom_t,
        "mean_token_len": n_chars / denom_t,
    }


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: favors alphabetic, stopword-bearing,
    mid-length documents; penalizes punctuation soup. Weights are the
    usual heuristic-filter shape (cf. public C4/Gopher-style rules),
    expressed as one deterministic column expression."""
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.3)
    alpha = F.coalesce(f["alpha_ratio"], F.lit(0.0))
    stop = F.least(F.coalesce(f["stopword_ratio"], F.lit(0.0)) * 4, F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.coalesce(f["punct_ratio"], F.lit(0.0)) * 5
    )
    return F.round(0.4 * alpha + 0.3 * stop + 0.2 * punct_pen + 0.1 * length_ok, 6)


# --------------------------------------------------------------------------
# Sanitization — corpus hygiene before any downstream tokenization.
# Both patterns use syntax valid in Java regex (Spark) AND RE2 (DuckDB
# oracle) so the same strings drive both engines.
# --------------------------------------------------------------------------

# C0 control chars except \t \n \r, plus DEL.
CONTROL_CHARS_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# Zero-width space/non-joiner/joiner and BOM.
ZERO_WIDTH_PATTERN = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"


def sanitize_text(text: Column) -> Column:
    """Strip control and zero-width characters, collapse whitespace
    runs to single spaces, trim. Pure JVM expression chain — runs
    inside whole-stage codegen, no Python in the path."""
    stripped = F.regexp_replace(
        F.regexp_replace(text, CONTROL_CHARS_PATTERN, ""),
        ZERO_WIDTH_PATTERN,
        "",
    )
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------

def normalized_text(text: Column) -> Column:
    """Canonical form for exact-dup detection: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def content_fingerprint(text: Column) -> Column:
    """128-bit hex fingerprint of the normalized text (md5 — available
    and identical in Spark and DuckDB; not a security context)."""
    return F.md5(normalized_text(text))


def hex_to_long(hex15: Column) -> Column:
    """First 15 hex chars (60 bits) → non-negative bigint; the shared
    integer-hash primitive for minhash/simhash/LSH (identical results
    from DuckDB's ``CAST('0x'||... AS BIGINT)``)."""
    return F.conv(hex15, 16, 10).cast("bigint")


def token_hash60(token: Column) -> Column:
    """Deterministic 60-bit hash of a token via md5."""
    return hex_to_long(F.substring(F.md5(token), 1, 15))
