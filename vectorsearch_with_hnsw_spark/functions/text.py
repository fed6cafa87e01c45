"""Text-analysis expressions for the training-data-pipeline surface.

All native Catalyst expressions (split / filter / transform / aggregate)
— no Python UDFs — so they run JVM-side at 100 TB. Integer hash
arithmetic is exact (no FP), which keeps the DuckDB oracle hash-stable.

Ops: tokenization, token counting, polynomial document fingerprinting
(rolling hash), word n-gram shingles, MinHash signatures, SimHash,
stopword-vote language ID, and a composite quality score.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007  # prime modulus for the polynomial rolling hash
MINHASH_MOD = 2_147_483_647  # 2^31 - 1, modulus for minhash permutations
# SimHash token hashes need all 48 bits meaningful. A polynomial fold
# alone can't deliver that: short tokens never wrap the modulus (an
# 8-char word stays under 31^7*127 < 2^42), leaving high bits zero and
# collapsing the top Hamming bands into single LSH buckets. So: fold to
# 31 bits, then a square-mix finalizer (h*(h+c1)+c2) mod 2^48 — h^2 is
# < 2^62, exact in any int64 engine, and squaring spreads low bits high.
SIMHASH_MIX_C1 = 0xA5A5  # 42405
SIMHASH_MIX_C2 = 25_214_903_917
SIMHASH_SPACE = 1 << 48


def simhash_token_hash(token: Column) -> Column:
    h = poly_hash(token, mod=MINHASH_MOD)
    return (h * (h + F.lit(SIMHASH_MIX_C1)) + F.lit(SIMHASH_MIX_C2)) % F.lit(SIMHASH_SPACE)

# tiny per-language stopword lists for the n-gram/stopword-vote language
# heuristic; priority order breaks ties deterministically
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "y", "las", "una", "es"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_codes(s: Column) -> Column:
    """Array of ascii codes of a string's characters."""
    return F.transform(
        F.filter(F.split(s, ""), lambda c: c != F.lit("")), lambda c: F.ascii(c)
    )


def poly_hash(s: Column, mod: int = HASH_MOD, mult: int = 31) -> Column:
    """Deterministic polynomial rolling hash over characters:
    ``h = (h*mult + code) % mod`` — exact integer arithmetic, identical in
    any SQL engine. Used for document fingerprints and as the token->int
    map feeding MinHash/SimHash."""
    return F.aggregate(
        char_codes(s),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(mult) + v) % F.lit(mod),
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: rolling hash of lowercased, space-normalized
    text (exact-dedup key that ignores case/whitespace differences)."""
    normalized = F.concat_ws(" ", tokens(F.lower(text)))
    return poly_hash(normalized)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (empty array when fewer than n
    tokens).

    Implemented as a zip of n shifted slices, NOT per-shingle slicing:
    a ``transform(sequence, i -> slice(toks, i+1, n))`` formulation
    re-evaluates the whole tokenization per output element (O(T^2) regex
    work per document — measured 20x slower on real data). Here each
    slice is evaluated once per row and the per-element work is struct
    field access."""
    toks = tokens(F.lower(text))
    if n == 1:
        return toks
    ln = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(n)])
    return F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))


def minhash_exprs(token_hash: Column, num_hashes: int = 8) -> list[Column]:
    """The i-th universal-hash permutation of a token hash:
    ``(a_i*h + b_i) % (2^31-1)`` with fixed odd multipliers. min() of each
    over a document's tokens is the MinHash signature component."""
    out = []
    for i in range(num_hashes):
        a = 2 * i + 1
        b = 7919 * i + 1
        out.append(
            ((F.lit(a) * token_hash + F.lit(b)) % F.lit(MINHASH_MOD)).alias(f"mh{i}")
        )
    return out


def simhash_bit_weight(token_hash: Column, bit: int) -> Column:
    """+1 / -1 contribution of a token to one SimHash bit."""
    return F.when(
        (F.shiftright(token_hash, bit) % F.lit(2)) == F.lit(1), F.lit(1)
    ).otherwise(F.lit(-1))


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens are in the given stopword list."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Stopword-vote language heuristic: score each language by stopword
    hits, pick the max (priority order breaks ties), 'und' when no hits."""
    toks = tokens(F.lower(text))
    scores = {lang: stopword_hits(toks, LANG_STOPWORDS[lang]) for lang in LANG_PRIORITY}
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    expr = F.lit("und")
    # build the CASE from lowest to highest priority so that the highest
    # priority language wins ties
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((scores[lang] > F.lit(0)) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword features + composite quality score.

    Integer counts first, ratios as double divisions of those exact ints —
    deterministic across engines.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    n_stop = stopword_hits(F.transform(toks, F.lower), STOPWORDS_EN)
    nt = n_tok.cast("double")
    nc = n_char.cast("double")
    mean_word_len = F.when(n_tok > 0, n_alpha.cast("double") / nt).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, n_punct.cast("double") / nc).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / nt).otherwise(F.lit(0.0))
    score = (
        F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_tokens": n_tok,
        "n_chars_measured": n_char,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


# PII patterns — deliberately simple, deterministic, and identical to the
# oracle's: the point is the REDACTION OPERATOR SHAPE (map-only regexp
# pass over 100 TB), not regex completeness. Tighten per deployment.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def redact_pii(text: Column) -> dict[str, Column]:
    """Counts + redacted text for the three PII classes. Columns only —
    composes into any projection; zero UDFs."""
    from pyspark.sql import functions as F

    counts = {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE)),
        "n_ips": F.regexp_count(text, F.lit(PII_IP)),
    }
    clean = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    clean = F.regexp_replace(clean, PII_IP, "<IP>")
    return {**counts, "clean_text": clean}


def shingle_hash_array(text: Column, n: int = 3) -> Column:
    """Two-level word n-gram hashes as array<long>: each token
    poly-hashed ONCE, then the n per-token hashes folded with the same
    ``(acc*31 + h) % HASH_MOD`` recurrence per shingle. ~6x less hash
    work than hashing each n-gram string character by character (every
    character would otherwise be folded n times across overlapping
    shingles); the shuffle key downstream is 8 bytes instead of the
    n-gram string. Shared by minhash signatures, n-gram Jaccard, and
    shared-passage span detection."""
    toks = tokens(F.lower(text))
    th = F.transform(toks, lambda t: poly_hash(t))
    ln = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(th, i + 1, ln) for i in range(n)])

    def combine(s):
        acc = F.lit(0).cast("long")
        for j in range(n):
            acc = (acc * F.lit(31) + s[str(j)]) % F.lit(HASH_MOD)
        return acc

    return F.transform(z, combine)


# GPT-2-style pretokenizer, simplified to the subset RE2 (DuckDB) and
# Java regex (Spark) match identically: contraction suffixes, optional-
# space letter runs, digit runs, punctuation runs, whitespace runs. The
# upstream pattern's (?!\S) lookahead is dropped — RE2 has no lookaround
# — which only changes how trailing spaces glue to the next token.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pretokenization (the unit a byte-pair encoder would then
    merge within) — the token-budget currency of real training
    pipelines, where whitespace counts undercount punctuation-heavy
    text. Engine-portable by construction (verified: identical token
    streams from Java regex and RE2 on mixed punctuation/contraction
    input)."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))
