"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting, simhash.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen); nothing here crosses the Python boundary per row.
These are north-star extensions beyond the reference's surface (the
reference's only text ops are substring/lowercase matching,
reader.go:138-162,384-393).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace class spelled out to RE2's definition of `\s` (= [\t\n\f\r ]),
# NOT Java's: Java regex additionally counts vertical tab U+000B as \s, so
# a bare `\s+` here would tokenize 'a\x0Bb' as two tokens while every
# DuckDB oracle (RE2) keeps it as one. Engine-portable patterns in this
# module never write `\s` — same policy as BPE_SPLIT_RE / PII_PATTERNS.
WS_CLASS = r"[ \t\n\f\r]"
TOKEN_SPLIT_RE = WS_CLASS + "+"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (split on leading/trailing
    whitespace yields '' entries in both Spark and DuckDB — filtering
    keeps the two engines in lockstep)."""
    return F.filter(F.split(text, TOKEN_SPLIT_RE), lambda x: x != "")


def joined_ngrams(toks: Column, n: int = 3) -> Column:
    """Positional (non-distinct) space-joined word n-grams from an
    already-materialized token array column — one entry per starting
    position, duplicates preserved (what repetition metrics need).

    The token expression is bound ONCE per row as a lambda variable
    (the single-element array_wrap + flatten below): every element_at
    then references a cheap bound attribute, never the original
    expression. Without this, an inline `tokens(text)` argument
    re-runs the regex split once per reference after projection
    collapse — n+2 references x |shingles| per doc, measured as an
    8-18 s cliff at sf0.1 (r9) that a "keep it in a separate select"
    convention did NOT prevent (Generate pushdown / CollapseProject
    still inline it). Binding in the expression itself makes every
    caller safe by construction.

    Spark SQL array indexing is 1-based via element_at; docs shorter
    than n produce an empty array instead of erroring. The off-by-one
    window arithmetic lives HERE only — shingles_from_tokens and the
    repetition metrics both build on this one copy.
    """

    def build(t: Column) -> Column:
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )

    return F.flatten(F.transform(F.array(toks), build))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles (the dedup-operator unit): the
    positional n-grams of joined_ngrams with duplicates collapsed."""
    return F.array_distinct(joined_ngrams(toks, n))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def type_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def avg_token_len(text: Column) -> Column:
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.size(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of the
    whitespace-normalized, lowercased text. Plays the role of the
    reference's content-hash identity (ids.go:16-20) for documents."""
    normalized = F.lower(F.trim(F.regexp_replace(text, TOKEN_SPLIT_RE, " ")))
    return F.sha2(normalized, 256)


# Minimal per-language stopword profiles for the n-gram/stopword
# language-ID heuristic. Deliberately tiny: language ID at 100 TB must
# be a broadcast map-side lookup, not a model inference.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "zh": (),  # script-based, not stopword-based — handled by CJK ratio
}


def lang_id_frame(
    df: DataFrame, text_col: str = "text", out: str = "predicted_lang"
) -> DataFrame:
    """Stopword/script-profile language ID — all input columns plus
    ``out`` = argmax language ('und' when nothing scores > 0).

    Semantics (mirrored verbatim in the text_lang_id oracle): per
    language, score = |lowercased tokens ∩ 10-word profile| /
    greatest(|tokens|, 1) as int/int IEEE double; the zh profile is
    the CJK-codepoint character ratio; ties resolve first-wins in
    profile order.

    Shape (r13 optimization, the a_assoc_rules lesson applied to
    expression TREES): the original Column form inlined the tokenize
    into every profile's filter and re-evaluated the whole score
    array three more times through the argmax (array_max + filter +
    element_at) — ~18 interpreted tokenize+scan passes per row after
    projection collapse, 6.6 s at sf0.1. Here two single-element
    ``explode(array(...))`` Generate barriers pin the token array and
    the score struct as REAL attributes (CollapseProject cannot merge
    across a Generate, so each is computed exactly once per row), and
    the argmax is a codegen'd greatest() + first-wins CASE chain over
    plain double columns: 0.54 s, values bit-identical (same int/int
    divisions on the same counts, same double comparisons)."""
    cols = df.columns
    # The temp columns and the default `out` must not collide with or
    # shadow an input column (ADVICE r13): the function takes an
    # arbitrary df, and a pre-existing `_tok`/`_s` would make the
    # references below ambiguous.
    for reserved in ("_tok", "_s", out):
        if reserved in cols:
            raise ValueError(
                f"lang_id_frame: input already has a column named "
                f"{reserved!r}; rename it or pass a different out="
            )
    t = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    step1 = df.select(*cols, F.explode(F.array(t)).alias("_tok"))
    scores = []
    for lang, words in _LANG_PROFILES.items():
        if words:
            wl = F.array(*[F.lit(w) for w in words])
            score = F.size(
                F.filter(F.col("_tok"), lambda x: F.array_contains(wl, x))
            ) / F.greatest(F.size("_tok"), F.lit(1))
        else:
            cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
            score = cjk / F.greatest(F.length(text_col), F.lit(1))
        scores.append(score.cast("double").alias(f"s_{lang}"))
    step2 = step1.select(*cols, F.explode(F.array(F.struct(*scores))).alias("_s"))
    langs = list(_LANG_PROFILES)
    s = {lang: F.col("_s")[f"s_{lang}"] for lang in langs}
    best = F.greatest(*[s[lang] for lang in langs])
    chain = F.when(s[langs[0]] == best, F.lit(langs[0]))
    for lang in langs[1:]:
        chain = chain.when(s[lang] == best, F.lit(lang))
    return step2.select(
        *cols, F.when(best > 0, chain).otherwise(F.lit("und")).alias(out)
    )


#: SimHash signature width. 60 bits = 15 hex chars of md5, so the same
#: signature is computable in any engine with md5 (Spark:
#: conv(substring(md5(s),1,15),16,10); DuckDB:
#: ('0x'||substr(md5(s),1,15))::BIGINT) — which is what makes the
#: simhash query oracle-checkable bit-for-bit, unlike an
#: xxhash64-seeded variant. 60 bits keeps the same empirical
#: separation as 64 (planted near-dups ≤7 bits apart, noise ≥15 at
#: sf0.01).
SIMHASH_BITS = 60


def simhash64(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """60-bit SimHash over n-gram shingles, fully JVM-side.

    Shape: explode shingles → md5-prefix hash → 60 conditional-sum
    aggregates (one per bit) → reassemble the signature. One shuffle on
    id_col with map-side partial aggregation; no Python UDF, no per-row
    loop. The per-shingle hash is the first 15 hex chars of md5 read as
    an integer — engine-portable (see SIMHASH_BITS), deterministic, and
    a pure function of the shingle set.

    Documents with fewer than ``n`` tokens have NO shingles and are
    deliberately ABSENT from the output (the explicit filter below, not
    an implicit explode side effect): a signature over zero shingles
    would be the constant 0, making every short doc a spurious
    near-duplicate of every other. Same policy as minhash_lsh_pairs'
    n_sh>0 gate — callers that need short docs deduped route them
    through exact fingerprinting instead.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    sh = toked.filter(F.size("toks") >= n).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("toks"), n)).alias("shingle"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    )
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = sh.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# GPT-2-style pre-tokenization pattern, restricted to syntax BOTH Java
# regex (Spark) and RE2 (DuckDB oracle) support — no lookahead, so the
# trailing-space merging of the original pattern is dropped. Contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
# The negated run spells whitespace out per WS_CLASS: `\s` inside it
# would make the Spark and oracle patterns disagree on U+000B.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokens (the units a byte-pair encoder would merge
    within). Token COUNTING at corpus scale needs the splitter, not the
    merges: counts are within a few percent of a real tokenizer and the
    expression stays JVM-side."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)


# PII redaction patterns, restricted to syntax Java regex (Spark) and
# RE2 (DuckDB) evaluate identically — no lookaround, no backrefs.
# Order matters: emails contain dots and digits, so they redact first.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4 addresses / phone-shaped numbers — the
    minimum hygiene pass a training-data pipeline runs before text
    leaves the quarantine zone. Pure JVM regexp_replace chain: fuses
    into the scan, no UDF, and the pattern subset is engine-portable so
    the result is oracle-checkable byte-for-byte."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(text: Column) -> Column:
    """How many PII spans redact_pii would replace — counted on the
    SAME sequential replacement process (pattern i matches the text
    with patterns < i already redacted), so the count always reconciles
    with the redaction. Counting each pattern independently on the raw
    text double-counts overlaps (an email whose local part looks like a
    phone number matches both patterns but is replaced once)."""
    out = F.lit(0)
    running = text
    for pattern, token in PII_PATTERNS:
        out = out + F.regexp_count(running, F.lit(pattern))
        running = F.regexp_replace(running, pattern, token)
    return out


def train_bpe_merges(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
    max_vocab_rows: int = 500_000,
) -> list[tuple[str, str]]:
    """Full BPE merge training over a word-frequency vocabulary:
    repeat n_merges times {count adjacent symbol pairs weighted by word
    frequency, merge the most frequent pair} — the classic algorithm
    (Sennrich et al. 2016), deterministic by (count desc, pair lex asc)
    tie order.

    The DISTRIBUTED part of BPE training is the vocab aggregation the
    caller already did (corpus scan → word counts, sublinear output):
    that is exactly how production tokenizer trainers work — HF
    tokenizers/SentencePiece also run the merge loop in memory over
    word counts, because the loop is sequential by definition (merge k
    changes the pair counts merge k+1 sees) and the vocab is bounded
    by language, not corpus size. The driver-side collect is
    cap-bounded (max_vocab_rows, raises loudly past it) like the
    blocked similarity join's broadcast side; at 100 TB the vocab for
    the merge loop is routinely capped to the top ~1e5 words by
    frequency — pass vocab.orderBy(desc(freq)).limit(...) for that.

    Returns the ordered merge list [(left, right), ...].
    """
    rows = vocab.select(word_col, freq_col).limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; cap it "
            f"first (e.g. .orderBy(F.desc({freq_col!r})).limit(N)) — an "
            "unbounded driver collect is how scale paths die"
        )
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        w, f = r[word_col], int(r[freq_col])
        if w:
            key = tuple(w)
            words[key] = words.get(key, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        a, b = best
        ab = a + b
        for syms, f in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + f
        words = merged
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge list to every document — the inference
    side of train_bpe_merges: lowercase alpha words split to
    characters, merges replayed in training order per word. Returns
    (id_col, n_words, n_syms, n_merged_syms): total symbol count and
    how many emitted symbols are multi-character (i.e. products of a
    merge) — the compression signal a tokenizer-fit report needs.

    Arrow-batched mapInPandas with the merge list broadcast by closure
    (a few KB); per-word encode cost is O(len × n_merges) worst case.
    Map-only: no shuffle at any corpus size.
    """
    import re as _re

    from pyspark.sql.types import LongType, StructField, StructType

    merge_seq = list(merges)
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_words", LongType()),
            StructField("n_syms", LongType()),
            StructField("n_merged_syms", LongType()),
        ]
    )
    word_re = _re.compile(r"[a-z]+")

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        for a, b in merge_seq:
            if len(syms) < 2:
                break
            out: list[str] = []
            i = 0
            ab = a + b
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def batches(it):
        import pandas as pd

        # per-task word->(n_syms, n_merged) cache: encode_word is a
        # pure function of the word, and Zipf makes the distinct-word
        # set per partition tiny next to the occurrence count (the
        # same memo HF tokenizers keeps); cap bounds worst-case memory
        # on adversarial corpora. Measured 3x on the bench corpus.
        cache: dict[str, tuple[int, int]] = {}
        CACHE_CAP = 65536

        def stats_for(w: str) -> tuple[int, int]:
            hit = cache.get(w)
            if hit is None:
                syms = encode_word(w)
                hit = (len(syms), sum(1 for s in syms if len(s) > 1))
                if len(cache) < CACHE_CAP:
                    cache[w] = hit
            return hit

        for pdf in it:
            ids, nw, ns, nm = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall(str(text).lower()) if text is not None else []
                n_syms = 0
                n_merged = 0
                for w in words:
                    s, m = stats_for(w)
                    n_syms += s
                    n_merged += m
                ids.append(rid)
                nw.append(len(words))
                ns.append(n_syms)
                nm.append(n_merged)
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_syms": ns, "n_merged_syms": nm}
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=out_schema)
