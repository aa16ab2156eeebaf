"""Text-analysis operators for training-data pipelines.

All built from JVM-side ``pyspark.sql.functions`` — tokenization, counts,
ratios, language-ID and fingerprinting are string/array expressions, so
they stay inside whole-stage codegen and scale linearly with no Python
boundary. (The reference has no text surface; this is the north-star
extension of BASELINE.json.)

Every helper returns a Column, so operators compose into any plan and the
same expressions can be mirrored 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword heuristic
# language-ID. Real pipelines use fastText/CLD3; the *engine mechanics*
# (array intersection scoring, argmax across languages) are identical.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
}

# BPE-ish word pattern: runs of alphanumerics OR a single non-space symbol —
# approximates subword pre-tokenization.
TOKEN_REGEX = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


def whitespace_tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on ``\\s+`` after trim)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), "\\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Regex token count approximating BPE pre-tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of whitespace tokens that are stopwords (with multiplicity)."""
    toks = whitespace_tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0, 1]: rewards stopword presence and
    moderate mean word length, penalizes symbol density — the standard
    cheap pre-filter shape (cf. Gopher/C4 quality rules, public papers).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = whitespace_tokens(c)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    mean_wlen = F.length(F.trim(c)) / n_tok
    sw = stopword_ratio(c, LANG_STOPWORDS["en"])
    symbols = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    sym_ratio = symbols / F.greatest(F.length(c), F.lit(1))
    score = (
        F.least(sw * 3.0, F.lit(1.0)) * 0.4
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.3) * 0.3
        + (1.0 - F.least(sym_ratio * 5.0, F.lit(1.0))) * 0.3
    )
    return score


# Fixed priority for language-ID ties; first entry wins a tie.
LANG_PRIORITY = ["en", "es", "de", "fr"]


def lang_hits(text: Column | str, lang: str) -> Column:
    """Distinct-token overlap with one language's stopword list."""
    toks = F.array_distinct(
        whitespace_tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    )
    words = LANG_STOPWORDS[lang]
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def lang_id(text: Column | str) -> Column:
    """Stopword-overlap language guess: the first language in
    ``LANG_PRIORITY`` whose hit count is positive and >= every other
    language's; ``und`` when nothing matches. An explicit CASE chain so
    the DuckDB oracle can mirror the argmax semantics exactly."""
    hits = {lang: lang_hits(text, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        cond = hits[lang] > 0
        for other in LANG_PRIORITY:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def chunk_tokens(
    text: Column | str, width: int = 64, stride: int = 48
) -> Column:
    """Sliding token-window chunking — the context-window preprocessing op
    for LLM training corpora. Returns an array of structs
    ``(chunk_idx, start_token, chunk_text)``; windows start every
    ``stride`` tokens and carry up to ``width`` tokens (the final window
    clamps). Pure array expressions; chunk counts per document are small,
    so the interpreted-HOF cost is negligible here (unlike per-shingle
    hashing — see operators/dedup.py).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), "\\s+")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            s.alias("start_token"),
            F.array_join(F.slice(toks, s + 1, width), " ").alias("chunk_text"),
        ),
    )


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition profile (the Gopher/MassiveText repetition
    filters, public arXiv 2112.11446 §A1.1): token count, distinct-token
    count, the most frequent token and its share. Word-level here — the
    fixture corpus is single-line, so the paper's duplicate-*line*
    fractions degenerate; the engine mechanics (explode -> per-token
    counts -> per-doc aggregate) are identical for any unit.

    Exactly ONE exchange: the documents are hash-partitioned on the doc
    id BEFORE the explode (moving each text once — strictly less data
    than shuffling the exploded tokens), and everything downstream
    inherits it: hashpartitioning(doc) satisfies the clustering
    requirement of the (doc, token) aggregate, and the per-doc windows
    (totals + the deterministic argmax: highest count, ties to the
    lexicographically smallest token) need exactly that partitioning.
    Frozen in CI by ``test_repetition_stats_single_exchange_on_docs``.
    """
    from pyspark.sql import Window

    toks = docs.repartition(F.col(id_col)).select(
        id_col,
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy(id_col)
    ranked = per_tok.select(
        id_col,
        "tok",
        "n",
        F.sum("n").over(w).alias("n_words"),
        F.count("*").over(w).alias("n_unique"),
        F.row_number()
        .over(w.orderBy(F.col("n").desc(), F.col("tok")))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        id_col,
        "n_words",
        "n_unique",
        F.round(F.col("n_unique") / F.col("n_words"), 6).alias("unique_ratio"),
        F.col("tok").alias("top_tok"),
        F.round(F.col("n") / F.col("n_words"), 6).alias("top_share"),
    )


def fingerprint(text: Column | str) -> Column:
    """Key-collision fingerprint: md5 over the sorted distinct lowercase
    token set — the classic OpenRefine/key-collision dedup key; identical
    md5 on the DuckDB side makes it oracle-checkable."""
    toks = F.array_sort(
        F.array_distinct(
            whitespace_tokens(F.lower(F.col(text) if isinstance(text, str) else text))
        )
    )
    return F.md5(F.array_join(toks, " "))


# PII patterns, restricted to syntax that parses identically as a Java
# regex (Spark) and an RE2 regex (DuckDB): character classes, bounded
# repetition, \b word boundaries — no lookaround, no backreferences.
# Order matters: SSN before phone (both are digit-dash shapes; the SSN
# 3-2-4 grouping must win over the phone's 3-3-4), email before phone so
# a digit-heavy local-part is consumed as an email first.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (pre-redaction), one
    ``regexp_extract_all``-length expression per category — all inside
    whole-stage codegen, no Python boundary."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Mask emails / SSNs / phone numbers / IPv4 addresses with typed
    placeholder tags — the standard pre-training scrub (cf. the public
    Dolma/BigCode PII pipelines; real deployments swap in NER models,
    the engine mechanics — a chain of vectorized regex rewrites over the
    corpus — are identical). Chained ``regexp_replace`` stays JVM-side;
    at 100 TB this is a map-only stage with zero shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def heavy_hitters(tokens, col: str, k: int):
    """Exact frequent-items (heavy hitters) at corpus scale: every value
    of ``col`` whose frequency exceeds n/k, WITHOUT a full-vocabulary
    shuffle — the candidate + verify decomposition of the classic
    streaming-sketch problem.

    Phase 1 (candidates): each partition maintains a MISRA-GRIES summary
    of m = k counters (merged batch-at-a-time: add the Arrow batch's
    value_counts, then if more than m counters survive subtract the
    (m+1)-th largest count from all and drop the non-positive — the
    mergeable-summaries form, Agarwal et al. 2012). Total decrement over
    a partition is <= n_p/(m+1), so any value with f_p(x) > n_p/k >=
    n_p/(k+1) still holds a positive counter at partition end and is
    emitted. Any globally heavy value is locally heavy in >= 1 partition
    (pigeonhole: if f(x) > n/k then f_p(x) > n_p/k for some p), so the
    candidate union provably contains every true heavy hitter —
    candidates are partitioning-dependent, but phase 2 makes the OUTPUT
    layout-independent. Per-partition state is O(k + arrow_batch), never
    the partition's distinct vocabulary, and each partition emits AT
    MOST k candidates — the candidate set (and the phase-2 shuffle) is
    bounded by k x partitions under EVERY layout, including
    many-small-partitions where "locally heavy" filters degrade to the
    full vocabulary.

    Phase 2 (verify): exact counts of the (small) candidate set only —
    a broadcast semi-join filter on the token stream feeding one
    map-side-combined aggregate — kept where ``count * k > n`` (integer
    arithmetic, engine-exact). Shuffle volume is O(k x partitions), not
    O(vocabulary x partitions).

    Returns ``(col, cnt)`` for the exact heavy-hitter set.
    """
    n_total = tokens.count()
    cands = mg_candidates(tokens, col, k)
    return (
        tokens.join(F.broadcast(cands.distinct()), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n_total))
    )


def mg_candidates(tokens, col: str, k: int):
    """Phase 1 of ``heavy_hitters``: per-partition Misra-Gries summaries
    of m = k counters; emits the <= k summary keys per partition as the
    provable candidate superset (see ``heavy_hitters``). Exposed so the
    candidate bound — |candidates| <= k x partitions under any layout —
    is directly testable."""
    import pandas as pd

    m = k  # counters; MG error <= n_p/(m+1) < n_p/k keeps heavies alive

    def local_heavy(batches):
        acc: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for t, c in vc.items():
                acc[t] = acc.get(t, 0) + int(c)
            if len(acc) > m:
                # (m+1)-th largest count; at most m values exceed it
                thresh = sorted(acc.values(), reverse=True)[m]
                acc = {t: c - thresh for t, c in acc.items() if c > thresh}
        yield pd.DataFrame({col: pd.Series(list(acc.keys()), dtype="object")})

    return tokens.mapInPandas(local_heavy, schema=f"{col} string")
