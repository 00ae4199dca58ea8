"""Text-analysis operators for training-data pipelines: tokenization,
shingling, stats/quality scoring, language-ID heuristic, rolling-hash
fingerprinting.

All pure `pyspark.sql.functions` expressions — JVM-side, whole-stage
codegen, no Python in the hot path. At 100 TB these run as narrow
map-only stages over the documents table: no shuffle at all until an
aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

# Small English stopword set for ratio features / lang scoring. Chosen
# to overlap the fixture vocabulary; the operator is the thing under
# test, not the lexicon.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization (split on single spaces — fixture docs
    are single-space separated)."""
    return F.split(F.col(text), " ")


def shingles_col(text: str = "text", n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles as an array column — distinct (set
    semantics, for Jaccard/MinHash) or raw in document order
    (``distinct=False``, for repetition-rate quality filters).

    Built with sequence+transform over the token array (1-indexed
    element_at, matching SQL list semantics) — no explode needed until
    the caller wants one row per shingle.
    """
    toks = tokens_col(text)
    # Guard: Spark's sequence(1, stop) DESCENDS when stop < 1, unlike
    # SQL generate_series which yields empty — short docs must produce
    # an empty shingle set in both engines.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + k).cast("int")) for k in range(n)]),
    )
    return F.array_distinct(gram) if distinct else gram


def shingle_sets_arrow(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sh_set) via an Arrow ``mapInPandas`` kernel — value-identical
    to ``select(id, shingles_col(text, n))`` (pinned by
    tests/test_llm_operators.py) but with deterministic per-row cost.

    Why not the pure-expression form here: ``shingles_col`` is a nest of
    higher-order functions (sequence/transform/element_at/concat_ws),
    which execute on the INTERPRETED expression path inside a codegen'd
    projection. Round 10 measured that path degrading 10–20× at random
    across repeated executions in one session (a 0.6 s shingle pass
    spiking to 11–28 s with zero GC delta — JIT deopt of the megamorphic
    Expression.eval call sites), which poisons every minhash-family
    bench sample. Plain Python string slicing over Arrow batches is
    both faster and immune.

    Exact-equivalence notes (each matched to the expression semantics):
    - tokens: ``str.split(" ")`` == Java ``split(" ", -1)`` — both keep
      leading/consecutive/trailing empty tokens;
    - join: ``" ".join`` == ``concat_ws(" ", ...)`` over non-NULL
      elements;
    - short/NULL docs (fewer than ``n`` tokens, or NULL text) yield the
      EMPTY set, mirroring the size()>=n guard (size(NULL) is -1);
    - dedup: ``dict.fromkeys`` preserves first-occurrence order, same
      as ``array_distinct``.
    """
    import pandas as pd

    out_schema = f"{id_col} {dict(df.dtypes)[id_col]}, sh_set array<string>"

    def gen(batches):
        for pdf in batches:
            sets = []
            for t in pdf[text]:
                if t is None or not isinstance(t, str):
                    sets.append([])
                    continue
                toks = t.split(" ")
                if len(toks) >= n:
                    sets.append(
                        list(
                            dict.fromkeys(
                                " ".join(toks[i : i + n])
                                for i in range(len(toks) - n + 1)
                            )
                        )
                    )
                else:
                    sets.append([])
            yield pd.DataFrame({id_col: pdf[id_col], "sh_set": sets})

    return df.select(id_col, text).mapInPandas(gen, out_schema)


# GPT-2-style pre-tokenizer pattern, simplified to the subset both
# Java regex (Spark) and RE2 (DuckDB) interpret identically: no
# lookarounds, ASCII classes. Groups: contraction suffixes, space+word,
# space+number, space+punctuation-run, whitespace runs. Whitespace is
# an EXPLICIT class, not \s — Java's \s includes \x0B, RE2's does not,
# and that one byte would silently flip counts between the engines.
_WS = " \\t\\n\\r\\x0b\\x0c"
BPE_ISH_PATTERN = rf"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9{_WS}']+|[{_WS}]+"


# ASCII-only case fold: Java (Spark) applies FULL Unicode case mapping
# ('İ' -> 'i' + combining dot, upper('ß') -> 'SS', context-sensitive
# final sigma) while DuckDB's utf8proc applies SIMPLE per-codepoint
# mapping ('İ' -> 'i', 'ß' -> 'ß') — lower()/upper() on non-ASCII text
# silently diverge between the engines (fuzz find, unicode profile:
# 'İstanbul' survived the [a-z0-9] word filter only in DuckDB).
# translate() is a 1:1 codepoint map with identical semantics in both
# engines; non-ASCII passes through untouched on both sides, so every
# cross-engine case-insensitive surface folds ASCII only.
_ASCII_LO = "abcdefghijklmnopqrstuvwxyz"
_ASCII_UP = _ASCII_LO.upper()


def ascii_lower_col(col: Column) -> Column:
    return F.translate(col, _ASCII_UP, _ASCII_LO)


def ascii_upper_col(col: Column) -> Column:
    return F.translate(col, _ASCII_LO, _ASCII_UP)


def sql_ascii_lower(expr: str) -> str:
    """The DuckDB twin of :func:`ascii_lower_col`."""
    return f"translate({expr}, '{_ASCII_UP}', '{_ASCII_LO}')"


def sql_ascii_upper(expr: str) -> str:
    return f"translate({expr}, '{_ASCII_LO}', '{_ASCII_UP}')"


def subword_count_col(text: str = "text") -> Column:
    """BPE-ish token count: number of pre-tokenizer matches on the
    ASCII-case-folded text. A real BPE vocab then splits each match
    into learned merges; match count is the standard cheap proxy for
    token budget in corpus curation (pure JVM regexp_count — no UDF).
    ASCII fold, not lower(): full-vs-simple Unicode case mapping
    diverges between the engines (see ascii_lower_col)."""
    return F.regexp_count(ascii_lower_col(F.col(text)), F.lit(BPE_ISH_PATTERN))


def _nsize(arr: Column) -> Column:
    """NULL-propagating array size: Spark's ``size(NULL)`` returns -1
    (legacy SQL quirk), every DuckDB twin propagates NULL — so a NULL
    document poisoned counts/averages with -1 sentinels (fuzz find,
    tools/fuzz_parity.py nulls profile, the whole text cohort).
    ``nullif(size(x), -1)`` is exact — a real array can never measure
    -1 — and evaluates the (possibly expensive HOF) array expression
    once, unlike a when(isNull) guard."""
    return F.nullif(F.size(arr), F.lit(-1))


def token_count_col(text: str = "text") -> Column:
    return _nsize(tokens_col(text))


def stopword_count_col(text: str = "text", stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    return _nsize(F.filter(tokens_col(text), lambda t: t.isin(*sw)))


def distinct_token_count_col(text: str = "text") -> Column:
    return _nsize(F.array_distinct(tokens_col(text)))


def avg_token_len_col(text: str = "text") -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / _nsize(toks)


def text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-document stats: token count, distinct tokens, char count,
    average token length, stopword ratio, lexical diversity."""
    n_tok = token_count_col(text)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        distinct_token_count_col(text).alias("n_distinct_tokens"),
        F.length(F.col(text)).alias("n_chars_measured"),
        F.round(avg_token_len_col(text), 6).alias("avg_token_len"),
        F.round(stopword_count_col(text).cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(distinct_token_count_col(text).cast("double") / n_tok, 6).alias("lexical_diversity"),
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Composite quality score in [0,1] from length/stopword/diversity
    signals — the standard cheap pre-filter before expensive dedup.

    Formula (deterministic, SQL-expressible): clamp each component then
    average: length_ok (20..400 tokens), diversity, 1-excess stopword
    ratio.
    """
    n_tok = token_count_col(text)
    # NULL text must score NULL, not "wrong length": the bare
    # otherwise(0.0) would swallow a NULL condition (fuzz find)
    length_ok = (
        F.when((n_tok >= 20) & (n_tok <= 400), F.lit(1.0))
        .when(n_tok.isNotNull(), F.lit(0.0))
    )
    diversity = distinct_token_count_col(text).cast("double") / n_tok
    sw_ratio = stopword_count_col(text).cast("double") / n_tok
    sw_ok = F.lit(1.0) - F.least(sw_ratio * 2, F.lit(1.0))
    score = F.round((length_ok + diversity + sw_ok) / 3, 6)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-word language heuristic: score = stopword hits; predict
    'en' above a threshold else 'unknown'. (A production version swaps
    the lexicon per language; the operator shape — token membership
    scoring, argmax — is what scales.)"""
    score = stopword_count_col(text)
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score.alias("en_score"),
        F.when(score >= 3, F.lit("en")).otherwise(F.lit("unknown")).alias("predicted_lang"),
    )


def fingerprint(df: DataFrame, text: str = "text", modulus: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive rolling polynomial hash over tokens — a
    document fingerprint that is stable across engines (pure integer
    arithmetic, no engine hash functions).

    fp = fold(tokens, acc -> (acc*31 + tokval) % m),
    tokval = 7*len(tok) + ascii(first_char).
    """
    toks = tokens_col(text)
    vals = F.transform(toks, lambda t: (F.length(t) * 7 + F.ascii(F.substring(t, 1, 1))).cast("long"))
    fp = F.aggregate(vals, F.lit(0).cast("long"), lambda acc, v: F.pmod(acc * 31 + v, F.lit(modulus)))
    return df.select("doc_id", fp.alias("fingerprint"))


# Redaction patterns restricted to the Java-regex/RE2-common subset
# (no lookarounds, explicit classes) so the DuckDB oracle can run the
# byte-identical pattern text.
PII_EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_PATTERN = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def redact_pii_col(text: str = "text") -> Column:
    """Corpus-curation redaction: emails then phone-like digit runs
    replaced with typed placeholder tags. Pure JVM regexp_replace —
    map-only at scale, composes with any downstream text operator."""
    emailless = F.regexp_replace(F.col(text), PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(emailless, PII_PHONE_PATTERN, "<PHONE>")


def repetition_fraction_col(text: str = "text", n: int = 3) -> Column:
    """Gopher-style repetition rate: 1 - distinct(n-grams)/count(n-grams).
    0.0 for fully novel text, → 1.0 for a document repeating one
    phrase; documents above a threshold are boilerplate/spam. Empty
    shingle lists (short docs) score 0.0.

    PERF: this Column references the shingle-array expression three
    times, and Catalyst does NOT share interpreted-HOF subexpressions
    built inline — each reference re-runs the sequence+transform+concat
    work per row (measured 46s vs 3s at sf0.1). Use
    ``with_repetition_fraction`` for DataFrame pipelines: it projects
    the array once behind a barrier so every reference reads the same
    computed value."""
    raw = shingles_col(text, n, distinct=False)
    return F.when(F.size(raw) > 0,
                  1.0 - F.size(F.array_distinct(raw)).cast("double") / F.size(raw)
                  ).otherwise(F.lit(0.0))


def with_repetition_fraction(
    df: DataFrame, text: str = "text", n: int = 3, out: str = "dup_frac"
) -> DataFrame:
    """Two-step repetition rate: materialize the raw shingle array in
    its own projection (CollapseProject keeps multi-referenced
    non-cheap aliases as a barrier), then compute the fraction from the
    column — the expensive HOF runs once per row instead of three
    times. Output keeps all input columns except ``text`` plus
    ``out``.

    Two perf levers over the naive Column (measured 46s → 13s → ~1s at
    sf0.1):

    - the input is hash-rebalanced across all cores first — a
      single-file fixture otherwise serializes the kernel on one task
      (same rationale as dedup._spread);
    - grams are counted as ``xxhash64(tok_i..tok_{i+n-1})`` LONGS, not
      concatenated strings: Spark's ``array_distinct`` has a hash-set
      fast path ONLY for primitive element types and is O(grams²)
      pairwise comparisons for strings — the dominant cost on long
      repetitive documents. Space-joined grams are injective (tokens
      cannot contain the separator), so the hashed distinct count
      differs from the string distinct count only on a 64-bit
      collision: p ≈ grams²/2⁶⁵ per document, ~1e-9 corpus-wide at
      fixture scale — far below any realistic quality-threshold
      sensitivity (the differential oracle has stayed exact across
      every run).

    Output rows are 1:1 with input rows; the kept (non-text) columns
    must uniquely identify a row (they do for any id-carrying table) —
    the trailing aggregation barrier groups by them.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    keep = [c for c in df.columns if c != text]
    toks = tokens_col(text)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram_h = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(toks, (i + k).cast("int")) for k in range(n)]),
    )
    sh = df.repartition(n_part).select(*keep, gram_h.alias("__sh"))
    frac = F.when(
        F.size("__sh") > 0,
        1.0 - F.size(F.array_distinct("__sh")).cast("double") / F.size("__sh"),
    ).otherwise(F.lit(0.0))
    scored = sh.select(*keep, frac.alias(out))
    # Aggregation barrier: without it, a caller's filter on `out` is
    # pushed below the projection AND the rebalance by
    # PushPredicateThroughNonJoin, inlining the whole HOF tree into a
    # Filter that runs on the raw (often single-partition) scan with
    # split() re-evaluated per array element — measured 13s vs ~1.5s at
    # sf0.1. Predicates cannot cross an Aggregate they reference, and
    # the exchange this adds carries one slim row per document.
    return scored.groupBy(*keep).agg(F.first(out).alias(out))


def bpe_train(df: DataFrame, text: str = "text", n_merges: int = 5) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges from the
    corpus (Sennrich et al. 2016): repeatedly count adjacent symbol
    pairs over the word vocabulary (weighted by word frequency) and
    merge the most frequent pair. Returns one row per learned merge:
    (merge_rank, lhs, rhs, pair_count).

    Scale shape: BPE trains on the VOCABULARY (word, freq), not the
    corpus — one corpus-sized shuffle builds it, after which every
    round is an agg over |vocab| rows. Words are encoded with each
    symbol pipe-wrapped (``'ab' -> '|a||b|'``) so a merge is a plain
    left-to-right global ``replace('|x||y|' -> '|xy|')`` — the
    delimiters anchor symbol boundaries, making adjacent occurrences
    merge greedily without overlap exactly like reference BPE. The
    per-round 1-row argmax collect is control-plane (same pattern as
    the k-means centroid refresh); ``localCheckpoint`` keeps the
    iterated plan O(1) per round.
    """
    # filter the RAW token, then lowercase: the admission test runs on
    # bytes both engines see identically, and lower() on the surviving
    # pure-ASCII words is engine-independent. Filtering AFTER lower()
    # diverged ('İ' full-maps to 'i' + combining dot in Java but
    # simple-maps to plain 'i' in utf8proc, so 'İstanbul' entered only
    # DuckDB's vocabulary — fuzz find, unicode profile). \\A/\\z are
    # Java's true string anchors ($ would also match before a trailing
    # newline, which RE2's regexp_full_match never does).
    words = (
        df.select(F.explode(F.split(F.col(text), " ")).alias("w0"))
        .where(F.col("w0").rlike(r"\A[a-zA-Z0-9]+\z"))
        .groupBy(F.lower(F.col("w0")).alias("w"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    vocab = words.select(
        "freq",
        F.concat(F.lit("|"), F.array_join(chars, "||"), F.lit("|")).alias("s"),
    ).localCheckpoint(eager=True)

    toks = F.expr("filter(split(s, '\\\\|'), x -> x != '')")
    pair_col = F.expr(
        "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
        "(a, b) -> concat(a, ' ', b))"
    )
    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            vocab.withColumn("_t", toks)
            .where(F.size("_t") >= 2)
            .select(F.explode(pair_col).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs = best[0]["pair"].split(" ")
        merges.append((rank, lhs, rhs, int(best[0]["cnt"])))
        old = vocab
        vocab = vocab.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
            ),
        ).localCheckpoint(eager=True)
        old.unpersist(blocking=True)
    vocab.unpersist(blocking=True)
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import local_result

    return local_result(
        df.sparkSession, merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Tokenize with learned BPE merges (the inference half of
    :func:`bpe_train`): per-document word and BPE-token counts.

    Scale shape: the merges are applied to the distinct word VOCABULARY
    (same pipe-anchored replaces as training), which then broadcasts
    back over the exploded corpus — the corpus is touched once and the
    chained-replace work is O(|vocab|·|merges|), not O(corpus). Words
    are admitted by the RAW-token test ([a-zA-Z0-9]+, engine-portable)
    and lowercased after it, exactly like training — see the
    case-mapping note in :func:`bpe_train`.
    """
    words = (
        df.select(F.explode(F.split(F.col(text), " ")).alias("w0"))
        .where(F.col("w0").rlike(r"\A[a-zA-Z0-9]+\z"))
        .select(F.lower(F.col("w0")).alias("w"))
        .distinct()
    )
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    s = F.concat(F.lit("|"), F.array_join(chars, "||"), F.lit("|"))
    for lhs, rhs in merges:
        s = F.replace(s, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|"))
    vocab = (
        words.withColumn("_enc", s)
        .select(
            "w",
            F.size(F.expr("filter(split(_enc, '\\\\|'), x -> x != '')")).alias("nt"),
        )
    )
    exploded = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("w0"))
        .where(F.col("w0").rlike(r"\A[a-zA-Z0-9]+\z"))
        .select(F.col(id_col), F.lower(F.col("w0")).alias("w"))
    )
    return (
        exploded.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").cast("long").alias("n_bpe_tokens"),
        )
    )


def normalize_text_col(col: Column) -> Column:
    """Canonical text normalization as one JVM-side expression chain:
    lowercase → punctuation (anything outside [a-z0-9 space]) → space
    → digit runs masked to the single token "0" → whitespace runs
    collapsed → trim. The standard pre-dedup canonicalizer: exact-hash
    dedup over the normalized form catches case/punct/number variants
    of the same boilerplate.

    ASCII character classes only ([^a-zA-Z0-9 ], [0-9]+, " +") — Java
    regex (Spark) and RE2 (DuckDB) interpret these identically; \\s
    and Unicode classes deliberately avoided (the engines' \\s sets
    differ by \\x0b, the BPE_ISH_PATTERN lesson above). Non-ASCII is
    stripped BEFORE lower(), so the case fold only ever sees ASCII —
    lowering first diverged between Java's full case mapping and
    utf8proc's simple mapping (see ascii_lower_col).
    SQL twin: trim(regexp_replace(regexp_replace(lower(regexp_replace(
    x, '[^a-zA-Z0-9 ]', ' ', 'g')), '[0-9]+', '0', 'g'),
    ' +', ' ', 'g')).
    """
    x = F.regexp_replace(col, "[^a-zA-Z0-9 ]", " ")
    x = F.lower(x)
    x = F.regexp_replace(x, "[0-9]+", "0")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


TRACKING_PARAM_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=", "mc_cid=", "mc_eid=")


def normalize_url_col(col: Column) -> Column:
    """Canonical URL normalization as one JVM-side expression chain —
    the dedup key for web-crawl corpora, where the same page arrives
    as ``HTTPS://WWW.Site.com/a?utm_source=feed&id=1#frag`` and
    ``https://site.com/a?id=1``:

    - scheme and host ASCII-lowercased (case-insensitive per RFC
      3986; non-ASCII host bytes pass through untouched — IDN hosts
      are punycoded upstream of this normalizer, and a full-Unicode
      lower() diverges between the engines, see ascii_lower_col);
      path and query values left as-is (case-significant);
    - a single leading ``www.`` stripped from the host;
    - the fragment dropped;
    - tracking parameters dropped (``utm_*``, ``ref``, ``fbclid``,
      ``gclid``, ``mc_cid``, ``mc_eid`` — the industry-standard
      strip list), remaining params sorted bytewise so parameter
      order never splits a dedup group;
    - the ``?`` dropped entirely when no parameters survive.

    Malformed input (no ``scheme://``) normalizes to NULL rather than
    a half-parsed string — callers can quarantine on it. Pure
    regexp_extract/split/array algebra (whole-stage codegen, map-only);
    ASCII regex classes only, identical under Java regex and RE2, so
    the DuckDB twin is token-for-token (see queries/retrieval_queries2
    SQL_URL_NORMALIZE).
    """
    no_frag = F.regexp_replace(col, "#.*$", "")
    scheme = ascii_lower_col(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = ascii_lower_col(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    def _is_tracking(x: Column) -> Column:
        from functools import reduce

        return reduce(
            lambda a, b: a | b,
            [x.startswith(p) for p in TRACKING_PARAM_PREFIXES],
        )

    kept = F.filter(F.split(query, "&"), lambda x: (x != F.lit("")) & ~_is_tracking(x))
    q = F.array_join(F.array_sort(kept), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(F.lit(None).cast("string"))
