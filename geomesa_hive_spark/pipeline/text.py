"""Text analysis operators — all pure Catalyst expressions.

Every function here returns a ``Column`` built from ``pyspark.sql.functions``
only: whole-stage codegen applies, nothing crosses into Python at run
time, and each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "normalize_text",
    "token_count",
    "word_tokens",
    "quality_score",
    "gopher_flags",
    "c4_clean",
    "stopword_ratio",
    "punct_ratio",
    "lang_id",
    "fingerprint",
    "repetition_signals",
    "winnowing_fingerprints",
    "redact_pii",
    "tfidf_pairs",
    "top_terms",
    "extract_urls",
    "PII_PATTERNS",
    "LANG_MARKERS",
    "STOPWORDS_EN",
    "chunk_documents",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def normalize_text(col) -> Column:
    """Lowercase + whitespace-collapse + trim: the canonical form used by
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


# THE tokenizer split pattern — word_tokens (SQL side, documents) and
# word_tokens_py (driver side, BM25 query strings) must stay twins, or
# punctuated query terms ("don't", "u.s.") silently stop matching the
# tokens the corpus was indexed with.
WORD_SPLIT_RE = r"\s+"


def word_tokens(col) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(_c(col)), WORD_SPLIT_RE)


def spread_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Input-split parallelism guard for tokenize/hash map stages
    (round 13 — the shared home of dedup's `_spread`): a small parquet
    (one file under maxPartitionBytes) arrives as a single split, so
    any regex-tokenize/md5 map stage projected before a shuffle runs on
    one core no matter how many the cluster has. When the input has
    fewer partitions than the default parallelism, hash-repartition on
    ``key`` BEFORE projecting the expensive expression. At production
    scale inputs carry splits ≫ cores and this is a no-op — the
    conditional keeps the extra shuffle out of the 100 TB plan."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def word_tokens_py(text: str) -> list:
    """Driver-side twin of :func:`word_tokens` — same split pattern, same
    lowercase-at-call-site convention. Used by retrieval's query-string
    tokenizer so a query term is guaranteed to be producible as a
    document token (tokenization parity)."""
    import re

    t = text.strip()
    return [] if not t else re.split(WORD_SPLIT_RE, t)


def token_count(col) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: words plus standalone punctuation — the
    cheap stand-in for a BPE tokenizer's token count."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


# compact high-frequency English function words: enough to separate
# prose (~0.25-0.5 ratio) from keyword spam / boilerplate (~0)
STOPWORDS_EN = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "at", "by", "be", "this", "are", "or",
]


def stopword_ratio(col) -> Column:
    """Fraction of whitespace tokens that are English stopwords — the
    classic fluency signal in quality filters (C4/Gopher-style rules):
    real prose sits around 0.25-0.5, keyword lists and boilerplate near
    0. Returns 0.0 for empty text."""
    c = _c(col)
    toks = word_tokens(F.lower(c))
    n = token_count(c)
    sw = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    """Fraction of characters that are punctuation/symbols (neither
    alphanumeric nor whitespace): high values flag markup, code, or
    OCR noise. Returns 0.0 for empty text."""
    c = _c(col)
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    mean word length band. Deterministic arithmetic only."""
    c = _c(col)
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    toks = token_count(c)
    mean_word = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    len_band = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    word_band = F.when((mean_word >= 3.0) & (mean_word <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round((0.4 * len_band + 0.4 * alpha_ratio + 0.2 * word_band), 6)
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(score)


#: the 8 Gopher "required word" stopwords (Rae et al. 2021, table A1)
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(col) -> Column:
    """The classic Gopher quality-rule battery (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 — the filter set
    RedPajama/Dolma-style pretraining pipelines reuse) as ONE native
    struct expression: seven per-rule booleans plus the overall pass.
    Null text → null struct. Every ratio is a count/count division —
    exact-rational in doubles — so an engine replaying the identical
    arithmetic (the contract oracle) reproduces every flag bit-for-bit.

    - ``wc_ok``: 50 ≤ word count ≤ 100 000
    - ``mwl_ok``: 3 ≤ mean word length ≤ 10
    - ``sym_ok``: (hash signs + ellipses) / words ≤ 0.1
    - ``bullet_ok``: ≤ 90% of lines start with a bullet (-, *, •)
    - ``ell_ok``: ≤ 30% of lines end with an ellipsis
    - ``alpha_ok``: ≥ 80% of words contain an alphabetic character
    - ``stop_ok``: ≥ 2 distinct of the 8 required stopwords
    """
    c = _c(col)
    words = word_tokens(c)
    wc = token_count(c)
    wchars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mwl = F.when(wc > 0, wchars.cast("double") / wc).otherwise(F.lit(0.0))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
        + (F.length(c) - F.length(F.replace(c, F.lit("\u2026"), F.lit(""))))
    )
    sym_ratio = F.when(wc > 0, (n_hash + n_ell).cast("double") / wc).otherwise(F.lit(0.0))
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*\u2022]"))
    )
    n_ell_end = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("\u2026"),
        )
    )
    bullet_ratio = F.when(n_lines > 0, n_bullet.cast("double") / n_lines).otherwise(F.lit(0.0))
    ell_ratio = F.when(n_lines > 0, n_ell_end.cast("double") / n_lines).otherwise(F.lit(0.0))
    n_alpha_w = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(wc > 0, n_alpha_w.cast("double") / wc).otherwise(F.lit(0.0))
    stops = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(w) for w in _GOPHER_STOPS]),
        )
    )
    flags = {
        "wc_ok": (wc >= 50) & (wc <= 100000),
        "mwl_ok": (mwl >= 3.0) & (mwl <= 10.0),
        "sym_ok": sym_ratio <= 0.1,
        "bullet_ok": bullet_ratio <= 0.9,
        "ell_ok": ell_ratio <= 0.3,
        "alpha_ok": alpha_ratio >= 0.8,
        "stop_ok": stops >= 2,
    }
    passed = None
    for v in flags.values():
        passed = v if passed is None else (passed & v)
    st = F.struct(
        *[v.alias(k) for k, v in flags.items()], passed.alias("gopher_pass")
    )
    return F.when(c.isNull(), F.lit(None).cast(
        "struct<wc_ok:boolean,mwl_ok:boolean,sym_ok:boolean,"
        "bullet_ok:boolean,ell_ok:boolean,alpha_ok:boolean,"
        "stop_ok:boolean,gopher_pass:boolean>"
    )).otherwise(st)


def c4_clean(col, min_words: int = 3) -> Column:
    """The classic C4 cleaning battery (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning…", §2.2 — the other canonical
    pretraining filter set beside :func:`gopher_flags`) as ONE native
    struct expression. Line level: keep only lines with >=
    ``min_words`` whitespace words, ending in a terminal punctuation
    mark ('.', '!', '?', '\"', '”'), and not mentioning
    "javascript"; the cleaned text is the kept lines rejoined. Doc
    level: ``has_lorem`` ("lorem ipsum" anywhere, case-insensitive),
    ``has_brace`` (a literal '{'), ``sent_ok`` (>= 3 terminal marks in
    the cleaned text), and the composite ``c4_pass`` = sent_ok AND NOT
    has_lorem AND NOT has_brace. C4's third doc rule — the external
    "List of Dirty, Naughty …" badword list — is input data, not an
    algorithm, so it is the caller's filter to apply on top. Null text
    → null struct; every count is exact integer arithmetic, so an
    engine replaying the identical expressions reproduces each field
    bit-for-bit."""
    c = _c(col)
    lines = F.split(c, "\n")

    def _wc(l):
        return F.size(
            F.filter(F.split(F.trim(l), r"\s+"), lambda t: t != F.lit(""))
        )

    def _terminal(l):
        rt = F.rtrim(l)
        return (
            rt.endswith(".") | rt.endswith("!") | rt.endswith("?")
            | rt.endswith('"') | rt.endswith("”")
        )

    keep_line = lambda l: (
        (_wc(l) >= int(min_words))
        & _terminal(l)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, keep_line)
    clean = F.array_join(kept, "\n")
    n_marks = sum(
        F.length(clean) - F.length(F.replace(clean, F.lit(m), F.lit("")))
        for m in (".", "!", "?")
    )
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    sent_ok = n_marks >= 3
    st = F.struct(
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        clean.alias("clean_text"),
        n_marks.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        sent_ok.alias("sent_ok"),
        (sent_ok & ~has_lorem & ~has_brace).alias("c4_pass"),
    )
    return F.when(c.isNull(), F.lit(None).cast(
        "struct<n_lines:int,n_kept:int,clean_text:string,n_sentences:int,"
        "has_lorem:boolean,has_brace:boolean,sent_ok:boolean,"
        "c4_pass:boolean>"
    )).otherwise(st)


#: marker words per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was", "with"],
    "fr": ["le", "la", "les", "et", "est", "dans"],
    "es": ["el", "los", "las", "es", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有"],
}


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    """How many tokens are marker words of the language."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(col) -> Column:
    """Marker-word-vote language ID over {en,fr,es,de,zh}; 'und' when no
    marker hits. Pure array expressions — SQL-twin-able."""
    toks = word_tokens(F.lower(_c(col)))
    scores = [(lang, _marker_hits(toks, m)) for lang, m in LANG_MARKERS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # first language (in insertion order) achieving the max wins ties:
    # build from the last to the first so earlier langs take precedence
    for lang, s in reversed(scores):
        out = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 exists in both Spark and DuckDB → hash-checkable)."""
    return F.md5(normalize_text(col))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    char k-gram of the normalized text, then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive positions — the
    selected set is robust to small edits (any shared substring of
    length ≥ k+window-1 guarantees a shared fingerprint), which is what
    makes it the standard near-dup/plagiarism sketch.

    Returns the distinct selected set as ``(id_col, fp: bigint)`` rows —
    the join-ready layout for near-dup detection (a per-doc array would
    not stream into an inverted-index join at scale). The per-position
    hash is the same portable md5-prefix code the LSH family uses (a
    Rabin-Karp rolling hash would shave the constant factor but has no
    SQL twin; this stays oracle-verifiable and JVM-side).

    Deliberately row-based, NOT a higher-order-function array pipeline:
    an expression like ``transform(seq, j -> array_min(slice(HASHES, j,
    w)))`` re-evaluates the whole HASHES subtree (every md5) once per
    window position — O(n²) hashing, measured ~100× slower at sf0.01.
    Here each k-gram is hashed exactly once and the sliding minima are
    a single partition-local window pass after one shuffle by doc id.

    Texts shorter than ``k`` yield no rows; shorter than k+window-1,
    one fingerprint (the global minimum)."""
    s = normalize_text(F.col(text_col))
    base = df.select(
        F.col(id_col), s.alias("__s"), (F.length(s) - k + 1).alias("__n")
    ).where(F.col("__n") >= 1)
    pos = base.select(
        id_col,
        "__s",
        "__n",
        F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i"),
    )
    hashed = pos.select(
        id_col,
        "__n",
        "__i",
        F.conv(
            F.substring(F.md5(F.col("__s").substr(F.col("__i"), F.lit(k))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("__hv"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    selected = hashed.withColumn("__wm", F.min("__hv").over(w)).where(
        F.col("__i") <= F.greatest(F.col("__n") - window + 1, F.lit(1))
    )
    return selected.select(F.col(id_col), F.col("__wm").alias("fp")).distinct()


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Within-document repetition quality signals (the Gopher/RefinedWeb
    filter family): the fraction of duplicated word n-grams and the
    fraction claimed by the single most frequent n-gram. High values
    flag boilerplate, keyword stuffing, and template spam — a standard
    pre-training quality gate alongside ``quality_score``.

    Returns ``(id_col, n_grams, dup_frac, top_frac)`` — one row per
    input document; documents with fewer than ``n`` tokens get
    (0, 0.0, 0.0).

    Scale shape: explode to one row per n-gram occurrence (rows =
    tokens per doc, same footprint as the jaccard/winnowing machinery),
    count per (doc, gram) with map-side partial aggregation, then one
    per-doc agg carrying three longs. The shuffle key is the n-gram
    STRING, not a hash, so the DuckDB oracle (which rebuilds the same
    grams) matches bit-for-bit; at 100 TB you would group on
    xxhash64(gram) to shrink shuffle bytes — the one-in-2^64 collision
    risk only perturbs the two ratios, never membership.
    """
    toks = word_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("__t"),
    )
    # sequence(1, size-n+1) would run DESCENDING when size < n — guard first
    grams = base.where(F.size("__t") >= n).select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__t", i, n)),
            )
        ).alias("__g"),
    )
    per_gram = grams.groupBy("__id", "__g").agg(F.count("*").alias("__c"))
    per_doc = per_gram.groupBy("__id").agg(
        F.sum("__c").alias("__total"),
        F.count("*").alias("__distinct"),
        F.max("__c").alias("__mx"),
    )
    out = df.select(F.col(id_col)).join(
        per_doc, F.col(id_col) == F.col("__id"), "left"
    )
    total = F.col("__total").cast("double")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("__total"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(
            F.round(F.lit(1.0) - F.col("__distinct") / total, 6), F.lit(0.0)
        ).alias("dup_frac"),
        F.coalesce(F.round(F.col("__mx") / total, 6), F.lit(0.0)).alias("top_frac"),
    )


#: PII categories in fixed application order. Every pattern is written
#: in the common subset of Java regex (Spark) and RE2 (DuckDB): no
#: lookarounds, no backreferences, ASCII classes — so the same string
#: literal is replayable verbatim in the oracle. Order matters when a
#: match could nest (an IPv4 can appear inside an email's domain), so
#: email runs first. The dotted-quad matcher is deliberately permissive
#: (999.999.999.999 matches): for PII scrubbing, over-redaction is the
#: safe failure mode.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """PII scrubbing for training corpora — fully native (zero Python
    in the hot path): per-category match counts (``pii_<name>``,
    computed on the ORIGINAL text so categories don't steal each
    other's counts), total ``pii_total``, and a ``redacted`` column
    where every match is replaced by ``token``, applying the patterns
    in dict order. Scale: per-row regexp expressions pipeline at scan
    speed with no shuffle; the regex set is a compile-time constant per
    task, not a join against a rules table."""
    pats = patterns if patterns is not None else PII_PATTERNS
    c = _c(text_col)
    out = df
    total = F.lit(0).cast("long")
    for name, pat in pats.items():
        cnt = F.regexp_count(c, F.lit(pat)).cast("long")
        out = out.withColumn(f"pii_{name}", cnt)
        total = total + cnt
    out = out.withColumn("pii_total", total)
    red = c
    for pat in pats.values():
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


#: URL matcher, same Java-regex/RE2 common subset as PII_PATTERNS.
_URL_PATTERN = r"https?://[A-Za-z0-9.-]+(:\d+)?(/[A-Za-z0-9._~%/+-]*)?"
#: host capture relative to a matched URL
_URL_HOST = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Link extraction: one output row per URL occurrence —
    ``(id, url, host)`` — via native ``regexp_extract_all`` + explode.
    Rows with no URLs produce no output (inner explode). Scale: the
    explode is map-side (no shuffle); downstream host-level aggregation
    shuffles only (id, host) pairs, never the documents."""
    c = _c(text_col)
    urls = F.regexp_extract_all(c, F.lit(_URL_PATTERN), 0)
    out = df.select(F.col(id_col), F.explode(urls).alias("url"))
    return out.withColumn("host", F.regexp_extract(F.col("url"), _URL_HOST, 1))


_CANON_TRACKING = "^(utm_[a-z]+|gclid|fbclid|ref)="


def canonicalize_url(col) -> Column:
    """Canonical URL form for URL-keyed dedup (the CommonCrawl-pipeline
    staple: the same page arrives as ``HTTP://Site.com:80/a?utm_x=1&b=2
    #frag`` and ``http://site.com/a?b=2`` — dedup must key on one
    spelling). Rules, all native expressions and exactly replayable in
    SQL:

    1. scheme and host lowercased (path/query case preserved — paths
       are case-sensitive on most servers);
    2. default ports stripped (``:80`` for http, ``:443`` for https);
    3. fragment dropped;
    4. tracking params removed (``utm_*``, ``gclid``, ``fbclid``,
       ``ref``);
    5. remaining query params sorted bytewise (param order is not
       semantic);
    6. empty path normalized to ``/``.

    Non-URL input (no scheme://host match) returns NULL — callers
    filter or coalesce explicitly. Pure per-row expression: no
    shuffle, whole-stage codegen, the canonical key feeds the same
    exact-dedup machinery as content fingerprints."""
    u = _c(col)
    scheme = F.lower(F.regexp_extract(u, r"^(?i)(https?)://", 1))
    host = F.lower(F.regexp_extract(u, r"^(?i)https?://([^/?#]+)", 1))
    host = F.when(
        (scheme == F.lit("http")) & host.endswith(":80"),
        host.substr(F.lit(1), F.length(host) - 3),
    ).when(
        (scheme == F.lit("https")) & host.endswith(":443"),
        host.substr(F.lit(1), F.length(host) - 4),
    ).otherwise(host)
    path = F.regexp_extract(u, r"^(?i)https?://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"^(?i)https?://[^/?#]+[^?#]*\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_CANON_TRACKING),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return F.when((scheme != "") & (host != ""), out)


def tfidf_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_sim: float = 0.3,
    max_df_frac: float = 0.1,
    idf_scale: int = 100,
) -> DataFrame:
    """TF-IDF cosine document similarity via an inverted-index join —
    the classic near-duplicate / related-document pattern, fully native.

    Exactness by construction: IDF is the integer quantization
    ``(N·idf_scale) DIV df`` (no logarithm — no libm), so weights, dot
    products and squared norms are exact 64-bit integer sums whose
    value is independent of Spark's aggregation order, and the only
    floating point is one final ``dot / (√na·√nb)`` from exact integers
    (IEEE sqrt/division are correctly rounded) — which is what lets a
    SQL oracle hash-match the similarity to 6 decimals. Overflow bound:
    |w| ≤ tf·N·idf_scale; with idf_scale=100 a corpus needs tf·N ≈ 9·10¹⁴
    before Σw² threatens int64 — far beyond any per-doc term count.

    Scale: the expensive part is the posting-list self-join on term.
    ``max_df_frac`` removes stop-terms (df > N·frac) BEFORE the join —
    the standard inverted-index pruning that bounds the hottest
    posting list; the shuffle carries (term, id, weight) triples only,
    never documents. Returns (id_a, id_b, sim) with id_a < id_b and
    sim ≥ min_sim."""
    n_docs = df.count()  # bounded driver scalar (like kmeans' k rows)
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(_c(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    max_df = int(n_docs * max_df_frac)
    kept = dfreq.filter(F.col("df") <= F.lit(max_df)).withColumn(
        "idf", F.expr(f"CAST({n_docs} AS BIGINT) * {int(idf_scale)} DIV df")
    )
    w = (
        tf.join(kept.select("term", "idf"), "term")
        .withColumn("w", F.col("tf") * F.col("idf"))
        .select(id_col, "term", "w")
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    a = w.select(
        F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa")
    )
    b = w.select(
        F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm2").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm2").alias("nb"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "sim",
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("sim") >= F.lit(float(min_sim)))
    )
    return out.select("id_a", "id_b", "sim")


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach all text-analysis columns at once."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fp", fingerprint(c))
    )


def top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    max_df_frac: float = 0.5,
    idf_scale: int = 100,
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest-TF·IDF terms
    of every document, (id, term, w, rank) — the tagging/indexing
    staple. Same exactness design as :func:`tfidf_pairs` (integer
    ``(N·idf_scale) DIV df`` IDF, exact integer weights) so the ranked
    set is deterministic under any partitioning; ties break (w DESC,
    term ASC). Stop-terms (df > N·max_df_frac) never rank.

    Scale: two map-side-combined groupBys (tf, df) + one broadcast-
    friendly join on term + a per-doc window — no posting-list
    self-join, strictly cheaper than the pair similarity."""
    n_docs = df.count()  # bounded driver scalar (same note as tfidf_pairs)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(_c(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    max_df = int(n_docs * max_df_frac)
    kept = dfreq.filter(F.col("df") <= F.lit(max_df)).withColumn(
        "idf", F.expr(f"CAST({n_docs} AS BIGINT) * {int(idf_scale)} DIV df")
    )
    w = (
        tf.join(kept.select("term", "idf"), "term")
        .withColumn("w", (F.col("tf") * F.col("idf")).cast("long"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("id").orderBy(F.desc("w"), F.asc("term"))
    )
    return (
        w.withColumn("rank", rnk)
        .filter(F.col("rank") <= int(k))
        .select("id", "term", "w", "rank")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    RAG/embedding-ingest chunker (and the long-document splitter a
    context-bounded training pipeline needs), entirely in native array
    expressions: tokenize once, compute the chunk count with INTEGER
    arithmetic (``1 + ceil((n − chunk)/stride)`` via DIV — no float
    boundary cases), then one ``explode(transform(sequence(...)))``
    emits ``slice``/``array_join`` windows inside whole-stage codegen.
    No shuffle at all: chunking is a per-row flatMap; fan-out is
    ~n/stride rows per document, the number the caller is asking for.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text). The last
    chunk is the remainder window (shorter than ``chunk_tokens``, never
    empty); a document with ≤ ``chunk_tokens`` tokens yields exactly
    one chunk. ``overlap`` must be < ``chunk_tokens``."""
    if not 0 <= int(overlap) < int(chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    chunk, stride = int(chunk_tokens), int(chunk_tokens) - int(overlap)
    base = df.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("toks"),
    ).withColumn("n", F.size("toks"))
    n_chunks = F.expr(
        f"CASE WHEN n <= {chunk} THEN 1 "
        f"ELSE 1 + CAST((n - {chunk} + {stride} - 1) DIV {stride} AS INT) END"
    )
    chunks = F.expr(
        f"transform(sequence(0, __nc - 1), i -> struct("
        f"CAST(i AS BIGINT) AS chunk_id, "
        f"size(slice(toks, i * {stride} + 1, {chunk})) AS n_chunk_tokens, "
        f"array_join(slice(toks, i * {stride} + 1, {chunk}), ' ') AS chunk_text))"
    )
    return (
        base.withColumn("__nc", n_chunks)
        .select("id", F.explode(chunks).alias("c"))
        .select("id", "c.chunk_id", "c.n_chunk_tokens", "c.chunk_text")
    )
