"""URL normalization and domain-level curation for web corpora.

Web-scale pretraining pipelines key almost every curation decision on the
URL: C4 and RefinedWeb dedupe by normalized URL before any content pass,
blocklists and quality priors attach to the *registered domain*, and
per-domain document caps keep a handful of mega-hosts from dominating the
mixture (Gopher §A.2, RefinedWeb §3.1 both report domain-level capping).
The reference engine (``/root/reference/src/temporalscope/``) is a
single-table temporal library with no web columns; this module extends the
engine with the URL primitives such a pipeline needs.

Design constraints (shared with :mod:`temporalscope_spark.operators.pii`):

- **Expression-only**: parsing and normalization are `regexp_extract` /
  higher-order array expressions inside whole-stage codegen — zero Python,
  narrow plans, no shuffle; the full pass costs one projection over the
  corpus regardless of scale.
- **Dialect-portable**: every regex stays in the Java∩RE2 intersection
  (no lookaround, no backreferences) and every array step maps 1:1 onto a
  DuckDB list expression, so the cross-engine oracle runs the SAME
  pattern strings.
- **Deterministic**: normalization is a pure string function; the
  per-domain cap ranks by an md5 hash of the id (partition-invariant), so
  the kept set is a pure function of (rows, cap, seed).

The registered-domain extraction is an explicit BOUNDED approximation of
the Public Suffix List: a compiled alternation over the common two-level
country suffixes, falling back to the last two labels. At production
scale the full PSL is a ~9k-row broadcast join against the reversed host
prefix — the swap is a table, not a redesign; the bounded regex keeps the
default path expression-only and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError

# Tracking parameters stripped by normalize_urls: the cross-site analytics
# keys (plus the utm_ prefix family handled by rule) that make otherwise
# identical pages look distinct to URL-level dedup.
TRACKING_PARAMS: tuple[str, ...] = ("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid")

# Common two-level public suffixes (bounded PSL approximation — see module
# docstring). Kept as data so the regex below is generated, not hand-typed.
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "com.hk", "co.za",
)

# ([^.]+\.(?:co\.uk|...))$ — Java and RE2 both support non-capturing groups
_SLD_RE = (
    r"([^.]+\.(?:"
    + "|".join(s.replace(".", r"\.") for s in SECOND_LEVEL_SUFFIXES)
    + r"))$"
)
_2LABEL_RE = r"([^.]+\.[^.]+)$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_HOST_RE = r"^([^:]*)"
_PORT_RE = r":([0-9]+)$"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def parse_urls(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Decompose ``url_col`` into ``(scheme, host, port, path, query)``
    columns via dialect-portable regexes — one codegen projection, no
    shuffle. Unparseable rows (no ``scheme://host``) get empty-string
    parts; ``port`` is an empty string when absent (kept as string so
    the column is a pure regex capture, engine-identical).
    """
    if url_col not in df.columns:
        raise DataFrameValidationError(f"parse_urls: missing column {url_col!r}")
    u = F.col(url_col)
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    return df.select(
        "*",
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(auth, _HOST_RE, 1)).alias("host"),
        F.regexp_extract(auth, _PORT_RE, 1).alias("port"),
        F.regexp_extract(u, _PATH_RE, 1).alias("path"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("query"),
    )


def _is_tracking(part: Column) -> Column:
    key = F.lower(F.split_part(part, F.lit("="), F.lit(1)))
    return (F.substring(key, 1, 4) == "utm_") | key.isin(*TRACKING_PARAMS)


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
) -> DataFrame:
    """Canonicalize URLs for URL-level dedup (the C4/RefinedWeb
    convention): lowercase the scheme and host, drop the fragment, drop
    default ports (http:80 / https:443), default an empty path to ``/``,
    and strip tracking parameters (the ``utm_*`` family plus
    :data:`TRACKING_PARAMS`) from the query while PRESERVING the order
    of the remaining parameters (re-sorting them would merge URLs that
    real servers may distinguish). Path and query case and percent
    escapes are left untouched for the same reason.

    Pure string expression — one projection, engine- and
    partition-invariant. Rows that do not parse as ``scheme://host...``
    get NULL (callers route them to quarantine, the standard web-corpus
    convention for malformed records).
    """
    if url_col not in df.columns:
        raise DataFrameValidationError(f"normalize_urls: missing column {url_col!r}")
    u = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, _HOST_RE, 1))
    port = F.regexp_extract(auth, _PORT_RE, 1)
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_n = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    query_n = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path_n,
        F.when(query_n == "", F.lit("")).otherwise(F.concat(F.lit("?"), query_n)),
    )
    norm = F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(rebuilt)
    return df.withColumn(out_col, norm)


def registered_domain(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
) -> DataFrame:
    """The registered (pay-level) domain of a hostname — the key that
    blocklists, quality priors, and per-domain caps attach to. Two
    anchored regex captures: the three-label form when the host ends in
    a known two-level country suffix (``example.co.uk``), else the last
    two labels; bare or dotless hosts fall back to the host itself.
    Bounded PSL approximation — see the module docstring for the
    broadcast-join production swap. Expression-only, no shuffle.
    """
    if host_col not in df.columns:
        raise DataFrameValidationError(
            f"registered_domain: missing column {host_col!r}"
        )
    h = F.lower(F.col(host_col))
    sld = F.regexp_extract(h, _SLD_RE, 1)
    two = F.regexp_extract(h, _2LABEL_RE, 1)
    dom = F.when(sld != "", sld).when(two != "", two).otherwise(h)
    return df.withColumn(out_col, dom)


def domain_caps(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: str = "cap",
    keep_rank: bool = False,
) -> DataFrame:
    """Cap the number of documents kept per domain (Gopher / RefinedWeb
    domain capping): within each domain keep ``cap`` documents, chosen
    by an md5 hash of ``(seed, id)`` — a deterministic uniform sample
    that is a pure function of the rows, independent of partitioning
    and of arrival order (re-running on a re-shuffled corpus keeps the
    SAME documents, which downstream incremental stages rely on).

    ONE window partitioned BY domain (hash rank, id tiebreak) — no
    global sort, and Spark plans the ``row_number ≤ cap`` filter as
    WindowGroupLimit, so each domain's partition stream stops ranking
    after ``cap`` rows. Skewed mega-domains bound the per-task work at
    their own row count; at 100 TB the heavy-domain tail is exactly
    what the cap is for.
    """
    if cap < 1:
        raise DataFrameValidationError("domain_caps: cap must be >= 1")
    for c in (domain_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"domain_caps: missing column {c!r}")
    h = F.md5(
        F.concat_ws(
            "\x1f", F.lit(seed), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(domain_col).orderBy(h, F.col(id_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    out = ranked.filter(F.col("_rk") <= cap)
    if keep_rank:
        return out.withColumnRenamed("_rk", "cap_rank")
    return out.drop("_rk")


def domain_stats(
    df: DataFrame,
    domain_col: str,
    size_col: str | None = None,
) -> DataFrame:
    """Per-domain corpus profile: document count, corpus share, and
    (optionally) total/mean of a size column — the table a curation run
    reads to pick its cap and to spot mega-host skew. ONE
    map-side-combinable aggregation plus a 1-row total broadcast into
    the share projection.
    """
    if domain_col not in df.columns:
        raise DataFrameValidationError(f"domain_stats: missing column {domain_col!r}")
    if size_col is not None and size_col not in df.columns:
        raise DataFrameValidationError(f"domain_stats: missing column {size_col!r}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).cast("long").alias("total_size"))
    g = df.groupBy(domain_col).agg(*aggs)
    total = df.count()
    out = g.withColumn(
        "share", F.round(F.col("n_docs") / F.lit(float(total)), 6)
    )
    if size_col is not None:
        out = out.withColumn(
            "mean_size",
            F.round(F.col("total_size") / F.col("n_docs").cast("double"), 6),
        )
    return out
