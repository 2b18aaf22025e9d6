"""Public Suffix List registrable-domain extraction (RFC-less but
de-facto standard: https://publicsuffix.org/list/).

The round-8 URL-curation layer shipped a 5-suffix approximation of
the PSL (``webcure._SLD_SUFFIXES``) — good enough for ``co.uk`` but
wrong for ``example.com.au`` (every ``.com.au`` site collapsed into
one registrable domain, so a per-domain cap would throttle an entire
national TLD). This module ships the REAL list — the Mozilla-
maintained ``public_suffix_list.dat`` vendored verbatim under
``spk_sl_validation_spark/data/`` (public data, MPL 2.0; the same
copy Debian and the JDK package) — and implements the full PSL
algorithm:

1. a rule matches a host when the rule's labels are a suffix of the
   host's labels; ``*`` matches exactly one label;
2. exception rules (``!www.ck``) beat all others — the registrable
   domain is the exception rule itself;
3. otherwise the prevailing rule is the one with the MOST labels
   (wildcards count their ``*``), default rule ``*`` when none match;
4. the public suffix is the prevailing rule's match; the registrable
   domain is the public suffix plus one more host label — NULL when
   the host IS a public suffix (``fallback_to_host`` substitutes the
   host so caps/blocklists degrade gracefully).

Spark-first shape: the list is ~9.5k rules whose keys are SHORT
strings, so suffix matching is a cascade of **broadcast hash joins on
exact string keys — zero shuffles, the URL frame stays narrow**. A
rule with k labels can only equal the host's k-label suffix, so one
deduplicated ``(key, is_normal, is_wild, is_exc)`` relation joined
once per candidate depth (≤ 4 for ICANN rules, ≤ 6 with the private
section) resolves every rule kind; prevailing-rule selection and the
final label slice are plain CASE/slice expressions (whole-stage
codegen). No UDF, no explode, no groupBy — a crawl manifest keeps
its partitioning through the lookup.

Matching is exact on the lowercased host labels as given (the list
carries unicode labels); raw unicode hosts convert to their ASCII
A-label form first via :func:`idna_encode_hosts` (stdlib IDNA codec,
Arrow-batched) and then look up normally. Reference:
SL_SPK_Cleansing.py has no URL layer at all; this extends SURVEY.md
§2.6 curation scope.
"""

from __future__ import annotations

import functools
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PSL_PATH = Path(__file__).resolve().parent.parent / "data" / "public_suffix_list.dat"

#: Deepest effective rule depth (labels incl. the wildcard) per section.
_MAX_DEPTH_ICANN = 4
_MAX_DEPTH_FULL = 6


@functools.lru_cache(maxsize=4)
def load_psl_rules(include_private: bool = True) -> tuple:
    """Parse the vendored list into deduplicated
    ``(key, is_normal, is_wild, is_exc)`` tuples.

    ``key`` is the rule with any ``!`` / ``*.`` prefix stripped, so a
    wildcard rule is keyed by its BASE (``*.ck`` → ``ck``) and marks
    ``is_wild``; the same key can simultaneously be a normal rule, a
    wildcard base, and an exception target, hence the flag triple.
    """
    rules: dict[str, list] = {}
    section_private = False
    for raw in PSL_PATH.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if "===BEGIN PRIVATE DOMAINS===" in line:
            section_private = True
        if not line or line.startswith("//"):
            continue
        if section_private and not include_private:
            continue
        if line.startswith("!"):
            key, slot = line[1:], 2
        elif line.startswith("*."):
            key, slot = line[2:], 1
        else:
            key, slot = line, 0
        flags = rules.setdefault(key.lower(), [False, False, False])
        flags[slot] = True
    out = tuple((k, f[0], f[1], f[2]) for k, f in sorted(rules.items()))
    # The join cascade in registrable_domain only probes suffixes up
    # to the _MAX_DEPTH constants; a list refresh adding a deeper rule
    # would otherwise silently under-match. Effective depth = key
    # labels, +1 for a wildcard (it consumes one more host label).
    max_eff = max(k.count(".") + 1 + (1 if wild else 0) for k, _n, wild, _e in out)
    limit = _MAX_DEPTH_FULL if include_private else _MAX_DEPTH_ICANN
    if max_eff > limit:
        raise AssertionError(
            f"public_suffix_list.dat contains a rule of effective depth "
            f"{max_eff} > {limit}; raise _MAX_DEPTH_"
            f"{'FULL' if include_private else 'ICANN'} to match"
        )
    return out


def psl_rules_df(spark: SparkSession, include_private: bool = True) -> DataFrame:
    """The parsed rule relation as a (tiny, broadcastable) DataFrame."""
    return spark.createDataFrame(
        list(load_psl_rules(include_private)),
        "key string, is_normal boolean, is_wild boolean, is_exc boolean",
    )


def host_from_url(norm_url: Column | str) -> Column:
    """host[:port] → host from a normalized URL (port never matches a
    rule key, strip it)."""
    u = F.col(norm_url) if isinstance(norm_url, str) else norm_url
    return F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)


def registrable_domain(
    df: DataFrame,
    host: Column | str,
    out_col: str = "domain",
    include_private: bool = True,
    fallback_to_host: bool = True,
) -> DataFrame:
    """Append ``out_col`` = the PSL registrable domain of ``host``.

    ``host`` is a column (or name) holding a bare lowercase hostname —
    compose with :func:`host_from_url` for URL inputs. Implements the
    full PSL algorithm (module docstring) via one broadcast join per
    candidate suffix depth. Hosts that ARE a public suffix (``ck``,
    ``y.kawasaki.jp`` under ``*.kawasaki.jp``) get NULL, or the host
    itself when ``fallback_to_host`` (the curation-friendly default:
    a cap/blocklist keyed on the fallback still behaves sanely).
    """
    h = F.col(host) if isinstance(host, str) else host
    max_depth = _MAX_DEPTH_FULL if include_private else _MAX_DEPTH_ICANN
    rules = psl_rules_df(df.sparkSession, include_private)

    out = df.withColumn("__parts", F.split(h, r"\."))
    n = F.size("__parts")
    for k in range(1, max_depth + 1):
        out = out.withColumn(
            f"__s{k}",
            F.when(n >= k, F.concat_ws(".", F.slice("__parts", -k, k))),
        )
        r = rules.alias(f"r{k}")
        out = out.join(
            F.broadcast(r),
            on=F.col(f"__s{k}") == F.col(f"r{k}.key"),
            how="left",
        ).select(
            *[c for c in out.columns],
            F.coalesce(F.col(f"r{k}.is_normal"), F.lit(False)).alias(f"__nrm{k}"),
            F.coalesce(F.col(f"r{k}.is_wild"), F.lit(False)).alias(f"__wld{k}"),
            F.coalesce(F.col(f"r{k}.is_exc"), F.lit(False)).alias(f"__exc{k}"),
        )

    # Deepest matching exception rule (exceptions beat everything; the
    # registrable domain IS the exception key's match).
    exc_depth = F.greatest(
        *[
            F.when(F.col(f"__exc{k}"), F.lit(k)).otherwise(F.lit(0))
            for k in range(1, max_depth + 1)
        ]
    )
    # Prevailing non-exception depth: most labels wins; a wildcard
    # base at depth k acts as a (k+1)-label rule and only matches when
    # the host actually has a label under the base; default rule * = 1.
    eff = [F.lit(1)]
    for k in range(1, max_depth + 1):
        eff.append(F.when(F.col(f"__nrm{k}"), F.lit(k)).otherwise(F.lit(0)))
        eff.append(
            F.when(F.col(f"__wld{k}") & (n >= k + 1), F.lit(k + 1)).otherwise(F.lit(0))
        )
    d = F.greatest(*eff)
    reg_len = F.when(exc_depth > 0, exc_depth).otherwise(d + 1)
    reg = F.when(
        n >= reg_len, F.concat_ws(".", F.slice("__parts", -reg_len, reg_len))
    )
    if fallback_to_host:
        reg = F.coalesce(reg, h)
    drop = ["__parts"] + [
        c
        for k in range(1, max_depth + 1)
        for c in (f"__s{k}", f"__nrm{k}", f"__wld{k}", f"__exc{k}")
    ]
    return out.withColumn(out_col, reg).drop(*drop)


# ---------------------------------------------------------------------------
# Fixture generation law (plans/webcure_queries.py web_domain_psl
# replays it): host and EXPECTED registrable domain are both closed-
# form functions of m = doc_id % 10 (c = doc_id % 5 varies the site
# label), so the oracle never runs a PSL lookup — it recomputes the
# answer the publicsuffix.org algorithm must give for each template:
#
#   m  host                         expected domain     exercises
#   0  site{c}.com                  site{c}.com         plain gTLD
#   1  site{c}.com.au               site{c}.com.au      2-label suffix the
#                                                       old approximation
#                                                       collapsed to com.au
#   2  sub.site{c}.co.jp            site{c}.co.jp       co.jp + subdomain
#   3  y{c}.kawasaki.jp             y{c}.kawasaki.jp    *.kawasaki.jp makes
#                                                       the host ITSELF a
#                                                       public suffix →
#                                                       fallback_to_host
#   4  x.y{c}.kawasaki.jp           x.y{c}.kawasaki.jp  wildcard + 1 label
#   5  www.city.kawasaki.jp         city.kawasaki.jp    exception rule
#   6  ck                           ck                  bare wildcard TLD →
#                                                       fallback
#   7  www.ck                       www.ck              !www.ck exception
#   8  shop{c}.blogspot.com         shop{c}.blogspot.com  private section
#   9  a.shop{c}.blogspot.com       shop{c}.blogspot.com  private + subdomain
# ---------------------------------------------------------------------------

PSL_HOST_ORACLE_LAW = """
WITH n AS (
  SELECT doc_id,
         CAST(doc_id % 10 AS INTEGER) AS m,
         CAST(doc_id % 5 AS VARCHAR) AS c
  FROM documents
), h AS (
  SELECT doc_id,
    CASE m
      WHEN 0 THEN 'site' || c || '.com'
      WHEN 1 THEN 'site' || c || '.com.au'
      WHEN 2 THEN 'sub.site' || c || '.co.jp'
      WHEN 3 THEN 'y' || c || '.kawasaki.jp'
      WHEN 4 THEN 'x.y' || c || '.kawasaki.jp'
      WHEN 5 THEN 'www.city.kawasaki.jp'
      WHEN 6 THEN 'ck'
      WHEN 7 THEN 'www.ck'
      WHEN 8 THEN 'shop' || c || '.blogspot.com'
      ELSE 'a.shop' || c || '.blogspot.com'
    END AS host,
    CASE m
      WHEN 0 THEN 'site' || c || '.com'
      WHEN 1 THEN 'site' || c || '.com.au'
      WHEN 2 THEN 'site' || c || '.co.jp'
      WHEN 3 THEN 'y' || c || '.kawasaki.jp'
      WHEN 4 THEN 'x.y' || c || '.kawasaki.jp'
      WHEN 5 THEN 'city.kawasaki.jp'
      WHEN 6 THEN 'ck'
      WHEN 7 THEN 'www.ck'
      WHEN 8 THEN 'shop' || c || '.blogspot.com'
      ELSE 'shop' || c || '.blogspot.com'
    END AS domain
  FROM n
)
"""


def synthesize_psl_host_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, host) under the generation law above. Pure Spark
    expressions — the fixture writer itself is JVM-side."""
    m = F.col(id_col) % 10
    c = (F.col(id_col) % 5).cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("site"), c, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("site"), c, F.lit(".com.au")))
        .when(m == 2, F.concat(F.lit("sub.site"), c, F.lit(".co.jp")))
        .when(m == 3, F.concat(F.lit("y"), c, F.lit(".kawasaki.jp")))
        .when(m == 4, F.concat(F.lit("x.y"), c, F.lit(".kawasaki.jp")))
        .when(m == 5, F.lit("www.city.kawasaki.jp"))
        .when(m == 6, F.lit("ck"))
        .when(m == 7, F.lit("www.ck"))
        .when(m == 8, F.concat(F.lit("shop"), c, F.lit(".blogspot.com")))
        .otherwise(F.concat(F.lit("a.shop"), c, F.lit(".blogspot.com")))
    )
    return docs.select(F.col(id_col), host.alias("host"))


def registrable_domain_py(host: str, include_private: bool = True) -> str | None:
    """Independent in-Python PSL reference (tests only): direct
    transliteration of the publicsuffix.org algorithm over the same
    vendored file, no Spark. Returns None when the host is itself a
    public suffix."""
    labels = host.lower().split(".")
    n = len(labels)
    rules = {k: (nm, wl, ex) for k, nm, wl, ex in load_psl_rules(include_private)}
    exc_depth = 0
    best = 1
    for k in range(1, n + 1):
        key = ".".join(labels[n - k:])
        nm, wl, ex = rules.get(key, (False, False, False))
        if ex:
            exc_depth = max(exc_depth, k)
        if nm:
            best = max(best, k)
        if wl and n >= k + 1:
            best = max(best, k + 1)
    reg_len = exc_depth if exc_depth else best + 1
    if n < reg_len:
        return None
    return ".".join(labels[n - reg_len:])


# ---------------------------------------------------------------------------
# IDNA / punycode host conversion (closes the documented scope gap
# above: raw crawls carry unicode hosts, the PSL matches on ASCII
# A-labels — convert first, then look up)
# ---------------------------------------------------------------------------

IDNA_SCHEMA = "host string, ascii_host string, idna_ok boolean"


def idna_encode_hosts(
    df: DataFrame, host_col: str = "host", out_col: str = "ascii_host"
) -> DataFrame:
    """Append ``out_col`` = the IDNA (punycode) A-label form of a
    unicode hostname (stdlib ``idna`` codec — IDNA 2003, the
    registry-compatible baseline), plus ``idna_ok``. ASCII hosts pass
    through lowercased. Codec failures (empty labels, length
    violations) keep the lowercased original with ``idna_ok=false`` —
    total, like every ingest op here. Arrow-batched map: the codec is
    per-row Python by nature; hosts are short strings, cost is
    per-ROW not per-byte.

    Compose with :func:`registrable_domain`:
    ``registrable_domain(idna_encode_hosts(df), "ascii_host")``."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        fields
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField("idna_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def enc(h):
                if h is None:
                    return None, False
                try:
                    # pre-lower: the stdlib codec nameprep-lowercases
                    # unicode labels but passes ASCII labels through
                    # verbatim ('Example' would stay 'Example')
                    return h.lower().encode("idna").decode("ascii"), True
                except (UnicodeError, ValueError):
                    return h.lower(), False

            res = pdf[host_col].apply(enc)
            pdf = pdf.copy()
            pdf[out_col] = res.apply(lambda t: t[0])
            pdf["idna_ok"] = res.apply(lambda t: t[1])
            yield pdf

    return df.mapInPandas(run, out_schema)


# Fixture law (web_idna_hosts replays it): m = doc_id % 4 picks the
# host; expected A-label forms are fixed strings (verified against
# the stdlib codec):
#   0: plain<c>.com           -> plain<c>.com            (ascii)
#   1: bücher<c>.example      -> xn--bcher<c>-3ya.example
#   2: müller.de              -> xn--mller-kva.de
#   3: 日本.jp                 -> xn--wgv71a.jp
# (c = doc_id % 5; note m=1's punycode tail is -3ya, not -kva: the
# trailing digit shifts the encoded insertion offset.)


def synthesize_idna_host_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, host) under the law above."""
    m = F.col(id_col) % 4
    c = (F.col(id_col) % 5).cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("plain"), c, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("bücher"), c, F.lit(".example")))
        .when(m == 2, F.lit("müller.de"))
        .otherwise(F.lit("日本.jp"))
    )
    return docs.select(F.col(id_col), host.alias("host"))
