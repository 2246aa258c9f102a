"""robots.txt parsing and URL permission evaluation (E95).

A compliant crawler evaluates every frontier url against its host's
robots.txt; at crawl scale that is a JOIN problem, not a per-url
parser call: parse each host's robots payload ONCE into a rule
relation, then join candidate urls by host and apply the RFC 9309
decision — the most specific (longest-path) matching rule wins, allow
beating disallow on equal length; no matching rule means allowed.

Engine subset (documented, deterministic):
- group selection: rules under ``User-agent: *`` (the agent-specific
  override resolution is a per-crawler config concern; the relational
  shape is identical);
- path rules are literal prefixes (the ``*``/``$`` wildcard extension
  is rejected -> rule ignored, matching the conservative reading);
- empty ``Disallow:`` means allow-all (the classic idiom) and
  produces no rule row.

Both stages are pure column work: the parser is a split/filter/
explode over the payload lines (JVM codegen — a robots file is a few
KB, so per-host parsing inside a UDF would also be fine, but the
relational form lets Catalyst prune and broadcast the RULE table,
which is tiny, instead of the payloads).  The decision join is
rule-count bounded per host; the longest-match pick is one
row_number window over (url, rule) candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_rules(robots: DataFrame) -> DataFrame:
    """robots(host, payload) -> (host, rule_path, is_allow) for the
    ``User-agent: *`` group(s)."""
    lines = F.split(F.col("payload"), "\n")
    e = robots.select(
        "host", F.posexplode(lines).alias("ln", "raw")
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    kind = F.when(
        F.lower("line").rlike("^user-agent\\s*:"), F.lit("agent")
    ).when(
        F.lower("line").rlike("^(allow|disallow)\\s*:"), F.lit("rule")
    )
    val = F.trim(F.regexp_replace("line", "^[A-Za-z-]+\\s*:", ""))
    d = e.select(
        "host", "ln", "line", kind.alias("kind"), val.alias("val")
    ).filter(F.col("kind").isNotNull())
    # group tracking: a rule belongs to the most recent agent line(s);
    # last_value of agent over preceding lines gives the active agent
    w = Window.partitionBy("host").orderBy("ln")
    active_agent = F.last(
        F.when(F.col("kind") == "agent", F.lower("val")), ignorenulls=True
    ).over(w)
    rules = (
        d.withColumn("agent", active_agent)
        .filter(
            (F.col("kind") == "rule")
            & (F.col("agent") == "*")
            & (F.col("val") != "")
            & ~F.col("val").contains("*")
            & ~F.col("val").contains("$")
        )
        .select(
            "host",
            F.col("val").alias("rule_path"),
            F.lower("line").startswith("allow").alias("is_allow"),
        )
        .distinct()
    )
    return rules


def evaluate_urls(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """urls(host, path) x rules(host, rule_path, is_allow) ->
    (host, path, matched_rule, allowed).

    Longest matching rule wins; allow beats disallow at equal length;
    no match -> allowed (matched_rule NULL).  The winning rule's
    is_allow equals ``allowed`` whenever matched_rule is non-null, so
    it is not emitted separately (a nullable boolean also round-trips
    differently through pandas in the two engines: None vs NaN)."""
    j = urls.join(rules, "host", "left").withColumn(
        "m",
        F.col("rule_path").isNotNull()
        & F.col("path").startswith(F.col("rule_path")),
    )
    w = Window.partitionBy("host", "path").orderBy(
        F.when(F.col("m"), F.length("rule_path")).otherwise(-1).desc(),
        F.col("is_allow").desc_nulls_last(),
        F.col("rule_path").asc_nulls_last(),
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "host",
            "path",
            F.when(F.col("m"), F.col("rule_path")).alias("matched_rule"),
            F.when(F.col("m"), F.col("is_allow"))
            .otherwise(F.lit(True))
            .alias("allowed"),
        )
    )
    return best


def robots_eval_sql(robots_sql: str, urls_sql: str) -> str:
    """DuckDB twin of parse |> evaluate.  ``robots_sql`` SELECTs
    (host, payload); ``urls_sql`` SELECTs (host, path)."""
    return f"""
WITH rb AS ({robots_sql}),
ru AS ({urls_sql}),
rsplit AS (
  SELECT host, string_split(payload, chr(10)) AS ls FROM rb
),
rpos AS (
  SELECT host, ls, unnest(range(1, len(ls) + 1)) AS ln FROM rsplit
),
lines AS (
  SELECT host, ln - 1 AS ln,
         trim(regexp_replace(ls[ln::INT], '#.*$', '')) AS line
  FROM rpos
),
tagged AS (
  SELECT host, ln, line,
         CASE WHEN regexp_matches(lower(line), '^user-agent\\s*:')
              THEN 'agent'
              WHEN regexp_matches(lower(line), '^(allow|disallow)\\s*:')
              THEN 'rule' END AS kind,
         trim(regexp_replace(line, '^[A-Za-z-]+\\s*:', '')) AS val
  FROM lines
  WHERE CASE WHEN regexp_matches(lower(line), '^user-agent\\s*:')
             THEN 'agent'
             WHEN regexp_matches(lower(line), '^(allow|disallow)\\s*:')
             THEN 'rule' END IS NOT NULL
),
withagent AS (
  SELECT host, ln, line, kind, val,
         last_value(CASE WHEN kind = 'agent' THEN lower(val) END
                    IGNORE NULLS)
           OVER (PARTITION BY host ORDER BY ln
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS agent
  FROM tagged
),
rules AS (
  SELECT DISTINCT host, val AS rule_path,
         lower(line) LIKE 'allow%' AS is_allow
  FROM withagent
  WHERE kind = 'rule' AND agent = '*' AND val <> ''
    AND val NOT LIKE '%*%' AND val NOT LIKE '%$%'
),
j AS (
  SELECT u.host, u.path, r.rule_path, r.is_allow,
         r.rule_path IS NOT NULL
           AND starts_with(u.path, r.rule_path) AS m
  FROM ru u LEFT JOIN rules r ON u.host = r.host
),
ranked AS (
  SELECT host, path, rule_path, is_allow, m,
         row_number() OVER (
           PARTITION BY host, path
           ORDER BY (CASE WHEN m THEN length(rule_path) ELSE -1 END) DESC,
                    is_allow DESC NULLS LAST,
                    rule_path ASC NULLS LAST
         ) AS rn
  FROM j
)
SELECT host, path,
       CASE WHEN m THEN rule_path END AS matched_rule,
       coalesce(CASE WHEN m THEN is_allow END, TRUE) AS allowed
FROM ranked WHERE rn = 1
"""


# -- Sitemap directives (E117) ----------------------------------------
# RFC 9309 §2.3 / sitemaps.org: `Sitemap:` lines are GLOBAL — they sit
# outside user-agent groups, so discovery needs no group tracking, just
# a per-line extraction.  This is the loop-closer between the robots
# channel (E95) and the sitemap channel (E97): a crawler learns WHERE
# the sitemaps are from robots.txt, then E97 parses what they list.

_SITEMAP_LINE_RE = "(?im)^sitemap:[ \\t]*([^ \\t\\r\\n#]+)"


def parse_robots_sitemaps(robots: DataFrame) -> DataFrame:
    """robots(host, payload) -> distinct (host, sitemap_url)."""
    urls = F.regexp_extract_all(
        F.col("payload"), F.lit(_SITEMAP_LINE_RE), F.lit(1)
    )
    return (
        robots.select("host", F.explode(urls).alias("sitemap_url"))
        .distinct()
    )


def parse_robots_sitemaps_sql(robots_sql: str) -> str:
    """DuckDB twin; ``robots_sql`` SELECTs (host, payload)."""
    return f"""
WITH rsm AS ({robots_sql})
SELECT DISTINCT host,
       unnest(regexp_extract_all(payload, '{_SITEMAP_LINE_RE}', 1))
         AS sitemap_url
FROM rsm
"""


# -- Crawl-delay directive (E128) -------------------------------------
# Unlike Sitemap: (E117, global), Crawl-delay is GROUP-SCOPED — it
# binds to the most recent User-agent line, exactly like rules — so
# extraction reuses the E95 group-tracking shape (last agent over line
# order).  The politeness input E83's wave scheduler multiplies by:
# delay in integer MILLISECONDS (seconds accepted with up to 3
# decimals — "0.5" is common in the wild; a float column would drag
# parity, an int never does).  Several delays in one * group: the
# LARGEST wins (conservative politeness).  Non-numeric values are
# dropped.

_DELAY_NUM_RE = "^([0-9]+)(\\.([0-9]{1,3}))?$"


def parse_crawl_delay(robots: DataFrame) -> DataFrame:
    """robots(host, payload) -> (host, delay_ms) for the * group;
    hosts without a valid directive are absent."""
    lines = F.split(F.col("payload"), "\n")
    e = robots.select(
        "host", F.posexplode(lines).alias("ln", "raw")
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    kind = F.when(
        F.lower("line").rlike("^user-agent\\s*:"), F.lit("agent")
    ).when(F.lower("line").rlike("^crawl-delay\\s*:"), F.lit("delay"))
    val = F.trim(F.regexp_replace("line", "^[A-Za-z-]+\\s*:", ""))
    d = e.select(
        "host", "ln", kind.alias("kind"), val.alias("val")
    ).filter(F.col("kind").isNotNull())
    w = Window.partitionBy("host").orderBy("ln")
    active_agent = F.last(
        F.when(F.col("kind") == "agent", F.lower("val")), ignorenulls=True
    ).over(w)
    secs = F.regexp_extract("val", _DELAY_NUM_RE, 1)
    frac_raw = F.regexp_extract("val", _DELAY_NUM_RE, 3)
    # emptiness checked BEFORE rpad ('' would otherwise become '000')
    ms = secs.cast("long") * 1000 + F.when(
        frac_raw == "", F.lit(0)
    ).otherwise(F.rpad(frac_raw, 3, "0").cast("long"))
    return (
        d.withColumn("agent", active_agent)
        .filter(
            (F.col("kind") == "delay")
            & (F.col("agent") == "*")
            & F.col("val").rlike(_DELAY_NUM_RE)
        )
        .groupBy("host")
        .agg(F.max(ms).alias("delay_ms"))
    )


def parse_crawl_delay_sql(robots_sql: str) -> str:
    """DuckDB twin; ``robots_sql`` SELECTs (host, payload)."""
    return f"""
WITH cdr AS ({robots_sql}),
lines AS (
  SELECT host,
         generate_subscripts(string_split(payload, chr(10)), 1) AS ln,
         trim(regexp_replace(
           unnest(string_split(payload, chr(10))), '#.*$', '')) AS line
  FROM cdr
),
kinds AS (
  SELECT host, ln, line,
         CASE WHEN regexp_matches(lower(line), '^user-agent\\s*:')
                THEN 'agent'
              WHEN regexp_matches(lower(line), '^crawl-delay\\s*:')
                THEN 'delay' END AS kind,
         trim(regexp_replace(line, '^[A-Za-z-]+\\s*:', '')) AS val
  FROM lines
),
tracked AS (
  SELECT host, ln, kind, val,
         last_value(CASE WHEN kind = 'agent' THEN lower(val) END
                    IGNORE NULLS)
           OVER (PARTITION BY host ORDER BY ln
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS agent
  FROM kinds WHERE kind IS NOT NULL
)
SELECT host,
       max(regexp_extract(val, '{_DELAY_NUM_RE}', 1)::BIGINT * 1000
           + CASE WHEN regexp_extract(val, '{_DELAY_NUM_RE}', 3) = ''
                  THEN 0
                  ELSE rpad(regexp_extract(val, '{_DELAY_NUM_RE}', 3),
                            3, '0')::BIGINT END) AS delay_ms
FROM tracked
WHERE kind = 'delay' AND agent = '*'
  AND regexp_matches(val, '{_DELAY_NUM_RE}')
GROUP BY host
"""
