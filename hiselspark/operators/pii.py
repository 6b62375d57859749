"""PII detection and scrubbing for training corpora.

Standard curation stage (public pipelines: C4's blocklist pass,
BigScience ROOTS / BigCode StarCoder PII redaction): find and mask
emails, URLs and bare IPv4 addresses before text reaches a trainer.
Everything is JVM-side ``regexp_count`` / ``regexp_replace`` — a pure
map stage, no shuffle, no Python, linear at any corpus size.

The patterns are deliberately RE2-compatible (no backrefs, no
lookaround) so the SAME pattern runs in Spark (Java regex), DuckDB
(RE2) and Go/Rust tooling — the driver gate replays detection AND
scrubbing in DuckDB verbatim, and the masked text must string-match
exactly.  Masking uses fixed-width sentinels (``<EMAIL>``, ``<URL>``,
``<IP>``), the convention the public PII pipelines above use, so
downstream tokenizers see a stable vocabulary item.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# RE2- and Java-compatible; keep in sync with the gate oracle
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_KINDS = (("email", EMAIL_RE, "<EMAIL>"),
          ("url", URL_RE, "<URL>"),
          ("ip", IPV4_RE, "<IP>"))


def pii_counts(col) -> list[Column]:
    """``n_email``, ``n_url``, ``n_ip`` count columns for ``col``."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
            for kind, pat, _ in _KINDS]


def scrub_pii(col) -> Column:
    """Masked text: emails first (an email is not also a URL), then
    URLs, then bare IPv4 (an IP inside a URL is already masked)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in _KINDS:
        c = F.regexp_replace(c, pat, token)
    return c


def with_pii(df: DataFrame, text_col: str = "text",
             scrubbed_col: str = "text_scrubbed") -> DataFrame:
    """Append per-row PII counts and the masked text."""
    return df.select("*", *pii_counts(text_col),
                     scrub_pii(text_col).alias(scrubbed_col))


def k_anonymity(df: DataFrame, quasi_cols: Sequence[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit of a release candidate: group rows by the
    quasi-identifier combination and report, per equivalence class,
    its size and whether it violates the ``k`` floor (a class smaller
    than k re-identifies its members against an external join on the
    same quasi-identifiers — Sweeney 2002).

    Returns one row per equivalence class: (quasi cols…, class_size,
    violates_k).  Callers roll it up to the headline numbers
    (``F.sum(violates)``, min class size) or anti-join the violating
    classes out of the release — both one aggregation away.  Exact
    integer counts; one hash shuffle on the quasi-identifier key, the
    same plan at any scale.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out = (df.groupBy(*quasi_cols)
           .agg(F.count(F.lit(1)).alias("class_size")))
    return out.withColumn("violates_k",
                          F.col("class_size") < F.lit(int(k)))


def l_diversity(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, l: int = 2) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007): per
    quasi-identifier equivalence class, the number of DISTINCT
    sensitive values and whether it violates the ``l`` floor — the
    follow-up to k-anonymity that catches the homogeneous class (50
    people, all with the same diagnosis, is k-anonymous and still
    leaks).  Exact counts, one shuffle.  Returns (quasi cols…,
    class_size, n_sensitive, violates_l)."""
    if l < 1:
        raise ValueError("l must be >= 1")
    out = (df.groupBy(*quasi_cols)
           .agg(F.count(F.lit(1)).alias("class_size"),
                F.countDistinct(F.col(sensitive_col))
                 .alias("n_sensitive")))
    return out.withColumn("violates_l",
                          F.col("n_sensitive") < F.lit(int(l)))


def t_closeness(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, t: float) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) for a
    CATEGORICAL sensitive attribute — the distributional companion of
    k_anonymity and l_diversity in this module: a group can be
    diverse yet still leak if its sensitive distribution differs
    sharply from the table's.  Each quasi-identifier group's
    total-variation distance to the global distribution must be <= t:

        TVD(group) = (1/2) Σⱼ |kⱼ/g − cⱼ/N|
                   = Σⱼ |kⱼ·N − cⱼ·g| / (2·g·N)

    The numerator is an exact int64: categories PRESENT in the group
    contribute |kⱼ·N − cⱼ·g| through the count join, and the absent
    ones contribute cⱼ·g in closed form via Σ_absent cⱼ =
    N − Σ_present cⱼ — no dense group×category table is ever built.
    One (quasi, sensitive) count shuffle, one broadcast of the
    per-category totals, one group-keyed window + rollup; tvd is a
    single mirrored division.  Returns one row per group:
    (quasi..., group_size, tvd_num, tvd, t_close)."""
    from pyspark.sql import Window

    if not (0.0 < float(t) <= 1.0):
        raise ValueError(f"t must be in (0,1], got {t}")
    d = df.filter(F.col(sensitive_col).isNotNull())
    per = (d.groupBy(*[F.col(c) for c in quasi_cols],
                     F.col(sensitive_col).alias("__s"))
            .agg(F.count(F.lit(1)).alias("k_j")))
    glob = (d.groupBy(F.col(sensitive_col).alias("__s"))
             .agg(F.count(F.lit(1)).alias("c_j")))
    tot = glob.agg(F.sum("c_j").alias("N"))
    wg = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    per = per.withColumn("g", F.sum("k_j").over(wg))
    j = per.join(F.broadcast(glob), "__s").join(F.broadcast(tot))
    out = (j.groupBy(*[F.col(c) for c in quasi_cols])
            .agg(F.max("g").alias("group_size"),
                 F.max("N").alias("N"),
                 F.sum(F.abs(F.col("k_j") * F.col("N")
                             - F.col("c_j") * F.col("g")))
                 .alias("present_num"),
                 F.sum("c_j").alias("present_c")))
    tvd_num = (F.col("present_num")
               + F.col("group_size") * (F.col("N")
                                        - F.col("present_c")))
    tvd = (tvd_num.cast("double")
           / (2.0 * F.col("group_size").cast("double")
              * F.col("N").cast("double")))
    return (out.withColumn("tvd_num", tvd_num.cast("long"))
               .withColumn("tvd", tvd)
               .withColumn("t_close", tvd <= F.lit(float(t)))
               .select(*quasi_cols,
                       F.col("group_size").cast("long")
                       .alias("group_size"),
                       "tvd_num", "tvd", "t_close"))


def dp_noisy_counts(df: DataFrame, group_cols: Sequence[str],
                    epsilon: float, seed: int = 0) -> DataFrame:
    """ε-differentially-private count release by the Laplace
    mechanism (Dwork et al. 2006): per group, ``noisy_count =
    count + Laplace(0, 1/ε)`` (a count query has sensitivity 1),
    with the noise drawn through the inverse CDF

        noise = −(1/ε)·sign(u−½)·ln(1 − 2|u−½|),   u ∈ (0,1)

    where u comes from the engine's replayable counter hash of the
    group key (``splits.raw_hash`` mixed through a seed-derived
    Carter-Wegman pair exactly as the bootstrap's 'poly' mode — the
    raw 31-polynomial of short keys is non-uniform in its low bits —
    then scaled with a half-step so u is never 0 or 1).  The
    DETERMINISTIC draw is the point
    for this engine: the release mechanics — sensitivity, scale,
    post-processing floor at 0 — are exactly testable and the SQL
    oracle replays every digit.  A production privacy deployment must
    swap the hash for a real entropy source (a hash of the PUBLISHED
    key alone provides no secrecy); everything else is unchanged.

    One count shuffle on the group key, then map-only expressions.
    Returns (group cols…, n, u, noise, noisy_count, released) where
    ``released = max(round(noisy_count), 0)`` — the standard
    integer-valued post-processed release (post-processing preserves
    ε-DP)."""
    from .bootstrap import cw_constants
    from .splits import raw_hash

    eps = float(epsilon)
    if eps <= 0.0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    per = (df.groupBy(*[F.col(c) for c in group_cols])
             .agg(F.count(F.lit(1)).alias("n")))
    key = F.concat_ws("\x1f",
                      *[F.col(c).cast("string") for c in group_cols])
    a, c = cw_constants(1, int(seed))[0]
    h = ((raw_hash(key) * F.lit(a) + F.lit(c))
         % F.lit((1 << 31) - 1))
    u = ((h % F.lit(1 << 20)).cast("double") + 0.5) / float(1 << 20)
    centered = u - 0.5
    noise = (-(1.0 / eps) * F.signum(centered)
             * F.log(1.0 - 2.0 * F.abs(centered)))
    per = (per.withColumn("u", u)
              .withColumn("noise", noise)
              .withColumn("noisy_count",
                          F.col("n").cast("double") + F.col("noise")))
    released = F.greatest(F.round(F.col("noisy_count"), 0)
                          .cast("long"), F.lit(0).cast("long"))
    return per.select(*group_cols,
                      F.col("n").cast("long").alias("n"),
                      "u", "noise", "noisy_count",
                      released.alias("released"))
