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


def l_diversity(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, l: int) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2006) — the
    stronger companion of k-anonymity: a quasi-identifier group that
    is k-anonymous but whose SENSITIVE attribute is (near-)constant
    still leaks it; each group must carry at least ``l`` distinct
    sensitive values.  One row per quasi-identifier group with the
    group size, the exact distinct sensitive count, and the pass
    flag.  One groupBy with exact integer counts — a single shuffle
    on the quasi-identifier key at any scale, the same plan class as
    k_anonymity in this module."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    return (df.groupBy(*[F.col(c) for c in quasi_cols])
              .agg(F.count(F.lit(1)).alias("group_size"),
                   F.countDistinct(F.col(sensitive_col))
                   .alias("n_sensitive"))
              .withColumn("l_diverse",
                          F.col("n_sensitive") >= F.lit(int(l))))
