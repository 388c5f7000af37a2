"""PII redaction for training-data pipelines.

Standard ingest hygiene: replace e-mail addresses, phone numbers and IP
addresses with stable placeholder tokens before text reaches training
shards. Pure Catalyst ``regexp_replace`` chains — JVM-side, no UDF, so
the pass rides along any existing scan at 100 TB. (Not a Lucene
reference operator — part of this repo's training-pipeline surface.)

Patterns are deliberately conservative, deterministic and documented —
the goal is a dependable mechanical pass, not NER:

* EMAIL: ``user@host.tld`` shapes
* IP: dotted quads with 1-3 digit octets (over-matches invalid octets
  like 999.1.1.1 — documented; cheap and safe to over-redact)
* PHONE: international/US-ish shapes — ``+1 555 123 4567``,
  ``(555) 123-4567``, ``555-123-4567`` (7+ digits with separators)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = (r"(?<![\d.])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?"
            r"\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\d.])")

_PATTERNS = (("EMAIL", EMAIL_RE), ("IP", IP_RE), ("PHONE", PHONE_RE))


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None,
               kinds: tuple = ("EMAIL", "IP", "PHONE")) -> DataFrame:
    """Redact the selected PII kinds from ``text_col`` (in order EMAIL →
    IP → PHONE, so an e-mail's host is never half-eaten by the phone
    rule) into ``out_col`` (default: in place), adding one
    ``n_<kind>`` count column per kind (pre-replacement match counts —
    the audit trail shard writers keep)."""
    out_col = out_col or text_col
    cur = F.col(text_col)
    counts = []
    for kind, pat in _PATTERNS:
        if kind not in kinds:
            continue
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .alias(f"n_{kind.lower()}"))
    res = df.select("*", *counts)
    cur = F.col(text_col)
    for kind, pat in _PATTERNS:
        if kind not in kinds:
            continue
        cur = F.regexp_replace(cur, pat, f"<{kind}>")
    return res.withColumn(out_col, cur)
