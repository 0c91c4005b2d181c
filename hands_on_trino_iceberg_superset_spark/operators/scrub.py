"""PII scrubbing for training corpora: detect and redact emails,
phone numbers, and IPv4 addresses in a text column.

100 TB design: pure JVM ``regexp_count`` / ``regexp_replace``
expressions inside whole-stage codegen — zero shuffle, zero Python,
embarrassingly parallel map-side work, exactly like the repetition
rules in :mod:`..queries.curation`. The patterns are deliberately
portable (valid under Java regex, RE2, and PCRE) so the same rules
run identically in Spark, DuckDB (the oracle), and any downstream
engine auditing the redaction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: portable patterns — no lookarounds, no engine-specific classes.
#: EMAIL matches alphabetic-TLD hosts AND raw-IP hosts
#: (user@10.0.0.1) — without the IP-host branch the local part
#: (often firstname.lastname) would survive redaction when only the
#: host gets rewritten by the IP rule.
#: PHONE covers +C[C]- prefixed, bare DDD-DDD[D]-DDDD, and
#: (DDD) DDD-DDDD forms with -/space separators; fully free-form
#: international spacing is out of scope and documented as such.
EMAIL_RE = (
    r"[A-Za-z0-9._%+-]+@"
    r"(?:[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    r"|[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})"
)
PHONE_RE = (
    r"(?:\+[0-9]{1,2}[- ])?"
    r"(?:\([0-9]{3}\)[ ]?|[0-9]{3}[- ])"
    r"[0-9]{3,4}[- ][0-9]{4}"
)
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: applied in this order; email MUST run before IP so
#: "user@10.0.0.1" redacts as one <EMAIL> (the email pattern's
#: IP-host branch claims it first), not as a leaked local part with
#: a redacted host
RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (before redaction)."""
    return {
        f"n_{kind}": F.regexp_count(col, F.lit(pat))
        for kind, pat, _tok in RULES
    }


def redact(col: Column) -> Column:
    """The redacted text: every rule applied in order."""
    out = col
    for _kind, pat, token in RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``<text_col>_redacted`` plus ``n_email`` / ``n_phone`` /
    ``n_ip`` count columns. One projection, no shuffle."""
    col = F.col(text_col)
    cols = [df[c] for c in df.columns]
    cols.append(redact(col).alias(f"{text_col}_redacted"))
    cols.extend(c.alias(n) for n, c in pii_counts(col).items())
    return df.select(*cols)
