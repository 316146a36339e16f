"""PII redaction: replace emails / phone numbers / IPv4 addresses /
SSN-shaped strings with typed placeholder tags, and count what was
redacted (§2.11 extension surface — standard hygiene before a corpus
can be used for training; no reference equivalent).

All JVM-side ``regexp_replace`` / ``regexp_count`` — no UDFs, so the
whole redaction pipeline stays inside whole-stage codegen and is a pure
map (no shuffle; scales linearly with corpus bytes). Patterns avoid
lookaround so the same regex runs unchanged on the DuckDB (RE2) oracle.

Order matters: SSN before phone (an SSN is also a phone-shaped digit
run), IP before phone (dotted quads contain digit runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (tag, pattern) in application order. Kept RE2-compatible (no
# backtracking-only constructs) for oracle portability.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("PHONE", r"\+?[0-9][0-9()\- ]{6,}[0-9]\b"),
]


def redact_text(text: Column) -> Column:
    """Apply every PII pattern in order, replacing matches with [TAG]."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Append ``out_col`` (redacted text) and per-type match counts
    (n_email, n_ssn, n_ip, n_phone).

    Counts are taken on the progressively-redacted text, mirroring the
    replacement order, so overlapping classes are attributed once: an
    SSN inside a sentence is counted as SSN, never double-counted as a
    phone (its digits are already replaced by the time the phone
    pattern runs).
    """
    cols: dict[str, Column] = {}
    cur = F.col(text_col)
    for tag, pat in PII_PATTERNS:
        cols[f"n_{tag.lower()}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, f"[{tag}]")
    cols[out_col] = cur
    return df.withColumns(cols)
