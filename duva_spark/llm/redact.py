"""PII / URL scrubbing for training-corpus preparation.

Pure ``regexp_replace`` / ``regexp_extract_all`` Column expressions —
whole-stage codegen, no UDFs, scan-speed at 100 TB. Patterns are kept to
the regex subset shared by Java (Spark) and RE2 (DuckDB/C4-style
pipelines) so the same constants drive both the engine and its oracle.

Reference scope: the duva reference has no scrubbing stage (it exports
survey data verbatim); this operator family is part of the LLM-pipeline
extension mandated alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Ordered: applied in this sequence (URL first so emails inside URLs are
# not double-counted as both).
PATTERNS: dict[str, tuple[str, str]] = {
    "url": (r"https?://[^\s]+", "[URL]"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}-\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def match_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (codegen regexp_extract_all)."""
    pattern, _ = PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def redact(text: Column, kinds: tuple[str, ...] = tuple(PATTERNS)) -> Column:
    """Replace every match of the selected patterns with its placeholder,
    in PATTERNS order (URL before email, so a URL containing an @ is
    scrubbed as one URL, not an email)."""
    out = text
    for kind in PATTERNS:
        if kind in kinds:
            pattern, placeholder = PATTERNS[kind]
            out = F.regexp_replace(out, pattern, placeholder)
    return out
