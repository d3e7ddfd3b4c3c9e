"""Secret scanning as declarative column expressions.

Pattern registry reproduces the reference's seven compiled regexes,
exclusion patterns, and redaction semantics
(reference graph_core/security/secret_scanner.py:29-90), re-expressed as
`posexplode(split(content)) + rlike` — line-granular, JVM-side, no UDF
(SURVEY.md §2.2 "Secret regex predicates"). The 10 MB / binary-extension
input pruning (secret_scanner.py:226-234) is an explicit pre-filter so
the expensive regex work never sees oversized rows. Findings join back
onto nodes by line containment — a range (theta) join
(reference security/graph_integration.py:128-157).

Java regex here vs Python `re` there: the patterns below use only the
common syntax subset, so match behavior is identical on these patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, confidence, exclude_pattern) — semantics per
# reference secret_scanner.py:29-61
SECRET_PATTERNS: list[tuple[str, str, str, str | None]] = [
    (
        "aws_access_key",
        r"(?i)(aws_access_key_id|aws_secret_access_key|aws_session_token|aws_key)\s*[=:]\s*['\"]([A-Za-z0-9/+=]{20,})['\"]",
        "high",
        None,
    ),
    (
        "generic_api_key",
        r"(?i)(api[_-]?key|api[_-]?secret|app[_-]?key|app[_-]?secret|secret[_-]?key|access[_-]?token)\s*[=:]\s*['\"]([A-Za-z0-9_\-+=/.]{10,})['\"]",
        "medium",
        r"(?i)(YOUR_API_KEY|PLACE_YOUR_KEY_HERE|XXXX)",
    ),
    (
        "generic_secret",
        r"(?i)(secret|token|password|passwd|pwd)\s*[=:]\s*['\"]([A-Za-z0-9_\-+=/.]{8,})['\"]",
        "medium",
        r"(?i)(test|example|dummy|placeholder)",
    ),
    (
        "password_assignment",
        r"(?i)(password|passwd|pwd)\s*=\s*['\"]([^'\"]{4,})['\"](?!\s*\+)",
        "medium",
        r"(?i)(test|example|dummy|placeholder)",
    ),
    ("private_key", r"(?i)(-----BEGIN[ A-Z]*PRIVATE KEY-----)", "high", None),
    (
        "connection_string",
        r"(?i)((?:mongodb|postgresql|mysql|redis|jdbc)://[^\s\"']+:[^\s\"']+@[^\s\"']+)",
        "high",
        None,
    ),
    (
        "jwt_token",
        r"(?i)(eyJ[a-zA-Z0-9_-]{10,}\.[a-zA-Z0-9_-]{10,}\.[a-zA-Z0-9_-]{10,})",
        "medium",
        None,
    ),
]

MAX_CONTENT_BYTES = 10 * 1024 * 1024  # reference secret_scanner.py:226-228
BINARY_EXT_RX = r"\.(pyc|so|dll|exe|bin|jpg|jpeg|png|gif|pdf|zip|tar|gz)$"


def scan_secrets(
    corpus: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, line_number, line, secret_type, confidence) findings."""
    pruned = corpus.filter(
        (F.length(F.col(content_col)) < MAX_CONTENT_BYTES)
        & ~F.col(path_col).rlike(BINARY_EXT_RX)
    )
    lines = pruned.select(
        F.col(path_col).alias("path"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "line"),
    ).select("path", (F.col("pos") + 1).alias("line_number"), "line")

    per_pattern = []
    for name, pattern, confidence, exclude in SECRET_PATTERNS:
        cond = F.col("line").rlike(pattern)
        if exclude:
            cond = cond & ~F.col("line").rlike(exclude)
        per_pattern.append(
            F.when(
                cond,
                F.struct(
                    F.lit(name).alias("secret_type"),
                    F.lit(confidence).alias("confidence"),
                ),
            )
        )
    findings = lines.select(
        "path",
        "line_number",
        "line",
        F.explode(
            F.filter(F.array(*per_pattern), lambda s: s.isNotNull())
        ).alias("f"),
    )
    return findings.select(
        "path", "line_number", "line", "f.secret_type", "f.confidence"
    )


def redact(line_col, keep: int = 2):
    """Mask the middle of a matched secret line's payload
    (reference secret_scanner.py:64-90 masks all but the edges)."""
    n = F.length(line_col)
    return F.when(n <= 2 * keep, F.lit("****")).otherwise(
        F.concat(
            F.substring(line_col, 1, keep),
            F.repeat(F.lit("*"), 8),
            F.substring(line_col, -keep, keep),
        )
    )


def annotate_nodes_with_secrets(nodes: DataFrame, findings: DataFrame) -> DataFrame:
    """Range join: finding.line_number ∈ [node.start_line, node.end_line]
    within the same path (reference graph_integration.py:150-157). The
    path equi-key keeps the theta-join banded per file.

    Each warning struct matches the reference secretWarnings entry shape
    {secretType, lineNumber, snippet, confidence}
    (graph_integration.py:39-46); the snippet is the REDACTED matched
    line — never raw secret text — exactly as the reference stores it.
    """
    f = findings.select(
        F.col("path").alias("f_path"),
        "line_number",
        "secret_type",
        "confidence",
        redact(F.col("line")).alias("snippet"),
    )
    joined = nodes.join(
        f,
        (nodes.path == f.f_path)
        & (f.line_number >= nodes.start_line)
        & (f.line_number <= nodes.end_line),
        "left",
    )
    return joined.groupBy(*[nodes[c] for c in nodes.columns]).agg(
        F.max(F.col("secret_type").isNotNull()).alias("hasSecret"),
        F.collect_list(
            F.when(
                F.col("secret_type").isNotNull(),
                F.struct("secret_type", "line_number", "snippet", "confidence"),
            )
        ).alias("secretWarnings"),
    )
