"""PII detection and redaction over document text — a standard stage of a
training-data pipeline (emails / phone numbers -> typed placeholders).

Pure Catalyst regexp expressions (JVM-side, codegen'd): count + replace in
one narrow projection per doc, no shuffle, no UDF — the per-row shape that
holds at 10^12 docs.  The patterns are deliberately engine-portable (valid
and identical under both java.util.regex and RE2) so the DuckDB oracle can
replicate them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email, then every phone, with typed placeholders.
    Email first: a phone-looking digit run inside an email local part is
    consumed by the email token before the phone pass sees it."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
    )


def with_pii_redaction(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id-preserving projection: PII counts, a clean flag, and the
    redacted text (plus its md5, so correctness gates can hash a scalar
    instead of the full text)."""
    t = F.col(text_col)
    out = docs
    for name, col in pii_counts(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("pii_clean", (F.col("n_emails") + F.col("n_phones")) == 0)
        .withColumn("redacted", redact_pii(t))
        .withColumn("redacted_md5", F.md5(F.col("redacted")))
    )
