"""PII detection + redaction for training-data pipelines.

Web-crawl corpora leak emails, IP addresses, and phone numbers; the
standard pre-training scrub (e.g. the BigScience ROOTS pipeline,
Laurencon et al. 2022 §3, or Subramani et al. 2023) replaces each
match with a typed placeholder so the downstream tokenizer never sees
the literal.  This module implements that scrub with pure
``regexp_replace``/``regexp_extract_all`` chains — whole-stage
codegen, zero Python, a narrow map with no shuffle, so it runs at
crawl scale as a free rider on any existing scan.

Patterns are deliberately kept inside the common Java-regex / RE2
subset (no lookaround, no backreferences) so the same expressions are
portable to DuckDB/RE2-based oracles and to other engines.

Detection is heuristic by design: the phone pattern in particular
trades precision for recall (any +/digit-led run of >= 8 phone-ish
chars).  Replacement order is fixed — emails first (their local parts
may contain digits), then IPv4 (dotted quads would otherwise be eaten
by the phone pattern), then phones over the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-match counts + the redacted text, all other columns kept.

    Output adds ``n_emails``/``n_ipv4``/``n_phones`` (long) and
    ``clean_text`` (the input with every match replaced by its typed
    placeholder); the original ``text_col`` is dropped.  Counts are
    taken on the same intermediate the corresponding replace runs on,
    so count and replacement can never disagree about a match.
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IPV4_TOKEN)

    def _n(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")

    return docs.select(
        *[c for c in docs.columns if c != text_col],
        _n(t, EMAIL_RE).alias("n_emails"),
        _n(after_email, IPV4_RE).alias("n_ipv4"),
        _n(after_ip, PHONE_RE).alias("n_phones"),
        F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN).alias("clean_text"),
    )
