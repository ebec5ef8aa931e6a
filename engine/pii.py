"""PII detection / redaction — the scrubbing pass a training-data
pipeline runs before any corpus leaves quarantine (emails and phone
numbers here; the pattern table is the extension point).

The reference has no PII analog (SURVEY.md §2.2); this is SURVEY §2.5
training-data infrastructure. The patterns are deliberately restricted
to syntax RE2 also supports (no lookahead/backreferences) so the SQL
oracle can run the IDENTICAL regexes through DuckDB's regexp functions
— detection counts and the redacted text are exact-comparable, not
heuristically bracketed.

Shape at 100 TB: stateless per-doc regex scan — compiled patterns live
in actor ``__init__`` (once per actor, never per batch), no shuffle, no
broadcast, output schema adds three fixed-width columns plus the
redacted string. Embarrassingly parallel; throughput scales with
actor count.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from .util import default_concurrency

# Shared verbatim with the SQL oracle (engine/queries.py) — keep the two
# in sync; both Python re and DuckDB's RE2 interpret these identically
# (greedy quantifiers only, no lookaround).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


class PIIScanner:
    """Actor-pool stage: per-doc email/phone counts plus the redacted
    text (emails replaced first, then phones — order matters for exact
    oracle comparison and neither replacement token re-matches)."""

    def __init__(self, text_col: str = "text", redact: bool = True):
        self.text_col = text_col
        self.redact = redact
        self.email = re.compile(EMAIL_RE)
        self.phone = re.compile(PHONE_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        n_emails = np.fromiter(
            (len(self.email.findall(t)) for t in texts), dtype=np.int64, count=n
        )
        n_phones = np.fromiter(
            (len(self.phone.findall(t)) for t in texts), dtype=np.int64, count=n
        )
        cols = dict(zip(batch.column_names, batch.columns))
        cols["n_emails"] = pa.array(n_emails)
        cols["n_phones"] = pa.array(n_phones)
        if self.redact:
            redacted = [
                self.phone.sub("[PHONE]", self.email.sub("[EMAIL]", t))
                for t in texts
            ]
            cols["redacted"] = pa.array(redacted, type=pa.string())
        return pa.table(cols)


def scan_pii(
    ds: ray.data.Dataset,
    text_col: str = "text",
    redact: bool = True,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Add ``n_emails``/``n_phones`` (and ``redacted`` when requested)
    columns to a documents Dataset."""
    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        PIIScanner,
        fn_constructor_kwargs=dict(text_col=text_col, redact=redact),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
