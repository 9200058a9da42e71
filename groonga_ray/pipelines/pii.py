"""PII redaction over a text column — one vectorized RE2 pass per
pattern per batch (pyarrow replace_substring_regex), no Python per row.

Patterns are RE2-compatible (no lookaround), so the exact same regex
runs in DuckDB's regexp_replace — the gate compares redacted text
byte-for-byte against a SQL oracle.

The usual pre-training scrub: emails, phone-like digit runs, IPv4s.
Order matters and is part of the contract: EMAIL first (its local part
may contain digits), then IP (dotted quads would otherwise be eaten by
the phone pattern's digit runs — the phone class has no '.', but the
fixed order keeps both sides identical by construction), then PHONE.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, replacement) — applied in order
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


class RedactPII:
    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        counts = {}
        for name, pat, repl in PII_PATTERNS:
            counts[name] = pc.count_substring_regex(col, pat).cast(pa.int64())
            col = pc.replace_substring_regex(col, pat, repl)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "text": col,
                "n_emails": counts["email"],
                "n_ips": counts["ip"],
                "n_phones": counts["phone"],
            }
        )


def redact_pii(ds: "ray.data.Dataset", text_col="text", id_col="doc_id") -> "ray.data.Dataset":
    return ds.map_batches(
        RedactPII, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=2,
    )
