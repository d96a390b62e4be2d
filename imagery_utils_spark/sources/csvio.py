"""RFC 4180 CSV — from-scratch writer and state-machine parser.

Spark ships a CSV reader, but its dialect (multiLine off by default,
its own quote/escape defaults) is not the RFC, and a web-scale export
pipeline needs BOTH directions to agree byte-for-byte with the spec:
quoted fields may contain commas, doubled quotes, and EMBEDDED
NEWLINES (the case naive line-splitting corrupts silently — and why
multiline CSV is not splittable by byte offset; blobs here are one
Arrow row each, the WARC/ZIP container shape).

Writer: minimal quoting (RFC 4180 §2.6-2.7) — a field is quoted iff it
contains a comma, quote, CR or LF; quotes double. Records join with
CRLF. Deterministic: same rows -> same bytes.

Parser: a single-pass state machine (in-quotes / out-of-quotes) over
the blob; doubled quotes collapse; CRLF and bare LF both accepted as
record separators (RFC permits the former, real data has the latter);
a trailing record without a final newline is emitted. Malformed input
(quote opening mid-field, dangling quote) raises rather than guessing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_csv", "parse_csv", "csv_records", "quote_field_col"]

_NEEDS_QUOTE = (",", '"', "\r", "\n")


def _field(s: str) -> str:
    if any(c in s for c in _NEEDS_QUOTE):
        return '"' + s.replace('"', '""') + '"'
    return s


def write_csv(rows: list[tuple[str, ...]]) -> str:
    """Rows of string fields -> one RFC 4180 text blob (CRLF records)."""
    return "\r\n".join(",".join(_field(f) for f in r) for r in rows)


def quote_field_col(c) -> "F.Column":
    """JVM-side RFC quoting of one field (always-quote form — RFC-legal
    and branch-free for hot-path exports)."""
    return F.concat(F.lit('"'),
                    F.regexp_replace(c, '"', '""'), F.lit('"'))


def parse_csv(blob: str) -> list[list[str]]:
    """RFC 4180 state machine. Returns records of fields."""
    records: list[list[str]] = []
    field: list[str] = []
    rec: list[str] = []
    in_q = False
    i, n = 0, len(blob)
    started = n > 0
    while i < n:
        ch = blob[i]
        if in_q:
            if ch == '"':
                if i + 1 < n and blob[i + 1] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_q = False
                i += 1
                if i < n and blob[i] not in (",", "\r", "\n"):
                    raise ValueError(
                        f"garbage after closing quote at offset {i}")
                continue
            field.append(ch)
            i += 1
        else:
            if ch == '"':
                if field:
                    raise ValueError(
                        f"quote opening mid-field at offset {i}")
                in_q = True
                i += 1
            elif ch == ",":
                rec.append("".join(field))
                field = []
                i += 1
            elif ch in ("\r", "\n"):
                rec.append("".join(field))
                records.append(rec)
                field, rec = [], []
                i += 2 if ch == "\r" and i + 1 < n and \
                    blob[i + 1] == "\n" else 1
            else:
                field.append(ch)
                i += 1
    if in_q:
        raise ValueError("dangling quote at end of input")
    if started and (field or rec):
        rec.append("".join(field))
        records.append(rec)
    return records


def csv_records(df: DataFrame, schema: T.StructType,
                blob_col: str = "csv",
                id_col: str = "csv_id") -> DataFrame:
    """Explode CSV blobs into typed records (Arrow-batched, partition-
    preserving). ``schema`` names the output columns after ``id_col``;
    every parsed field arrives as string — cast downstream."""
    n_fields = len(schema.fields)
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(schema.fields))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, blob in zip(pdf[id_col], pdf[blob_col]):
                for rec in parse_csv(str(blob)):
                    if len(rec) != n_fields:
                        raise ValueError(
                            f"record has {len(rec)} fields, "
                            f"schema wants {n_fields}")
                    rows.append((int(cid), *rec))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              out_schema.fields])

    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(run, schema=out_schema))
