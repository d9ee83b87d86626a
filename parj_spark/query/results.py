"""SPARQL 1.1 Query Results serializers: JSON, CSV, TSV.

The reference prints tab-separated rows from its driver (QueryTester.java
result loop); standard tooling expects the W3C result formats, so SELECT /
ASK results from the SPARQL surface serialize here. Term typing reuses the
exporter's URI-shape rule (rdf_io._IRI_SHAPE_RE — the same rule FILTER
isIRI compiles against), so export, FILTER, and result serialization agree
on every term.

Two regimes:
- bounded, driver-side strings (``to_sparql_json`` / ``to_csv`` /
  ``to_tsv``) for interactive use and HTTP-style responses — these
  collect, so pass ``limit`` for unbounded queries;
- distributed writes (``write_csv_results``) for result sets that should
  never visit the driver: plain ``df.write.csv`` with a header, which IS
  the SPARQL CSV results format (raw lexical forms, one header row).
"""

from __future__ import annotations

import csv
import io
import json
import re

from pyspark.sql import DataFrame

from parj_spark.construct.rdf_io import _IRI_SHAPE_RE

_IRI_RE = re.compile(_IRI_SHAPE_RE)
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _is_ask(df: DataFrame) -> bool:
    return df.columns == ["ask"] and df.schema[0].dataType.simpleString() == "boolean"


def _binding(value):
    """One W3C JSON binding object, or None for an unbound variable."""
    if value is None:
        return None
    if isinstance(value, bool):
        return {"type": "literal", "value": str(value).lower(),
                "datatype": _XSD + "boolean"}
    if isinstance(value, int):
        return {"type": "literal", "value": str(value),
                "datatype": _XSD + "integer"}
    if isinstance(value, float):
        return {"type": "literal", "value": repr(value),
                "datatype": _XSD + "double"}
    s = str(value)
    if _IRI_RE.match(s):
        return {"type": "uri", "value": s}
    return {"type": "literal", "value": s}


def _rows(df: DataFrame, limit: int | None):
    return (df.limit(limit) if limit else df).collect()


def to_sparql_json(df: DataFrame, limit: int | None = None) -> str:
    """W3C SPARQL 1.1 Query Results JSON — SELECT bindings or the ASK
    boolean envelope (an ASK result is the 1-row boolean 'ask' frame the
    engine produces)."""
    rows = _rows(df, limit)
    if _is_ask(df):
        return json.dumps({"head": {}, "boolean": bool(rows[0][0])})
    cols = df.columns
    bindings = []
    for row in rows:
        b = {}
        for c, v in zip(cols, row):
            j = _binding(v)
            if j is not None:
                b[c] = j
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}}
    )


def to_csv(df: DataFrame, limit: int | None = None) -> str:
    """SPARQL 1.1 CSV results: header of variable names, raw lexical forms
    (IRIs unbracketed, literals unquoted), empty cell for unbound."""
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    w.writerow(df.columns)
    for row in _rows(df, limit):
        w.writerow(["" if v is None else str(v) for v in row])
    return buf.getvalue()


def _tsv_term(value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, (int, float)):
        return str(value)
    s = str(value)
    if _IRI_RE.match(s):
        return f"<{s}>"
    esc = s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace(
        "\t", "\\t"
    )
    return f'"{esc}"'


def to_tsv(df: DataFrame, limit: int | None = None) -> str:
    """SPARQL 1.1 TSV results: '?var' header, full term syntax per cell
    (<iri>, "literal" with escapes, bare numerics)."""
    lines = ["\t".join("?" + c for c in df.columns)]
    for row in _rows(df, limit):
        lines.append("\t".join(_tsv_term(v) for v in row))
    return "\n".join(lines) + "\n"


def write_csv_results(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Distributed SPARQL-CSV write for result sets that must not visit the
    driver (one part file per partition; ``partitions`` coalesces)."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").option("header", True).csv(path)
