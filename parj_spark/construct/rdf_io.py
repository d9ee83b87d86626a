"""N-Triples import: the reference's RDF-file loader analog.

The reference's in-repo loader (ImportHandler.java:24-172) parses RDF files
with RDF4J into per-predicate tables — the real encode lives in the external
``rdf-exp`` project (reference README.md:5-8) — and rejects blank nodes
outright (ImportHandler.java:101-103, 120-122). Here the load is one
JVM-side regexp pass over ``spark.read.text`` (no per-row Python), producing
the (s_uri, p_uri, o_uri) relation the shared encode/materialize stages
consume, so an .nt file becomes a queryable GraphStore with the exact
permutation layout the docs pipeline writes.

Scope: the N-Triples line grammar ``<s> <p> <o> .`` with IRI or literal
objects. Literal language tags / datatype suffixes (``"x"@en``,
``"x"^^<t>``) are dropped, matching the SPARQL front-end's literal
canonicalization (sparql.py module docstring); the four standard string
escapes (\\\\ \\" \\n \\t) are unescaped. Blank-node lines are skipped at
parity with the reference; ``count_rejected`` surfaces how many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_S_RE = r"^\s*<([^>]*)>"
_P_RE = r"^\s*<[^>]*>\s*<([^>]*)>"
_O_IRI_RE = r"^\s*<[^>]*>\s*<[^>]*>\s*<([^>]*)>\s*\.\s*$"
# end-anchored (optional datatype/language suffix, then the dot): an
# N-Quads line with a literal object must NOT silently parse as a triple
# with its graph term dropped — quads belong to read_nquads
_O_LIT_RE = (
    r'^\s*<[^>]*>\s*<[^>]*>\s*"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^<[^>]*>|@[A-Za-z0-9\-]+)?\s*\.\s*$"
)
_BLANK_RE = r"^\s*_:|\s_:"
_SKIP_RE = r"^\s*(#|$)"


def _unescape(col):
    """N-Triples string escapes, backslash-safe via a sentinel: \\\\ first
    to NUL, then \\" \\n \\t, then NUL back to a literal backslash."""
    x = F.regexp_replace(col, r"\\\\", "\x00")
    x = F.regexp_replace(x, r'\\"', '"')
    x = F.regexp_replace(x, r"\\n", "\n")
    x = F.regexp_replace(x, r"\\t", "\t")
    return F.regexp_replace(x, "\x00", r"\\")


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file (or directory/glob of them) into the
    (s_uri, p_uri, o_uri) string-triples relation — one distributed
    regexp_extract pass, filters pushed to the text scan."""
    lines = spark.read.text(path)
    t = lines.filter(~F.col("value").rlike(_SKIP_RE)).filter(
        ~F.col("value").rlike(_BLANK_RE)  # blank nodes rejected (parity)
    )
    o_iri = F.regexp_extract("value", _O_IRI_RE, 1)
    o_lit = _unescape(F.regexp_extract("value", _O_LIT_RE, 1))
    is_lit = F.col("value").rlike(_O_LIT_RE)
    out = t.select(
        F.regexp_extract("value", _S_RE, 1).alias("s_uri"),
        F.regexp_extract("value", _P_RE, 1).alias("p_uri"),
        F.when(is_lit, o_lit).otherwise(o_iri).alias("o_uri"),
        is_lit.alias("__lit"),
    )
    return (
        out.filter(
            (F.col("s_uri") != "")
            & (F.col("p_uri") != "")
            & (F.col("__lit") | (F.col("o_uri") != ""))
        )
        .drop("__lit")
    )


# one RDF term: IRI, literal (with optional ^^<datatype> / @lang suffix),
# or blank-node label — the N-Quads statement is 3 or 4 of these + "."
_TERM_RE = r'(<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9\-]+)?|_:[^\s]+)'


def _strip_term(c):
    """IRI -> its content, literal -> its unescaped string content (the
    datatype/lang suffix never reaches the extract group), matching
    read_ntriples's literal canonicalization."""
    return F.when(
        c.startswith("<"), F.regexp_extract(c, r"^<([^>]*)>$", 1)
    ).otherwise(_unescape(F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1)))


def read_nquads(
    spark: SparkSession, path: str, graph: str | None = None
) -> DataFrame:
    """Parse N-Quads (or a mix of N-Quads and N-Triples lines) into
    (s_uri, p_uri, o_uri, g_uri) — ``g_uri`` null for default-graph
    (3-term) statements. ``graph`` filters to one named graph (the
    filter reaches the text scan via the tokenized predicate).

    Same distributed JVM-side pass as :func:`read_ntriples` — one
    ``regexp_extract_all`` tokenization per line, no per-row Python —
    and the same scope rules: blank-node lines rejected at reference
    parity, literal datatype/language suffixes canonicalized away. The
    graph term must be an IRI (blank-node graph labels fall under the
    blank-node rejection).

    Feed the result to :func:`parj_spark.construct.pipeline.import_rdf`
    with ``fmt="nquads"`` (which drops ``g_uri``, merging all graphs —
    the RDF-dataset default-graph union) or pre-filter by graph here.
    """
    lines = spark.read.text(path)
    t = (
        lines.filter(~F.col("value").rlike(_SKIP_RE))
        .filter(~F.col("value").rlike(_BLANK_RE))
        .filter(F.col("value").rlike(r"\.\s*$"))
    )
    ts = F.regexp_extract_all(F.col("value"), F.lit(_TERM_RE), 1)
    parsed = (
        t.select(ts.alias("ts"))
        .filter(F.size("ts").isin(3, 4))
        # subject and predicate must be IRIs; a 4th term (graph) likewise
        .filter(
            F.col("ts")[0].startswith("<")
            & F.col("ts")[1].startswith("<")
            & ((F.size("ts") == 3) | F.col("ts")[3].startswith("<"))
        )
        .select(
            _strip_term(F.col("ts")[0]).alias("s_uri"),
            _strip_term(F.col("ts")[1]).alias("p_uri"),
            _strip_term(F.col("ts")[2]).alias("o_uri"),
            F.when(
                F.size("ts") == 4, _strip_term(F.col("ts")[3])
            ).alias("g_uri"),
        )
        .filter((F.col("s_uri") != "") & (F.col("p_uri") != ""))
    )
    if graph is not None:
        parsed = parsed.filter(F.col("g_uri") == graph)
    return parsed


def count_rejected(spark: SparkSession, path: str) -> int:
    """How many non-comment lines the importer skipped (blank nodes or
    malformed) — the importer's loud-but-not-fatal loss accounting."""
    lines = spark.read.text(path).filter(~F.col("value").rlike(_SKIP_RE))
    return lines.count() - read_ntriples(spark, path).count()


# an object serializes as an IRI when it looks like one: a URI scheme
# followed by characters legal inside <>; everything else (spaces, quotes,
# angle brackets, or no scheme) must be a literal. String triples carry no
# IRI/literal flag — the importer canonicalized literals to bare strings —
# so this is the inverse of that canonicalization, not extra state.
_IRI_SHAPE_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:[^\s\"<>]*$"


def _escape(col):
    """Inverse of ``_unescape``: backslash first (so the escapes it
    introduces are not re-escaped), then quote, newline, tab."""
    x = F.regexp_replace(col, r"\\", r"\\\\")
    x = F.regexp_replace(x, '"', '\\\\"')
    x = F.regexp_replace(x, "\n", r"\\n")
    return F.regexp_replace(x, "\t", r"\\t")


def write_ntriples(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Serialize a string-triples relation to N-Triples text files — the
    importer's inverse, closing the round trip the reference never offers
    (its loader is one-way, ImportHandler.java:24-172): a GraphStore's
    ``triples_uri`` table or a CONSTRUCT result becomes a ``.nt`` dataset
    any RDF tool can read, written distributed (one part file per
    partition; ``partitions`` coalesces, e.g. 1 for a single file).

    Accepts columns (s_uri, p_uri, o_uri) or (s, p, o). Objects matching a
    URI shape serialize as ``<iri>``; everything else as an escaped
    ``"literal"`` — the inverse of the importer's literal canonicalization.
    All formatting is JVM-side concat/regexp (no per-row Python).
    """
    cols = triples.columns
    if {"s_uri", "p_uri", "o_uri"} <= set(cols):
        s, p, o = F.col("s_uri"), F.col("p_uri"), F.col("o_uri")
    elif {"s", "p", "o"} <= set(cols):
        s, p, o = F.col("s"), F.col("p"), F.col("o")
    else:
        raise ValueError(f"expected (s_uri,p_uri,o_uri) or (s,p,o) columns, got {cols}")
    obj = F.when(
        o.rlike(_IRI_SHAPE_RE), F.concat(F.lit("<"), o, F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), _escape(o), F.lit('"')))
    lines = triples.select(
        F.concat(
            F.lit("<"), s, F.lit("> <"), p, F.lit("> "), obj, F.lit(" .")
        ).alias("value")
    )
    if partitions:
        lines = lines.coalesce(partitions)
    lines.write.mode("overwrite").text(path)
