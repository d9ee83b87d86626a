"""Closed-world constraint validation over the triple relation (SHACL-lite).

The data-quality counterpart of reason.py: entailment ADDS triples the
open-world semantics imply; validation REPORTS where the data violates
constraints a curator declared. The reference engine has no validation
surface at all (it loads a pre-cleaned corpus, parj.c:1972-2189) — on a
lakehouse pipeline ingesting 10^12 raw documents, the violation reports are
what drives the keep/drop/fix loop, so they are first-class construct-stage
operators here, same shape discipline as the rest of the tier: every check
is one predicate-pruned scan + one aggregation or anti-join, no UDFs, no
driver-side data.

Checks:
  functional_violations       p declared functional, subject has >1 value
  inverse_functional_violations  identifying value shared by >1 subject
  dangling_refs               entity-URI objects never seen as subjects
  domain_violations           closed-world rdfs:domain check against the
                              ASSERTED (or pre-entailed) type set
  cardinality_profile         per-predicate objects-per-subject profile
                              (the curator's what-should-be-functional map)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def functional_violations(triples: DataFrame, func_preds: list) -> DataFrame:
    """Subjects asserting more than one distinct object for a functional
    predicate (owl:FunctionalProperty, closed-world reading: a person has
    ONE birth date — two values is dirty data, not an entailment that the
    dates are owl:sameAs).

    Returns (s, p, n_values), one row per violating (subject, predicate).
    Scale shape: predicate-pruned scan + one groupBy — map-side partial
    aggregation makes the shuffle carry (s, p) groups, not rows."""
    return (
        triples.filter(F.col("p").isin(list(func_preds)))
        .groupBy("s", "p")
        .agg(F.countDistinct("o").alias("n_values"))
        .filter(F.col("n_values") > 1)
    )


def inverse_functional_violations(
    triples: DataFrame, ifp_preds: list
) -> DataFrame:
    """Identifying values shared by more than one subject (the violation
    view of the IFP rule — canonicalize.ifp_sameas_edges consumes the same
    groups as merge candidates; this reports them for curation instead).

    Returns (p, o, n_subjects) per over-shared value."""
    return (
        triples.filter(F.col("p").isin(list(ifp_preds)))
        .groupBy("p", "o")
        .agg(F.countDistinct("s").alias("n_subjects"))
        .filter(F.col("n_subjects") > 1)
    )


def dangling_refs(triples: DataFrame, uri_prefix: str) -> DataFrame:
    """Entity-URI objects that never occur as a subject — broken references
    after extraction/canonicalization (the KG analog of a foreign-key miss).

    ``uri_prefix`` separates entity URIs from literals (the pipeline mints
    entities under one namespace, e.g. ``ub:`` / ``urn:``); class URIs used
    only as rdf:type objects are naturally excluded by passing the entity
    namespace. Returns (o, n_refs) per dangling target.

    Scale shape: distinct objects anti-joined against distinct subjects —
    both sides shrink before the join (distinct = map-side partial), and
    the anti-join is the same s=o key shape the OSP permutation serves."""
    objs = (
        triples.filter(F.col("o").startswith(uri_prefix))
        .groupBy("o")
        .agg(F.count("*").alias("n_refs"))
    )
    subs = triples.select("s").distinct()
    return objs.join(subs, objs["o"] == subs["s"], "left_anti").select(
        "o", "n_refs"
    )


def domain_violations(
    triples: DataFrame,
    domains: list,
    type_pred: str = "rdf:type",
) -> DataFrame:
    """Closed-world rdfs:domain check: subjects using a predicate whose
    declared domain class they never assert. ``domains`` is the
    (predicate, required_class) list; MULTIPLE pairs for one predicate are
    CONJUNCTIVE (each row is an independent requirement in the anti-join),
    so adding subclass-composed pairs makes the check stricter and yields
    false-positive violations. If subclass membership should satisfy the
    check, expand the ASSERTED-TYPE side upward through the closed
    subclass hierarchy (or entail rdf:type triples only) before calling —
    that cannot be expressed through this list. Run BEFORE entailment:
    after rdfs_closure the check is vacuous by construction (rdfs2
    asserts exactly the missing types).

    Returns (s, p, required_class), one row per violating use."""
    spark = triples.sparkSession
    ddf = F.broadcast(
        spark.createDataFrame(sorted(set(domains)), ["p", "required_class"])
    )
    uses = (
        triples.join(ddf, "p")
        .select("s", "p", "required_class")
        .dropDuplicates(["s", "p", "required_class"])
    )
    types = triples.filter(F.col("p") == type_pred).select(
        F.col("s").alias("__ts"), F.col("o").alias("__tc")
    )
    return uses.join(
        types,
        (uses["s"] == types["__ts"])
        & (uses["required_class"] == types["__tc"]),
        "left_anti",
    )


def validation_report(
    triples: DataFrame,
    func_preds: list | None = None,
    ifp_preds: list | None = None,
    uri_prefix: str | None = None,
    domains: list | None = None,
    type_pred: str = "rdf:type",
) -> DataFrame:
    """All requested checks as ONE normalized report relation
    (chk, a, b, n) — the shape a curation dashboard or keep/drop joiner
    consumes, and the shape the `violations` pipeline stage persists:
      functional  -> ('functional', s, p, n_distinct_values)
      ifp         -> ('ifp', p, value, n_subjects)
      dangling    -> ('dangling', o, '-', n_refs)
      domain      -> ('domain', s, p, 1)
    Checks whose config is absent contribute nothing (and cost nothing —
    the union is built lazily from the requested slices only)."""
    n_long = lambda c: F.col(c).cast("long").alias("n")  # noqa: E731
    parts = []
    if func_preds:
        parts.append(
            functional_violations(triples, func_preds).select(
                F.lit("functional").alias("chk"), F.col("s").alias("a"),
                F.col("p").alias("b"), n_long("n_values"),
            )
        )
    if ifp_preds:
        parts.append(
            inverse_functional_violations(triples, ifp_preds).select(
                F.lit("ifp").alias("chk"), F.col("p").alias("a"),
                F.col("o").alias("b"), n_long("n_subjects"),
            )
        )
    if uri_prefix:
        parts.append(
            dangling_refs(triples, uri_prefix).select(
                F.lit("dangling").alias("chk"), F.col("o").alias("a"),
                F.lit("-").alias("b"), n_long("n_refs"),
            )
        )
    if domains:
        parts.append(
            domain_violations(triples, domains, type_pred=type_pred).select(
                F.lit("domain").alias("chk"), F.col("s").alias("a"),
                F.col("p").alias("b"), F.lit(1).cast("long").alias("n"),
            )
        )
    if not parts:
        raise ValueError("validation_report: no checks configured")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def cardinality_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate objects-per-subject profile: (p, n_subjects,
    max_per_subject, avg_per_subject). The curator's map of what is
    de-facto functional (max 1), near-functional (avg ~1, max small) or
    multi-valued — the input for choosing func_preds/ifp_preds above."""
    per_subj = triples.groupBy("p", "s").agg(
        F.countDistinct("o").alias("__n")
    )
    return per_subj.groupBy("p").agg(
        F.count("*").alias("n_subjects"),
        F.max("__n").alias("max_per_subject"),
        F.round(F.avg("__n"), 4).alias("avg_per_subject"),
    )
