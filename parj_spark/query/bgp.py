"""Basic-graph-pattern query engine over the materialized permutation tables.

Spark-first re-expression of PARJ's live query surface (SURVEY.md §2.3 J1):
a BGP is a multi-way equi self-join of the triples relation on shared
variables. Where the reference hand-builds a left-deep CROSS JOIN chain with
DP-chosen order and forces SQLite's NLJ over sorted permutation arrays
(DPSubLinear.java:40-113, SQLQuery.java:1076-1178), we:

- scan the predicate partition of the right sort order per pattern
  (SPO when subject-bound/unbound, POS when object-bound — the reference's
  access-path choice, DagCreator.java:94-122, becomes "which table to read");
- seed the join order with a greedy most-selective-first, connected-pattern
  ordering driven by the per-predicate stats table (the reference's
  histogram/sampling DP, SURVEY.md §4.1 — we keep the greedy seed and let
  Catalyst CBO + AQE do the rest at runtime);
- broadcast small pattern scans and the dictionary decode (J4:
  QueryTester.java:189-223's decode join, placed after all joins).

Constant predicates only, like the reference (DagCreator.java:170-171 rejects
predicate variables); variable predicates would read the OSP table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parj_spark.construct.pipeline import GraphStore

BROADCAST_ROWS = 2_000_000


def _is_var(term: str) -> bool:
    return term.startswith("?")


@dataclass(frozen=True)
class Pattern:
    s: str
    p: str
    o: str

    def vars(self) -> set[str]:
        return {t[1:] for t in (self.s, self.o) if _is_var(t)}


def parse_bgp(text: str) -> list[Pattern]:
    """Parse whitespace-separated triple patterns, one per line, optional
    trailing '.'; terms are '?var' or constant URIs/literals (quote literals
    containing spaces with double quotes)."""
    import shlex

    pats = []
    for line in text.strip().splitlines():
        for chunk in line.split(" . "):  # allow several patterns per line
            chunk = chunk.strip().rstrip(".").strip()
            if not chunk:
                continue
            parts = shlex.split(chunk)
            if len(parts) != 3:
                raise ValueError(f"bad pattern line: {chunk!r}")
            pats.append(Pattern(*parts))
    return pats


class BGPEngine:
    def __init__(self, store: GraphStore):
        self.store = store
        self.spark = store.spark
        self._props = {r["uri"]: r["id"] for r in store.properties().collect()}
        self._stats = {r["p"]: r.asDict() for r in store.stats().collect()}
        self._dict = store.dict()

    # --- term resolution -----------------------------------------------
    def _resolve_terms(self, patterns: list[Pattern]) -> dict[str, int]:
        consts = {t for p in patterns for t in (p.s, p.o) if not _is_var(t)}
        if not consts:
            return {}
        rows = self._dict.filter(F.col("uri").isin(list(consts))).collect()
        return {r["uri"]: r["id"] for r in rows}

    # --- planning --------------------------------------------------------
    def _estimate(self, pat: Pattern) -> float:
        pid = self._props.get(pat.p)
        st = self._stats.get(pid)
        if st is None:
            return 0.0
        n = float(st["n"])
        if not _is_var(pat.s):
            n /= max(1.0, float(st["ndv_s"]))
        if not _is_var(pat.o):
            n /= max(1.0, float(st["ndv_o"]))
        return n

    def _scan(self, pat: Pattern, terms: dict[str, int]) -> DataFrame | None:
        """One filtered permutation-table scan, columns renamed to var names."""
        pid = self._props.get(pat.p)
        if pid is None:
            return None
        s_const = None if _is_var(pat.s) else terms.get(pat.s)
        o_const = None if _is_var(pat.o) else terms.get(pat.o)
        if (not _is_var(pat.s) and s_const is None) or (
            not _is_var(pat.o) and o_const is None
        ):
            return None  # constant not in dictionary -> empty result
        # access-path choice: object-bound reads POS (sorted by o), else SPO
        table = self.store.pos() if o_const is not None and s_const is None else self.store.spo()
        df = table.filter(F.col("p") == pid)
        if s_const is not None:
            df = df.filter(F.col("s") == s_const)
        if o_const is not None:
            df = df.filter(F.col("o") == o_const)
        cols = []
        if _is_var(pat.s):
            cols.append(F.col("s").alias(pat.s[1:]))
        if _is_var(pat.o):
            cols.append(F.col("o").alias(pat.o[1:]))
        if _is_var(pat.s) and _is_var(pat.o) and pat.s == pat.o:
            df = df.filter(F.col("s") == F.col("o"))
            cols = [F.col("s").alias(pat.s[1:])]
        if not cols:  # fully-bound pattern: existence filter
            cols = [F.lit(1).alias("__exists")]
            df = df.limit(1)
        return df.select(*cols)

    def _order(self, patterns: list[Pattern]) -> list[Pattern]:
        """Greedy: cheapest first, then cheapest *connected* next (avoids
        accidental cartesians; the reference's DP does the same for left-deep
        trees, DPSubLinear.java:46-113)."""
        remaining = sorted(patterns, key=self._estimate)
        ordered = [remaining.pop(0)]
        bound = set(ordered[0].vars())
        while remaining:
            connected = [p for p in remaining if p.vars() & bound]
            pick = min(connected or remaining, key=self._estimate)
            remaining.remove(pick)
            ordered.append(pick)
            bound |= pick.vars()
        return ordered

    # --- execution -------------------------------------------------------
    def query(
        self,
        patterns: list[Pattern] | str,
        select: list[str] | None = None,
        distinct: bool = False,
        decode: bool = True,
        optional: list[Pattern] | str | None = None,
        order_by: list[str] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """Answer a BGP. ``optional`` patterns join LEFT OUTER (SPARQL
        OPTIONAL — the reference carries the opcode but never constructs it,
        Node.java:43 / SURVEY.md §2.3 J5); ``order_by``/``limit`` complete
        the O1/O2 surface."""
        if isinstance(patterns, str):
            patterns = parse_bgp(patterns)
        opt_patterns = parse_bgp(optional) if isinstance(optional, str) else (optional or [])
        terms = self._resolve_terms(list(patterns) + opt_patterns)
        ordered = self._order(patterns)

        result: DataFrame | None = None
        for pat in ordered:
            scan = self._scan(pat, terms)
            if scan is None:
                # unknown predicate/constant: empty result with right columns
                all_vars = sorted({v for p in patterns for v in p.vars()})
                empty = self.spark.createDataFrame(
                    [], "".join(f"{v} long," for v in all_vars).rstrip(",") or "x long"
                )
                result = empty
                break
            if self._estimate(pat) <= BROADCAST_ROWS:
                scan = F.broadcast(scan)
            if result is None:
                result = scan
            else:
                shared = sorted(set(result.columns) & set(scan.columns) - {"__exists"})
                result = result.join(scan, on=shared) if shared else result.crossJoin(scan)
        assert result is not None
        if "__exists" in result.columns:
            result = result.drop("__exists")

        for pat in opt_patterns:  # OPTIONAL: left outer join, after the BGP core
            scan = self._scan(pat, terms)
            if scan is None:
                for v in pat.vars():
                    if v not in result.columns:
                        result = result.withColumn(v, F.lit(None).cast("long"))
                continue
            shared = sorted(set(result.columns) & set(scan.columns))
            result = result.join(scan, on=shared, how="left") if shared else result.crossJoin(scan)

        all_pats = list(patterns) + opt_patterns
        out_vars = select or sorted({v for p in all_pats for v in p.vars()})
        result = result.select(*[c for c in out_vars if c in result.columns])
        if distinct:
            result = result.distinct()
        if decode and result.columns:
            for v in list(result.columns):
                d = F.broadcast(
                    self._dict.select(
                        F.col("id").alias(v), F.col("uri").alias(f"{v}_uri")
                    )
                )
                result = result.join(d, v, "left").drop(v).withColumnRenamed(f"{v}_uri", v)
            result = result.select(*out_vars)
        if order_by:
            result = result.orderBy(*order_by)
        if limit is not None:
            result = result.limit(limit)
        return result

    def count(self, patterns: list[Pattern] | str) -> int:
        """count(*) result counting (reference A1, SQLiteLocalExecutor.java:152)."""
        return self.query(patterns, decode=False).count()
