from parj_spark.query.bgp import BGPEngine, Path, Pattern, parse_bgp
from parj_spark.query.sparql import (
    SparqlQuery,
    execute_on_quads,
    execute_on_triples,
    parse_sparql,
)

__all__ = [
    "BGPEngine",
    "Path",
    "Pattern",
    "parse_bgp",
    "SparqlQuery",
    "execute_on_quads",
    "execute_on_triples",
    "parse_sparql",
]
