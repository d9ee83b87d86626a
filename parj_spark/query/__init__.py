from parj_spark.query.bgp import BGPEngine, Pattern, parse_bgp
from parj_spark.query.sparql import SparqlQuery, execute_on_triples, parse_sparql

__all__ = [
    "BGPEngine",
    "Pattern",
    "parse_bgp",
    "SparqlQuery",
    "execute_on_triples",
    "parse_sparql",
]
