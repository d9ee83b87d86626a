from parj_spark.query.bgp import BGPEngine, Pattern, parse_bgp

__all__ = ["BGPEngine", "Pattern", "parse_bgp"]
