from parj_spark.construct.pipeline import run_pipeline, GraphStore

__all__ = ["run_pipeline", "GraphStore"]
