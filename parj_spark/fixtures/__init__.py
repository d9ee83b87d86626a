from parj_spark.fixtures.generator import gen_corpus, gold_triples_df, documents_kg_df

__all__ = ["gen_corpus", "gold_triples_df", "documents_kg_df"]
