"""PySpark-native full-text index + BM25 query engine.

Public surface:

    from informationretrieval_en_people_cn_spark import build_index, SearchEngine
    from informationretrieval_en_people_cn_spark.sources.corpus import with_doc_ids

Heavy imports stay lazy — importing the package must not start Spark.
"""

__all__ = ["build_index", "SearchEngine", "get_spark"]


def __getattr__(name):
    if name == "build_index":
        from .operators.build import build_index

        return build_index
    if name == "SearchEngine":
        from .plans.engine import SearchEngine

        return SearchEngine
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
