import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from informationretrieval_en_people_cn_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    from informationretrieval_en_people_cn_spark.sources.corpus import (
        synth_corpus,
        with_doc_ids,
    )

    return with_doc_ids(synth_corpus(spark, n_docs=120, seed=42)).cache()


@pytest.fixture(scope="session")
def corpus_pdf(corpus):
    return corpus.toPandas()


@pytest.fixture(scope="session")
def index_dir(spark, corpus, tmp_path_factory):
    from informationretrieval_en_people_cn_spark.operators.build import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, corpus, out, slices=3, salt=2, block_size=8)
    return out


@pytest.fixture(scope="session")
def engine(spark, index_dir):
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine

    return SearchEngine(spark, index_dir)
