import duckdb
import pytest

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from sphinx_1_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


@pytest.fixture(scope="session")
def docs_index(spark):
    from sphinx_1_spark import IndexSettings, SphinxIndex

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="doc_id", fields=("text",))
    )
    return idx.persist()
