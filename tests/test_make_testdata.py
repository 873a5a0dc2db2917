"""The standalone generator must produce data the engine AND the oracle
agree on: arrow schemas identical to the harness tables, referential
integrity, and a Spark-vs-DuckDB value match on a representative query —
the property that makes the whole oracle gate data-independent."""

import duckdb
import pyarrow.parquet as pq
import pytest

from tools.make_testdata import generate

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gen"))
    generate(d, scale=1)
    return d


def test_schemas_match_harness(gen_dir):
    for t in TABLES:
        got = [(f.name, str(f.type)) for f in pq.read_schema(f"{gen_dir}/{t}.parquet")]
        want = [
            (f.name, str(f.type))
            for f in pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        ]
        assert got == want, t


def test_referential_integrity(gen_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{gen_dir}/{t}.parquet'"
        )
    orphans = {
        "o->c": "SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
        "l->o": "SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
        "l->p": "SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL",
        "n->r": "SELECT COUNT(*) FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL",
    }
    for name, sql in orphans.items():
        assert con.execute(sql).fetchone()[0] == 0, name
    # documents: n_chars is the real text length; planted near-dups exist
    assert con.execute("SELECT COUNT(*) FROM documents WHERE n_chars <> length(text)").fetchone()[0] == 0
    assert con.execute("SELECT MAX(len(embedding)) = 64 AND MIN(len(embedding)) = 64 FROM embeddings").fetchone()[0]


def test_engine_matches_oracle_on_generated_data(spark, gen_dir):
    from aws_glue_cdc_metrics_job_spark.plans import catalog

    catalog.load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{gen_dir}/{t}.parquet'")
    for name in ("pricing_summary", "docs_exact_dedup", "events_value_trend"):
        got = sorted(
            tuple(r) for r in catalog.QUERIES[name](spark, gen_dir).collect()
        )
        want = sorted(tuple(r) for r in con.execute(catalog.ORACLE[name]).fetchall())
        assert len(got) == len(want) and got == want, name
