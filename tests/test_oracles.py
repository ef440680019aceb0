"""Driver-style DuckDB oracle comparison for the SQL-expressible extras.

Emulates the per-round correctness gate for the three extras queries that
gained oracles in round 2 (doc_langid, doc_quality, emb_knn_batch): run the
Ray pipeline and the oracle SQL on the same parquet tables, sort columns by
name, sort rows, compare values EXACTLY (the engineered half-up rounding
must make both sides bit-identical doubles).
"""

import duckdb
import pandas as pd
import pytest

from courlan_ray.pipelines.extras import EXTRA_ORACLES, EXTRAS

SF = "/root/testdata/sf0.01"
_TABLES = ("documents", "embeddings", "events", "orders", "customer",
           "lineitem")


@pytest.fixture(scope="module", autouse=True)
def _oracle_side_inputs(ray_session):
    """The pair-verify oracles (audio/video/doc_simhash) scan signature
    parquets materialized by ensure_oracle_inputs — generate them up
    front, exactly as __ray_entry__.oracle_sql() does for the driver."""
    from courlan_ray.pipelines.extras import ensure_oracle_inputs
    ensure_oracle_inputs()


def _oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLES))
def test_extra_oracle_matches(name):
    res = EXTRAS[name](SF)
    ray_df = _canon(res.to_pandas())
    ora_df = _canon(_oracle_df(EXTRA_ORACLES[name]))
    assert len(ray_df) == len(ora_df), f"{name}: row count"
    assert list(ray_df.columns) == list(ora_df.columns), f"{name}: schema"
    pd.testing.assert_frame_equal(ray_df, ora_df, check_dtype=False,
                                  check_exact=True)


def test_image_counters_sql_builder_generalizes():
    """The image_dedup_counters oracle builder is correct at an n OTHER
    than the driver's sf0.01 (pins the SQL gate chain itself, not one
    row-count accident)."""
    from courlan_ray.config import DEFAULT_CONFIG
    from courlan_ray.pipelines.extras import _image_counters_sql
    from courlan_ray.sources.synth import synth_parquet, synth_table
    from courlan_ray.stages.canonicalize import canonicalize_batch

    path = synth_parquet(2000, 42)
    df = duckdb.connect().execute(
        _image_counters_sql(path + "/*.parquet")).df()
    truth = (canonicalize_batch(synth_table(2000, 42), DEFAULT_CONFIG)
             .to_pandas()["reject_reason"].value_counts().to_dict())
    assert dict(zip(df["reject_reason"], df["n"])) == truth
