"""s17 scan_parquet_evolving + union_vintages: multi-vintage parquet read
as one table (SURVEY §2.1) — absent columns null-fill, declared contract
columns materialize/cast, type drift handled by the union path, and
incompatible footer merges fail loudly at planning time.
"""

from __future__ import annotations

import pandas as pd
import pytest

from wikipedia_org_xmldump_importer_spark.io import (
    scan_parquet_evolving,
    union_vintages,
)


@pytest.fixture()
def vintages(spark, tmp_path):
    root = tmp_path / "pages"
    # v1: 2019 vintage — no `model` column
    spark.createDataFrame(
        pd.DataFrame({"page_id": [1, 2], "n_rev": [3, 4]})
    ).selectExpr(
        "CAST(page_id AS INT) page_id", "CAST(n_rev AS BIGINT) n_rev"
    ).write.parquet(str(root), mode="append")
    # v2: 2024 vintage — adds `model`
    spark.createDataFrame(
        pd.DataFrame(
            {"page_id": [3], "n_rev": [5_000_000_000], "model": ["wikitext"]}
        )
    ).selectExpr(
        "CAST(page_id AS INT) page_id", "CAST(n_rev AS BIGINT) n_rev", "model"
    ).write.parquet(str(root), mode="append")
    return str(root)


def test_merge_unions_vintages_and_nullfills(spark, vintages):
    df = scan_parquet_evolving(spark, vintages)
    assert set(df.columns) == {"page_id", "n_rev", "model"}
    rows = {r.page_id: r for r in df.collect()}
    assert rows[1].model is None and rows[3].model == "wikitext"
    assert rows[3].n_rev == 5_000_000_000


def test_required_contract_adds_and_casts(spark, vintages):
    df = scan_parquet_evolving(
        spark, vintages, required={"lang": "string", "page_id": "bigint"}
    )
    assert dict(df.dtypes)["lang"] == "string"
    assert dict(df.dtypes)["page_id"] == "bigint"
    assert df.filter("lang IS NULL").count() == df.count()


def test_type_drift_refused_by_merge_handled_by_union(spark, tmp_path):
    # Two eras drifted a column int -> bigint: parquet footer-merge refuses
    # (loud planning-time error), union_vintages widens via ANSI coercion.
    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.range(2).selectExpr("CAST(id AS INT) n_rev", "id AS page_id").write.parquet(v1)
    spark.range(1).selectExpr(
        "CAST(id + 5000000000 AS BIGINT) n_rev", "id + 10 AS page_id", "'wikitext' AS model"
    ).write.parquet(v2)

    root = str(tmp_path / "mixed")
    spark.read.parquet(v1).write.parquet(root, mode="append")
    spark.read.parquet(v2).write.parquet(root, mode="append")
    with pytest.raises(Exception, match="(?i)merge"):
        scan_parquet_evolving(spark, root).collect()

    u = union_vintages(spark, [v1, v2])
    assert dict(u.dtypes)["n_rev"] == "bigint"
    assert u.count() == 3
    assert u.filter("model IS NULL").count() == 2


def test_incompatible_vintage_fails_loudly(spark, tmp_path):
    root = tmp_path / "bad"
    spark.range(1).selectExpr("CAST(id AS INT) v").write.parquet(
        str(root), mode="append"
    )
    spark.range(1).selectExpr("CAST(id AS STRING) v").write.parquet(
        str(root), mode="append"
    )
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        scan_parquet_evolving(spark, str(root)).collect()
