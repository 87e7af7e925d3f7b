"""S4 Ditto export sink + stage-table format seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.sources.ditto_export import (
    ditto_lines,
    write_ditto,
)


def _pairs(spark):
    return spark.createDataFrame(
        [
            # tabs/newlines must be scrubbed; None fields dropped
            ("ford f-150\t2012", "ford\nf150", "2012", None, 1),
            ("honda civic", "honda  civic", "2015", "blue", 0),
            (None, "", "1999", "red", 1),
        ],
        "desc_l string, make_r string, year_r string, color_r string, label int",
    )


def test_ditto_lines_reference_parity(spark):
    """Line format matches 1_prepare_data.py:44-71 semantics: per-value
    strip + [\\t\\n\\r]->' ', empties dropped, ' '-join, '\\t' between
    repr_l / repr_r / label."""
    rows = [
        r["value"]
        for r in ditto_lines(
            _pairs(spark),
            fields_l=["desc_l"],
            fields_r=["make_r", "year_r", "color_r"],
        ).collect()
    ]

    def ref_repr(vals):
        out = []
        for v in vals:
            v = "" if v is None else str(v).strip()
            v = v.replace("\t", " ").replace("\n", " ").replace("\r", " ")
            if v:
                out.append(v)
        return " ".join(out)

    expected = {
        ref_repr(["ford f-150\t2012"]) + "\t" + ref_repr(["ford\nf150", "2012", None]) + "\t1",
        ref_repr(["honda civic"]) + "\t" + ref_repr(["honda  civic", "2015", "blue"]) + "\t0",
        ref_repr([None]) + "\t" + ref_repr(["", "1999", "red"]) + "\t1",
    }
    assert set(rows) == expected
    for line in rows:
        assert line.count("\t") == 2  # exactly 3 tab-separated fields


def test_write_ditto_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ditto_train")
    write_ditto(
        _pairs(spark), path,
        fields_l=["desc_l"], fields_r=["make_r", "year_r", "color_r"],
        coalesce=1,
    )
    back = spark.read.text(path)
    assert back.count() == 3
    parsed = back.select(F.split("value", "\t").alias("p"))
    assert parsed.where(F.size("p") != 3).count() == 0
    labels = {r["p"][2] for r in parsed.collect()}
    assert labels == {"0", "1"}


def test_iceberg_stage_format_fails_fast_without_jar(spark, tmp_path):
    from idd_hw6_record_linkage_spark.plans.pipeline import (
        LinkagePipeline,
        PipelineConfig,
    )
    from idd_hw6_record_linkage_spark.sources.pages import iceberg_available

    cfg = PipelineConfig(workdir=str(tmp_path / "wd"), table_format="iceberg")
    pipe = LinkagePipeline(spark, cfg)
    df = spark.range(3)
    if iceberg_available(spark):
        pytest.skip("iceberg jar present; fail-fast branch not reachable")
    with pytest.raises(RuntimeError, match="iceberg"):
        pipe._write_stage(df, pipe._stage_path("normalize"))
    # and the stage target is a catalog identifier, not a path
    assert pipe._stage_path("normalize") == "linkage.run0_normalize"


def test_unknown_stage_format_rejected(spark, tmp_path):
    from idd_hw6_record_linkage_spark.plans.pipeline import (
        LinkagePipeline,
        PipelineConfig,
    )

    cfg = PipelineConfig(workdir=str(tmp_path / "wd"), table_format="orc!?")
    pipe = LinkagePipeline(spark, cfg)
    with pytest.raises(ValueError, match="table_format"):
        pipe._write_stage(spark.range(1), "x")
