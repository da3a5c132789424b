"""Triple-stage units: nearest-property tie-breaking (J1), value-unit
interval join (J2 / Measurement semantics), wide pivot + export sinks."""

import json
import os

import pytest
from pyspark.sql import functions as F

from named_entity_algorithm_project_spark.io_exports import (
    export_csv,
    export_json,
    wide_entities,
)
from named_entity_algorithm_project_spark.operators.triples import (
    build_triples,
    link_value_units,
)

MENTION_COLS = (
    "conv_id string, turn_idx int, entity string, entity_type string, "
    "confidence double, start int, end int, canonical string"
)


def _mention(conv, entity, etype, start, end=None, canonical=None):
    return (
        conv, 0, entity, etype, 0.9, start,
        (start + len(entity)) if start is not None and end is None else end,
        canonical or entity,
    )


def test_nearest_property_tiebreak(spark):
    rows = [
        # value at 100; two props equidistant (90 and 110) -> lower start wins
        _mention("c1", "5 V", "PROP_VALUE", 100),
        _mention("c1", "zeta", "PROP_NAME", 90),
        _mention("c1", "alpha", "PROP_NAME", 110),
        # value with no props in doc
        _mention("c2", "7 K", "PROP_VALUE", 10),
        # props-only doc emits (prop, NULL)
        _mention("c3", "mobility", "PROP_NAME", 0),
    ]
    df = spark.createDataFrame(rows, MENTION_COLS)
    triples = {
        (r["conv_id"], r["subj"], r["obj"])
        for r in build_triples(df).collect()
    }
    assert ("c1", "zeta", "5 V") in triples  # dist tie -> start 90 < 110
    assert ("c2", None, "7 K") in triples
    assert ("c3", "mobility", None) in triples


def test_value_unit_follows_preferred(spark):
    rows = [
        # value [10,13); unit before at [5,7) gap 3, unit after at [20,22) gap 7
        _mention("c1", "123", "PROP_VALUE", 10, 13),
        _mention("c1", "nm", "PROP_VALUE", 5, 7),
        _mention("c1", "eV", "PROP_VALUE", 20, 22),
    ]
    df = spark.createDataFrame(rows, MENTION_COLS)
    linked = link_value_units(df).collect()
    assert len(linked) == 1
    # direction beats gap: the following unit wins despite larger gap
    assert linked[0]["linked_unit"] == "eV"
    assert linked[0]["measurement"] == "123 eV"


def test_value_unit_gap_cutoff(spark):
    rows = [
        _mention("c1", "42", "PROP_VALUE", 0, 2),
        _mention("c1", "Pa", "PROP_VALUE", 50, 52),  # gap 48 > 30
    ]
    df = spark.createDataFrame(rows, MENTION_COLS)
    assert link_value_units(df).count() == 0
    assert link_value_units(df, max_distance=60).count() == 1


def test_wide_entities_pivot(spark):
    rows = [
        _mention("c1", "P3HT", "ORGANIC", 0),
        _mention("c1", "mobility", "PROP_NAME", 10),
        _mention("c1", "bandgap", "PROP_NAME", 30),
        _mention("c2", "15 %", "PROP_VALUE", 0),
    ]
    df = spark.createDataFrame(rows, MENTION_COLS)
    wide = {r["conv_id"]: r for r in wide_entities(df).collect()}
    assert wide["c1"]["PROP_NAME"] == ["bandgap", "mobility"]  # sorted
    assert wide["c1"]["ORGANIC"] == ["P3HT"]
    assert wide["c1"]["all_entities"] == ["P3HT", "bandgap", "mobility"]
    assert wide["c1"]["entity_map"]["PROP_NAME"] == ["bandgap", "mobility"]
    assert "PROP_VALUE" not in wide["c1"]["entity_map"]  # empty types dropped
    assert wide["c2"]["PROP_VALUE"] == ["15 %"]
    assert wide["c2"]["ORGANIC"] == []


def test_export_sinks(spark, tmp_path):
    rows = [
        _mention("c1", "P3HT", "ORGANIC", 0),
        _mention("c1", "mobility", "PROP_NAME", 10),
    ]
    df = spark.createDataFrame(rows, MENTION_COLS)
    wide = wide_entities(df)

    csv_path = str(tmp_path / "csv")
    export_csv(wide, csv_path)
    back = spark.read.option("header", "true").csv(csv_path).collect()[0]
    assert back["all_entities"] == "P3HT, mobility"  # flattened string
    assert json.loads(back["entity_map"])["ORGANIC"] == ["P3HT"]

    json_path = str(tmp_path / "json")
    export_json(df, json_path)
    assert spark.read.json(json_path).count() == 2
