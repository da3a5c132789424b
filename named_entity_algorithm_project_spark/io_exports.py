"""Export sinks (SURVEY §2.1 S4/S5/S6): CSV / JSON / parquet views of the
result tables, plus the reference's per-document wide view (X9) for
download-style consumption.

The reference flattens nested cells to comma-joined strings before CSV
(app.py:1425-1480); here the same idiom is array_sort + array_join applied
only in the export projection — core tables keep real arrays/maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stringify_nested(df: DataFrame) -> DataFrame:
    """Comma-join array columns, JSON-encode maps/structs (flatten_iterable
    analog, app.py:1425-1464) so the frame is CSV-safe."""
    cols = []
    for field in df.schema.fields:
        kind = field.dataType.typeName()
        col = F.col(field.name)
        if kind == "array":
            cols.append(
                F.array_join(
                    F.array_sort(col.cast("array<string>")), ", "
                ).alias(field.name)
            )
        elif kind in ("map", "struct"):
            cols.append(F.to_json(col).alias(field.name))
        else:
            cols.append(col)
    return df.select(*cols)


def export_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S4 (app.py:4059-4071)."""
    _stringify_nested(df).write.mode("overwrite").option(
        "header", str(header).lower()
    ).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    """S5 (app.py:4060-4078): one JSON record per line (records orient)."""
    df.write.mode("overwrite").json(path)


def wide_entities(
    mentions: DataFrame, key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
) -> DataFrame:
    """X9 per-document wide view (app.py:3871-3879): one sorted distinct
    entity list column per entity type, plus All Entities and the Entity Map
    (map<type, array<entity>>) — built as ONE pivot, not a per-row loop.

    The pivot gets the closed ENTITY_TYPES vocabulary explicitly: without
    it Spark runs an extra distinct-scan job just to discover the column
    set, and the output schema would vary with the data."""
    from .detector import ENTITY_TYPES

    keys = list(key_cols)
    pivoted = (
        mentions.groupBy(*keys)
        .pivot("entity_type", ENTITY_TYPES)
        .agg(F.array_sort(F.collect_set("entity")))
    )
    type_cols = [c for c in pivoted.columns if c not in keys]
    filled = pivoted.select(
        *keys,
        *[F.coalesce(F.col(c), F.array()).alias(c) for c in type_cols],
    )
    all_entities = F.array_sort(
        F.array_distinct(F.flatten(F.array(*[F.col(c) for c in type_cols])))
    )
    entity_map = F.map_from_entries(
        F.filter(
            F.array(
                *[
                    F.struct(F.lit(c).alias("key"), F.col(c).alias("value"))
                    for c in type_cols
                ]
            ),
            lambda kv: F.size(kv.value) > 0,
        )
    )
    return filled.withColumns(
        {"all_entities": all_entities, "entity_map": entity_map}
    )
