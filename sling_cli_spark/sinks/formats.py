"""Extra sink formats: GeoJSON, Excel, Arrow IPC.

Reference writers: GeoJSON (``core/dbio/iop/geojson.go`` feature-per-row),
Excel (``core/dbio/iop/excel.go``). GeoJSON feature lines are built
DISTRIBUTED (to_json over a feature struct — plain Catalyst); only the
FeatureCollection wrapper variant collects, and it is meant for
map-sized outputs. Excel is inherently single-file: driver-side pandas,
same as the reference's in-memory sheet builder.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geojson_features(
    df: DataFrame, geometry_col: str = "geometry",
) -> DataFrame:
    """One GeoJSON Feature string per row (newline-delimited GeoJSON).

    ``geometry_col`` holds a GeoJSON geometry as a JSON string; all other
    columns become feature properties. Fully distributed — writes as text
    at any scale (ndjson/GeoJSONSeq, the standard big-geo interchange).
    """
    props = [c for c in df.columns if c != geometry_col]
    # assemble verbatim: properties via to_json, geometry spliced as-is so
    # coordinate arrays of any nesting depth survive
    props_json = F.to_json(F.struct(*[F.col(f"`{c}`") for c in props]))
    line = F.concat(
        F.lit('{"type": "Feature", "geometry": '),
        F.coalesce(F.col(geometry_col), F.lit("null")),
        F.lit(', "properties": '), props_json, F.lit("}"),
    )
    return df.select(line.alias("feature"))


def write_geojsonl(
    df: DataFrame, path: str, geometry_col: str = "geometry",
    mode: str = "overwrite",
) -> None:
    """Newline-delimited GeoJSON (GeoJSONSeq) — distributed text write."""
    geojson_features(df, geometry_col).write.mode(mode).text(path)


def write_geojson_collection(
    df: DataFrame, path: str, geometry_col: str = "geometry",
) -> None:
    """Single FeatureCollection document (driver-collected; map-sized)."""
    feats = [r["feature"] for r in
             geojson_features(df, geometry_col).collect()]
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        f.write(",\n".join(feats))
        f.write("\n]}\n")


def write_excel(df: DataFrame, path: str, sheet: str = "Sheet1") -> None:
    """Driver-side Excel writer. Uses pandas+openpyxl/xlsxwriter when
    available; otherwise the stdlib xlsx writer (sources/xlsx.py — a zip
    of OOXML parts, no dependency needed). Sheets are driver-sized by
    contract, like the reference's in-memory builder (sheet_excel.go)."""
    from sling_cli_spark.limits import collect_capped, ensure_driver_rows

    engine = None
    try:
        import openpyxl  # noqa: F401
        engine = "openpyxl"
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401
            engine = "xlsxwriter"
        except ImportError:
            pass
    if engine:
        # xlsx itself caps a sheet at 1,048,576 rows; the guard also
        # keeps the driver toPandas bounded
        ensure_driver_rows(
            df, "xlsx write (sinks/formats)",
            "csv/parquet output (xlsx caps at 1,048,576 rows per sheet)")
        pdf = df.toPandas()
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        pdf.to_excel(path, sheet_name=sheet, index=False, engine=engine)
        return
    from sling_cli_spark.sources.xlsx import write_xlsx

    rows = [list(r) for r in collect_capped(
        df, "xlsx write (sinks/formats)",
        "csv/parquet output (xlsx caps at 1,048,576 rows per sheet)")]
    write_xlsx(rows, list(df.columns), path, sheet=sheet)


def json_inline_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Inline JSON-typed string columns for JSON/JSONL targets
    (reference: datastream.go encodeRowAsJSONObject, vectors in
    datastream_test.go:68): a value that IS valid JSON embeds raw
    ({"payload":{"k":1}}), anything else stays a quoted string
    ({"payload":"{not-json"}), literal "null" becomes JSON null, SQL
    NULL stays a JSON null field.

    All-JVM via VariantType: ``try_parse_json`` inlines the valid
    values; the quoted fallback round-trips through
    ``parse_json(to_json(array(c)))`` so escaping is the JSON
    encoder's, never string surgery."""
    from pyspark.sql import functions as F

    out = df
    for name in cols:
        if name not in df.columns:
            continue
        c = F.col(f"`{name}`").cast("string")
        inline = F.try_parse_json(c)
        quoted = F.variant_get(
            F.parse_json(F.to_json(F.array(c))), "$[0]", "variant")
        out = out.withColumn(
            name,
            F.when(c.isNull(),
                   F.lit(None).cast("variant"))
            .when(inline.isNotNull(), inline)
            .otherwise(quoted))
    return out
