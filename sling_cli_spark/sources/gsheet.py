"""Google Sheets source.

Reference: ``core/dbio/filesys/fs_google_sheets.go`` — reads a sheet via
the Sheets API into a datastream. Here the sheet lands via the CSV
export endpoint (no API key needed for link-shared sheets), is parsed
with pandas on the driver (sheets are small by construction — the API
caps cells), and becomes a DataFrame for distributed processing.

``transport`` is injectable for tests: ``(url) -> bytes``.
"""

from __future__ import annotations

import io
import re
import urllib.request
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str], bytes]

_ID_RE = re.compile(r"/spreadsheets/d/([A-Za-z0-9_-]+)")


def export_url(sheet_ref: str, gid: str | int = 0) -> str:
    """Accepts a full sheet URL or a bare spreadsheet id."""
    m = _ID_RE.search(sheet_ref)
    sheet_id = m.group(1) if m else sheet_ref
    return (f"https://docs.google.com/spreadsheets/d/{sheet_id}"
            f"/export?format=csv&gid={gid}")


def _default_transport(url: str) -> bytes:
    with urllib.request.urlopen(url) as resp:  # nosec - user-configured URL
        return resp.read()


def read_gsheet(
    spark: SparkSession, sheet_ref: str, gid: str | int = 0,
    transport: Transport | None = None, infer: bool = True,
) -> DataFrame:
    import pandas as pd

    transport = transport or _default_transport
    raw = transport(export_url(sheet_ref, gid))
    pdf = pd.read_csv(io.BytesIO(raw), dtype=str, keep_default_na=False)
    pdf = pdf.replace({"": None})
    df = spark.createDataFrame(pdf)
    if infer:
        from sling_cli_spark.operators.inference import infer_and_cast

        df = infer_and_cast(df)
    return df


def write_gsheet(
    df,
    sheet_ref: str,
    sheet_name: str = "Sheet1",
    token: str | None = None,
    transport=None,
) -> dict:
    """Write a DataFrame to a sheet via the Sheets API values.update
    endpoint (reference: fs_google_sheets write path —
    ``Spreadsheets.Values.Update(... ).ValueInputOption("RAW")``,
    sheet_google.go:420).

    ``transport`` is ``(method, url, headers, json_body) -> (status,
    json)`` — injectable for tests; the default posts with urllib using
    a bearer ``token``. Sheets are driver-sized by API contract (cell
    caps), so the collect here matches the reference's in-memory build.
    """
    import json as _json
    import urllib.request

    from sling_cli_spark.limits import collect_capped

    m = _ID_RE.search(sheet_ref)
    sheet_id = m.group(1) if m else sheet_ref
    rng = f"{sheet_name}!A1"
    url = (f"https://sheets.googleapis.com/v4/spreadsheets/{sheet_id}"
           f"/values/{urllib.request.quote(rng)}?valueInputOption=RAW")

    def _default_put(method, u, headers, body):
        req = urllib.request.Request(
            u, method=method, headers=headers,
            data=_json.dumps(body).encode())
        with urllib.request.urlopen(req) as resp:  # nosec - user URL
            return resp.status, _json.loads(resp.read().decode())

    transport = transport or _default_put

    def _cell(v):
        # Sheets RAW values must be JSON-native: isoformat temporals,
        # stringify Decimal/bytes/struct rows — json.dumps would raise
        # TypeError on a datetime cell otherwise.
        import datetime as _dt
        import decimal as _dec

        if v is None:
            return ""
        if isinstance(v, (str, bool, int, float)):
            return v
        if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
            return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) \
                else v.isoformat()
        if isinstance(v, _dec.Decimal):
            return str(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    # Sheets caps a spreadsheet at 10M cells — anything near that must
    # not be collected to the driver anyway
    values = [list(df.columns)] + [
        [_cell(v) for v in row] for row in collect_capped(
            df, "Sheets values.update write (sources/gsheet)",
            "a warehouse/file target (Sheets caps at 10M cells)")]
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    status, body = transport("PUT", url, headers, {
        "range": rng, "majorDimension": "ROWS", "values": values})
    if status >= 400:
        raise RuntimeError(f"sheets values.update returned {status}: {body}")
    return body
