"""Spec-driven API source.

Reference: ``core/dbio/api/spec.go:123-359`` — endpoints with a request
template, pagination rules (offset / cursor / next-URL), and a record
JMESPath; ~3.6k LoC of spec machinery. The Spark-shaped subset here:

- spec: {url, method, params, headers, records_path, pagination}
- pagination: {type: offset|cursor|none, limit_param, offset_param,
  cursor_param, cursor_path, page_size, max_pages}
- transport: any callable ``(url, params, headers) -> (status, json)``
  — tests inject a fake; the default uses urllib (stdlib only).

Pagination is inherently serial per endpoint, so fetching happens on the
driver and lands in a DataFrame per page-batch; PARALLELISM comes from
fanning out over endpoint partitions (one call list -> many streams via
``replication``), which is how the reference scales too (endpoint
iterate/dependencies). The DataFrame conversion uses
``spark.createDataFrame`` on the accumulated records with optional
flatten — downstream operators are fully distributed.
"""

from __future__ import annotations

import json as _json
import urllib.parse
import urllib.request
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict, dict], tuple[int, Any]]


def _default_transport(url: str, params: dict, headers: dict,
                       method: str = "GET", payload=None):
    """urllib transport. Extended signature (method + JSON payload for
    GraphQL/POST specs); returns ``(status, body, resp_headers, text)``
    when called with the extended kwargs by ``api_spec._call_transport``
    — plain 3-arg calls still get the legacy ``(status, body)`` pair."""
    qs = urllib.parse.urlencode(
        {k: v for k, v in (params or {}).items() if v is not None})
    full = f"{url}?{qs}" if qs else url
    data = None
    hdrs = dict(headers or {})
    if payload is not None:
        data = _json.dumps(payload).encode("utf-8")
        hdrs.setdefault("Content-Type", "application/json")
    req = urllib.request.Request(full, data=data, headers=hdrs,
                                 method=(method or "GET").upper())
    try:
        resp = urllib.request.urlopen(req)  # nosec - user-configured URL
        status = resp.status
        raw = resp.read().decode("utf-8", errors="replace")
        resp_headers = dict(resp.headers.items())
        resp.close()
    except urllib.error.HTTPError as e:  # non-2xx: surface, don't raise
        status = e.code
        raw = (e.read() or b"").decode("utf-8", errors="replace")
        resp_headers = dict(e.headers.items()) if e.headers else {}
    try:
        body = _json.loads(raw) if raw else None
    except ValueError:
        body = None
    return status, body, resp_headers, raw


def normalize_response(res) -> tuple[int, Any, dict, str]:
    """Fold any transport's return shape — ``(status, body)`` legacy
    2-tuple (test mocks), 3-tuple with headers, or the default
    transport's 4-tuple — onto ``(status, body, headers, text)``."""
    if isinstance(res, tuple):
        if len(res) == 2:
            status, body = res
            return status, body, {}, _json.dumps(body, default=str)
        if len(res) == 3:
            status, body, hdrs = res
            return status, body, dict(hdrs or {}), \
                _json.dumps(body, default=str)
        status, body, hdrs, text = res
        return status, body, dict(hdrs or {}), text or ""
    raise TypeError(f"transport returned {type(res).__name__}, "
                    "expected a tuple")


def call_transport(transport, url: str, params: dict, headers: dict,
                   method: str = "GET", payload=None):
    """Invoke a transport with the extended signature when it accepts
    one, else the legacy 3-arg form; returns the normalized 4-tuple."""
    try:
        res = transport(url, params, headers, method=method,
                        payload=payload)
    except TypeError as e:
        if "argument" not in str(e) and "method" not in str(e):
            raise
        res = transport(url, params, headers)
    return normalize_response(res)


def _extract_path(obj: Any, path: str | None) -> Any:
    """Dotted-path extraction (``data.items``) with JMESPath flatten
    segments (``data[]``, ``[]``) — the subset the reference's own
    specs and tests use (spec_test.go specs are full of ``data[]``).

    Paths the simple parser can't express (multiselect hashes like
    ``[{id: id, owner_login: owner.login}]``, ``@``, filters, slices —
    the production specs in api/specs/*.yaml use all of these) route
    through the full ``jmespath`` library."""
    if not path:
        return obj
    if any(ch in path for ch in "{?@|&*["):
        try:
            import jmespath

            return jmespath.search(path, obj)
        except Exception:
            pass  # fall back to the simple parser
    cur = obj
    for seg in path.split("."):
        flatten = seg.endswith("[]")
        if flatten:
            seg = seg[:-2]
        if seg:
            if cur is None:
                return None
            if isinstance(cur, list):
                try:
                    cur = cur[int(seg)]
                except (ValueError, IndexError):
                    return None
            else:
                cur = cur.get(seg) if isinstance(cur, dict) else None
        if flatten:
            if cur is None:
                return None
            if not isinstance(cur, list):
                return None
            # JMESPath []: flatten one level of nested lists
            flat = []
            for x in cur:
                if isinstance(x, list):
                    flat.extend(x)
                else:
                    flat.append(x)
            cur = flat
    return cur


def iter_records(
    spec: dict[str, Any], transport: Transport | None = None,
) -> Iterator[dict]:
    """Drive pagination, yielding raw record dicts."""
    transport = transport or _default_transport
    pag = spec.get("pagination") or {}
    ptype = pag.get("type", "none")
    page_size = int(pag.get("page_size", 100))
    max_pages = int(pag.get("max_pages", 10_000))
    params = dict(spec.get("params") or {})
    headers = dict(spec.get("headers") or {})
    url = spec["url"]

    retries = int(spec.get("retries", 2))
    offset, cursor = 0, None
    for _page in range(max_pages):
        p = dict(params)
        if ptype == "offset":
            p[pag.get("limit_param", "limit")] = page_size
            p[pag.get("offset_param", "offset")] = offset
        elif ptype == "cursor" and cursor is not None:
            p[pag.get("cursor_param", "cursor")] = cursor
        for attempt in range(retries + 1):
            status, body, _, _ = call_transport(transport, url, p, headers)
            if status < 500 or attempt == retries:
                break  # success, client error, or retries exhausted
        if status >= 400:
            raise RuntimeError(f"API error {status} from {url}")
        records = _extract_path(body, spec.get("records_path"))
        if records is None:
            records = []
        if isinstance(records, dict):
            records = [records]
        yield from records
        if ptype == "none" or not records:
            return
        if ptype == "offset":
            if len(records) < page_size:
                return
            offset += len(records)
        elif ptype == "cursor":
            cursor = _extract_path(body, pag.get("cursor_path", "next_cursor"))
            if not cursor:
                return


def apply_processors(
    df: "DataFrame", processors: list[dict[str, Any]],
) -> dict[str, Any]:
    """API processors: per-record expression + aggregation into state
    (reference: api/spec.go:1343-1368 — aggregation kinds maximum /
    minimum / collect / first / last). One distributed aggregate pass;
    the scalar results feed the next request's state (e.g. cursor
    high-water marks)."""
    from pyspark.sql import functions as F

    aggs, names = [], []
    for p in processors:
        expr = F.expr(p["expression"])
        kind = p.get("aggregation", "last")
        name = p.get("output") or p["expression"]
        if kind == "maximum":
            aggs.append(F.max(expr))
        elif kind == "minimum":
            aggs.append(F.min(expr))
        elif kind == "collect":
            aggs.append(F.collect_list(expr))
        elif kind == "first":
            aggs.append(F.first(expr, ignorenulls=True))
        elif kind == "last":
            aggs.append(F.last(expr, ignorenulls=True))
        else:
            raise ValueError(f"unknown aggregation: {kind!r}")
        names.append(name)
    row = df.agg(*[a.alias(f"__p{i}") for i, a in enumerate(aggs)]) \
        .collect()[0]
    return {name: row[f"__p{i}"] for i, name in enumerate(names)}


def read_api(
    spark: SparkSession, spec: dict[str, Any],
    transport: Transport | None = None, flatten_records: bool = True,
) -> DataFrame:
    """Fetch all pages and land them as a DataFrame (schema inferred from
    the JSON records, nested objects flattened like the JSON file path)."""
    records = list(iter_records(spec, transport))
    if not records:
        raise ValueError(f"API returned no records for {spec.get('url')!r}")
    # slice count scales with the record volume (about 2k records per
    # slice), not defaultParallelism: API pages accumulate driver-side,
    # so a handful of records would otherwise fan into one near-empty
    # python partition per core — and schema inference + the read each
    # pay a worker round trip per slice (guide §4)
    slices = max(1, min(len(records) // 2000 + 1,
                        spark.sparkContext.defaultParallelism))
    df = spark.read.json(
        spark.sparkContext.parallelize(
            [_json.dumps(r) for r in records], slices))
    if flatten_records:
        from sling_cli_spark.operators.flatten import flatten

        df = flatten(df)
    return df
