"""Round-12 ADVICE + VERDICT hygiene fixes.

- configured CSV delimiter is authoritative (csv.go:243-256: detection
  only assigns when c.Delimiter == "") — ADVICE r12 high
- masked-source full-refresh rewrites time tokens, and the runner gate
  covers pure time-token masks — ADVICE r12 low
- write-path datetime_format converts ISO-8601 tokens to a Java layout
  exactly like the read path — ADVICE r12 low
- operator-internal persists register with caching.release_operator_caches
  — VERDICT r11 "What's wrong" #1
"""

import datetime
import os

from sling_cli_spark.config import SourceOptions, TargetOptions


def test_source_options_delimiter_unset_by_default():
    assert SourceOptions().delimiter is None
    assert TargetOptions().delimiter == ","  # write needs a concrete sep


def test_configured_delimiter_not_overridden_by_sample(spark, tmp_path):
    # pipe-delimited file whose text field is comma-laden: comma "wins"
    # the sample vote, but the user configured '|' — the reference keeps
    # the configured delimiter (csv.go only detects when unset)
    p = tmp_path / "pipes.csv"
    p.write_text(
        "id|note\n"
        "1|a,b,c,d,e\n"
        "2|f,g,h,i,j\n"
        "3|k,l,m,n,o\n")
    from sling_cli_spark.sources.files import read_files

    df = read_files(spark, str(p),
                    SourceOptions(format="csv", delimiter="|"))
    assert df.columns == ["id", "note"]
    assert df.filter("note = 'a,b,c,d,e'").count() == 1


def test_unset_delimiter_still_autodetects(spark, tmp_path):
    p = tmp_path / "semis.csv"
    p.write_text("a;b;c\n1;2;3\n4;5;6\n7;8;9\n")
    from sling_cli_spark.sources.files import read_files

    df = read_files(spark, str(p), SourceOptions(format="csv"))
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 3


def test_has_mask_tokens_gate():
    from sling_cli_spark.sources.files import has_mask_tokens

    assert has_mask_tokens("s3://b/t/{part_year}/{part_month}/")
    assert has_mask_tokens("/data/{YYYY}/{MM}/{DD}/")   # pure time tokens
    assert has_mask_tokens("/data/{MMM}/")
    assert not has_mask_tokens("/data/plain/path")
    assert not has_mask_tokens("/data/{not_a_token}/x")
    assert not has_mask_tokens("")


def test_masked_full_refresh_globs_time_tokens(spark, tmp_path):
    # {YYYY}/{MM} mask, no time range: every token must become '*' —
    # a literal {MM} would be Hadoop glob ALTERNATION and match nothing
    from sling_cli_spark.config import Source
    from sling_cli_spark.sources.files import read_masked_source

    for ym in [("2024", "01"), ("2024", "02")]:
        d = tmp_path / ym[0] / ym[1]
        d.mkdir(parents=True)
        (d / "part.csv").write_text(f"k,v\n{ym[1]},x\n")
    src = Source(stream=str(tmp_path / "{YYYY}" / "{MM}" / "*.csv"),
                 options=SourceOptions(format="csv"))
    df = read_masked_source(spark, src, time_range=None)
    assert df.count() == 2


def test_write_datetime_format_iso_tokens(spark, tmp_path):
    # 'DD-MM-YYYY' in Java layout means day-of-YEAR — the write path
    # must convert ISO tokens like the read path does
    from sling_cli_spark.config import Mode, Target
    from sling_cli_spark.sinks.writers import write_files

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 7, 10, 30, 0))], "id int, ts timestamp")
    out = str(tmp_path / "out")
    write_files(df, Target(object=out, options=TargetOptions(
        format="csv", datetime_format="DD-MM-YYYY HH:mm:ss")),
        Mode.FULL_REFRESH)
    text = "".join(
        open(os.path.join(out, f)).read()
        for f in os.listdir(out) if f.endswith(".csv"))
    assert "07-03-2024 10:30:00" in text, text


def test_runner_masked_bounds_are_naive_utc(spark, monkeypatch):
    # a tz-aware watermark must not raise aware-vs-naive TypeError and
    # the upper bound must be UTC (not the driver's local clock)
    import sling_cli_spark.runner as R

    captured = {}

    def fake_masked(spark_, source, time_range=None, base_dir=""):
        captured["rng"] = time_range
        return spark.createDataFrame([("2024-06-01",)], "ts string")

    monkeypatch.setattr(
        "sling_cli_spark.sources.files.read_masked_source", fake_masked)
    from sling_cli_spark.config import (Config, Mode, Source, Target)

    cfg = Config(
        source=Source(stream="/data/{part_year}/{part_month}/*.parquet",
                      update_key="ts",
                      options=SourceOptions(format="parquet")),
        target=Target(object="/tmp/x", options=TargetOptions()),
        mode=Mode.INCREMENTAL)
    R.build_read_plan(spark, cfg, watermark="2024-01-01T00:00:00+05:00")
    lo, hi = captured["rng"]
    assert lo.tzinfo is None and hi.tzinfo is None
    # +05:00 normalizes to 2023-12-31T19:00 UTC-naive
    assert lo == datetime.datetime(2023, 12, 31, 19, 0, 0)
    # upper bound ~ utcnow, not local now
    utcnow = datetime.datetime.now(datetime.timezone.utc) \
        .replace(tzinfo=None)
    assert abs((hi - utcnow).total_seconds()) < 120


def test_persist_tracking_contract(spark, documents):
    from sling_cli_spark.caching import (
        release_operator_caches, tracked_cache_count)
    from sling_cli_spark.operators.dedup import ngram_novelty

    release_operator_caches()
    before = tracked_cache_count()
    out = ngram_novelty(documents.limit(50))
    assert out.count() > 0
    assert tracked_cache_count() == before + 1
    released = release_operator_caches()
    assert released >= 1
    assert tracked_cache_count() == 0
    # released cache is safe to re-consume: silently recomputes
    assert out.count() > 0


def test_normalize_text_vectorized_nullsafe(spark):
    from sling_cli_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("a", "Café"), ("b", "Ｈｉ"), ("c", None)],
        "doc_id string, text string")
    rows = {r["doc_id"]: r["text"]
            for r in normalize_text(df, form="NFKC").collect()}
    assert rows["a"] == "Café"
    assert rows["b"] == "Hi"
    assert rows["c"] is None
