"""Remote staging (http/ftp/sftp/gdrive) — fake transports, no network."""

import pytest

from sling_cli_spark.sources.remote import (
    _gdrive_url, _staged_name, is_remote, stage_remote,
)


def test_is_remote():
    assert is_remote("https://x/a.csv")
    assert is_remote("ftp://u:p@h/a.csv")
    assert is_remote("sftp://h/a.csv")
    assert is_remote("gdrive://abc123")
    assert not is_remote("/local/a.csv")
    assert not is_remote("s3a://bucket/a.csv")  # hadoop FS handles these


def test_stage_http_and_reuse(tmp_path):
    calls = []

    def transport(url):
        calls.append(url)
        return b"id,v\n1,a\n"

    p1 = stage_remote("https://x/data.csv", str(tmp_path), transport)
    p2 = stage_remote("https://x/data.csv", str(tmp_path), transport)
    assert p1 == p2 and open(p1).read() == "id,v\n1,a\n"
    assert len(calls) == 1  # second call reused the staged copy
    p3 = stage_remote("https://x/data.csv", str(tmp_path), transport,
                      overwrite=True)
    assert p3 == p1 and len(calls) == 2


def test_staged_names_unique_per_uri(tmp_path):
    assert _staged_name("https://a/x.csv") != _staged_name("https://b/x.csv")
    assert _staged_name("https://a/x.csv").endswith("_x.csv")


def test_gdrive_url():
    assert _gdrive_url("gdrive://FILE42") == \
        "https://drive.google.com/uc?export=download&id=FILE42"


def test_gdrive_routes_through_transport(tmp_path):
    seen = []

    def transport(url):
        seen.append(url)
        return b"x"

    stage_remote("gdrive://F1", str(tmp_path), transport)
    assert seen == ["https://drive.google.com/uc?export=download&id=F1"]


def test_sftp_gated_without_paramiko(tmp_path):
    try:
        import paramiko  # noqa: F401
        pytest.skip("paramiko present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="paramiko"):
        stage_remote("sftp://h/f.csv", str(tmp_path))


def test_read_source_stages_remote(spark, tmp_path, monkeypatch):
    import sling_cli_spark.sources.remote as rmod
    from sling_cli_spark.config import Source, SourceOptions
    from sling_cli_spark.sources.files import read_source

    monkeypatch.setattr(
        rmod, "_default_transport", lambda url: b"id,v\n1,a\n2,b\n")
    # point the default staging dir at tmp so repeat test runs don't reuse
    monkeypatch.setattr(
        rmod.tempfile, "gettempdir", lambda: str(tmp_path))
    src = Source(stream="https://example.test/data.csv",
                 options=SourceOptions(format="csv"))
    df = read_source(spark, src)
    assert df.count() == 2 and set(df.columns) == {"id", "v"}


def test_run_el_task_from_remote_source(spark, tmp_path, monkeypatch):
    import sling_cli_spark.sources.remote as rmod
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    monkeypatch.setattr(
        rmod, "_default_transport", lambda url: b"id,v\n1,a\n2,b\n3,c\n")
    monkeypatch.setattr(rmod.tempfile, "gettempdir", lambda: str(tmp_path))
    out = str(tmp_path / "o.parquet")
    cfg = Config.from_dict({
        "source": {"stream": "https://example.test/rows.csv"},
        "target": {"object": out},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 3
    assert spark.read.parquet(out).count() == 3
