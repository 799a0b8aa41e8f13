"""Config env-override layer (config/config.go:141-161) and the F2
SegmentId restriction hook (client/export.go:52, config/config.go:17)."""

import datetime as dt

import pytest

from hauser_spark.config import (
    DEFAULT_API_URL,
    DEFAULT_SEGMENT_ID,
    Config,
    load_toml,
)
from hauser_spark.sources.export_client import LocalFixtureClient

UTC = dt.timezone.utc
RAW = "/root/reference/testing/testdata/raw.json"


def _write_toml(tmp_path, body: str) -> str:
    p = tmp_path / "hauser.toml"
    p.write_text(body)
    return str(p)


def test_env_token_overrides_toml(tmp_path, monkeypatch):
    # config/config.go:154-156 — env wins over the TOML value
    path = _write_toml(tmp_path, 'FsApiToken = "from-toml"\n')
    monkeypatch.setenv("FULLSTORY_API_TOKEN", "from-env")
    assert load_toml(path).fs_api_token == "from-env"


def test_no_env_keeps_toml_token(tmp_path, monkeypatch):
    path = _write_toml(tmp_path, 'FsApiToken = "from-toml"\n')
    monkeypatch.delenv("FULLSTORY_API_TOKEN", raising=False)
    assert load_toml(path).fs_api_token == "from-toml"


def test_empty_env_is_not_an_override(tmp_path, monkeypatch):
    # Go's os.Getenv("...") != "" check: empty string does not override
    path = _write_toml(tmp_path, 'FsApiToken = "from-toml"\n')
    monkeypatch.setenv("FULLSTORY_API_TOKEN", "")
    assert load_toml(path).fs_api_token == "from-toml"


def test_api_url_and_segment_defaults(tmp_path, monkeypatch):
    monkeypatch.delenv("FULLSTORY_API_TOKEN", raising=False)
    cfg = load_toml(_write_toml(tmp_path, ""))
    assert cfg.api_url == DEFAULT_API_URL
    assert cfg.segment_id == DEFAULT_SEGMENT_ID


def test_segment_and_url_from_toml(tmp_path, monkeypatch):
    monkeypatch.delenv("FULLSTORY_API_TOKEN", raising=False)
    cfg = load_toml(
        _write_toml(
            tmp_path,
            'SegmentId = "power-users"\nApiURL = "https://example.test"\n',
        )
    )
    assert cfg.segment_id == "power-users"
    assert cfg.api_url == "https://example.test"


def test_validate_refills_empty_strings():
    # config/config.go:166-172 — empty means "use the default"
    cfg = Config(api_url="", segment_id="").validate(
        now=dt.datetime(2020, 9, 1, tzinfo=UTC)
    )
    assert cfg.api_url == DEFAULT_API_URL
    assert cfg.segment_id == DEFAULT_SEGMENT_ID


# --- F2: segment restriction in the export client ---------------------------

WIN_START = dt.datetime(2020, 8, 1, tzinfo=UTC)
WIN_END = dt.datetime(2020, 9, 1, tzinfo=UTC)


def test_everyone_segment_is_noop():
    everyone = LocalFixtureClient(None, RAW)
    named = LocalFixtureClient(
        None, RAW, segment_id="all", segments={"all": lambda rec: True}
    )
    e1 = everyone.create_export(WIN_START, WIN_END, [])
    e2 = named.create_export(WIN_START, WIN_END, [])
    assert everyone.get_export_records(e1) == named.get_export_records(e2)
    assert len(everyone.get_export_records(e1)) > 0


def test_segment_restricts_records():
    seg = LocalFixtureClient(
        None,
        RAW,
        segment_id="clickers",
        segments={"clickers": lambda rec: rec.get("EventType") == "click"},
    )
    eid = seg.create_export(WIN_START, WIN_END, [])
    recs = seg.get_export_records(eid)
    assert recs, "fixture contains click events"
    assert all(r["EventType"] == "click" for r in recs)


def test_unknown_segment_raises():
    with pytest.raises(KeyError):
        LocalFixtureClient(None, RAW, segment_id="nope", segments={})
