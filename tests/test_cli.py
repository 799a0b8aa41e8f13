"""CLI entrypoint (python -m hauser_spark) — the reference's main.go:18-39
flags and wiring, driven end-to-end over the golden fixtures."""

import os

from hauser_spark import __version__
from hauser_spark.__main__ import main

REF = "/root/reference/testing/testdata"


def test_version_flag(capsys):
    assert main(["-version"]) == 0
    assert f"hauser_spark {__version__}" in capsys.readouterr().out


def test_cli_golden_loop_local_provider(spark, tmp_path, capsys):
    """-c config.toml drives config.load -> make_storage -> service.run;
    the local provider is storage-only (config.go:226-231) and the five
    groupByDay bundles byte-match the reference's goldens."""
    save_dir = tmp_path / "export"
    cfg_path = tmp_path / "config.toml"
    cfg_path.write_text(
        f"""
Provider = "local"
GroupFilesByDay = true
StartTime = "2020-08-26T00:00:00Z"
TmpDir = "{tmp_path / 'tmp'}"
FixtureFile = "{REF}/raw.json"

[local]
SaveDir = "{save_dir}"
"""
    )
    assert main(["-c", str(cfg_path), "--max-bundles", "5"]) == 0
    assert "processed 5 bundle(s)" in capsys.readouterr().out

    golden = sorted(os.listdir(f"{REF}/groupByDay"))
    uploaded = sorted(
        n for n in os.listdir(save_dir) if not n.startswith(".sync")
    )
    assert uploaded == golden
    for name in golden:
        with open(f"{REF}/groupByDay/{name}", "rb") as f:
            expected = f.read()
        with open(save_dir / name, "rb") as f:
            got = f.read()
        assert got == expected, name


def test_cli_deprecated_warehouse_key(spark, tmp_path):
    """Warehouse = "local" still selects the local provider
    (config.go:206-221)."""
    cfg_path = tmp_path / "config.toml"
    cfg_path.write_text(
        f"""
Warehouse = "local"
StartTime = "2020-08-26T00:00:00Z"
TmpDir = "{tmp_path / 'tmp'}"
FixtureFile = "{REF}/raw.json"

[local]
SaveDir = "{tmp_path / 'export'}"
"""
    )
    assert main(["-c", str(cfg_path), "--max-bundles", "1"]) == 0
    assert os.path.exists(tmp_path / "export")
