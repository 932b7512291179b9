"""CLI dispatch tests (cmd/mie/main.go:140-170 command parity),
executed in-process against a parquet-engine store in tmp_path so state
persists across invocations the way it does for the real binary."""

from __future__ import annotations

import json
import os

import pytest

from mie_spark.cli import main
from mie_spark.config import config_path, default_config, save_config


@pytest.fixture()
def cfg_file(tmp_path, monkeypatch):
    cfg = default_config()
    cfg.storage.engine = "parquet"
    cfg.storage.path = str(tmp_path / "data")
    cfg.embedding.dimensions = 4
    p = str(tmp_path / "config.yaml")
    save_config(cfg, p)
    # ensure ambient env can't redirect the CLI under test
    for k in ("MIE_CONFIG_PATH", "MIE_STORAGE_ENGINE", "MIE_STORAGE_PATH",
              "MIE_EMBEDDING_PROVIDER", "NOMIC_API_KEY", "OPENAI_API_KEY"):
        monkeypatch.delenv(k, raising=False)
    return p


def _run(capsys, *argv) -> tuple[int, str]:
    rc = main(list(argv))
    out = capsys.readouterr().out
    return rc, out


def test_init_creates_and_respects_force(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc, out = _run(capsys, "init")
    assert rc == 0 and os.path.exists(config_path(str(tmp_path)))
    rc, _ = _run(capsys, "init")
    assert rc == 1  # already exists
    rc, _ = _run(capsys, "init", "--force")
    assert rc == 0


def test_reset_requires_yes(cfg_file, capsys):
    rc, _ = _run(capsys, "--config", cfg_file, "reset")
    assert rc == 1


def test_status_json_on_fresh_store(spark, cfg_file, capsys):
    rc, out = _run(capsys, "--config", cfg_file, "status", "--json")
    assert rc == 0
    payload = json.loads(out)
    assert payload["storage_engine"] == "parquet"


def test_import_query_export_roundtrip(spark, cfg_file, tmp_path, capsys):
    data = {
        "mie_fact": [
            {"content": "cli imported fact", "category": "general"},
        ]
    }
    src = tmp_path / "in.json"
    src.write_text(json.dumps(data))

    rc, out = _run(capsys, "--config", cfg_file, "import", "-i", str(src))
    assert rc == 0 and "Imported 1 rows" in out

    rc, out = _run(
        capsys, "--config", cfg_file, "query",
        "SELECT content FROM mie_fact WHERE valid",
    )
    assert rc == 0
    assert json.loads(out.splitlines()[0])["content"] == "cli imported fact"

    dest = tmp_path / "out.json"
    rc, _ = _run(capsys, "--config", cfg_file, "export", "-o", str(dest))
    assert rc == 0
    exported = json.loads(dest.read_text())
    assert exported["mie_fact"][0]["content"] == "cli imported fact"


def test_import_dry_run_writes_nothing(spark, cfg_file, tmp_path, capsys):
    src = tmp_path / "in.json"
    src.write_text(json.dumps({"mie_fact": [{"content": "phantom"}]}))
    rc, out = _run(
        capsys, "--config", cfg_file, "import", "-i", str(src), "--dry-run"
    )
    assert rc == 0 and "Would import 1 rows" in out
    rc, out = _run(
        capsys, "--config", cfg_file, "query", "SELECT count(*) AS n FROM mie_fact"
    )
    assert json.loads(out.splitlines()[0])["n"] == 0


def test_backup_restore_cli(spark, cfg_file, tmp_path, capsys):
    src = tmp_path / "in.json"
    src.write_text(json.dumps({"mie_fact": [{"content": "keep me"}]}))
    _run(capsys, "--config", cfg_file, "import", "-i", str(src))

    bdir = str(tmp_path / "bak")
    rc, out = _run(capsys, "--config", cfg_file, "backup", bdir)
    assert rc == 0 and "Backed up" in out

    _run(capsys, "--config", cfg_file, "reset", "--yes")
    rc, out = _run(
        capsys, "--config", cfg_file, "query", "SELECT count(*) AS n FROM mie_fact"
    )
    assert json.loads(out.splitlines()[0])["n"] == 0

    rc, out = _run(capsys, "--config", cfg_file, "restore", bdir)
    assert rc == 0
    rc, out = _run(
        capsys, "--config", cfg_file, "query",
        "SELECT content FROM mie_fact",
    )
    assert json.loads(out.splitlines()[0])["content"] == "keep me"


def test_sql_script_export_import(spark, cfg_file, tmp_path, capsys):
    src = tmp_path / "in.json"
    src.write_text(json.dumps({"mie_fact": [{"content": "scripted"}]}))
    _run(capsys, "--config", cfg_file, "import", "-i", str(src))

    script = tmp_path / "dump.sql"
    rc, _ = _run(
        capsys, "--config", cfg_file, "export", "--format", "sql", "-o", str(script)
    )
    assert rc == 0 and "INSERT INTO mie_fact" in script.read_text()
    # datalog is accepted as the reference-compatible alias
    rc, out = _run(
        capsys, "--config", cfg_file, "import", "--format", "datalog",
        "-i", str(script), "--dry-run",
    )
    assert rc == 0 and "Would import" in out


def test_invalid_config_errors_for_data_commands_but_not_status(
    tmp_path, capsys
):
    """A malformed config must stop reset/import/export/query; status
    degrades to defaults (status.go:65-69)."""
    bad = tmp_path / "bad.yaml"
    bad.write_text("version: '999'\n")
    rc, _ = _run(capsys, "--config", str(bad), "reset", "--yes")
    assert rc == 1
    err = capsys.readouterr()
    rc, out = _run(capsys, "--config", str(bad), "status", "--json")
    assert rc == 0
    assert json.loads(out)["storage_engine"] in ("parquet", "mem")


def test_mcp_mode_serves_stdio(spark, cfg_file, capsys, monkeypatch):
    """`--mcp` global-flag parity (main.go:53): a JSON-RPC initialize
    over stdin gets a framed response on stdout, using the configured
    store."""
    import io
    import sys as _sys

    req = json.dumps(
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}
    )
    monkeypatch.setattr(_sys, "stdin", io.StringIO(req + "\n"))
    rc = main(["--config", cfg_file, "--mcp"])
    assert rc == 0
    line = capsys.readouterr().out.splitlines()[0]
    resp = json.loads(line)
    assert resp["id"] == 1
    assert resp["result"]["serverInfo"]["name"] == "mie-spark"


def test_typoed_mie_config_path_stops_data_commands(tmp_path, monkeypatch, capsys):
    """An explicit MIE_CONFIG_PATH pointing at a missing file must error,
    not silently reset the default data dir."""
    monkeypatch.setenv("MIE_CONFIG_PATH", str(tmp_path / "nope.yaml"))
    rc = main(["reset", "--yes"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "cannot read config file" in err


def test_mcp_mode_accepts_config_equals_form(spark, cfg_file, capsys, monkeypatch):
    import io
    import sys as _sys

    req = json.dumps(
        {"jsonrpc": "2.0", "id": 7, "method": "initialize", "params": {}}
    )
    monkeypatch.setattr(_sys, "stdin", io.StringIO(req + "\n"))
    rc = main([f"--config={cfg_file}", "--mcp"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.splitlines()[0])["id"] == 7
    # trailing --config without a value is a usage error, not a crash
    rc = main(["--mcp", "--config"])
    assert rc == 1


def test_dry_run_count_excludes_embedding_tables(spark, cfg_file, tmp_path, capsys):
    src = tmp_path / "in.json"
    src.write_text(json.dumps({
        "mie_fact": [{"content": "real row"}],
        "mie_fact_embedding": [{"fact_id": "x", "embedding": [0.1]}],
    }))
    rc, out = _run(
        capsys, "--config", cfg_file, "import", "-i", str(src), "--dry-run"
    )
    assert rc == 0 and "Would import 1 rows" in out


def test_explain_cli_reports_plan_health(spark, cfg_file, capsys):
    rc, out = _run(
        capsys, "--config", cfg_file, "explain",
        "SELECT category, count(*) AS n FROM mie_fact "
        "WHERE category = 'general' GROUP BY category",
    )
    assert rc == 0
    report = json.loads(out.splitlines()[0])
    assert set(report) == {
        "pushed_filters", "read_schemas", "shuffle_exchanges",
        "broadcast_joins", "cartesian_or_nested_loop_joins",
        "codegen_spans",
    }
    # a grouped filter query: at least the aggregation exchange, and no
    # nested-loop/cartesian join anywhere
    assert report["cartesian_or_nested_loop_joins"] == 0
    assert report["shuffle_exchanges"] >= 0
