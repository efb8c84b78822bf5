"""CLI parity surface (stratum plan/apply/verify/status/reset analog,
crates/cli/src/commands/mod.rs) driven through stratum_spark.cli.main."""

from __future__ import annotations

import json

from stratum_spark.cdc import generate_binlog, write_binlog
from stratum_spark.cli import main

SMQL = """
pipeline "orders_flat" {{
    from {{ connection = connection.src  table = "orders" }}
    to   {{ connection = connection.dst  table = "orders_out" }}

    where "big" {{ orders.o_totalprice > 100000.0 }}

    select {{
        order_id = orders.o_orderkey
        total    = orders.o_totalprice
    }}

    validate {{
        assert "positive" {{
            check  = total > 0.0
            action = warn
        }}
    }}

    settings {{ copy_columns = "MAP_ONLY" }}
}}
"""


def test_cli_cdc_lifecycle(spark, tmp_path, capsys):
    feed = generate_binlog(spark, n_docs=100, n_events=600, seed=3)
    write_binlog(feed, str(tmp_path / "binlog"), n_chunks=2)
    wh = str(tmp_path / "wh")
    args = ["--warehouse", wh, "--events-hint", "600", "--n-buckets", "8"]
    assert main(["backfill", "--binlog", str(tmp_path / "binlog"),
                 "--epoch-size", "200", *args]) == 0
    capsys.readouterr()
    assert main(["status", "--json", *args]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["schema_ver"] == 3 and payload["epoch"] >= 0
    assert payload["delta_rows"] > 0  # mor default
    assert main(["verify", "--write-receipt", *args]) == 0
    assert main(["verify", *args]) == 0  # exit 0 = receipt matches
    assert main(["compact", *args]) == 0
    capsys.readouterr()
    assert main(["status", "--json", *args]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["delta_rows"] == 0 and payload["table_rows"] > 0
    # backfill again: everything replay-skips, state unchanged
    assert main(["backfill", "--binlog", str(tmp_path / "binlog"),
                 "--epoch-size", "200", *args]) == 0
    assert main(["reset", "--warehouse", wh, "--yes"]) == 0
    assert main(["version"]) == 0


def test_cli_plan_and_apply_smql(spark, sf_dir, tmp_path, capsys):
    cfg = tmp_path / "orders.smql"
    cfg.write_text(SMQL.format())
    table = f"orders={sf_dir}/orders.parquet"
    assert main(["plan", "-c", str(cfg), "--table", table]) == 0
    payload = json.loads(capsys.readouterr().out)
    p = payload["orders_flat"]
    assert p["source_rows"] > 0 and p["output_columns"] == ["order_id", "total"]
    assert main(["apply", "-c", str(cfg), "--table", table,
                 "--warehouse", str(tmp_path / "whx")]) == 0
    out = capsys.readouterr().out
    assert "ok" in out and "written=" in out


def test_pyfiles_zip_is_self_contained(tmp_path):
    """The spark-submit --py-files artifact must import with ONLY the zip
    on PYTHONPATH (cluster-submission packaging, tools/make_pyfiles.sh)."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        ["bash", "/root/repo/tools/make_pyfiles.sh", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    zipp = tmp_path / "stratum_spark.zip"
    assert zipp.exists()
    probe = subprocess.run(
        [sys.executable, "-c",
         "import stratum_spark, stratum_spark.cli, stratum_spark.cdc; "
         "print(stratum_spark.cli.main(['version']))"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": str(zipp)},
    )
    assert probe.returncode == 0, probe.stderr
    assert "stratum_spark" in probe.stdout
