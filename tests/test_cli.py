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


def test_cli_pause_resume(spark, tmp_path, capsys):
    """`pause` drops a marker the backfill honors between epochs; `resume`
    clears it and continues from the committed bookmark to the exact same
    final state (verb parity with crates/cli/src/commands/pause.rs /
    resume.rs; the epoch bookmark is the checkpoint)."""
    feed = generate_binlog(spark, n_docs=100, n_events=600, seed=3)
    write_binlog(feed, str(tmp_path / "binlog"), n_chunks=2)
    wh = str(tmp_path / "whp")
    args = ["--warehouse", wh, "--events-hint", "600", "--n-buckets", "8"]

    # pause BEFORE starting: the backfill must apply zero epochs
    assert main(["pause", "--warehouse", wh]) == 0
    assert main(["backfill", "--binlog", str(tmp_path / "binlog"),
                 "--epoch-size", "200", *args]) == 0
    out = capsys.readouterr().out
    assert "applied 0 epochs" in out

    # resume runs the backfill to completion
    assert main(["resume", "--binlog", str(tmp_path / "binlog"),
                 "--epoch-size", "200", *args]) == 0
    out = capsys.readouterr().out
    assert "pause marker cleared" in out and "applied 3 epochs" in out
    assert main(["status", "--json", *args]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["epoch"] == 2

    # resume with no marker and no binlog is a harmless no-op
    assert main(["resume", *args]) == 0
    assert "no pause marker" in capsys.readouterr().out


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


def test_cli_ping_and_jdbc_source(spark, tmp_path, capsys):
    """ping probes a live JDBC url; plan/apply accept --jdbc-table
    sources (keyset-partitioned reads of a real database)."""
    url = "jdbc:derby:memory:clidb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE items ("o_orderkey" INT PRIMARY KEY, "o_totalprice" DOUBLE)'
    )
    st.executeUpdate('INSERT INTO items VALUES (1, 150000.0), (2, 250000.0), (3, 50.0)')

    assert main(["ping", "--url", url]) == 0
    out = capsys.readouterr().out
    assert out.startswith("ok: Apache Derby")
    assert main(["ping", "--url", "jdbc:derby:memory:doesnotexist"]) == 1
    capsys.readouterr()

    cfg = tmp_path / "o.smql"
    cfg.write_text(SMQL.format())
    jt = f"orders={url}|items|o_orderkey|1|3|org.apache.derby.jdbc.EmbeddedDriver"
    assert main(["apply", "-c", str(cfg), "--jdbc-table", jt,
                 "--warehouse", str(tmp_path / "whj")]) == 0
    out = capsys.readouterr().out
    assert "ok" in out and "written=2" in out  # rows 1 and 2 pass the filter
