"""CLI entry-point tests (run-script parity, SURVEY.md §3)."""

from __future__ import annotations

from dataflow_example_spark.cli import main


def _csv_line(ts: str, station: str) -> str:
    fields = [ts, station, "5", "N", "x", "x", "x", "120", "x", "x", "x"]
    for i in range(1, 9):
        fields += [str(10 * i), "0.5", "60.0", "x", "x"]
    return ",".join(fields)


def test_cli_batch_traffic(spark, tmp_path, capsys):
    src = tmp_path / "in.csv"
    src.write_text(
        "Timestamp,hdr\n" + _csv_line("01/01/2010 08:00:00", "S001") + "\n"
    )
    out = str(tmp_path / "out")
    main(
        [
            "traffic",
            "--input",
            str(src),
            "--output",
            out,
            "--windowDuration",
            "60",
            "--windowSlideEvery",
            "60",
        ]
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].lane_max_flow == 80


def test_cli_inject_and_starter(spark, tmp_path, capsys):
    src = tmp_path / "in.csv"
    src.write_text("Timestamp,hdr\n" + _csv_line("01/01/2010 08:00:00", "S1") + "\n")
    topic = str(tmp_path / "topic")
    main(["inject", "--input", str(src), "--outputTopic", topic])
    assert "published 1 lines" in capsys.readouterr().out
    main(["starter"])
    assert capsys.readouterr().out.splitlines() == ["HELLO", "WORLD"]


def test_cli_query_subcommand(spark, capsys, tmp_path):
    from dataflow_example_spark.cli import main

    main(["query", "list"])
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 60

    out = str(tmp_path / "q1")
    main([
        "query", "q1_pricing_summary",
        "--sfDir", "/root/testdata/sf0.001", "--output", out,
    ])
    assert spark.read.parquet(out).count() > 0
