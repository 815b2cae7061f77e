"""Engine facade: the reference operator's workflow end-to-end."""

from __future__ import annotations

import os

from rsyslog_nginx_clickhouse_spark.engine import Engine

LINES = [
    '1.1.1.1 - - [06/Apr/2020:09:00:0%d +0000] "GET /a HTTP/1.1" 200 10 "-" "ua" "-"' % i
    for i in range(5)
] + [
    '2.2.2.2 - - [07/Apr/2020:10:00:0%d +0000] "GET /b HTTP/1.1" 404 20 "-" "ua" "-"' % i
    for i in range(3)
] + ["garbage line"]


def test_engine_ingest_then_grafana_sql(spark, tmp_path):
    log = str(tmp_path / "access.log")
    with open(log, "w") as f:
        f.write("\n".join(LINES) + "\n")

    eng = Engine(table_root=str(tmp_path / "nginx"), spark=spark)
    assert eng.ingest(log) == 9  # bad line lands in null partition, kept

    # the reference's published Grafana query, verbatim macros
    rows = eng.sql(
        "SELECT $timeSeries as t, count(*) as Count "
        "FROM $table WHERE $timeFilter GROUP BY t ORDER BY t",
        time_from="2020-04-06 00:00:00", time_to="2020-04-08 00:00:00",
    ).collect()
    assert [(str(r["t"]), r["Count"]) for r in rows] == [
        ("2020-04-06 09:00:00", 5), ("2020-04-07 10:00:00", 3)]

    # ClickHouse-flavored SQL runs as-is
    ch = eng.sql("SELECT toYYYYMMDD(logdate) AS d, count(*) AS c "
                 "FROM nginx WHERE logdate IS NOT NULL "
                 "GROUP BY d ORDER BY d").collect()
    assert [(r["d"], r["c"]) for r in ch] == [(20200406, 5), (20200407, 3)]

    # the rest of the macro surface flows through the facade too:
    # $adhoc dashboard filters and $conditionalTest template vars
    ad = eng.sql(
        "SELECT count(*) AS c FROM $table WHERE $timeFilter AND $adhoc"
        " $conditionalTest(AND response = $code, $code)",
        time_from="2020-04-06 00:00:00", time_to="2020-04-08 00:00:00",
        adhoc_filters=[("clientip", "=", "2.2.2.2")],
        template_vars={"code": 404},
    ).collect()
    assert ad[0]["c"] == 3

    # dead letters visible through the debug tee
    assert eng.dead_letters(log).count() == 1

    # compaction keeps the data intact
    eng.compact()
    assert eng.table().count() == 9
    assert os.path.isdir(str(tmp_path / "nginx" / "logdate=2020-04-06"))


def test_engine_stream_ingests_exactly_once(spark, tmp_path):
    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "a.log"), "w") as f:
        f.write("\n".join(LINES[:5]) + "\n")
    eng = Engine(table_root=str(tmp_path / "nginx"), spark=spark)
    q = eng.stream(log_dir, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert eng.table().count() == 5
    # restart with no new files: no duplicates
    q2 = eng.stream(log_dir, checkpoint=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert eng.table().count() == 5
