"""Round-3 smoke: run the queries broken by the NTZ regression at
sf0.001 and print row counts. Not a test — a fast iteration loop."""
import sys

from rsyslog_nginx_clickhouse_spark.session import get_spark
from rsyslog_nginx_clickhouse_spark.queries import load_all

NAMES = sys.argv[1:] or [
    "grafana_timeseries",
    "timeseries_5min_by_type",
    "user_event_gaps",
    "funnel_view_click_purchase",
    "similar_activity_users",
    "events_in_sessions_rangejoin",
]

spark = get_spark("smoke-r3", cpus=8)
reg = load_all()
sf_dir = "/root/testdata/sf0.001"
fails = 0
for n in NAMES:
    try:
        rows = reg[n].spark(spark, sf_dir).count()
        print(f"OK   {n}: {rows} rows")
    except Exception as e:
        fails += 1
        print(f"FAIL {n}: {type(e).__name__}: {str(e)[:300]}")
sys.exit(1 if fails else 0)
