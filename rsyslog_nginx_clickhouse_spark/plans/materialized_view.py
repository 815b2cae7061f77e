"""``CREATE MATERIALIZED VIEW`` DDL analog (round 14, VERDICT r13
item 4) — the AggregatingMergeTree/SummingMergeTree idiom end-to-end.

In ClickHouse a materialized view is an INSERT trigger: each block
inserted into the source table is run through the view's ``AS
SELECT … xxxState(…) … GROUP BY …`` body and the resulting partial
STATES are appended to the view's own storage; serving queries read
the view with ``xxxMerge`` and re-group (reference README.md's
dashboard pattern). This module accepts the VERBATIM CH DDL text and
wires it to the engine's existing state machinery:

- the body runs through ``functions.macros.sql`` — the SAME
  ``-State`` rewrites the inline SQL spellings use
  (``_rewrite_state_merge``: deterministic KMV for uniqState, exact
  run-length histograms for quantileState, plain partials for the
  additive family, ord-structs for argMax/argMin, truncated exact
  pairs for topK), so the MV analog and the SQL surface cannot
  diverge;
- each ``insert()`` appends one parquet part of state rows —
  O(groups · state) per batch regardless of batch size, the
  ``plans/agg_rollup.append_*_partial`` scaling contract;
- the view name is registered as a session temp view over the part
  files, so the user's verbatim serving read (``SELECT k,
  uniqMerge(st) FROM mv GROUP BY k``) runs unmodified through the
  engine SQL facade.

At 100 TB each ingest batch shuffles once on the group keys and
writes O(keys · sketch) rows; the serving read scans only the parts
(O(parts · keys · sketch)), never the raw history — exactly why the
CH pattern exists. Merge exactness (KMV bottom-k, exact histograms,
additive partials) is what lets the registry row value-gate the
round-trip against the direct aggregate.

Deliberate refusals (loud, like the rest of the DDL surface): the
``TO target`` form (this analog owns the view's storage), engines
other than Aggregating/SummingMergeTree, and a body without GROUP BY
(a stateless MV is just a view — use createOrReplaceTempView).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MV_DDL_RE = re.compile(
    r"(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.]+)\s+"
    r"(?P<to>TO\s+[\w.]+\s+)?"
    r"ENGINE\s*=\s*(?P<engine>\w+)\s*\(\s*\)\s+"
    r"ORDER\s+BY\s+\(?(?P<keys>[^)]+?)\)?\s+"
    r"(?P<populate>POPULATE\s+)?"
    r"AS\s+(?P<body>SELECT\b.+)$")

#: declared views by name — the session-level registry the serving
#: reads resolve through (declare_dictionary/_FINAL_TABLES precedent)
_MATERIALIZED_VIEWS: dict[str, "MaterializedView"] = {}


class MaterializedView:
    """One declared view: its parsed DDL plus the part store."""

    def __init__(self, name: str, engine: str, order_keys: list[str],
                 body: str, source_table: str, path: str) -> None:
        self.name = name
        self.engine = engine
        self.order_keys = order_keys
        self.body = body
        self.source_table = source_table
        self.path = path
        self.n_parts = 0

    def _body_over(self, spark: SparkSession,
                   batch: DataFrame | None) -> DataFrame:
        """The view body evaluated over one source batch (or the
        source table's current contents when ``batch`` is None) —
        through the engine SQL facade, so the -State rewrites are the
        same ones the inline SQL spellings use."""
        from rsyslog_nginx_clickhouse_spark.functions.macros import (
            sql as engine_sql,
        )

        body = self.body
        if batch is not None:
            # run against the BATCH's session: foreachBatch hands
            # micro-batches to a cloned SparkSession, so the temp
            # view registers there, not in the outer session
            spark = batch.sparkSession
            tmp = f"__mv_batch_{self.name.replace('.', '_')}"
            batch.createOrReplaceTempView(tmp)
            body = re.sub(
                rf"(?is)\bFROM\s+{re.escape(self.source_table)}\b",
                f"FROM {tmp}", body)
        return engine_sql(spark, body)

    def insert(self, spark: SparkSession,
               batch: DataFrame | None = None) -> int:
        """The INSERT-trigger analog: run the view body over one
        source batch and append the resulting state rows as a new
        part. ``batch`` defaults to the source table's current
        contents (what POPULATE does). Returns the part ordinal."""
        self._body_over(spark, batch).write.mode("append") \
            .parquet(self.path)
        self.n_parts += 1
        self._register(spark)
        return self.n_parts

    def streaming_sink(self, spark: SparkSession):
        """The streaming maintainer — a ``foreachBatch`` callable: a
        CH materialized view IS an insert trigger over a stream of
        blocks, so the natural Spark analog feeds micro-batches
        through the same body. Each epoch's state part publishes via
        ``streaming/ingest.idempotent_epoch_writer`` (stage →
        atomic-rename → marker), so a checkpoint replay converges to
        exactly one copy of the epoch's states — the double-count a
        bare append would cause. Serving reads stay the verbatim
        -Merge text over the view name; merge exactness makes the
        result independent of the epoch split (the property the
        streaming registry row value-gates)."""
        from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
            idempotent_epoch_writer,
        )

        inner = idempotent_epoch_writer(
            self.path,
            write_fn=lambda bdf, staging: self._body_over(spark, bdf)
            .write.mode("overwrite").parquet(staging))

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            inner(batch_df, epoch_id)
            self.n_parts += 1
            self._register(spark)

        return sink

    def _register(self, spark: SparkSession) -> None:
        """(Re-)register the view name over the current parts so the
        verbatim serving read resolves. createOrReplaceTempView is
        lazy — each serving query re-lists the part files."""
        spark.read.parquet(self.path).createOrReplaceTempView(
            self.name.replace(".", "_"))


def declare_materialized_view(spark: SparkSession, ddl: str,
                              path: str | None = None
                              ) -> MaterializedView:
    """Parse the verbatim CH ``CREATE MATERIALIZED VIEW`` DDL and
    declare the view. With ``POPULATE``, the source table's current
    contents are ingested as part 0 (the CH backfill semantics —
    minus its documented insert race, which an atomic batch read
    doesn't have). ``path`` overrides the per-process scratch
    location (CH owns MV storage; so does this analog)."""
    m = _MV_DDL_RE.match(ddl.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "declare_materialized_view: expected the CH DDL form "
            "CREATE MATERIALIZED VIEW <name> ENGINE = "
            "AggregatingMergeTree() ORDER BY (<keys>) [POPULATE] "
            "AS SELECT … — got an unparseable statement")
    if m.group("to"):
        raise ValueError(
            "CREATE MATERIALIZED VIEW … TO <target> is not supported "
            "— this analog owns the view's storage (declare without "
            "TO and read the view by name)")
    engine = m.group("engine")
    if engine not in ("AggregatingMergeTree", "SummingMergeTree"):
        raise ValueError(
            f"materialized view ENGINE must be AggregatingMergeTree "
            f"or SummingMergeTree (the -State/-Merge and additive "
            f"idioms this engine implements), got {engine}")
    body = m.group("body").strip()
    if not re.search(r"(?is)\bGROUP\s+BY\b", body):
        raise ValueError(
            "materialized view body has no GROUP BY — a stateless MV "
            "is just a view; use createOrReplaceTempView")
    fm = re.search(r"(?is)\bFROM\s+([\w.]+)", body)
    if not fm:
        raise ValueError("materialized view body has no FROM table")
    name = m.group("name")
    keys = [k.strip() for k in m.group("keys").split(",")]
    if path is None:
        path = os.path.join(
            tempfile.gettempdir(),
            f"mv_{name.replace('.', '_')}_{os.getpid()}")
    mv = MaterializedView(name, engine, keys, body, fm.group(1), path)
    _MATERIALIZED_VIEWS[name] = mv
    if m.group("populate"):
        mv.insert(spark)
    return mv


def get_materialized_view(name: str) -> MaterializedView:
    mv = _MATERIALIZED_VIEWS.get(name)
    if mv is None:
        raise ValueError(
            f"materialized view {name!r} is not declared — call "
            f"declare_materialized_view(spark, 'CREATE MATERIALIZED "
            f"VIEW …') first (the CH DDL analog)")
    return mv
