"""Modern SQL / Arrow-native surfaces (Spark 4.x): recursive CTEs,
ordered LISTAGG, median + deterministic mode, and the two Arrow-batch
Python surfaces (``mapInArrow``, ``applyInArrow``) the pandas-based
queries don't touch.

These complete the engine's claim over the Spark 4 feature surface:
recursion (iterative queries *inside* one SQL statement instead of a
driver loop), ordered string aggregation, and zero-copy Arrow UDFs where
Python batch code avoids the pandas conversion tax entirely.

Scale notes:
- the recursive CTE runs on the bounded 25-node nation graph (the edge
  *derivation* is the fact-fact join AQE already plans; the recursion
  itself touches only dimension-sized rows). Spark executes each
  recursion level as one join stage — same shape as the hand-rolled
  loops in operators/graph.py, but planned by Catalyst.
- LISTAGG's WITHIN GROUP ordering carries a unique tiebreak
  (o_orderdate, o_orderkey) so the concatenation is deterministic and
  cross-engine comparable.
- mapInArrow projects to the 3 needed columns BEFORE entering Python —
  column pruning through an opaque Python map is manual, and shipping
  only (source, text) keeps the Arrow transfer minimal.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.plans.graph_queries import _TRADE_EDGES_SQL
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table


def _register_trade_views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --- recursive CTE: BFS reachability over the nation trade graph -----------
# Shared verbatim between Spark and DuckDB (both speak WITH RECURSIVE);
# the hop bound keeps UNION ALL recursion finite on a cyclic graph, and
# the final min-aggregate collapses paths to BFS distance.
NATION_REACH_SQL = f"""
WITH RECURSIVE edges AS ({_TRADE_EDGES_SQL}),
reach(nation, hops) AS (
  SELECT 'NATION_0' AS nation, 0 AS hops
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.nation
  WHERE r.hops < 2
)
SELECT nation, CAST(min(hops) AS INT) AS min_hops
FROM reach
GROUP BY nation
"""


def nation_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop-distance from NATION_0 through cross-nation trade lanes,
    expressed as a Spark 4 recursive CTE (bounded recursion + min-hop
    aggregate). The identical statement runs in DuckDB — recursion
    semantics, not just results, are cross-checked."""
    tune(spark)
    _register_trade_views(spark, sf_dir)
    return spark.sql(NATION_REACH_SQL)


# --- ordered LISTAGG --------------------------------------------------------
def customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's order-status string in order-date order — ordered
    LISTAGG / string_agg with a unique (date, orderkey) tiebreak, the
    compact-sequence encoding used for per-entity event histories."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.expr(
            "listagg(o_orderstatus, '')"
            " WITHIN GROUP (ORDER BY o_orderdate, o_orderkey)"
        ).alias("status_seq"),
        F.count("*").alias("n_orders"),
    )


CUSTOMER_STATUS_ORACLE = """
SELECT o_custkey AS custkey,
       string_agg(o_orderstatus, '' ORDER BY o_orderdate, o_orderkey) AS status_seq,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


# --- median / exact percentile / deterministic mode -------------------------
def quantity_profile_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per returnflag: median, p90, and the modal quantity (ties broken
    to the smallest value so the mode is well-defined — built-in MODE()
    is tie-nondeterministic in both engines and can't be oracle-checked).
    Quantities are integer-valued doubles: medians/percentiles
    interpolate on exact integers, so values match bitwise."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return stats.join(mode, "l_returnflag")


QUANTITY_PROFILE_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, l_quantity, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), mode AS (
  SELECT l_returnflag, l_quantity AS mode_qty
  FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, l_quantity ASC) AS rn
        FROM counts)
  WHERE rn = 1
)
SELECT s.l_returnflag, median(l_quantity) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty, mode_qty
FROM lineitem s JOIN mode USING (l_returnflag)
GROUP BY s.l_returnflag, mode_qty
"""


# --- mapInArrow: zero-copy Arrow batch transform ----------------------------
def doc_token_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token/char totals where the per-document counting runs
    in ``mapInArrow`` — Arrow RecordBatches transformed with
    ``pyarrow.compute`` kernels (C++, zero-copy), no pandas
    materialization. The aggregate itself stays JVM-side: Python only
    does the per-row regex counting Spark would otherwise need a UDF for."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def count_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in it:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                ["source", "n_tokens", "n_chars"],
            )

    counted = docs.mapInArrow(
        count_batches, "source string, n_tokens long, n_chars long"
    )
    return counted.groupBy("source").agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count("*").alias("n_docs"),
    )


DOC_TOKEN_STATS_ORACLE = r"""
SELECT source,
       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       count(*) AS n_docs
FROM documents
GROUP BY source
"""


# --- applyInArrow: grouped Arrow table aggregation --------------------------
def source_extremes_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length extremes computed group-at-a-time in
    ``applyInArrow`` — the grouped Arrow surface (each source's rows
    arrive as one ``pyarrow.Table``). Shape-wise this is what a custom
    per-group algorithm (e.g. a group-local sketch) would use; here the
    kernel is simple so the DuckDB twin stays expressible."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")

    def extremes(key: tuple, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = tbl.column("n_chars")
        return pa.table(
            {
                "source": [key[0]],
                "min_chars": [pc.min(col).as_py()],
                "max_chars": [pc.max(col).as_py()],
                "n_docs": [tbl.num_rows],
            },
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("min_chars", pa.int64()),
                    ("max_chars", pa.int64()),
                    ("n_docs", pa.int64()),
                ]
            ),
        )

    return docs.groupBy("source").applyInArrow(
        extremes, "source string, min_chars long, max_chars long, n_docs long"
    )


SOURCE_EXTREMES_ORACLE = """
SELECT source,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       count(*) AS n_docs
FROM documents
GROUP BY source
"""


def sql_scripting_threshold_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN...END compound with a local variable
    and a WHILE loop): escalate a price threshold by powers of 2 for as
    long as DOUBLING it would still leave more than 10 qualifying
    orders — i.e. find the largest power-of-2 multiple of $1000 that
    still keeps a >10-order population — and return it with its count.
    The "escalate until selective enough" control-flow pattern
    expressed INSIDE one SQL statement instead of a driver loop; the
    look-ahead condition guarantees a non-degenerate result (the
    returned population is always >10).

    Each iteration is one scan-side count (pushed predicate on a single
    column); the loop variable lives in the scripting interpreter, so
    the shape ships to a cluster unchanged. The DuckDB twin derives the
    same fixpoint with a recursive CTE — same semantics, two different
    modern-SQL facilities."""
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
    BEGIN
      DECLARE thr DOUBLE DEFAULT 1000.0;
      WHILE (SELECT count(*) FROM orders WHERE o_totalprice > thr * 2) > 10 DO
        SET thr = thr * 2;
      END WHILE;
      SELECT thr AS threshold, count(*) AS n_orders
      FROM orders WHERE o_totalprice > thr;
    END
    """)


SQL_SCRIPTING_ORACLE = """
WITH RECURSIVE t(thr) AS (
  SELECT CAST(1000.0 AS DOUBLE)
  UNION ALL
  SELECT thr * 2 FROM t
  WHERE (SELECT count(*) FROM orders WHERE o_totalprice > thr * 2) > 10
)
SELECT max(thr) AS threshold,
       (SELECT count(*) FROM orders
        WHERE o_totalprice > (SELECT max(thr) FROM t)) AS n_orders
FROM t
"""


QUERIES = {
    "nation_reach_bfs": nation_reach_bfs,
    "sql_scripting_threshold_scan": sql_scripting_threshold_scan,
    "customer_status_history": customer_status_history,
    "quantity_profile_by_flag": quantity_profile_by_flag,
    "doc_token_stats_arrow": doc_token_stats_arrow,
    "source_extremes_arrow": source_extremes_arrow,
}

ORACLE = {
    "nation_reach_bfs": NATION_REACH_SQL,
    "sql_scripting_threshold_scan": SQL_SCRIPTING_ORACLE,
    "customer_status_history": CUSTOMER_STATUS_ORACLE,
    "quantity_profile_by_flag": QUANTITY_PROFILE_ORACLE,
    "doc_token_stats_arrow": DOC_TOKEN_STATS_ORACLE,
    "source_extremes_arrow": SOURCE_EXTREMES_ORACLE,
}
