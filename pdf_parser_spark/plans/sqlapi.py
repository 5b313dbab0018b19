"""spark.sql(...) API surface: the engine's tables registered as temp views
and queries expressed as SQL text instead of DataFrame calls.

The DataFrame plans in plans/relational.py and these SQL strings compile to
the same Catalyst logical plan — this module exists so a SQL-first user of
the engine has a first-class entry point, and to prove it the driver query
`q1_pricing_sql` runs ONE ANSI string on BOTH engines: Spark executes it
via spark.sql and the DuckDB oracle executes the identical text, so any
divergence in either engine's SQL semantics fails the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (idempotent).  In
    production this is the catalog (Iceberg/HMS) doing the same job."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# Valid in BOTH Spark SQL and DuckDB — the cross-engine common subset is
# the point (see module docstring).
Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def q1_pricing_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(Q1_SQL)


# Window-function family through the same one-string-two-engines gate:
# row_number + partitioned rank + join, valid verbatim in Spark SQL and
# DuckDB.  (Q1_SQL proves the aggregate family; this proves windows.)
TOP_ORDERS_SQL = """
    WITH rev AS (
        SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, o.o_orderkey
    ), ranked AS (
        SELECT custkey, orderkey, revenue,
               row_number() OVER (
                   PARTITION BY custkey ORDER BY revenue DESC, orderkey
               ) AS rk
        FROM rev
    )
    SELECT custkey, orderkey, revenue, rk
    FROM ranked WHERE rk <= 2
    ORDER BY custkey, rk
"""


def top_orders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(TOP_ORDERS_SQL)
