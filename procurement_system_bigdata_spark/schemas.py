"""Explicit StructTypes for the procurement data model.

One schema per table from SURVEY §1.3, types per §1.2 (reference:
init-scripts/postgres/init.sql:9-71, init-scripts/cassandra/init.cql:7-17,
dags/pipeline.py:331-360).  CSV facts are declared all-string first — the
reference registers Hive CSV tables with every column VARCHAR and types them
with CAST inside queries (pipeline.py:333-338 + :410-418), so bad rows
surface at cast time, not read time; ``ORDERS_TYPED`` is the post-cast shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# Facts (reference generateData.py:85-118, :164-181, :244-265)
ORDERS_RAW = _s(  # as read from CSV: all VARCHAR (pipeline.py:331-345)
    ("order_id", StringType()),
    ("supplier_id", StringType()),
    ("sku_id", StringType()),
    ("quantity", StringType()),
    ("warehouse_id", StringType()),
    ("order_date", StringType()),
)
ORDERS_TYPED = _s(
    ("order_id", StringType()),
    ("supplier_id", LongType()),
    ("sku_id", LongType()),
    ("quantity", LongType()),
    ("warehouse_id", LongType()),
    ("order_date", StringType()),  # ISO string; MAX() is a string max (A4)
)
STOCK = _s(
    ("warehouse_id", IntegerType()),
    ("sku_id", IntegerType()),
    ("current_stock", IntegerType()),
)
INVENTORY_SNAPSHOTS = _s(  # PK ((sku_code), snapshot_date, warehouse_code)
    ("sku_code", StringType()),
    ("snapshot_date", DateType()),
    ("warehouse_code", StringType()),
    ("available_qty", IntegerType()),
    ("reserved_qty", IntegerType()),
)

# Master data (init.sql)
SUPPLIERS = _s(
    ("supplier_id", LongType()),
    ("supplier_code", StringType()),
    ("name", StringType()),
    ("email", StringType()),
    ("phone", StringType()),
    ("is_active", BooleanType()),
    ("created_at", TimestampType()),
)
PRODUCTS = _s(
    ("sku_id", LongType()),
    ("sku_code", StringType()),
    ("name", StringType()),
    ("category", StringType()),
    ("uom", StringType()),
    ("is_active", BooleanType()),
    ("created_at", TimestampType()),
)
WAREHOUSES = _s(
    ("warehouse_id", LongType()),
    ("warehouse_code", StringType()),
    ("name", StringType()),
    ("city", StringType()),
    ("is_active", BooleanType()),
)
SUPPLIER_PRODUCTS = _s(
    ("supplier_id", LongType()),
    ("sku_id", LongType()),
    ("pack_size", IntegerType()),
    ("min_order_qty", IntegerType()),
    ("lead_time_days", IntegerType()),
    ("unit_price", DecimalType(12, 4)),
    ("currency", StringType()),
    ("is_active", BooleanType()),
)
SAFETY_STOCK = _s(
    ("sku_id", LongType()),
    ("safety_stock_qty", IntegerType()),
)
SAFETY_STOCK_BY_WAREHOUSE = _s(
    ("warehouse_id", LongType()),
    ("sku_id", LongType()),
    ("safety_stock_qty", IntegerType()),
)
