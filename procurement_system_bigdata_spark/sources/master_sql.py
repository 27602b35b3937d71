"""Postgres init-script master-data source.

Production master data arrives via JDBC (``read_jdbc_table``, SURVEY §1.4);
this loader reconstructs the same six tables from a Postgres init script
(INSERT statements only — data values, no reference code) for environments
without a live database: the golden-parity tests and the offline CLI run.
Reference schema: init-scripts/postgres/init.sql:9-71, rows :78-352.
"""


from __future__ import annotations

import re
from datetime import datetime

INIT_SQL = "/root/reference/init-scripts/postgres/init.sql"


def _consume_quoted(s: str, i: int) -> int:
    """Given ``s[i] == "'"``, return the index just past the closing quote,
    consuming ``''`` escape pairs as a unit.  THE single quote-scanning
    state machine — every parser below delegates here, so a quoting edge
    case has exactly one place to be wrong (the round-1 bug existed because
    three hand-rolled copies diverged).  Unterminated strings consume to
    end-of-input."""
    i += 1
    while i < len(s):
        if s[i] == "'":
            if i + 1 < len(s) and s[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return len(s)


def _split_tuples(values_blob: str) -> list[list]:
    """Split a VALUES blob into tuples, respecting quotes and nested parens
    (product names contain parentheses, e.g. 'Office Paper A4 (500 sheets)')."""
    tuples, cur, depth = [], "", 0
    i = 0
    while i < len(values_blob):
        ch = values_blob[i]
        if ch == "'":
            j = _consume_quoted(values_blob, i)
            cur += values_blob[i:j]
            i = j
            continue
        if ch == "(":
            depth += 1
            cur = "" if depth == 1 else cur + ch
        elif ch == ")":
            depth -= 1
            if depth == 0:
                tuples.append(_split_fields(cur))
                cur = ""
            else:
                cur += ch
        elif depth >= 1:
            cur += ch
        i += 1
    return tuples


def _split_fields(tuple_body: str) -> list:
    """Split one tuple body into fields on top-level commas; quoted strings
    (with '' escapes) pass through ``_consume_quoted`` so a value like
    'Acme''s, co' stays one field."""
    fields, cur, depth = [], "", 0
    i = 0
    while i < len(tuple_body):
        ch = tuple_body[i]
        if ch == "'":
            j = _consume_quoted(tuple_body, i)
            cur += tuple_body[i:j]
            i = j
            continue
        if ch == "(":
            depth += 1
            cur += ch
        elif ch == ")":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            fields.append(_coerce(cur.strip()))
            cur = ""
        else:
            cur += ch
        i += 1
    if cur.strip():
        fields.append(_coerce(cur.strip()))
    return fields


def _coerce(token: str):
    if token.startswith("'") and token.endswith("'"):
        return token[1:-1].replace("''", "'")
    if token.upper() == "TRUE":
        return True
    if token.upper() == "FALSE":
        return False
    if token.upper() in ("NOW()", "NULL"):
        return None
    if re.fullmatch(r"-?\d+", token):
        return int(token)
    if re.fullmatch(r"-?\d+\.\d+", token):
        return float(token)
    return token


def _statement_end(text: str, start: int) -> int:
    """Index of the ';' terminating the statement beginning at ``start``,
    honoring single-quoted strings ('' escapes) — a ';' inside a quoted
    value (e.g. a supplier name 'Acme; GmbH') must not end the statement."""
    i = start
    while i < len(text):
        ch = text[i]
        if ch == "'":
            i = _consume_quoted(text, i)
            continue
        if ch == ";":
            return i
        i += 1
    return len(text)


def parse_inserts(sql_path: str = INIT_SQL) -> dict[str, list[list]]:
    """table name -> list of value tuples (comments stripped)."""
    text = open(sql_path).read()
    text = re.sub(r"--[^\n]*", "", text)
    out: dict[str, list[list]] = {}
    for m in re.finditer(
        r"INSERT INTO\s+(\w+)\s*\(([^)]*)\)\s*VALUES\s*", text, re.I
    ):
        end = _statement_end(text, m.end())
        out.setdefault(m.group(1), []).extend(_split_tuples(text[m.end():end]))
    return out


def master_data_frames(spark, sql_path: str = INIT_SQL):
    """Build the six master-data DataFrames with BIGSERIAL ids assigned in
    insert order (1-based), matching Postgres behavior."""
    from decimal import Decimal

    from procurement_system_bigdata_spark import schemas

    ins = parse_inserts(sql_path)
    now = datetime(2026, 1, 1)

    suppliers = [
        (i + 1, code, name, email, phone, active, now)
        for i, (code, name, email, phone, active) in enumerate(ins["suppliers"])
    ]
    products = [
        (i + 1, code, name, cat, uom, active, now)
        for i, (code, name, cat, uom, active) in enumerate(ins["products"])
    ]
    warehouses = [
        (i + 1, code, name, city, active)
        for i, (code, name, city, active) in enumerate(ins["warehouses"])
    ]
    supplier_products = [
        (sid, sku, pack, moq, lead, Decimal(str(price)), cur, active)
        for (sid, sku, pack, moq, lead, price, cur, active) in ins["supplier_products"]
    ]
    safety_stock = [(sku, qty) for (sku, qty, _ts) in ins["safety_stock"]]
    ssw = [(wh, sku, qty) for (wh, sku, qty, _ts) in ins["safety_stock_by_warehouse"]]

    return {
        "suppliers": spark.createDataFrame(suppliers, schemas.SUPPLIERS),
        "products": spark.createDataFrame(products, schemas.PRODUCTS),
        "warehouses": spark.createDataFrame(warehouses, schemas.WAREHOUSES),
        "supplier_products": spark.createDataFrame(supplier_products, schemas.SUPPLIER_PRODUCTS),
        "safety_stock": spark.createDataFrame(safety_stock, schemas.SAFETY_STOCK),
        "safety_stock_by_warehouse": spark.createDataFrame(ssw, schemas.SAFETY_STOCK_BY_WAREHOUSE),
    }
