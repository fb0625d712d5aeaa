#!/usr/bin/env python3
"""Dev-only golden generator: executes the REFERENCE dbt SQL (mechanically
ported PG → DuckDB) over the checked-in fixture CSVs, and dumps each model's
result to src/test/resources/goldens/<model>.csv.

The goldens therefore encode the reference's own semantics; the ScalaTest
suite (UfcModelSpec) compares the Spark models against them. Re-run only
when fixtures change. NOT part of the engine.
"""
import glob
import os
import re

import duckdb

REF = "/root/reference/ufc/models"
FIX = "src/test/resources/fixtures"
OUT = "src/test/resources/goldens"

DATE_FMt = {
    "Mon DD, YYYY": "%b %d, %Y",
    "Month DD, YYYY": "%B %d, %Y",
    "Mon YYYY": "%b %Y",
    "Month YYYY": "%B %Y",
}


def port(sql: str) -> str:
    # strip jinja config / resolve refs
    sql = re.sub(r"\{\{\s*config\([^}]*\)\s*\}\}", "", sql)
    sql = re.sub(r"\{\{\s*ref\('([^']+)'\)\s*\}\}", r"\1", sql)
    sql = re.sub(r"\{\{\s*source\('ufc',\s*'([^']+)'\)\s*\}\}", r"\1", sql)
    # to_date(x, 'fmt') -> CAST(strptime(x, '%fmt') AS DATE)
    def todate(m):
        return (f"CAST(strptime({m.group(1)}, '{DATE_FMt[m.group(2)]}') AS DATE)")
    sql = re.sub(r"to_date\(([^,]+),\s*'([^']+)'\)", todate, sql)
    # PG float (float8) -> duckdb double
    sql = sql.replace("::float", "::double")
    # array_length(string_to_array(X, ' '), 1) -> len(string_split(X, ' '))
    sql = re.sub(
        r"array_length\(\s*string_to_array\(([^()]*(?:\([^()]*\))?[^()]*),\s*' '\),\s*1\s*\)",
        r"len(string_split(\1, ' '))", sql, flags=re.S)
    sql = re.sub(r"string_to_array\(", "string_split(", sql)
    # current_date pinned for deterministic goldens (test passes same asOf)
    sql = re.sub(r"\bcurrent_date\b", "DATE '2026-01-01'", sql)
    return sql


def deps(sql: str):
    return set(re.findall(r"from\s+(\w+)|join\s+(\w+)", sql, flags=re.I))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # sources: all-varchar, snake_cased headers (the dlt contract)
    for path in glob.glob(f"{FIX}/*.csv"):
        t = os.path.splitext(os.path.basename(path))[0]
        if t == "dim_ufc_event_details" or t == "title_status_changes_outside_octagon":
            pass
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_csv('{path}', header=true, all_varchar=true)")
        cols = [r[0] for r in con.execute(f"DESCRIBE {t}").fetchall()]
        for c in cols:
            snake = re.sub(r"^_+|_+$", "", re.sub(r"[^a-z0-9]+", "_", c.strip().lower()))
            if snake != c:
                con.execute(f'ALTER TABLE {t} RENAME COLUMN "{c}" TO {snake}')

    models = {}
    for path in glob.glob(f"{REF}/**/*.sql", recursive=True):
        name = os.path.splitext(os.path.basename(path))[0]
        models[name] = port(open(path).read())

    # topo order by ref() dependencies
    order, done = [], set()
    def visit(n):
        if n in done or n not in models:
            return
        done.add(n)
        for m in models:
            if m != n and re.search(rf"\b{m}\b", models[n]):
                visit(m)
        order.append(n)
    for n in models:
        visit(n)

    for name in order:
        con.execute(f"CREATE VIEW {name} AS {models[name]}")
    for name in order:
        con.execute(
            f"COPY (SELECT * FROM {name}) TO '{OUT}/{name}.csv' (HEADER, NULLSTR '\\N')")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"{name}: {n} rows")

    # Metabase card goldens: run the charts.sh card SQL verbatim (minus the
    # schema prefix; view alias -> model name)
    alias = {}
    for path in glob.glob(f"{REF}/**/*.sql", recursive=True):
        name = os.path.splitext(os.path.basename(path))[0]
        m = re.search(r"alias='([^']+)'", open(path).read())
        if m:
            alias[m.group(1)] = name
    charts = open("/root/reference/metabase/charts.sh").read()
    cards = re.findall(
        r"QUERY=\$\(cat <<'SQL'\n(.*?)\nSQL\n\)\ncreate_card \"([^\"]+)\"",
        charts, flags=re.S)
    for i, (sql, title) in enumerate(cards):
        q = re.sub(r"fighters_extracted_goat_status\.(\w+)",
                   lambda m: alias.get(m.group(1), m.group(1)), sql).rstrip(";\n")
        slug = re.sub(r"[^a-z0-9]+", "_", title.lower()).strip("_")
        con.execute(
            f"COPY ({q}) TO '{OUT}/card_{i:02d}_{slug}.csv' (HEADER, NULLSTR '\\N')")
        n = con.execute(f"SELECT count(*) FROM ({q})").fetchone()[0]
        print(f"card {i:02d} {title}: {n} rows")


if __name__ == "__main__":
    main()
