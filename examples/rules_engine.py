"""The reference-parity surface in one script: JSON-lines rules, validation,
sequential application, nested-struct overrides, audit details, keep-old.

Mirrors the reference's README walkthrough (indix/sparkplug README.md:28-182)
re-expressed on this engine.  Run:  python examples/rules_engine.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from sparkplug_spark import SparkPlug
from sparkplug_spark.sources import read_plug_rules


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # rules ship as JSON lines, exactly like the reference's rule files
    rules_json = [
        {
            "name": "fix-qty",
            "version": "v1",
            "condition": "qty < 0",
            "actions": [{"key": "qty", "value": "0"}],
        },
        {
            "name": "flag-big-orders",
            "version": "v2",
            "condition": "price * qty > 1000 and status = 'open'",
            "actions": [
                {"key": "status", "value": "review"},
                {"key": "meta.reviewed", "value": "`qty > 100`"},
            ],
        },
    ]
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        f.write("\n".join(json.dumps(r) for r in rules_json))
        path = f.name

    rules = read_plug_rules(spark, path)
    df = spark.createDataFrame(
        [
            (1, 30.0, -2, "open", (False,)),
            (2, 12.0, 200, "open", (False,)),
            (3, 900.0, 2, "closed", (False,)),
        ],
        "id long, price double, qty long, status string, "
        "meta struct<reviewed: boolean>",
    )

    plug = (
        SparkPlug.builder(spark)
        .enable_rules_validation()
        .enable_plug_details()
        .keep_old_field()
        .create()
    )
    out = plug.plug(df, rules)
    out.show(truncate=False)
    out.explain("formatted")

    # the condition/value language is the FULL Spark SQL surface — the
    # same delegation the reference got from its temp-view executor:
    # scalar subqueries in conditions, window functions in values
    df.createOrReplaceTempView("orders_v")
    from sparkplug_spark import PlugAction, PlugRule

    rich = [
        PlugRule(
            "above_avg_price", "v1",
            "price > (select avg(price) from orders_v)",
            (PlugAction("status", "pricey"),),
        ),
        PlugRule(
            "qty_rank", "v1", "true",
            (PlugAction(
                "status",
                "`concat(status, '#', cast(row_number() over "
                "(order by qty desc, id) as string))`",
            ),),
        ),
    ]
    SparkPlug.builder(spark).create().plug(df, rich).select(
        "id", "price", "qty", "status"
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
