"""Entity resolution + data selection — the round-7 layer end to end.

Composes the new operators on the same components the query suite
checks one by one:

  1. fuzzy-match entities        edit_distance_pairs  (ED-Join prefix filter)
  2. block to plausible pairs    same-nation join     (standard ER blocking)
  3. merge + survive             consensus_records    (CC + deterministic mode)
  4. find co-purchase structure  frequent_itemsets    (A-Priori <= triples)
  5. order matters too           frequent_event_sequences (first/last bounds)
  6. community context           label_propagation    (sync LPA, 4 rounds)
  7. keyword the corpus          textrank_scores      (integer PageRank)
  8. pick a coreset              select_max_coverage  (submodular greedy)
  9. pair embeddings mutually    mutual_knn_pairs     (reciprocal top-k)
 10. encode for the model        encode_categoricals  (deterministic indexer)

Every step is engine-exact (integer ranks/supports, struct-min argmax,
rounded-cosine contract), so the whole pipeline is replayable
bit-for-bit on any engine — the property the oracle suite enforces
query by query.

Run:  python examples/entity_resolution_selection.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    basket_pairs,
    consensus_records,
    edit_distance_pairs,
    encode_categoricals,
    frequent_event_sequences,
    frequent_itemsets,
    label_propagation,
    mutual_knn_pairs,
    select_max_coverage,
    textrank_scores,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("entity-resolution-selection")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    read = lambda t: spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))  # noqa: E731

    # --- entity resolution: match -> block -> merge -> survive -------
    cust = read("customer")
    pairs = edit_distance_pairs(
        cust, text_col="c_name", id_col="c_custkey", max_distance=1
    )
    nations = cust.select(
        F.col("c_custkey").alias("id_a"), F.col("c_nationkey").alias("na")
    )
    blocked = (
        pairs.join(nations, "id_a")
        .join(
            nations.withColumnsRenamed({"id_a": "id_b", "na": "nb"}), "id_b"
        )
        .filter(F.col("na") == F.col("nb"))
        .select("id_a", "id_b")
    )
    golden = consensus_records(
        cust, blocked, id_col="c_custkey",
        attr_cols=("c_mktsegment", "c_nationkey"),
    )
    merged = golden.filter(F.col("n_members") > 1)
    print(f"[1-3] {pairs.count()} fuzzy pairs -> {blocked.count()} blocked "
          f"-> {golden.count()} golden records ({merged.count()} merged)")

    # --- co-purchase structure: sets, sequences, communities ---------
    li = read("lineitem")
    sets = frequent_itemsets(li, "l_orderkey", "l_partkey", min_support=2)
    print("[4] frequent itemsets by size:",
          dict(sorted((r["size"], r["count"]) for r in
                      sets.groupBy("size").count().collect())))

    events = read("events").select("user_id", "event_type", "ts")
    seqs = frequent_event_sequences(events, min_support=100)
    top = seqs.filter(F.col("size") == 3).orderBy(
        F.desc("support"), "pattern").first()
    print(f"[5] top length-3 sequence: {top['pattern']} "
          f"(support {top['support']})")

    edges = basket_pairs(li, "l_orderkey", "l_partkey", min_count=2)
    comms = label_propagation(
        edges.selectExpr("item_a as src", "item_b as dst"), iterations=4
    )
    print("[6] LPA communities:",
          comms.select("label").distinct().count(),
          "over", comms.count(), "parts")

    # --- corpus: keywords and a coverage coreset ---------------------
    docs = read("documents")
    kw = textrank_scores(docs, min_pair_count=3)
    best = kw.orderBy(F.desc("rank_nano"), "token").limit(3).collect()
    print("[7] top TextRank tokens:", [r["token"] for r in best])

    core = select_max_coverage(docs, k=5, ngram=2)
    print("[8] coverage coreset:",
          [(r["id"], r["gain"]) for r in core.orderBy("step").collect()])

    # --- embeddings: reciprocal pairs --------------------------------
    emb = read("embeddings")
    mutual = mutual_knn_pairs(emb, k=5, min_cosine=0.2)
    print("[9] mutual-kNN pairs:", mutual.count())

    # --- model prep: deterministic categorical ids -------------------
    orders = read("orders")
    enc = encode_categoricals(orders, ["o_orderstatus", "o_orderpriority"])
    print("[10] categorical dictionary sizes:",
          enc.select("o_orderstatus_id").distinct().count(), "x",
          enc.select("o_orderpriority_id").distinct().count())

    spark.stop()


if __name__ == "__main__":
    main()
