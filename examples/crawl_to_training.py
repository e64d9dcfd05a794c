"""Crawl-to-training pipeline — WARC archives to SFT-ready blocks and
image–text pairs, the round-9 crawl lane composed end to end:

  1. ingest            read_warc / read_wet    (Content-Length framing,
                                                path-only parallelism)
  2. policy gates      extract_html_metadata(policy=True)
                       -> filter_by_policy    (noindex/noai opt-outs)
                       parse_robots_txt -> match_robots
                                              (site-wide exclusion, RFC 9309)
  3. extraction        extract_main_blocks -> blocks_to_markdown
                                              (structure-preserving text)
  4. link graph        extract_links -> pagerank_integer
                                              (exact-integer page ranks)
  5. frontier          crawl_frontier         (next fetch set: dedup +
                                               per-domain politeness cap)
  6. image–text        image_text_pairs       (captions joined to the
                                               dHashed image store)
  7. SFT packing       parse_dialogue -> pack_transcripts
                                              (whole-transcript blocks
                                               with per-turn loss masks)

Every step is deterministic (integer ratios, md5 coins/orders), so the
lane reproduces bit-identically on any run, cluster size, or engine.

Run:  python examples/crawl_to_training.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    blocks_to_markdown,
    crawl_frontier,
    extract_html_metadata,
    extract_main_blocks,
    extract_links,
    filter_by_policy,
    image_dhash,
    image_text_pairs,
    match_robots,
    pack_transcripts,
    pagerank_integer,
    parse_dialogue,
    parse_robots_txt,
)
from sparkplug_spark.sources import (
    gzip_member,
    read_warc,
    warc_response_record,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("crawl-to-training")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. a small crawl: 12 pages as a real gzip WARC archive ---------
    n = 12
    pages_html = []
    for k in range(n):
        robots_meta = (
            '<meta name="robots" content="noai">' if k == 5 else ""
        )
        img = (
            f'<figure><img src="http://site.example/img/{k % 4}.pgm">'
            f"<figcaption>figure for page {k}</figcaption></figure>"
        )
        para = (
            "the corpus text of page %d that is long enough to pass "
            "the paragraph gates of the extractor " % k
        ) * 2
        body = (
            f"<html><head><title>Page {k}</title>{robots_meta}</head><body>"
            f"<h1>Guide {k}</h1>"
            f"<p>{para}</p>"
            f"<ul><li>point one of page {k}</li></ul>"
            f'<a href="http://site.example/page/{(k + 1) % n}">next</a>'
            f'<a href="http://site.example/page/{(k + 3) % n}">related</a>'
            f'<a rel="nofollow" href="http://ads.example/{k}">ad</a>'
            f"{img}</body></html>"
        )
        pages_html.append((k, body))
    tmp = tempfile.mkdtemp(prefix="crawl_example_")
    with open(os.path.join(tmp, "crawl.warc.gz"), "wb") as f:
        f.write(
            b"".join(
                gzip_member(
                    warc_response_record(
                        f"http://site.example/page/{k}", html.encode()
                    )
                )
                for k, html in pages_html
            )
        )
    parsed = read_warc(spark, tmp + "/*.warc.gz", record_types=("response",))
    pages = parsed.select(
        F.regexp_extract("target_uri", r"/page/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.decode("payload", "utf-8").alias("html"),
    )

    # --- 2. policy gates: in-page opt-outs, then robots.txt -------------
    meta = extract_html_metadata(pages, policy=True)
    kept_ids = filter_by_policy(meta).select("doc_id")
    robots = spark.createDataFrame(
        [("site.example", "User-agent: *\nDisallow: /page/9\n")],
        "host string, robots_txt string",
    )
    urls = pages.select("doc_id", F.lit("site.example").alias("host"), "url")
    allowed = (
        match_robots(urls, parse_robots_txt(robots), agent="trainbot")
        .where("allowed")
        .select("doc_id")
    )
    gated = pages.join(kept_ids, "doc_id").join(allowed, "doc_id")
    print(f"pages: {pages.count()} -> after policy gates: {gated.count()}")

    # --- 3. structure-preserving extraction ------------------------------
    md = blocks_to_markdown(extract_main_blocks(gated, min_stop_pct=2))
    md.orderBy("doc_id").show(3, truncate=60)

    # --- 4 + 5. link graph rank and the next frontier --------------------
    links = extract_links(gated)
    edges = links.where(F.col("rel").isNull()).select(
        F.concat(
            F.lit("http://site.example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("src"),
        F.col("href").alias("dst"),
    )
    ranks = pagerank_integer(edges, iterations=5)
    ranks.orderBy(F.desc("rank_nano")).show(3, truncate=False)
    frontier = crawl_frontier(
        gated, gated.select("url"), per_domain_cap=5
    )
    print("frontier:")
    frontier.show(5, truncate=False)

    # --- 6. image–text pairs against a toy decoded-image store -----------
    def p5(k: int) -> bytes:
        px = bytes(
            ((k * 7 + 3 * y + 5 * x) % 57 + 1)
            for y in range(16)
            for x in range(18)
        )
        return b"P5\n18 16\n255\n" + px

    images = image_dhash(
        spark.createDataFrame(
            [(f"http://site.example/img/{k}.pgm", p5(k)) for k in range(4)],
            "url string, payload binary",
        ),
        image_col="payload",
        id_col="url",
    )
    pairs = image_text_pairs(gated, images, url_col="url")
    print(f"image-text pairs: {pairs.count()}")
    pairs.show(3, truncate=50)

    # --- 7. SFT packing with loss masks ----------------------------------
    transcripts = spark.createDataFrame(
        [
            (i, f"user: question {i} about the corpus\n"
                f"assistant: the answer to question {i}")
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    packed = pack_transcripts(parse_dialogue(transcripts), budget=40)
    packed.orderBy("pack_group", "shard_id", "start_tok").show(
        12, truncate=False
    )

    spark.stop()


if __name__ == "__main__":
    main()
