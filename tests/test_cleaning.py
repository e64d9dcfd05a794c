"""Unit semantics for the corpus-cleaning operators (cleaning.py); the
oracle queries (pii_scrub / quality_flags / decontaminate / sample_per_key)
cover cross-engine value parity."""

from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    decontaminate,
    gopher_quality_flags,
    pack_token_budget,
    sample_per_key,
    scrub_pii,
)


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at bob.smith+x@corp.example.org or 192.168.0.17 thanks"),
            (2, "call +1 555 0123 4567 today"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert "<EMAIL>" in rows[1]["text_clean"] and "<IP>" in rows[1]["text_clean"]
    assert "bob.smith" not in rows[1]["text_clean"]
    assert "192.168" not in rows[1]["text_clean"]
    assert rows[2]["n_phone"] == 1 and "<PHONE>" in rows[2]["text_clean"]
    assert rows[3]["text_clean"] == rows[3]["text"]
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == rows[3]["n_phone"] == 0


def test_gopher_quality_flags(spark):
    good = " ".join(f"word{i} item{i * 7 % 97} thing{i * 13 % 89}" for i in range(40))
    repetitive = "spam ham eggs " * 40  # one 3-gram repeated
    df = spark.createDataFrame(
        [(1, good), (2, repetitive), (3, "too short")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert not rows[1]["flag_low_quality"]
    assert rows[2]["frac_dup_3gram"] > 0.9 and rows[2]["flag_low_quality"]
    assert rows[3]["n_tokens"] == 2 and rows[3]["flag_low_quality"]


def test_decontaminate(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    df = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon suffix words"),  # shares a 5-gram
            (2, "completely different content with no benchmark overlap at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in decontaminate(df, eval_df, n=5).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_eval_grams_hit"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_eval_grams_hit"] == 0
    # bloom prefilter tier: IDENTICAL output (no false negatives; exact
    # verify removes false positives)
    bloom_rows = {
        r["doc_id"]: r
        for r in decontaminate(df, eval_df, n=5, bloom_prefilter=True).collect()
    }
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in bloom_rows.items()
    }
    # pre-built-bitmap path (stored-artifact reuse): identical again
    from sparkplug_spark.functions.bloom import build_bloom_from_texts

    blob = build_bloom_from_texts(eval_df, "text", 5, 1 << 23, 5)
    reused = {
        r["doc_id"]: r
        for r in decontaminate(
            df, eval_df, n=5, bloom_prefilter=True, bloom_blob=blob
        ).collect()
    }
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in reused.items()
    }


def test_pack_token_budget(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(50)], ["doc_id", "n_tokens"]
    )
    out = pack_token_budget(df, budget=300, num_groups=2).collect()
    assert len(out) == 50
    # greedy semantics: within a (group, shard), weights sum to <= budget
    # except the spill row that crossed the boundary; shards are dense
    from collections import defaultdict

    shards = defaultdict(list)
    for r in out:
        assert 0 <= r["pack_group"] < 2
        shards[(r["pack_group"], r["shard_id"])].append(r["n_tokens"])
    for (_, sid), weights in shards.items():
        assert sid >= 0
        # 300-budget, 100-weight rows → exactly 3 rows per full shard
        assert len(weights) <= 3
    # deterministic across runs
    again = pack_token_budget(df, budget=300, num_groups=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # oversized row gets its own shard id (and doesn't break neighbors)
    big = spark.createDataFrame(
        [(1, 1000), (2, 50), (3, 50)], ["doc_id", "n_tokens"]
    )
    rows = pack_token_budget(big, budget=300, num_groups=1).collect()
    assert len({(r["pack_group"], r["shard_id"], r["doc_id"]) for r in rows}) == 3


def test_sample_per_key_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(60)], ["doc_id", "lang"]
    )
    a = sample_per_key(df, "lang", cap=5, id_col="doc_id")
    got = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in a.collect()}
    assert len(got) == 10  # 5 per language
    assert all(rk <= 5 for _, _, rk in got)
    # deterministic: same rows on re-run (no rand() involved)
    b = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in sample_per_key(df, "lang", cap=5, id_col="doc_id").collect()}
    assert got == b


def test_stratified_sample(spark):
    from sparkplug_spark.operators import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], ["doc_id", "lang"]
    )
    half = stratified_sample(df, "lang", {"en": 0.5}, default_fraction=1.0)
    kept = {r["doc_id"] for r in half.collect()}
    # all de rows survive (fraction 1.0), roughly half the en rows do
    assert {i for i in range(300) if i % 3 == 0} <= kept
    n_en = sum(1 for i in kept if i % 3)
    assert 60 <= n_en <= 140
    # composable: sampling at 0.5 twice == sampling at 0.25 once
    quarter = stratified_sample(half, "lang", {"en": 0.25}, default_fraction=1.0)
    direct = stratified_sample(df, "lang", {"en": 0.25}, default_fraction=1.0)
    assert {r["doc_id"] for r in quarter.collect()} == {
        r["doc_id"] for r in direct.collect()
    }
    # deterministic re-run
    assert kept == {r["doc_id"] for r in half.collect()}
    import pytest

    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})


def test_bloom_blob_size_mismatch_raises(spark):
    from sparkplug_spark.functions.bloom import build_bloom_from_texts
    from sparkplug_spark.operators import decontaminate
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    blob = build_bloom_from_texts(df, "text", 5, 1 << 10, 5)
    with _pytest.raises(ValueError, match="bloom_bits"):
        decontaminate(
            df, df, n=5, bloom_prefilter=True, bloom_bits=1 << 23, bloom_blob=blob
        )


class TestDecontaminateSemantic:
    """E203: paraphrase-level leakage the n-gram tier misses."""

    _EVAL = [
        (100, "the resilient mountain climbers reached the snowy summit "
              "before dawn carrying heavy oxygen tanks and woven ropes"),
        (101, "quantum processors entangle superconducting qubits inside "
              "dilution refrigerators near absolute zero temperatures"),
    ]
    # word-order shuffled + light substitutions: shares almost no 5-gram
    # with the eval rows, but nearly the same bag of tokens
    _PARAPHRASE = [
        (1, "before dawn the snowy summit was reached by resilient "
            "mountain climbers carrying woven ropes and heavy oxygen "
            "tanks"),
        (2, "inside dilution refrigerators quantum processors entangle "
            "qubits superconducting near absolute zero temperatures"),
    ]
    _UNRELATED = [
        (3, "grandma baked sourdough bread with rosemary butter on "
            "sunday morning while the kettle whistled"),
        (4, "the stock market index fell two percent after the central "
            "bank raised interest rates unexpectedly"),
    ]

    def _dfs(self, spark):
        corpus = spark.createDataFrame(
            self._PARAPHRASE + self._UNRELATED, "doc_id long, text string"
        )
        ev = spark.createDataFrame(self._EVAL, "doc_id long, text string")
        return corpus, ev

    def test_catches_paraphrases_ngram_tier_misses(self, spark):
        from sparkplug_spark.operators import (
            decontaminate,
            decontaminate_semantic,
        )

        corpus, ev = self._dfs(spark)
        sem = {
            r["doc_id"]: (r["semantic_contaminated"], r["best_eval_id"])
            for r in decontaminate_semantic(
                corpus, ev, min_cosine=0.8
            ).collect()
        }
        # full recall on the planted paraphrases, matched to the right
        # eval doc; zero false positives on unrelated text
        assert sem[1] == (True, 100)
        assert sem[2] == (True, 101)
        assert sem[3][0] is False and sem[4][0] is False

        exact = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(corpus, ev, n=5).collect()
        }
        # the verbatim 5-gram tier misses the reordered copies — the gap
        # this tier exists to close
        assert exact[1] is False and exact[2] is False

    def test_partition_invariant_and_dot_bounds(self, spark):
        from sparkplug_spark.operators import decontaminate_semantic

        corpus, ev = self._dfs(spark)
        a = sorted(
            map(
                tuple,
                decontaminate_semantic(corpus, ev).select(
                    "doc_id", "n_semantic_matches", "max_dot",
                    "best_eval_id",
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                decontaminate_semantic(
                    corpus.repartition(5), ev.repartition(3)
                ).select(
                    "doc_id", "n_semantic_matches", "max_dot",
                    "best_eval_id",
                ).collect(),
            )
        )
        assert a == b
        # micro-quantized unit vectors: dot ~ cosine * 1e12; floor
        # quantization can push a negative component's magnitude up by
        # <1 micro, so allow per-bucket slack above the exact 1e12
        assert all(row[2] <= 10**12 + 64 * 2 * 10**6 for row in a)

    def test_threshold_validation(self, spark):
        from sparkplug_spark.operators import decontaminate_semantic

        corpus, ev = self._dfs(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="min_cosine"):
            decontaminate_semantic(corpus, ev, min_cosine=0.0)


class TestFilterLinesQuality:
    """E208 RefinedWeb-style line-wise corrections."""

    def test_rules_and_rebuild(self, spark):
        from sparkplug_spark.operators import filter_lines_quality

        df = spark.createDataFrame(
            [
                (1, "This is a good prose line that survives fine.\n"
                    "OK\n"
                    "SIGN IN NOW PLEASE HELLO WORLD\n"
                    "12345 67890 42 77 99\n"
                    "- navigation item\n"
                    "Another decent line of readable text here."),
            ],
            "doc_id long, text string",
        )
        r = filter_lines_quality(df).collect()[0]
        assert (r["n_lines"], r["n_kept"]) == (6, 2)
        assert (r["n_short"], r["n_upper"], r["n_digit"], r["n_bullet"]) == (
            1, 1, 1, 1,
        )
        assert r["text_clean"].splitlines() == [
            "This is a good prose line that survives fine.",
            "Another decent line of readable text here.",
        ]
        assert r["line_filter_dropped"]  # 2/6 < 50%

    def test_first_matching_rule_attribution(self, spark):
        from sparkplug_spark.operators import filter_lines_quality

        # a short ALL-CAPS line counts as short (rule 1), never upper
        df = spark.createDataFrame([(1, "HI\nthis line is long enough ok")],
                                   "doc_id long, text string")
        r = filter_lines_quality(df).collect()[0]
        assert r["n_short"] == 1 and r["n_upper"] == 0

    def test_clean_doc_untouched(self, spark):
        from sparkplug_spark.operators import filter_lines_quality

        text = "first decent line of text\nsecond decent line of text"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = filter_lines_quality(df).collect()[0]
        assert r["text_clean"] == text
        assert not r["line_filter_dropped"]

    def test_null_and_validation(self, spark):
        from sparkplug_spark.operators import filter_lines_quality

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        r = filter_lines_quality(df).collect()[0]
        assert r["n_lines"] == 1 and r["n_kept"] == 0
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_upper_pct"):
            filter_lines_quality(df, max_upper_pct=150)


class TestWordlistFilter:
    """E219 C4-style banned-wordlist gate."""

    def test_token_level_not_substring(self, spark):
        from sparkplug_spark.operators import wordlist_filter

        df = spark.createDataFrame(
            [(1, "the town of Scunthorpe is lovely"),
             (2, "an actual bad word here: scunt"),
             (3, "SCUNT twice scunt!")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_term_hits"], r["n_distinct_terms"],
                          r["wordlist_flagged"])
            for r in wordlist_filter(df, ["scunt"]).collect()
        }
        # substring inside Scunthorpe must NOT match
        assert got[1] == (0, 0, False)
        assert got[2] == (1, 1, True)
        assert got[3] == (2, 1, True)  # case-folded, punctuation stripped

    def test_max_hits_tolerance_and_validation(self, spark):
        from sparkplug_spark.operators import wordlist_filter

        df = spark.createDataFrame(
            [(1, "mention mention"), (2, "mention")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["wordlist_flagged"]
            for r in wordlist_filter(df, ["mention"], max_hits=1).collect()
        }
        assert got == {1: True, 2: False}
        import pytest as _pytest

        with _pytest.raises(ValueError, match="terms"):
            wordlist_filter(df, [])

    def test_phrase_entries_match_token_subsequences(self, spark):
        from sparkplug_spark.operators import wordlist_filter

        df = spark.createDataFrame(
            [
                (1, "this is Hot Garbage, truly hot garbage"),
                (2, "hot dog and garbage truck"),   # words apart: no hit
                (3, "hothot garbage"),              # substring: no hit
                (4, "spam hot garbage spam"),       # phrase + 2 singles
                (5, "go go go"),                    # overlapping phrase
                (6, "go"),                          # shorter than phrase
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_term_hits"], r["n_distinct_terms"],
                          r["wordlist_flagged"])
            for r in wordlist_filter(
                df, ["spam", "hot garbage", "go go"], max_hits=1
            ).collect()
        }
        assert got[1] == (2, 1, True)     # case-folded, punct-stripped
        assert got[2] == (0, 0, False)
        assert got[3] == (0, 0, False)
        assert got[4] == (3, 2, True)     # 2x spam + 1 phrase
        assert got[5] == (2, 1, True)     # "go go go" -> positions 1,2
        assert got[6] == (0, 0, False)

    def test_scunthorpe_still_safe_with_phrases(self, spark):
        from sparkplug_spark.operators import wordlist_filter

        df = spark.createDataFrame(
            [(1, "the town of Scunthorpe is lovely")],
            "doc_id long, text string",
        )
        r = wordlist_filter(df, ["scunt", "horpe is"]).collect()[0]
        assert (r["n_term_hits"], r["wordlist_flagged"]) == (0, False)


class TestFoldConfusables:
    def test_fold_and_count(self, spark):
        from sparkplug_spark.operators import fold_confusables

        rows = [
            (1, "привет"),            # Cyrillic: only lookalikes fold
            (2, "sрам with сyrillic"), # р,с are Cyrillic homoglyphs
            (3, "ｆｕｌｌｗｉｄｔｈ １２３"),
            (4, "plain ascii"),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in fold_confusables(df).collect()}
        # only the curated lookalikes fold (п,в,и,т stay Cyrillic)
        assert out[1]["text"] == "пpивeт"
        assert out[1]["n_folded"] == 2  # р->p, е->e
        assert out[2]["text"] == "spaм with cyrillic"
        assert out[2]["n_folded"] == 3
        assert out[3]["text"] == "fullwidth 123"
        assert out[3]["n_folded"] == 12
        assert out[4]["text"] == "plain ascii" and out[4]["n_folded"] == 0
        assert out[5]["text"] == "" and out[5]["n_folded"] == 0

    def test_map_columns_aligned(self):
        from sparkplug_spark.operators.cleaning import CONFUSABLES

        src, dst = CONFUSABLES
        assert len(src) == len(dst)
        assert len(set(src)) == len(src)  # no duplicate source codepoint
        assert all(ord(c) < 128 for c in dst)  # folds land in ASCII

    def test_evasive_clone_collides_after_fold(self, spark):
        from pyspark.sql import functions as F

        from sparkplug_spark.operators import fold_confusables

        orig = "the quick brown fox"
        evasive = orig.replace("o", "о").replace("e", "е")  # Cyrillic
        assert evasive != orig
        df = spark.createDataFrame(
            [(1, orig), (2, evasive)], "doc_id long, text string"
        )
        folded = fold_confusables(df).select(
            "doc_id", F.md5("text").alias("h")
        ).collect()
        hs = {r["doc_id"]: r["h"] for r in folded}
        assert hs[1] == hs[2]


class TestAugmentTokenEdits:
    def test_deterministic_and_counted(self, spark):
        from sparkplug_spark.operators import augment_token_edits

        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog " * 10)],
            "doc_id long, text string",
        )
        a = augment_token_edits(df, dropout_ppm=200000, dup_ppm=100000)
        r1, r2 = a.collect()[0], augment_token_edits(
            df, dropout_ppm=200000, dup_ppm=100000
        ).collect()[0]
        assert r1 == r2  # bit-identical regeneration
        assert r1["n_tokens"] == 90
        out_tokens = len(r1["text"].split(" "))
        assert out_tokens == 90 - r1["n_dropped"] + r1["n_dupped"]
        assert r1["n_dropped"] > 0 and r1["n_dupped"] > 0

    def test_seed_changes_edits(self, spark):
        from sparkplug_spark.operators import augment_token_edits

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta " * 25)],
            "doc_id long, text string",
        )
        a = augment_token_edits(df, dropout_ppm=300000, seed="s1").collect()[0]
        b = augment_token_edits(df, dropout_ppm=300000, seed="s2").collect()[0]
        assert a["text"] != b["text"]

    def test_band_validation(self, spark):
        from sparkplug_spark.operators import augment_token_edits

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            augment_token_edits(df, dropout_ppm=600000, dup_ppm=500000)
