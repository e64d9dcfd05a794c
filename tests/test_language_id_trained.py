"""E201 trained language ID: held-out accuracy, coverage beyond the
stopword tier (languages with no stopword table), determinism, and
train/apply separation."""

import pytest

from sparkplug_spark.operators import language_id, language_id_trained

# Tiny deterministic "languages" with genuinely different character
# distributions.  'fi' and 'sw' are stopword-free for the E15 heuristic
# (no entry in STOPWORDS) — the trained tier must still resolve them.
_WORDS = {
    "en": ["the", "of", "and", "quick", "brown", "fox", "jumps", "lazy",
           "dog", "that", "with", "house", "water", "light"],
    "de": ["der", "die", "und", "schnell", "braun", "fuchs", "springt",
           "über", "faul", "hund", "straße", "größe", "müde", "zwölf"],
    "fi": ["nopea", "ruskea", "kettu", "hyppää", "laiskan", "koiran",
           "yli", "järvi", "kaunis", "päivä", "yö", "metsä", "talvi",
           "kesäloma"],
    "sw": ["mbweha", "mwepesi", "kahawia", "anaruka", "juu", "mbwa",
           "mvivu", "maji", "nyumba", "safari", "rafiki", "chakula",
           "kidogo", "asante"],
}


def _doc(lang, i):
    ws = _WORDS[lang]
    # deterministic word mix, no RNG: rotate through the vocab
    return " ".join(ws[(i * 7 + j * 3) % len(ws)] for j in range(30))


def _corpus(spark, langs, n_per_lang, id_base=0):
    rows = [
        (id_base + li * n_per_lang + i, _doc(lang, i), lang)
        for li, lang in enumerate(langs)
        for i in range(n_per_lang)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestLanguageIdTrained:
    def test_heldout_accuracy_and_stopword_free_coverage(self, spark):
        langs = sorted(_WORDS)
        train = _corpus(spark, langs, 12)
        test = _corpus(spark, langs, 6, id_base=10_000)
        got = {
            r["doc_id"]: r["lang_pred"]
            for r in language_id_trained(test, train_df=train).collect()
        }
        truth = {r["doc_id"]: r["lang"] for r in test.collect()}
        acc = sum(got[d] == truth[d] for d in truth) / len(truth)
        assert acc == 1.0  # fully separable char distributions

        # the stopword heuristic cannot resolve fi/sw at all (no table):
        # it predicts some OTHER language or 'und' for every fi/sw doc
        sw_pred = {
            r["doc_id"]: r["lang_pred"]
            for r in language_id(test).collect()
        }
        fi_sw_ids = [d for d in truth if truth[d] in ("fi", "sw")]
        assert all(sw_pred[d] != truth[d] for d in fi_sw_ids)
        # trained tier strictly beats the heuristic on the same docs
        sw_acc = sum(sw_pred[d] == truth[d] for d in truth) / len(truth)
        assert acc > sw_acc

    def test_self_train_partition_invariant(self, spark):
        df = _corpus(spark, sorted(_WORDS), 8)
        a = {
            (r["doc_id"], r["lang_pred"], r["score_micros"],
             r["margin_micros"])
            for r in language_id_trained(df).collect()
        }
        b = {
            (r["doc_id"], r["lang_pred"], r["score_micros"],
             r["margin_micros"])
            for r in language_id_trained(df.repartition(7)).collect()
        }
        assert a == b

    def test_margin_semantics(self, spark):
        df = _corpus(spark, ["en", "de"], 6)
        rows = language_id_trained(df).collect()
        assert all(r["margin_micros"] >= 0 for r in rows)
        # two classes -> margin is winner minus the single runner-up;
        # clearly separable docs should carry a decisive margin
        assert all(r["margin_micros"] > 0 for r in rows)

    def test_single_class_margin_zero(self, spark):
        df = _corpus(spark, ["en"], 5)
        rows = language_id_trained(df).collect()
        assert {r["lang_pred"] for r in rows} == {"en"}
        assert all(r["margin_micros"] == 0 for r in rows)

    def test_null_labels_excluded_from_training(self, spark):
        base = _corpus(spark, ["en", "de"], 6)
        noisy = base.unionByName(
            spark.createDataFrame(
                [(999, "zzz qqq xxx", None)],
                "doc_id long, text string, lang string",
            )
        )
        # NULL-label rows train nothing and (self-train) are not scored
        rows = language_id_trained(noisy).collect()
        assert 999 not in {r["doc_id"] for r in rows}
        assert {r["lang_pred"] for r in rows} <= {"en", "de"}

    def test_short_docs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "en"), (2, "the quick brown fox the of and", "en"),
             (3, "der die und schnell braun", "de")],
            "doc_id long, text string, lang string",
        )
        got = {r["doc_id"] for r in language_id_trained(df).collect()}
        # doc 1 has a single char: it still yields no 3-gram but one
        # 2-gram would need len >= 2 -> dropped entirely
        assert got == {2, 3}


class TestLanguageIdServingTiers:
    """E212: closure-apply and streaming route equal the relational tier
    bit-for-bit (same trained integers)."""

    def test_apply_equals_relational_exact(self, spark):
        from sparkplug_spark.operators import (
            apply_language_id,
            train_language_id,
        )

        df = _corpus(spark, sorted(_WORDS), 8)
        model = train_language_id(df)
        a = sorted(map(tuple, apply_language_id(df, model).collect()))
        b = sorted(map(tuple, language_id_trained(df).collect()))
        assert a == b

    def test_model_is_plain_picklable_dict(self, spark):
        import pickle

        from sparkplug_spark.operators import train_language_id

        model = train_language_id(_corpus(spark, ["en", "de"], 6))
        again = pickle.loads(pickle.dumps(model))
        assert again["langs"] == ["de", "en"]
        assert len(again["priors"]) == 2
        assert all(len(v) == 2 for v in again["weights"].values())

    def test_no_gram_docs_dropped_and_review_lane(self, spark):
        from sparkplug_spark.operators import (
            apply_language_id,
            train_language_id,
        )
        from sparkplug_spark.streaming import streaming_language_route

        train = _corpus(spark, ["en", "de"], 6)
        model = train_language_id(train)
        apply_df = train.unionByName(
            spark.createDataFrame(
                [(999, "", "en")], "doc_id long, text string, lang string"
            )
        )
        out = apply_language_id(apply_df, model)
        assert 999 not in {r["doc_id"] for r in out.collect()}
        routed = streaming_language_route(
            apply_df, model, min_margin_micros=10**12
        )
        rows = routed.collect()
        assert all(r["review_lane"] for r in rows)  # absurd threshold
