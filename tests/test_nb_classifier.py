"""E128 trained multinomial naive-Bayes classifier: learns separable
vocabularies, integer micro-nat scores are exact and partitioning-
independent, prediction is the score's sign."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import naive_bayes_classifier


def _toy(spark, reps=3):
    rows = []
    i = 0
    for _ in range(reps):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
        rows.append((i + 1, "der schnelle braune fuchs springt ueber den hund", "de"))
        i += 2
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestNaiveBayesClassifier:
    def test_separable_corpus_learns(self, spark):
        out = {
            r["doc_id"]: r
            for r in naive_bayes_classifier(_toy(spark)).collect()
        }
        assert len(out) == 6
        for r in out.values():
            # disjoint vocabularies: training accuracy must be perfect
            assert r["predicted"] == r["label"]
            assert (r["score_micros"] > 0) == r["predicted"]

    def test_scores_partitioning_independent(self, spark):
        df = _toy(spark, reps=4)
        a = {
            r["doc_id"]: r["score_micros"]
            for r in naive_bayes_classifier(df.repartition(1)).collect()
        }
        b = {
            r["doc_id"]: r["score_micros"]
            for r in naive_bayes_classifier(df.repartition(7)).collect()
        }
        # integer micro-nat sums: EXACTLY equal, not approximately
        assert a == b

    def test_identical_docs_identical_scores(self, spark):
        out = {
            r["doc_id"]: r["score_micros"]
            for r in naive_bayes_classifier(_toy(spark)).collect()
        }
        assert out[0] == out[2] == out[4]
        assert out[1] == out[3] == out[5]


class TestLabelNoiseReport:
    def test_flags_planted_mislabel(self, spark):
        from sparkplug_spark.operators import label_noise_report

        # two clearly-separated dialects + one mislabeled doc per side
        rows = []
        for i in range(30):
            rows.append((i, "alpha beta gamma alpha beta", "en"))
            rows.append((100 + i, "zork quux blarg zork quux", "xx"))
        rows.append((500, "zork quux blarg zork quux blarg", "en"))  # noisy
        rows.append((501, "alpha beta gamma alpha", "xx"))           # noisy
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        rep = {
            r["doc_id"]: (r["noise_micros"], r["flag_noise"])
            for r in label_noise_report(df).collect()
        }
        assert rep[500][1] and rep[501][1]  # planted noise flagged
        clean_flags = [rep[i][1] for i in range(30)] + [
            rep[100 + i][1] for i in range(30)
        ]
        assert not any(clean_flags)
        # signed semantics: positive = model argues against the label
        assert rep[500][0] > 0 and rep[0][0] < 0

    def test_threshold_is_respected(self, spark):
        from sparkplug_spark.operators import label_noise_report

        df = spark.createDataFrame(
            [(1, "a b", "en"), (2, "a b", "xx")],
            "doc_id long, text string, lang string",
        )
        rep = label_noise_report(df, threshold_micros=10**12).collect()
        assert not any(r["flag_noise"] for r in rep)


class TestSourceInfluence:
    def test_poison_source_shows_positive_removal_delta(self, spark):
        from sparkplug_spark.operators import source_influence

        rows = []
        did = 0
        # two clean sources: 'alpha beta' ⇔ en, 'zork quux' ⇔ xx
        for src in ("good1", "good2"):
            for _ in range(5):
                rows.append((did, "alpha beta alpha", "en", src)); did += 1
                rows.append((did, "zork quux zork", "xx", src)); did += 1
        # poison source: labels inverted
        for _ in range(30):
            rows.append((did, "alpha beta alpha", "xx", "poison")); did += 1
            rows.append((did, "zork quux zork", "en", "poison")); did += 1
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        train = df.filter(F.col("doc_id") % 5 != 0)
        eval_df = df.filter((F.col("doc_id") % 5 == 0) & (F.col("source") != "poison"))
        rep = {
            r["source"]: (
                r["n_removed_docs"], r["n_eval"], r["accuracy_ppm"],
                r["delta_ppm"],
            )
            for r in source_influence(train, eval_df).collect()
        }
        assert set(rep) == {"__full__", "good1", "good2", "poison"}
        assert rep["__full__"][0] == 0 and rep["__full__"][3] == 0
        assert rep["poison"][0] > 0
        # removing the poison source must help at least as much as
        # removing either clean source, and strictly beat the full model
        assert rep["poison"][3] > 0
        assert rep["poison"][2] >= rep["good1"][2]
        assert rep["poison"][2] >= rep["good2"][2]
        # every variant scores the same eval set
        assert len({v[1] for v in rep.values()}) == 1

    def test_guard_on_variant_count(self, spark):
        from sparkplug_spark.operators import source_influence

        df = spark.createDataFrame(
            [(i, "a b", "en", f"s{i}") for i in range(10)],
            "doc_id long, text string, lang string, source string",
        )
        with pytest.raises(ValueError, match="max_variants"):
            source_influence(df, df, max_variants=3)


class TestExportedModelServing:
    """score_with_model through a REAL exported artifact: the trained NB
    weights parquet re-loaded once per worker must reproduce the
    relational tier bit-for-bit."""

    def test_loader_path_matches_relational_tier(self, spark, tmp_path):
        from sparkplug_spark.operators import (
            export_nb_model,
            nb_model_loader,
            score_with_model,
        )

        df = _toy(spark, reps=4)
        path = str(tmp_path / "nb_model")
        export_nb_model(df, path)
        # real files on disk, readable without Spark
        import pyarrow.dataset as ds

        wt = ds.dataset(path + "/weights").to_table()
        assert wt.num_rows > 0 and set(wt.column_names) == {
            "token", "w_micros"}

        relational = {
            r["doc_id"]: r["score_micros"]
            for r in naive_bayes_classifier(df).collect()
        }
        served = {
            r["doc_id"]: r["model_score"]
            for r in score_with_model(
                df, model_loader=nb_model_loader(path)
            ).collect()
        }
        assert set(served) == set(relational)
        for d, micros in relational.items():
            # integer micro-nats / 1e6 — exact in double, so bit-for-bit
            assert served[d] == micros / 1e6, (d, served[d], micros)

    def test_oov_tokens_weigh_zero(self, spark, tmp_path):
        from sparkplug_spark.operators import (
            export_nb_model,
            nb_model_loader,
            score_with_model,
        )

        train = _toy(spark, reps=2)
        path = str(tmp_path / "nb_model2")
        export_nb_model(train, path)
        new = spark.createDataFrame(
            [(100, "the dog zzzunseen"), (101, "zzzunseen qqqnovel")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["model_score"]
            for r in score_with_model(
                new, model_loader=nb_model_loader(path)
            ).collect()
        }
        # doc 101 is all-OOV -> scores exactly the prior
        import pyarrow.dataset as ds

        prior = ds.dataset(path + "/prior").to_table().to_pydict()[
            "prior_micros"][0]
        assert got[101] == prior / 1e6
        # doc 100 shares 'the dog' with the en class -> scores above prior
        assert got[100] > got[101]
