"""E196 rule_selectivity: one-pass match/overlap preflight for a rule
set — counts, ppm, exactly-one exclusivity, NULL-condition semantics."""

import pytest

from sparkplug_spark.models import PlugAction, PlugRule
from sparkplug_spark.operators import rule_selectivity


def _rules():
    return [
        PlugRule("lo", "v1", "x < 10", (PlugAction("y", "0"),)),
        PlugRule("hi", "v1", "x >= 5", (PlugAction("y", "1"),)),
        PlugRule("nul", "v1", "z = 'a'", (PlugAction("y", "2"),)),
    ]


class TestRuleSelectivity:
    def test_counts_overlap_and_any(self, spark):
        # x: 0..19; z NULL everywhere -> 'nul' never matches
        df = spark.createDataFrame(
            [(i, None) for i in range(20)], "x int, z string"
        )
        got = {
            r["rule_name"]: (r["n_match"], r["match_ppm"], r["n_exclusive"])
            for r in rule_selectivity(df, _rules()).collect()
        }
        assert got["lo"] == (10, 500000, 5)   # x<5 exclusive
        assert got["hi"] == (15, 750000, 10)  # x>=10 exclusive
        assert got["nul"] == (0, 0, 0)        # NULL condition = no match
        assert got["__any__"] == (20, 1000000, 15)

    def test_empty_rules_raise(self, spark):
        df = spark.createDataFrame([(1,)], "x int")
        with pytest.raises(ValueError, match="non-empty"):
            rule_selectivity(df, [])
