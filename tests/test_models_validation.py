"""Unit tests: models, loader, validation matrix
(port of ``PlugRuleSpec.scala`` and ``SparkPlugHelperSpec.scala``)."""

import json

import pytest
from pyspark.sql import types as T

from sparkplug_spark import (
    PlugAction,
    PlugRule,
    rules_from_json_lines,
    validate_rules,
)
from sparkplug_spark.sources import read_plug_rules
from sparkplug_spark.validation import build_fields_map, coerce_action_value, CoercionError

FLAT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("price", T.IntegerType()),
    ]
)

NESTED = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField(
            "price",
            T.StructType(
                [
                    T.StructField("minPrice", T.DoubleType()),
                    T.StructField(
                        "extra",
                        T.StructType([T.StructField("deep", T.IntegerType())]),
                    ),
                ]
            ),
        ),
    ]
)


def test_loader_json_lines(tmp_path):
    # SparkPlugHelperSpec.scala:16-31 / rules.json fixture
    lines = [
        json.dumps(
            {
                "name": "rule1",
                "version": "version1",
                "condition": "title like '%iPhone%'",
                "actions": [
                    {"key": "title", "value": "Apple iPhone"},
                    {"key": "price", "value": "1000"},
                ],
            }
        ),
        json.dumps(
            {
                "name": "rule2",
                "version": "version1",
                "condition": "title like '%Galaxy%'",
                "actions": [{"key": "price", "value": "700"}],
            }
        ),
    ]
    rules = rules_from_json_lines(lines)
    assert len(rules) == 2
    assert rules[0].name == "rule1"
    assert rules[0].actions[0] == PlugAction("title", "Apple iPhone")
    assert rules[0].actions[0].update_key == "title"
    assert rules[1].field_names == ["price"]

    p = tmp_path / "rules.json"
    p.write_text("\n".join(lines))

    class FakeSpark:  # local path → no Spark needed
        pass

    assert read_plug_rules(FakeSpark(), str(p)) == rules


def test_empty_actions_invalid():
    # PlugRuleSpec.scala:7-14
    errs = validate_rules(FLAT, [PlugRule("r", "v", "true", ())])
    assert errs[0].error == "At the least one action must be specified per rule."


def test_missing_field_invalid():
    # PlugRuleSpec.scala:16-23
    errs = validate_rules(FLAT, [PlugRule("r", "v", "true", (PlugAction("zzz", "1"),))])
    assert errs[0].error == 'Field "zzz" not found in the schema.'


def test_nested_key_presence_three_levels():
    # PlugRuleSpec.scala:25-52
    ok = PlugRule(
        "r",
        "v",
        "true",
        (
            PlugAction("price.minPrice", "1.5"),
            PlugAction("price.extra.deep", "7"),
        ),
    )
    assert validate_rules(NESTED, [ok]) == []
    missing = PlugRule("r", "v", "true", (PlugAction("price.nope", "1"),))
    errs = validate_rules(NESTED, [missing])
    assert errs[0].error == 'Field "price.nope" not found in the schema.'


def test_incompatible_values_incl_nested():
    # PlugRuleSpec.scala:54-86
    errs = validate_rules(
        FLAT, [PlugRule("r", "v", "true", (PlugAction("price", "12.5"),))]
    )
    assert errs[0].error == 'Value "12.5" cannot be assigned to field price.'
    errs = validate_rules(
        NESTED,
        [PlugRule("r", "v", "true", (PlugAction("price.extra.deep", "oops"),))],
    )
    assert errs[0].error == 'Value "oops" cannot be assigned to field price.extra.deep.'


def test_backtick_value_skips_coercion():
    rule = PlugRule(
        "r", "v", "true", (PlugAction("price", "`cast(rand() * 100 as int)`"),)
    )
    assert validate_rules(FLAT, [rule]) == []
    assert rule.actions[0].is_expression
    assert rule.actions[0].expression == "cast(rand() * 100 as int)"


def test_coercion_matrix():
    assert coerce_action_value("42", T.IntegerType()) == 42
    assert coerce_action_value("42", T.LongType()) == 42
    assert coerce_action_value("2.5", T.DoubleType()) == 2.5
    assert coerce_action_value("2", T.DoubleType()) == 2.0
    assert coerce_action_value("x", T.StringType()) == "x"
    assert coerce_action_value("true", T.BooleanType()) is True
    with pytest.raises(CoercionError):
        coerce_action_value("2.5", T.IntegerType())
    with pytest.raises(CoercionError):
        coerce_action_value("9999999999999", T.IntegerType())  # overflow
    with pytest.raises(CoercionError):
        coerce_action_value("yes", T.BooleanType())


def test_build_fields_map_recursive():
    m = build_fields_map(NESTED)
    assert set(m) == {
        "title",
        "price",
        "price.minPrice",
        "price.extra",
        "price.extra.deep",
    }
    assert isinstance(m["price.extra.deep"], T.IntegerType)
