"""sparkplug_spark — a PySpark-native data-quality / rules engine.

Capability parity with ``indix/sparkplug`` (SQL-rule conditional overrides,
validation, audit trail, metrics) re-designed Spark-first, plus large-scale
pipeline extensions: deduplication, similarity search, text analysis, and
multimodal column plumbing.
"""

from .models import (
    DEFAULT_PLUG_DETAILS_COLUMN,
    PLUG_DETAILS_SCHEMA_DDL,
    PlugAction,
    PlugDetail,
    PlugRule,
    PlugRuleValidationError,
    rule_from_dict,
    rules_from_json_lines,
)
from .engine import (
    CheckpointConfig,
    PlugDetailsConfig,
    PlugRuleValidationException,
    SparkPlug,
    apply_rule,
    default_details_entry,
    plug,
)
from .validation import (
    CoercionError,
    build_fields_map,
    coerce_action_value,
    validate_rules,
)
from .conf import recommended_conf

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_PLUG_DETAILS_COLUMN",
    "PLUG_DETAILS_SCHEMA_DDL",
    "PlugAction",
    "PlugDetail",
    "PlugRule",
    "PlugRuleValidationError",
    "rule_from_dict",
    "rules_from_json_lines",
    "CheckpointConfig",
    "PlugDetailsConfig",
    "PlugRuleValidationException",
    "SparkPlug",
    "apply_rule",
    "default_details_entry",
    "plug",
    "CoercionError",
    "build_fields_map",
    "coerce_action_value",
    "validate_rules",
    "recommended_conf",
]
