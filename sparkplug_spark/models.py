"""Rule / action / audit data model.

Re-expresses the reference's case classes as Python dataclasses:

- ``PlugAction``   ≅ reference ``PlugRule.scala:10-12``
- ``PlugRule``     ≅ reference ``PlugRule.scala:16``
- ``PlugDetail``   ≅ reference ``PlugDetail.scala:3``
- ``PlugRuleValidationError`` ≅ reference ``PlugRuleValidationError.scala:3``

Rules serialize as JSON lines (reference ``src/test/resources/rules.json``,
loader ``SparkPlugHelper.scala:8-12``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable

__all__ = [
    "PlugAction",
    "PlugRule",
    "PlugDetail",
    "PlugRuleValidationError",
    "rule_from_dict",
    "rules_from_json_lines",
    "PLUG_DETAILS_SCHEMA_DDL",
    "DEFAULT_PLUG_DETAILS_COLUMN",
]

#: Default audit column name (reference ``SparkPlugUDFs.scala:33``).
DEFAULT_PLUG_DETAILS_COLUMN = "plugDetails"

#: Spark DDL for the audit column (reference ``PlugDetail.scala:3`` via
#: case-class reflection, ``ReflectionUtil.scala:10-11``).
PLUG_DETAILS_SCHEMA_DDL = (
    "array<struct<name:string,version:string,fieldNames:array<string>>>"
)


@dataclass(frozen=True)
class PlugAction:
    """One column override: set ``key`` to ``value``.

    ``key`` may be a dotted path into (arbitrarily nested) structs, e.g.
    ``price.minPrice``.  ``value`` is a literal string coerced to the target
    column type, or a backtick-quoted Spark SQL expression
    (reference ``PlugRule.scala:132-141``).
    """

    key: str
    value: str

    @property
    def update_key(self) -> str:
        """First path segment — the top-level column this action touches
        (reference ``PlugRule.scala:11``)."""
        return self.key.split(".", 1)[0]

    @property
    def is_expression(self) -> bool:
        """Backtick values are raw Spark SQL expressions
        (reference ``PlugRule.scala:132-134``)."""
        return "`" in self.value

    @property
    def expression(self) -> str:
        return self.value.replace("`", "")


@dataclass(frozen=True)
class PlugRule:
    """A named, versioned conditional-override rule.

    ``condition`` is a Spark SQL WHERE-clause predicate evaluated per row;
    ``actions`` are applied where it holds (reference ``PlugRule.scala:16``).
    """

    name: str
    version: str
    condition: str
    actions: tuple[PlugAction, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        # Allow list input for ergonomics; store as tuple (hashable/frozen).
        if not isinstance(self.actions, tuple):
            object.__setattr__(
                self,
                "actions",
                tuple(
                    a if isinstance(a, PlugAction) else PlugAction(**a)
                    for a in self.actions
                ),
            )

    @property
    def field_names(self) -> list[str]:
        """Action keys recorded in the audit entry
        (reference ``PlugRule.scala:18-19``)."""
        return [a.key for a in self.actions]

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "version": self.version,
            "condition": self.condition,
            "actions": [{"key": a.key, "value": a.value} for a in self.actions],
        }


@dataclass(frozen=True)
class PlugDetail:
    """Audit record appended per matched-and-changed rule
    (reference ``PlugDetail.scala:3``)."""

    name: str
    version: str
    fieldNames: tuple[str, ...]


@dataclass(frozen=True)
class PlugRuleValidationError:
    """Validation failure for a rule (reference
    ``PlugRuleValidationError.scala:3``).  Error strings match the reference
    verbatim for parity."""

    name: str
    error: str


def rule_from_dict(d: dict[str, Any]) -> PlugRule:
    return PlugRule(
        name=d["name"],
        version=d["version"],
        condition=d["condition"],
        actions=tuple(PlugAction(a["key"], a["value"]) for a in d.get("actions", [])),
    )


def rules_from_json_lines(lines: Iterable[str]) -> list[PlugRule]:
    """Parse JSON-lines rule text (reference ``SparkPlugHelper.scala:8-12``
    used ``spark.read.json``; rules are tiny driver-side objects, so a plain
    parse avoids a Spark job entirely)."""
    out: list[PlugRule] = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        out.append(rule_from_dict(json.loads(line)))
    return out
