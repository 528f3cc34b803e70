"""Expectation suites — declarative, JSON-serializable rule configs.

Mirrors the observable shape of the reference's
``ExpectationConfiguration`` (``great_expectations/expectations/
expectation_configuration.py``) and ``ExpectationSuite``
(``great_expectations/core/expectation_suite.py:66-89``): a suite is a named,
ordered list of ``(type, kwargs, meta)`` configs plus ``suite_parameters``.

Suite parameters: kwargs values of the form ``{"$PARAMETER": "name"}`` are
substituted at compile time from ``suite_parameters`` — plain-name lookups
(reference ``core/suite_parameters.py:44-63``) AND the arithmetic expression
mini-language (``"x * 3"``, ``"round(x / 2)"`` — reference
``core/suite_parameters.py:66+``; see ``core/suite_parameters.py`` here).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ExpectationConfiguration:
    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def to_json_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_json_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )

    def substituted(self, suite_parameters: dict[str, Any]) -> "ExpectationConfiguration":
        """Return a copy with ``{"$PARAMETER": name}`` kwargs resolved."""

        def sub(v: Any) -> Any:
            if isinstance(v, dict) and set(v) == {"$PARAMETER"}:
                from great_expectations_ray.core.suite_parameters import (
                    SuiteParameterError,
                    parse_suite_parameter,
                )

                try:
                    return parse_suite_parameter(v["$PARAMETER"], suite_parameters)
                except SuiteParameterError as exc:
                    raise KeyError(str(exc)) from exc
            if isinstance(v, dict):
                return {k: sub(x) for k, x in v.items()}
            if isinstance(v, list):
                return [sub(x) for x in v]
            return v

        return ExpectationConfiguration(self.expectation_type, sub(self.kwargs), dict(self.meta))


@dataclass
class ExpectationSuite:
    name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    suite_parameters: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        self.expectations.append(ExpectationConfiguration(expectation_type, kwargs))
        return self

    def to_json_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "expectations": [e.to_json_dict() for e in self.expectations],
            "suite_parameters": self.suite_parameters,
            "meta": self.meta,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_json_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json_dict(cls, d: dict[str, Any]) -> "ExpectationSuite":
        return cls(
            name=d["name"],
            expectations=[ExpectationConfiguration.from_json_dict(e) for e in d.get("expectations", [])],
            suite_parameters=dict(d.get("suite_parameters", {})),
            meta=dict(d.get("meta", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        return cls.from_json_dict(json.loads(s))

    def resolved_expectations(self) -> list[ExpectationConfiguration]:
        """Expectations with suite parameters substituted."""
        return [e.substituted(self.suite_parameters) for e in self.expectations]
