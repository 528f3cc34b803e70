"""Expectation diagnostics — the checklist that validates a (custom)
expectation implementation.

Mirrors the reference's ``core/expectation_diagnostics/`` harness
(``expectation_diagnostics.py:35`` ``ExpectationDiagnostics``,
``generate_checklist``, ``_check_example_cases``,
``_check_core_logic_for_at_least_one_execution_engine``,
``tests/expectations/test_run_diagnostics.py``): given an expectation type
and example cases in the reference's test-data-cases shape::

    examples = [{
        "data": {"x": [1, 2, 3, None]},
        "tests": [{
            "title": "basic_positive",
            "in": {"column": "x", "min_value": 0, "max_value": 5},
            "out": {"success": True, "unexpected_list": []},
        }],
    }]

``run_diagnostics`` executes every case through the real Ray engine
(``from_memory`` -> ``validate``) and emits a checklist whose items match
the reference's: registration, docstring, positive+negative examples, core
logic passing on all cases, input validation producing failed EVRs (not
crashes), and data-docs renderability.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class DiagnosticCheck:
    check: str
    passed: bool
    details: str = ""


@dataclass
class ExpectationDiagnostics:
    expectation_type: str
    checks: list[DiagnosticCheck] = field(default_factory=list)

    @property
    def success(self) -> bool:
        return all(c.passed for c in self.checks)

    def generate_checklist(self) -> str:
        """Human checklist, reference ``generate_checklist`` shape."""
        lines = [f"Completeness checklist for {self.expectation_type}:"]
        for c in self.checks:
            mark = "✔" if c.passed else "✗"
            line = f"   {mark} {c.check}"
            if c.details and not c.passed:
                line += f"\n      {c.details}"
            lines.append(line)
        return "\n".join(lines)

    def to_json_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "success": self.success,
            "checks": [vars(c) for c in self.checks],
        }


def _run_case(expectation_type: str, data: dict, case: dict):
    import pandas as pd

    from great_expectations_ray.core.suite import ExpectationSuite
    from great_expectations_ray.engine import validate
    from great_expectations_ray.sources.readers import from_memory

    ds = from_memory(pd.DataFrame(data))
    suite = ExpectationSuite("diagnostics").add(expectation_type, **case["in"])
    res = validate(ds, suite, result_format="COMPLETE")
    return res.results[0]


def run_diagnostics(
    expectation_type: str,
    examples: Optional[list[dict]] = None,
) -> ExpectationDiagnostics:
    """Run the completeness checklist; returns ``ExpectationDiagnostics``."""
    from great_expectations_ray.engine import STUB_TYPES
    from great_expectations_ray.functions.aggregates import AGG_EXPECTATIONS
    from great_expectations_ray.functions.column_map import CONDITION_KERNELS
    from great_expectations_ray.functions.registry import supported_expectation_types
    from great_expectations_ray.functions.table import TABLE_RULES

    diag = ExpectationDiagnostics(expectation_type)
    examples = examples or []

    # 1. registration (reference: _check_library_metadata / registry presence)
    registered = (
        expectation_type in supported_expectation_types()
        and expectation_type not in STUB_TYPES
    )
    diag.checks.append(DiagnosticCheck(
        "Has a registered execution kernel", registered,
        "" if registered else f"{expectation_type!r} is not registered",
    ))
    if not registered:
        return diag

    # 2. docstring (reference: _check_docstring)
    impl = (
        CONDITION_KERNELS.get(expectation_type)
        or TABLE_RULES.get(expectation_type)
        or AGG_EXPECTATIONS.get(expectation_type)
    )
    # per-kernel docstring, falling back to the kernel module's docstring
    # (this repo documents kernel families at module granularity)
    has_doc = bool(getattr(impl, "__doc__", None))
    if not has_doc and impl is not None:
        import sys as _sys

        mod = _sys.modules.get(getattr(impl, "__module__", ""), None)
        has_doc = bool(getattr(mod, "__doc__", None))
    diag.checks.append(DiagnosticCheck(
        "Has a docstring on the kernel (or its module)", has_doc,
        "" if has_doc else "kernel and module have no docstring",
    ))

    # 3. example coverage (reference: _count_positive_and_negative_example_cases)
    cases = [(ex["data"], t) for ex in examples for t in ex.get("tests", [])]
    n_pos = sum(1 for _, t in cases if t.get("out", {}).get("success") is True)
    n_neg = sum(1 for _, t in cases if t.get("out", {}).get("success") is False)
    ok_examples = n_pos >= 1 and n_neg >= 1
    diag.checks.append(DiagnosticCheck(
        "Has at least one positive and negative example case", ok_examples,
        f"positive={n_pos} negative={n_neg}",
    ))

    # 4. core logic on the Ray engine (reference:
    #    _check_core_logic_for_at_least_one_execution_engine)
    failures: list[str] = []
    for data, t in cases:
        title = t.get("title", "?")
        try:
            evr = _run_case(expectation_type, data, t)
            out = t.get("out", {})
            if evr.exception_info and evr.exception_info.get("raised_exception"):
                failures.append(
                    f"{title}: raised {evr.exception_info.get('exception_message')}"
                )
                continue
            if "success" in out and evr.success != out["success"]:
                failures.append(
                    f"{title}: success={evr.success}, expected {out['success']}"
                )
            if "unexpected_list" in out:
                got = sorted(
                    (evr.result or {}).get("unexpected_list",
                                           (evr.result or {}).get(
                                               "partial_unexpected_list", [])),
                    key=str,
                )
                want = sorted(out["unexpected_list"], key=str)
                if got != want:
                    failures.append(f"{title}: unexpected_list {got} != {want}")
            if "observed_value" in out:
                got_ov = (evr.result or {}).get("observed_value")
                if got_ov != out["observed_value"]:
                    failures.append(
                        f"{title}: observed_value {got_ov} != {out['observed_value']}"
                    )
        except Exception as exc:  # noqa: BLE001 - diagnostics must not crash
            failures.append(f"{title}: {type(exc).__name__}: {exc}")
    diag.checks.append(DiagnosticCheck(
        "All example cases pass on the Ray engine",
        bool(cases) and not failures,
        "; ".join(failures) if failures else f"{len(cases)} case(s) passed",
    ))

    # 5. input validation (reference: _check_input_validation): a bogus
    #    column must produce a failed EVR with exception info, not a crash
    try:
        evr = _run_case(
            expectation_type,
            {"__diag_x": [1, 2, 3]},
            {"in": {**(cases[0][1]["in"] if cases else {}),
                    "column": "__no_such_column"}},
        )
        # the contract (reference _check_input_validation): a bogus column
        # must yield a FAILED EVR — success=True on a nonexistent column
        # means the kernel silently ignored its input
        graceful = not evr.success
        detail = "" if graceful else "succeeded on a nonexistent column"
    except Exception as exc:  # noqa: BLE001
        graceful = False
        detail = f"crashed: {type(exc).__name__}: {exc}"
    diag.checks.append(DiagnosticCheck(
        "Invalid input fails gracefully (failed EVR, no crash)", graceful, detail,
    ))

    # 6. data-docs renderability (reference: _check_renderer_methods)
    try:
        from great_expectations_ray.pipelines.data_docs import render_validation_page

        payload = {"success": True, "suite_name": "diag", "results": [
            {"expectation_config": {"expectation_type": expectation_type,
                                    "kwargs": cases[0][1]["in"] if cases else {}},
             "success": True, "result": {"observed_value": 1}},
        ]}
        page = render_validation_page(payload)
        renders = expectation_type in page
        detail = "" if renders else "type missing from rendered page"
    except Exception as exc:  # noqa: BLE001
        renders, detail = False, f"{type(exc).__name__}: {exc}"
    diag.checks.append(DiagnosticCheck(
        "Renders in data docs", renders, detail,
    ))
    return diag
