"""Suite-registry lints — cheap guards for the machinery every round
relies on: oracle hygiene (a nondeterministic function inside an
oracle would flake the driver gate, not fail it cleanly) and rotation
name integrity (a typo in _ROUND_NEW would silently burn a driver
verification slot on a nonexistent query).
"""

import importlib.util
import os
import re

import pytest

from city_payroll_data_pipeline_spark.suite import build_suite

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def suite():
    return build_suite()


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


#: functions that would make a DuckDB oracle nondeterministic between
#: the driver's run and ours. current_timestamp/now have no business
#: in any oracle (audit_timestamp deliberately has NO oracle).
_FORBIDDEN = re.compile(
    r"\b(random|now|current_timestamp|current_date|today|gen_random_uuid)\s*\(",
    re.IGNORECASE,
)


def test_oracles_are_deterministic_sql(suite):
    bad = {
        name: m.group(0)
        for name, q in suite.items()
        if q.oracle is not None
        for m in [_FORBIDDEN.search(q.oracle)]
        if m
    }
    assert not bad, bad


def test_oracles_are_single_statements(suite):
    """One SELECT per oracle: a stray semicolon would make DuckDB run
    only the first statement and the comparison would test the wrong
    query. Comments and string literals are stripped first (a ';'
    inside either is harmless); trailing semicolons are tolerated."""

    def strip(sql: str) -> str:
        sql = re.sub(r"'(?:[^']|'')*'", "''", sql)  # string literals
        sql = re.sub(r"--[^\n]*", "", sql)  # line comments
        return sql

    bad = [
        name
        for name, q in suite.items()
        if q.oracle is not None
        and ";" in strip(q.oracle).rstrip().rstrip(";")
    ]
    assert not bad, bad


def test_round_new_names_exist(suite):
    """Every _ROUND_NEW entry must be a real suite query — a typo
    would silently burn one of the driver's 50 verification slots."""
    mod = _entry_module()
    missing = [n for n in mod._ROUND_NEW if n not in suite]
    assert not missing, missing


def test_round_new_has_no_duplicates():
    mod = _entry_module()
    seen, dups = set(), []
    for n in mod._ROUND_NEW:
        if n in seen:
            dups.append(n)
        seen.add(n)
    assert not dups, dups


def test_round_new_disjoint_from_checked_ledger():
    """Rotation-overlap lint (VERDICT r6 item 8): a _ROUND_NEW entry
    already in CHECKED.md would silently burn one of the driver's 50
    verification slots re-checking a name that already has an official
    verdict. Intentional re-verdicts (e.g. a changed plan or a new
    oracle for an already-checked query) must be declared here."""
    # r8: re-verdicts of r1/r3-checked queries whose implementations
    # were rewritten in the r4/r5 window-rework after their green rows
    # (VERDICT r7 item 1). zipf_slope / peak_concurrency /
    # session_coverage from the same list are still never-checked, so
    # they ride the normal rotation instead.
    DECLARED_REVERDICTS: tuple[str, ...] = (
        "mann_whitney_test",
        "quantile_normalize_lengths",
        "bm25_search",
        "revenue_concentration",
        "key_gini_skew",
    )
    mod = _entry_module()
    overlap = sorted(
        (set(mod._ROUND_NEW) & mod._already_checked())
        - set(DECLARED_REVERDICTS)
    )
    assert not overlap, overlap


def test_bench_headline_and_excluded_partition_registry(suite):
    """Bench-coverage rule (VERDICT r6 item 4): every registry query is
    either timed in bench.HEADLINE or carries a documented exclusion
    class in bench.EXCLUDED — and never both — so the bench total's
    denominator is exact. Unknown names in either list are typos."""
    import bench

    names = set(suite)
    headline, excluded = set(bench.HEADLINE), set(bench.EXCLUDED)
    assert not headline & excluded, sorted(headline & excluded)
    assert not headline - names, sorted(headline - names)
    assert not excluded - names, sorted(excluded - names)
    uncovered = sorted(names - headline - excluded)
    assert not uncovered, uncovered
    # every exclusion reason names one of the documented classes
    classes = (
        "warmup", "sampled-twin", "variant-of-benched",
        "parity-micro", "quadratic-baseline",
    )
    unclassed = {
        n: r
        for n, r in bench.EXCLUDED.items()
        if not r.startswith(classes)
    }
    assert not unclassed, unclassed


#: Queries that once had a driver verdict but were later deleted or
#: renamed in the registry. Currently none — every CHECKED.md name
#: resolves. Any retirement must be recorded here explicitly so the
#: ledger/registry drift stays exactly zero (VERDICT r7 item 7).
RETIRED_CHECKED_NAMES: tuple[str, ...] = ()


def test_checked_ledger_names_exist(suite):
    """CHECKED.md names must stay resolvable — a renamed query would
    silently re-enter the rotation as 'never checked'. A name may only
    be unresolvable if it is explicitly declared retired above."""
    mod = _entry_module()
    checked = mod._already_checked()
    unknown = sorted(
        n for n in checked
        if n not in suite and n not in RETIRED_CHECKED_NAMES
    )
    assert not unknown, unknown
    # and the retired tuple must not rot into carrying live names
    stale = sorted(n for n in RETIRED_CHECKED_NAMES if n in suite)
    assert not stale, stale
