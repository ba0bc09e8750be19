"""Unit checks for tools/staleness_audit.py — the rotation generator
is now load-bearing for the driver-verification process (VERDICT r8
item 3), so its building blocks get pinned: span extraction must see
through the suite into operator callees, the round-commit parser must
find every ``round N:`` marker, and the hunk parser must map diffs to
new-file ranges exactly."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import staleness_audit as sa  # noqa: E402


@pytest.fixture(scope="module")
def suite():
    from city_payroll_data_pipeline_spark.suite import build_suite

    return build_suite()


def test_round_commits_found():
    rc = sa.round_commits()
    # rounds 2..8 all have driver "round N: verdict/..." commits
    assert set(range(2, 9)).issubset(rc), sorted(rc)
    for sha in rc.values():
        assert len(sha) == 40


def test_green_rounds_cover_checked_ledger():
    gr = sa.green_rounds()
    checked = sa.checked_names()
    # every ledger name has a green CORRECTNESS row somewhere — except
    # the one declared rows-only no-oracle query, whose driver record
    # doesn't carry the full rows+schema(+hash) triple
    assert checked - set(gr) <= {"audit_timestamp"}, sorted(
        checked - set(gr)
    )[:5]


def test_spans_reach_operator_callees(suite):
    """The audit must see PAST the suite wrapper into the operator a
    query calls — otherwise an operator-only change would never mark
    its queries stale. mmr_diversified_topk's suite fn is in
    suite/vectors.py but the greedy fold lives in
    operators/similarity.py::mmr_rerank."""
    spans = sa.spans_for(suite["mmr_diversified_topk"].spark)
    files = {rel for rel, _, _ in spans}
    assert any(f.endswith("suite/vectors.py") for f in files), files
    assert any(f.endswith("operators/similarity.py") for f in files), files


def test_hunk_parser_maps_new_file_ranges():
    assert sa._HUNK.match("@@ -10,2 +20,3 @@").groups() == ("20", "3")
    assert sa._HUNK.match("@@ -10 +20 @@ def f():").groups() == ("20", None)
    # pure deletion: n=0 flags the adjacent line
    m = sa._HUNK.match("@@ -5,4 +7,0 @@")
    assert m.groups() == ("7", "0")


def test_rotation_file_matches_tool_output(suite):
    """__spark_entry__._ROUND_NEW must stay consistent with the
    registry: every rotation name resolves and this round's new
    queries lead (cheap drift alarm between the generated file and
    the tool's contract)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert len(mod._ROUND_NEW) == 50
    unknown = [n for n in mod._ROUND_NEW if n not in suite]
    assert not unknown, unknown
    checked = sa.checked_names()
    never = [n for n in mod._ROUND_NEW if n not in checked]
    # never-checked names (this round's new + r8 stragglers) must all
    # sit BEFORE the first re-verdict — the driver samples a prefix
    if never:
        last_never = max(mod._ROUND_NEW.index(n) for n in never)
        first_re = min(
            (mod._ROUND_NEW.index(n) for n in mod._ROUND_NEW if n in checked),
            default=50,
        )
        assert last_never < first_re or first_re == 50, (
            last_never, first_re,
        )


def test_git_available_and_repo_clean_enough():
    out = subprocess.run(
        ["git", "rev-parse", "--is-inside-work-tree"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert out.stdout.strip() == "true"
