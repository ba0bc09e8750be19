"""Staleness audit: which driver-verified queries changed AFTER their
green verdict? (VERDICT r8 item 3 — make re-verdict selection
principled and tool-generated instead of hand-picked.)

A query's driver verdict (CORRECTNESS_r{N}.json) certifies the code as
of the ``round N: verdict/...`` commit. If the query's implementation
— the suite function or any package function it (transitively) calls —
changed after that commit, the CURRENT implementation has never been
driver-checked and should be re-verdicted. This tool computes exactly
that set:

1. per-query latest green round from the CORRECTNESS_r*.json ledger;
2. round → commit via ``git log --grep '^round '``;
3. per-query implementation spans: the registered Spark function plus
   every package-internal callee reachable from it (AST walk over
   Name/Attribute references and function-local imports, depth-capped);
4. per (round-commit, file): changed new-file line ranges from
   ``git diff <sha> HEAD --unified=0``; a query is STALE iff any of
   its spans intersects any changed range of its file since its
   verdict commit.

Known limitation (documented, conservative in the safe direction for
code): the ORACLE SQL string is usually module-level and not walked —
but in this suite oracle edits accompany Spark-side edits in the same
file region virtually always, and the local pytest oracle gate
(tests/test_oracle_parity.py) re-checks every oracle each session
regardless.

Usage:
    python tools/staleness_audit.py                # report
    python tools/staleness_audit.py --rotation \
        --new q1,q2 --slots 50                     # emit _ROUND_NEW body

``--rotation`` prints a ready-to-paste tuple body: --new names first
(this round's brand-new queries), then never-checked names (registry
minus CHECKED.md), then stale queries oldest-verdict-first, cut at
--slots. Stale names already in CHECKED.md belong in
DECLARED_REVERDICTS (tests/test_suite_meta.py) — the tool prints that
list too.
"""

from __future__ import annotations

import argparse
import ast
import inspect
import json
import os
import re
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "city_payroll_data_pipeline_spark"
MAX_DEPTH = 3  # suite fn -> operator -> helper


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_commits() -> dict[int, str]:
    """round number -> sha of the 'round N: verdict/...' commit."""
    out = _git("log", "--format=%H %s", "--grep", "^round ")
    m: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        g = re.match(r"round (\d+):", subj)
        if g:
            m[int(g.group(1))] = sha
    return m


def green_rounds() -> dict[str, int]:
    """query -> LATEST round with a green driver row (rows+schema and,
    when an oracle exists, hash)."""
    gr: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO)):
        g = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if not g:
            continue
        rnd = int(g.group(1))
        with open(os.path.join(REPO, fname)) as f:
            data = json.load(f)
        for name, v in data.items():
            if not isinstance(v, dict) or v.get("err"):
                continue
            if v.get("rows_match") and v.get("schema_match") and (
                v.get("hash_match") is not False
            ):
                gr[name] = max(gr.get(name, 0), rnd)
    return gr


def _span_of(fn) -> tuple[str, int, int] | None:
    try:
        src_file = inspect.getsourcefile(fn)
        lines, start = inspect.getsourcelines(fn)
    except (TypeError, OSError):
        return None
    if not src_file:
        return None
    rel = os.path.relpath(os.path.abspath(src_file), REPO)
    if rel.startswith(".."):
        return None
    return (rel, start, start + len(lines) - 1)


def _callees(fn) -> list:
    """Package-internal functions referenced by ``fn``: global names,
    dotted module attributes, and function-local ``from .. import``s."""
    try:
        src = inspect.getsource(fn)
    except (TypeError, OSError):
        return []
    try:
        tree = ast.parse(
            "\n".join(
                line[4:] if line.startswith("    ") else line
                for line in src.splitlines()
            )
            if src.startswith("    ")
            else src
        )
    except SyntaxError:
        import textwrap

        tree = ast.parse(textwrap.dedent(src))
    g = getattr(fn, "__globals__", {})
    out = []

    def _keep(obj):
        mod = getattr(obj, "__module__", "") or ""
        if mod.startswith(PKG) and isinstance(
            obj, (types.FunctionType, type)
        ):
            out.append(obj)

    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id in g:
            _keep(g[node.id])
        elif isinstance(node, ast.Attribute) and isinstance(
            node.value, ast.Name
        ):
            base = g.get(node.value.id)
            if isinstance(base, types.ModuleType) and base.__name__.startswith(
                PKG
            ):
                _keep(getattr(base, node.attr, None))
        elif isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith(PKG) or node.level
        ):
            modname = node.module
            if node.level:  # relative import inside the package
                pkg_parts = (fn.__module__ or "").split(".")
                modname = ".".join(
                    pkg_parts[: len(pkg_parts) - node.level]
                    + ([node.module] if node.module else [])
                )
            try:
                import importlib

                mod = importlib.import_module(modname)
            except ImportError:
                continue
            for alias in node.names:
                _keep(getattr(mod, alias.name, None))
    return out


def spans_for(fn) -> list[tuple[str, int, int]]:
    seen_fns: set[int] = set()
    spans: list[tuple[str, int, int]] = []

    def visit(f, depth):
        if id(f) in seen_fns or depth > MAX_DEPTH:
            return
        seen_fns.add(id(f))
        sp = _span_of(f)
        if sp:
            spans.append(sp)
        if depth < MAX_DEPTH:
            for c in _callees(f):
                visit(c, depth + 1)

    visit(fn, 1)
    return spans


_HUNK = re.compile(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@")
_diff_cache: dict[tuple[str, str], list[tuple[int, int]]] = {}


def changed_ranges(sha: str, rel: str) -> list[tuple[int, int]]:
    """New-file line ranges touched between ``sha`` and HEAD."""
    key = (sha, rel)
    if key not in _diff_cache:
        out = _git("diff", "--unified=0", sha, "HEAD", "--", rel)
        ranges = []
        for line in out.splitlines():
            m = _HUNK.match(line)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) is not None else 1
                # pure deletion (n=0): flag the adjacent line
                ranges.append((start, start + max(n, 1) - 1))
        _diff_cache[key] = ranges
    return _diff_cache[key]


def checked_names() -> set[str]:
    path = os.path.join(REPO, "CHECKED.md")
    try:
        with open(path) as f:
            return {ln[2:].strip() for ln in f if ln.startswith("- ")}
    except OSError:
        return set()


def audit() -> tuple[dict[str, dict], dict[str, int]]:
    from city_payroll_data_pipeline_spark.suite import build_suite

    suite = build_suite()
    rc = round_commits()
    gr = green_rounds()
    # span -> how many queries reach it; spans reached by a majority
    # of the registry (table()/events_table() style plumbing) are
    # "shared infra" — a change there is one shared-code event, not
    # N independent per-query staleness events, so queries whose ONLY
    # hits are infra spans rank below direct-stale ones (they still
    # surface; they just don't crowd the 50-slot rotation).
    all_spans: dict[str, list] = {
        name: spans_for(q.spark) for name, q in suite.items()
    }
    span_use: dict[tuple, int] = {}
    for spans in all_spans.values():
        for sp in set(spans):
            span_use[sp] = span_use.get(sp, 0) + 1
    shared_cut = len(suite) // 2
    report: dict[str, dict] = {}
    for name in suite:
        rnd = gr.get(name)
        if rnd is None or rnd not in rc:
            continue  # never driver-green -> handled by never-checked pool
        sha = rc[rnd]
        hits, direct = [], False
        for rel, s, e in all_spans[name]:
            for cs, ce in changed_ranges(sha, rel):
                if cs <= e and s <= ce:
                    shared = span_use[(rel, s, e)] > shared_cut
                    hits.append(
                        f"{rel}:{s}-{e} changed @{cs}-{ce}"
                        + (" [shared-infra]" if shared else "")
                    )
                    direct = direct or not shared
                    break
        if hits:
            report[name] = {
                "green_round": rnd, "hits": hits, "direct": direct,
            }
    return report, gr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rotation", action="store_true")
    ap.add_argument("--new", default="", help="comma-separated round-new names")
    ap.add_argument("--slots", type=int, default=50)
    args = ap.parse_args()

    report, gr = audit()
    from city_payroll_data_pipeline_spark.suite import build_suite

    suite = build_suite()
    checked = checked_names()
    never = sorted(n for n in suite if n not in checked)

    direct = sorted(
        (n for n in report if report[n]["direct"]),
        key=lambda n: (report[n]["green_round"], n),
    )
    infra = sorted(
        (n for n in report if not report[n]["direct"]),
        key=lambda n: (report[n]["green_round"], n),
    )
    print(f"# direct-stale (own impl changed after green verdict): "
          f"{len(direct)}")
    for n in direct:
        r = report[n]
        print(f"  {n} (green r{r['green_round']}): {r['hits'][0]}")
    print(f"# infra-stale (only shared plumbing changed): {len(infra)}")
    for n in infra:
        print(f"  {n} (green r{report[n]['green_round']})")
    print(f"# never driver-checked: {len(never)}")
    for n in never:
        print(f"  {n}")

    if args.rotation:
        new = [n for n in args.new.split(",") if n]
        rot = list(new)
        rot += [n for n in never if n not in rot]
        rot += [n for n in direct if n not in rot]
        rot += [n for n in infra if n not in rot]
        # fill remaining slots oldest-verdict-first (re-confirm the
        # longest-unchecked greens even when not stale)
        aged = sorted(
            (n for n in suite if n in gr and n not in rot),
            key=lambda n: (gr[n], n),
        )
        rot += aged
        rot = rot[: args.slots]
        print("\n# paste into __spark_entry__._ROUND_NEW:")
        for n in rot:
            print(f'    "{n}",')
        reverdicts = sorted(set(rot) & checked)
        print("\n# paste into DECLARED_REVERDICTS (already-checked names")
        print("# deliberately re-entering the rotation):")
        for n in reverdicts:
            print(f'    "{n}",')


if __name__ == "__main__":
    main()
