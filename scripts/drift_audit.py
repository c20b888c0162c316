#!/usr/bin/env python
"""Mechanical derivation of the driver-sweep _PRIORITY rotation.

The driver certifies the FIRST 50 registry keys each round
(CORRECTNESS_r{N}.json).  This script reproduces the r8 rotation
method (PLANS.md "r8 _PRIORITY rotation") as a repeatable audit:

1. parse every CORRECTNESS_r*.json -> each key's latest GREEN round
   (green = rows+schema+hash all true, no err);
2. locate each round's code snapshot (the `round N: ...` artifact
   commits — the snapshot the round-N driver actually certified);
3. AST-extract each key's registered function block (decorators
   included, so the oracle SQL is part of the block) PLUS the recursive
   closure of helpers it references — same-module AND cross-module
   (``from pkg... import _helper`` at module level or inside the
   function body), private functions (_-prefixed) and module-level
   constants (_-prefixed or ALL-CAPS targets, compared by
   ``ast.unparse`` so comment/position churn doesn't flag) — at HEAD
   and at its last-green snapshot; textual mismatch -> DRIFTED.
   Motivation (r12): the winsorized report row changed
   `_experiment_report_from_per_user` and the streaming twin's OUTPUT
   gained a row while its own registered block was untouched —
   helper-mediated drift the bare-block hash missed.  Remaining blind
   spots: public (non-underscore, non-CAPS) helpers like ``load`` and
   attribute-qualified calls — proxy-covered by vintage aging;
4. emit tiers: never-rowed keys, drifted keys (oldest vintage first),
   then oldest-standing green keys as proxies for the remaining
   helper drift.

Usage: python scripts/drift_audit.py [--slots 50]
Prints a proposed _PRIORITY block plus the accounting behind it.
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "mysql_postgres_debezium_cdc_spark"


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def latest_green_rounds() -> dict[str, int]:
    """key -> latest round with a fully-green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rows = json.loads(Path(path).read_text())
        for key, r in rows.items():
            green = (
                r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("hash_match") is True
                and not r.get("err")
            )
            if green:
                out[key] = max(out.get(key, 0), rnd)
    return out


def round_commits() -> dict[int, str]:
    """round -> the artifact commit snapshotting that round's code.

    The driver writes exactly one ``round N: ...`` commit per round; if
    a later commit ever reused that subject prefix (hotfix, revert), the
    OLDEST match is the one whose tree the round-N driver actually
    certified — so iterate newest-first and let later (older) matches
    overwrite (ADVICE r9: newest-match would silently shift the
    certified snapshot under a reused subject)."""
    log = sh("git", "log", "--format=%H %s")
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            out[int(m.group(1))] = sha  # newest first; last write = oldest
    return out


def _module_info(source: str):
    """(registered key -> def name,
        def name -> (block text, referenced names, body from-imports),
        module-level from-imports (name -> (module, original name)),
        tracked constants (name -> ast.unparse of the assignment))
    for one module.  Constants are _-prefixed or ALL-CAPS top-level
    assignment targets; ``ast.unparse`` keeps them comment-insensitive
    so moving or re-commenting a constant doesn't flag drift."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return {}, {}, {}, {}
    lines = source.splitlines()
    registered: dict[str, str] = {}
    fns: dict[str, tuple[str, set[str], dict]] = {}
    mod_imports: dict[str, tuple[str, str]] = {}
    consts: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            for al in node.names:
                mod_imports[al.asname or al.name] = (node.module, al.name)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                if isinstance(t, ast.Name) and (t.id.startswith("_") or t.id.isupper()):
                    consts[t.id] = ast.unparse(node)
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        start = (
            min(d.lineno for d in node.decorator_list) - 1
            if node.decorator_list
            else node.lineno - 1
        )
        block = "\n".join(lines[start : node.end_lineno])
        refs = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        fimps: dict[str, tuple[str, str]] = {}
        for n in ast.walk(node):
            if isinstance(n, ast.ImportFrom) and n.module and n.module.startswith(PKG):
                for al in n.names:
                    fimps[al.asname or al.name] = (n.module, al.name)
        fns[node.name] = (block, refs, fimps)
        for dec in node.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and isinstance(dec.func, ast.Name)
                and dec.func.id == "register"
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
                and isinstance(dec.args[0].value, str)
            ):
                registered[dec.args[0].value] = node.name
    return registered, fns, mod_imports, consts


# Ubiquitous infra names excluded from the helper closure: every key
# references them, so including them would flag the WHOLE registry on
# any infra edit — that breadth of drift is what the vintage-aging
# tiers are for.  Everything else public now rides the closure (r12.2:
# the lsh_signatures vectorization showed a public shared helper
# changing two certified keys' physical plan with zero flagged drift —
# the documented blind spot, now closed for explicitly-referenced
# package helpers; attribute-qualified calls remain proxy-covered).
_INFRA_NAMES = {"load", "register"}


def _closures(mods: dict) -> dict[str, str]:
    """key -> registered block + the recursive helper/constant closure,
    parts sorted and name-labelled so the text is order-stable."""
    out: dict[str, str] = {}
    empty = ({}, {}, {}, {})
    for mod, (registered, _fns, _mimps, _consts) in mods.items():
        for key, fname in registered.items():
            seen: set[tuple[str, str]] = set()
            cseen: set[tuple[str, str]] = set()
            stack = [(mod, fname)]
            parts: list[tuple[str, str, str, str]] = []
            while stack:
                m, f = stack.pop()
                if (m, f) in seen:
                    continue
                seen.add((m, f))
                _, mfns, mmimps, mconsts = mods.get(m, empty)
                if f not in mfns:
                    continue
                block, refs, fimps = mfns[f]
                parts.append(("F", m, f, block))
                for r in refs:
                    if r in _INFRA_NAMES:
                        continue
                    if r in mfns:
                        stack.append((m, r))
                    elif r in mconsts and (m, r) not in cseen:
                        cseen.add((m, r))
                        parts.append(("C", m, r, mconsts[r]))
                    elif r in fimps or r in mmimps:
                        tm, tn = fimps.get(r) or mmimps[r]
                        _, tfns, _, tconsts = mods.get(tm, empty)
                        if tn in tfns:
                            stack.append((tm, tn))
                        elif tn in tconsts and (tm, tn) not in cseen:
                            cseen.add((tm, tn))
                            parts.append(("C", tm, tn, tconsts[tn]))
            out[key] = "\n#---\n".join(
                f"{t}:{m}.{n}\n{b}" for t, m, n, b in sorted(parts)
            )
    return out


def blocks_at(commit: str | None) -> dict[str, str]:
    """All registered closure blocks at a commit (None = worktree HEAD)."""
    mods: dict = {}
    if commit is None:
        for p in (REPO / PKG).rglob("*.py"):
            mod = str(p.relative_to(REPO)).replace("/", ".")[:-3]
            mods[mod] = _module_info(p.read_text())
    else:
        files = [
            f
            for f in sh("git", "ls-tree", "-r", "--name-only", commit).splitlines()
            if f.startswith(PKG) and f.endswith(".py")
        ]
        for f in files:
            mods[f.replace("/", ".")[:-3]] = _module_info(sh("git", "show", f"{commit}:{f}"))
    return _closures(mods)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    keys = list(all_queries())
    green = latest_green_rounds()
    commits = round_commits()
    head_blocks = blocks_at(None)

    never = [k for k in keys if k not in green]
    cache: dict[int, dict[str, str]] = {}
    drifted: list[tuple[int, str]] = []  # (vintage, key)
    clean: list[tuple[int, str]] = []
    for k in keys:
        if k in never:
            continue
        rnd = green[k]
        if rnd not in commits:
            print(f"!! no round-{rnd} commit found for {k}", file=sys.stderr)
            continue
        if rnd not in cache:
            cache[rnd] = blocks_at(commits[rnd])
        then = cache[rnd].get(k)
        now = head_blocks.get(k)
        if now is None:
            print(f"!! {k} registered but no AST block at HEAD", file=sys.stderr)
            continue
        (drifted if then != now else clean).append((rnd, k))

    drifted.sort()
    clean.sort()
    print(f"# registry keys: {len(keys)}")
    print(f"# never-rowed: {len(never)} {never}")
    print(f"# drifted since last green row: {len(drifted)}")
    for rnd, k in drifted:
        print(f"#   r{rnd}  {k}")
    print("# oldest-standing clean certs (vintage histogram):")
    hist: dict[int, int] = {}
    for rnd, _ in clean:
        hist[rnd] = hist.get(rnd, 0) + 1
    for rnd in sorted(hist):
        print(f"#   r{rnd}: {hist[rnd]} keys")

    slots = args.slots
    tier1 = never
    tier2 = [k for _, k in drifted][: max(0, slots - len(tier1))]
    rest = max(0, slots - len(tier1) - len(tier2))
    tier3 = [k for _, k in clean][:rest]
    deferred = [k for _, k in drifted][max(0, slots - len(tier1)):]
    if deferred:
        # Overflow round (first seen r12: wide-closure edits drifted more
        # keys than one sweep holds).  Tiers are oldest-vintage first, so
        # the deferred keys are the NEWEST-vintage drifted — the freshest
        # certs, least risky to carry one round; they MUST head the next
        # round's prefix.  tests/test_rotation_discipline.py enforces
        # exactly this degradation rule.
        print(f"\n# OVERFLOW: {len(deferred)} drifted keys beyond the "
              f"{slots}-slot window (newest vintage; must head next round):")
        for k in deferred:
            print(f"#   deferred  r{green[k]}  {k}")
    print(f"\n# proposed {slots}-slot prefix "
          f"(tier1={len(tier1)} tier2={len(tier2)} tier3={len(tier3)}):")
    print("_PRIORITY: tuple[str, ...] = (")
    for k in tier1:
        print(f'    "{k}",  # tier 1: no green driver row')
    for k in tier2:
        print(f'    "{k}",  # tier 2: drifted (last green r{green[k]})')
    for k in tier3:
        print(f'    "{k}",  # tier 3: oldest-standing cert (r{green[k]})')
    print(")")


if __name__ == "__main__":
    main()
