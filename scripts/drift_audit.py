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
   included, so the oracle SQL is part of the block) PLUS the closure
   of same-module private helpers it references (r12: the winsorized
   report row changed `_experiment_report_from_per_user` and the
   streaming twin's OUTPUT gained a row while its own registered block
   was untouched — helper-mediated drift the bare-block hash missed),
   at HEAD and at its last-green snapshot; textual mismatch -> DRIFTED.
   Cross-module helpers (e.g. stats._banded_rank_cums used from
   behavioral) are still invisible to the hash;
4. emit tiers: never-rowed keys, drifted keys (oldest vintage first),
   then oldest-standing green keys as proxies for the remaining
   cross-module helper drift.

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
    """(registered key -> def name, def name -> (block text, referenced
    names)) for one module's top-level functions, decorators included."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return {}, {}
    lines = source.splitlines()
    registered: dict[str, str] = {}
    fns: dict[str, tuple[str, set[str]]] = {}
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
        fns[node.name] = (block, refs)
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
    return registered, fns


def function_blocks(source: str) -> dict[str, str]:
    """key -> registered block text + the recursive closure of
    same-module private helpers (_-prefixed top-level defs) it
    references, helpers sorted by name so the text is order-stable."""
    registered, fns = _module_info(source)
    out: dict[str, str] = {}
    for key, fname in registered.items():
        seen: set[str] = set()
        stack = [fname]
        parts: list[tuple[str, str]] = []
        while stack:
            f = stack.pop()
            if f in seen or f not in fns:
                continue
            seen.add(f)
            block, refs = fns[f]
            parts.append((f, block))
            stack.extend(r for r in refs if r.startswith("_") and r in fns)
        out[key] = "\n#---\n".join(b for _, b in sorted(parts))
    return out


def blocks_at(commit: str | None) -> dict[str, str]:
    """All registered function blocks at a commit (None = worktree HEAD)."""
    out: dict[str, str] = {}
    if commit is None:
        for p in (REPO / PKG).rglob("*.py"):
            out.update(function_blocks(p.read_text()))
        return out
    files = [
        f
        for f in sh("git", "ls-tree", "-r", "--name-only", commit).splitlines()
        if f.startswith(PKG) and f.endswith(".py")
    ]
    for f in files:
        out.update(function_blocks(sh("git", "show", f"{commit}:{f}")))
    return out


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
