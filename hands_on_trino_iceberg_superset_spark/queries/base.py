"""Query-inventory registry.

Every operator/query from SURVEY.md §2 (plus the north-star
extensions) registers here as a :class:`QuerySpec`:

- ``spark``  -- ``(SparkSession, sf_dir) -> DataFrame``, the
  Spark-first implementation (DataFrame API, Catalyst-optimizable).
- ``oracle`` -- equivalent ANSI SQL runnable by DuckDB over the same
  parquet views (``None`` for genuinely non-SQL-expressible ops;
  the driver then records a weaker rows-only check).

Column names are part of the contract: the driver sorts columns by
name before value-hashing, so both sides alias every computed column
identically.

Determinism contract for float outputs: aggregate in DECIMAL (exact),
cast the result to DOUBLE — identical bits on both engines regardless
of partial-aggregation order. Raw double sums are never emitted.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a Spark query implementation to the inventory."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _last_driver_check() -> dict[str, tuple[int, dict]]:
    """query name -> (last round it appeared in a driver CORRECTNESS
    snapshot, that round's record), read from the
    ``CORRECTNESS_r*.json`` files the driver leaves at the repo root.
    Missing/any-error -> {}."""
    import json
    import re
    from pathlib import Path

    seen: dict[str, tuple[int, dict]] = {}
    root = Path(__file__).resolve().parents[2]
    try:
        for f in sorted(root.glob("CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", f.name)
            if not m:
                continue
            rnd = int(m.group(1))
            for name, rec in json.loads(f.read_text()).items():
                if name not in seen or rnd > seen[name][0]:
                    seen[name] = (rnd, rec if isinstance(rec, dict) else {})
    except Exception:
        return {}
    return seen


def _check_failed(rec: dict, has_oracle: bool) -> bool:
    """True when a driver CORRECTNESS record is anything short of a
    full pass for the query's CURRENT oracle contract: any match flag
    explicitly False, any err — including ``no_oracle`` for a query
    that HAS an oracle now (it was rows-only checked before the oracle
    landed, so the oracle has never been driver-verified)."""
    if any(rec.get(k) is False
           for k in ("rows_match", "schema_match", "hash_match")):
        return True
    err = rec.get("err")
    if err is None:
        return False
    if err == "no_oracle" and not has_oracle:
        # legit rows-only check of a no-oracle query: pass iff rows ran
        return rec.get("spark_rows") is None
    return True


def _module_closure() -> dict[str, set]:
    """module name -> set of package source Paths it transitively
    imports (including itself), resolved by ast-parsing each module's
    imports (a regex scan proved fragile: a pattern whose name class
    crossed newlines swallowed the NEXT import statement and silently
    dropped dependency edges). Used to decide whether a query's code
    changed since its last driver check. Memoized per process — the
    working tree is fixed for a process lifetime."""
    import ast
    from pathlib import Path

    cached = getattr(_module_closure, "_cache", None)
    if cached is not None:
        return cached

    pkg_root = Path(__file__).resolve().parents[1]
    pkg = pkg_root.name
    srcs = {p for p in pkg_root.rglob("*.py")}
    by_mod: dict[str, Path] = {}
    for p in srcs:
        rel = p.relative_to(pkg_root).with_suffix("")
        mod = ".".join(rel.parts)
        by_mod[mod] = p
        if rel.name == "__init__":
            by_mod[".".join(rel.parts[:-1])] = p

    # registry/ordering machinery is imported by EVERY query module;
    # an edit to it doesn't change query semantics, so keep it out of
    # dependency edges or one ordering tweak marks all 143 queries
    # "changed"
    here = Path(__file__).resolve()
    infra = {here, here.parent / "__init__.py"}
    direct: dict[Path, set] = {}
    for p in srcs:
        deps = set()
        try:
            tree = ast.parse(p.read_text())
        except (OSError, SyntaxError):
            tree = ast.Module(body=[], type_ignores=[])
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                mod = node.module
                if node.level:
                    # relative import: resolve against this file's
                    # package path
                    rel_pkg = p.relative_to(pkg_root).parts[
                        : -(node.level)
                    ]
                    mod = ".".join([*rel_pkg, mod])
                elif mod == pkg:
                    mod = ""
                elif mod.startswith(pkg + "."):
                    mod = mod[len(pkg) + 1:]
                else:
                    continue
                if mod in by_mod:
                    deps.add(by_mod[mod])
                for alias in node.names:
                    sub = f"{mod}.{alias.name}" if mod else alias.name
                    if sub in by_mod:
                        deps.add(by_mod[sub])
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(pkg + "."):
                        sub = alias.name[len(pkg) + 1:]
                        if sub in by_mod:
                            deps.add(by_mod[sub])
        direct[p] = deps - infra

    closure: dict[Path, set] = {}

    def close(p: Path, seen: frozenset) -> set:
        if p in closure:
            return closure[p]
        out = {p}
        for d in direct.get(p, ()):
            if d not in seen:
                out |= close(d, seen | {p})
        closure[p] = out
        return out

    result = {mod: close(path, frozenset())
              for mod, path in by_mod.items()}
    _module_closure._cache = result
    return result


def _changed_since_round() -> "Callable[[str, int], bool]":
    """Return ``changed(module_name, round) -> bool``: did any package
    file in the query module's import closure change after the driver
    commit that recorded round N's CORRECTNESS snapshot? Falls back to
    "not changed" when git/markers are unavailable (ordering then
    degrades to pure staleness, never crashes the driver). Memoized
    per process — load_all() is called repeatedly (queries() +
    oracle_sql() at driver startup, per-test imports) and the git
    subprocess + full-package scan must run once, not per call."""
    import re
    import subprocess
    from pathlib import Path

    cached = getattr(_changed_since_round, "_cache", None)
    if cached is not None:
        return cached

    root = Path(__file__).resolve().parents[2]
    markers: dict[int, str] = {}
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s"], cwd=root,
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout
        for line in log.splitlines():  # newest first; keep newest
            m = re.match(r"([0-9a-f]+) round (\d+):", line)
            if m and int(m.group(2)) not in markers:
                markers[int(m.group(2))] = m.group(1)
    except Exception:
        markers = {}

    closure = _module_closure()
    pkg_name = Path(__file__).resolve().parents[1].name
    changed_files: dict[int, set] = {}

    def files_changed_after(rnd: int) -> set:
        if rnd not in changed_files:
            try:
                out = subprocess.run(
                    ["git", "diff", "--name-only", markers[rnd],
                     "HEAD", "--", pkg_name],
                    cwd=root, capture_output=True, text=True,
                    timeout=30, check=True,
                ).stdout
                changed_files[rnd] = {
                    (root / f).resolve() for f in out.splitlines() if f
                }
            except Exception:
                changed_files[rnd] = set()
        return changed_files[rnd]

    def changed(module_name: str, rnd: int) -> bool:
        if rnd not in markers:
            return False
        deps = closure.get(module_name)
        if not deps:
            return False
        return bool(deps & files_changed_after(rnd))

    _changed_since_round._cache = changed
    return changed


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and
    return the full inventory.

    Ordering is DELIBERATE, not alphabetical: the driver's
    CORRECTNESS snapshot records at most the first ~50 inventory
    entries, so queries rotate by re-check priority:

    1. latest driver record was anything short of a full pass (err,
       a False match flag, or a rows-only ``no_oracle`` check of a
       query that has an oracle now);
    2. never driver-checked;
    3. the query's code (its module's transitive intra-package import
       closure) changed after the driver commit that recorded its
       last check — green-on-old-code is not green;
    4. everything else, oldest snapshot round first (ties keep a
       stable family grouping).

    Every round this cycles the stalest tail into the driver's
    window; the full inventory is always covered by the local DuckDB
    differential (tools/check_correctness.py) regardless.
    """
    from hands_on_trino_iceberg_superset_spark.queries import (  # noqa: F401
        bi,
        core,
        curation,
        dedup,
        dml,
        events,
        iceberg,
        multimodal,
        reference,
        scale,
        similarity,
        sketches,
        sourcefmt,
        streaming,
        text,
        tpch_extra,
        tpch_global,
        wire,
    )

    family_order = ["tpch_global", "iceberg", "curation", "sourcefmt", "text",
                    "streaming", "tpch_extra",
                    "sketches", "wire", "scale", "dedup", "dml", "similarity",
                    "multimodal", "events", "core", "reference", "bi"]
    pkg = __name__.split(".", 1)[0]
    module_of = {name: spec.spark.__module__.split(pkg + ".", 1)[-1]
                 for name, spec in REGISTRY.items()}
    rank = {m: i for i, m in enumerate(family_order)}
    last_seen = _last_driver_check()
    changed = _changed_since_round()

    def priority(name: str) -> tuple[int, int]:
        if name not in last_seen:
            return (1, 0)  # never driver-checked
        rnd, rec = last_seen[name]
        if _check_failed(rec, REGISTRY[name].oracle is not None):
            return (0, rnd)  # failed / oracle never driver-verified
        if changed(module_of[name], rnd):
            return (2, rnd)  # green, but on code older than HEAD
        return (3, rnd)  # green on current code, oldest round first

    ordered = sorted(
        REGISTRY,
        key=lambda name: (
            *priority(name),
            rank.get(module_of[name].rsplit(".", 1)[-1], 99),
            name,
        ),
    )
    return {name: REGISTRY[name] for name in ordered}
