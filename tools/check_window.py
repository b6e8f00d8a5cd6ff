"""Mechanical oracle-window check (VERDICT r6 'What's wrong #4').

BUILD rounds (≤12): the driver oracles only the FIRST 50 entries of
``queries()``, so any query whose code changed since the last
CORRECTNESS artifact must sit inside that window or its standing green
row silently goes stale. Round 5 hit exactly that failure, and round 6
avoided it only by hand-reasoning about which commits touched which
modules; this tool made the judgment mechanical.

OPTIMIZATION rounds: round 13 widened the default window to the full
registry on the premise that the optimization-round driver re-runs
EVERY declared query. The actual r13 driver artifact has exactly 50
rows — the premise did not hold (VERDICT r13 "What's wrong #2") — so
the default is back to the observed driver contract: **50 slots**,
until a driver artifact actually shows more. The two always-enforced
hazards stay (they fail ANY driver regime): a query DISAPPEARING from
``queries()`` or losing its ``oracle_sql()`` twin (exit 1).
``--window 0`` requests the full-registry regime explicitly. (Context:
the r13 optimization touched ``datapipe/dedup.py``/``text.py``, whose
import closure covers 63 declared queries — more than the 50 slots, so
build-round rotation was mathematically unsatisfiable that round;
round 14 rotated the stale remainder in and re-shrunk the touched
closures to window-sized modules.)

Mechanics:

1. base = the commit that last touched the newest ``CORRECTNESS_r*.json``
   (the round boundary), overridable with ``--base``.
2. changed reflexiv_spark modules = ``git diff --name-only base`` plus
   untracked files, filtered by a SEMANTIC comparison: both versions are
   parsed and compared as docstring-stripped ASTs, so comment/docstring
   edits do not count as changes (they cannot alter a query's rows).
3. a query is AFFECTED if (a) its ``q_*`` function or any
   ``__spark_entry__`` helper it transitively references changed
   semantically, (b) its ``oracle_sql()`` string changed (old and new
   entry files are imported side by side and the dicts diffed), (c) it
   is new since base, or (d) any reflexiv_spark module in the transitive
   import closure of its function/helpers changed semantically.
4. exit 1 if any base-declared query disappeared or any declared query
   lacks an oracle (always), or if any affected query is outside the
   enforced window (``--window N``; default 50 — the observed driver
   artifact size; ``--window 0`` = the full registry).

Run directly (``python tools/check_window.py``) or via
``tests/test_window_protocol.py`` which fails the suite on violation.
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = "__spark_entry__.py"
BUILD_WINDOW = 50  # the build-round driver artifact size (--window 50)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def find_base() -> str:
    """Commit that last touched the newest TRACKED ``CORRECTNESS_r*.json``.

    The driver drops each round's artifact UNTRACKED at the round
    boundary; ``git log -1 -- <untracked>`` returns the empty string and
    every downstream ``git diff <empty-base>`` explodes with exit 128 —
    so the tool (and the suite gate wrapping it) would fail at exactly
    the round boundary it exists to police (VERDICT r7 'What's wrong
    #1'). Walk artifacts newest-first and skip any with no commit
    history."""
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        reverse=True,
    )
    for art in arts:
        sha = _git("log", "-1", "--format=%H", "--", art.name).strip()
        if sha:
            return sha
    return _git("rev-list", "--max-parents=0", "HEAD").strip()


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(
                node,
                (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            )
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return tree


def _norm(src: str) -> str | None:
    try:
        return ast.dump(_strip_docstrings(ast.parse(src)))
    except SyntaxError:
        return None


def semantically_changed(old_src: str | None, new_src: str | None) -> bool:
    if old_src is None or new_src is None:
        return True  # added or deleted file
    a, b = _norm(old_src), _norm(new_src)
    if a is None or b is None:
        return True  # unparseable — be conservative
    return a != b


def _show(base: str, path: str) -> str | None:
    try:
        return _git("show", f"{base}:{path}")
    except subprocess.CalledProcessError:
        return None  # did not exist at base


def changed_modules(base: str) -> set[str]:
    """reflexiv_spark/*.py files whose docstring-stripped AST differs
    between ``base`` and the working tree."""
    names = set(
        _git("diff", "--name-only", base, "--", "reflexiv_spark").split()
    )
    names |= set(
        _git(
            "ls-files", "--others", "--exclude-standard", "--", "reflexiv_spark"
        ).split()
    )
    out = set()
    for name in sorted(names):
        if not name.endswith(".py"):
            continue
        p = REPO / name
        new = p.read_text() if p.exists() else None
        if semantically_changed(_show(base, name), new):
            out.add(name)
    return out


def module_file(dotted: str) -> str | None:
    """'reflexiv_spark.datapipe.dedup' → repo-relative file path."""
    rel = dotted.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if (REPO / cand).exists():
            return cand
    return None


def _imports_of(tree: ast.AST, pkg: str = "") -> set[str]:
    """All reflexiv_spark module files imported anywhere in ``tree``
    (module-level and function-local). ``pkg`` is the dotted package of
    the file being scanned (e.g. ``reflexiv_spark.datapipe`` for
    ``reflexiv_spark/datapipe/dedup.py``) so RELATIVE imports resolve —
    a missed ``from .dedup import x`` edge would silently hide a
    changed-module → affected-query mapping, the exact stale-green
    failure this tool exists to prevent."""
    mods = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level and pkg:
                # relative: level 1 = current package, each extra level
                # strips one package component
                parts = pkg.split(".")
                if node.level - 1 < len(parts):
                    base = ".".join(parts[: len(parts) - (node.level - 1)])
                    module = (
                        f"{base}.{node.module}" if node.module else base
                    )
                else:
                    continue
            else:
                module = node.module or ""
            if module.startswith("reflexiv_spark"):
                f = module_file(module)
                if f:
                    mods.add(f)
                # `from reflexiv_spark.pkg import submodule` form
                for alias in node.names:
                    f2 = module_file(f"{module}.{alias.name}")
                    if f2:
                        mods.add(f2)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("reflexiv_spark"):
                    f = module_file(alias.name)
                    if f:
                        mods.add(f)
    return mods


def import_closure() -> dict[str, set[str]]:
    """file → transitive set of reflexiv_spark files it imports
    (including itself)."""
    direct: dict[str, set[str]] = {}
    for p in (REPO / "reflexiv_spark").rglob("*.py"):
        rel = str(p.relative_to(REPO))
        # dotted package of this file, for relative-import resolution
        pkg = rel[: -len("/__init__.py")] if rel.endswith("/__init__.py") else rel[:-3]
        pkg = pkg.replace("/", ".")
        if not rel.endswith("/__init__.py"):
            pkg = pkg.rsplit(".", 1)[0] if "." in pkg else pkg
        try:
            direct[rel] = _imports_of(ast.parse(p.read_text()), pkg=pkg)
        except SyntaxError:
            direct[rel] = set()
    closure = {f: {f} | deps for f, deps in direct.items()}
    changed = True
    while changed:
        changed = False
        for f, deps in closure.items():
            add = set()
            for d in deps:
                add |= closure.get(d, {d})
            if not add <= deps:
                deps |= add
                changed = True
    return closure


def entry_functions(src: str) -> dict[str, ast.FunctionDef]:
    return {
        n.name: n
        for n in ast.parse(src).body
        if isinstance(n, ast.FunctionDef)
    }


def helper_closure(funcs: dict[str, ast.FunctionDef]) -> dict[str, set[str]]:
    """function name → itself + every entry-file function it transitively
    references by name."""
    refs = {}
    for name, node in funcs.items():
        refs[name] = {
            n.id
            for n in ast.walk(node)
            if isinstance(n, ast.Name) and n.id in funcs and n.id != name
        }
    closure = {n: {n} | r for n, r in refs.items()}
    changed = True
    while changed:
        changed = False
        for n, deps in closure.items():
            add = set()
            for d in deps:
                add |= closure.get(d, {d})
            if not add <= deps:
                deps |= add
                changed = True
    return closure


def _load_entry(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def affected_queries(base: str, verbose: bool = False) -> tuple[set[str], list[str], dict]:
    """Returns (affected query names, current window order, debug info)."""
    sys.path.insert(0, str(REPO))
    new_src = (REPO / ENTRY).read_text()
    old_src = _show(base, ENTRY)

    new_mod = _load_entry(REPO / ENTRY, "_window_new_entry")
    order = list(new_mod.queries().keys())
    oracles_new = new_mod.oracle_sql()

    if old_src is not None:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".py", delete=False, dir=REPO
        ) as tf:
            tf.write(old_src)
            old_path = Path(tf.name)
        try:
            old_mod = _load_entry(old_path, "_window_old_entry")
            old_queries = set(old_mod.queries().keys())
            oracles_old = old_mod.oracle_sql()
        finally:
            old_path.unlink()
    else:
        old_queries, oracles_old = set(), {}

    affected: set[str] = set()
    why: dict[str, str] = {}

    # (c) new queries
    for q in order:
        if q not in old_queries:
            affected.add(q)
            why[q] = "new since base"

    # (b) oracle SQL text changed
    for q, sql in oracles_new.items():
        if q in oracles_old and oracles_old[q] != sql and q not in affected:
            affected.add(q)
            why[q] = "oracle_sql changed"

    # (a) entry-file function changes, via the helper closure
    funcs_new = entry_functions(new_src)
    funcs_old = entry_functions(old_src) if old_src else {}
    changed_fns = {
        name
        for name, node in funcs_new.items()
        if name not in funcs_old
        or semantically_changed(
            ast.unparse(funcs_old[name]), ast.unparse(node)
        )
    }
    # queries()/oracle_sql() bodies change every rotation; their effect is
    # captured by (b)/(c) above, not by function-body identity
    changed_fns -= {"queries", "oracle_sql", "entry"}
    helpers = helper_closure(funcs_new)

    # map query name → its q_ function name
    qfn = {}
    qdict_node = funcs_new.get("queries")
    for node in ast.walk(qdict_node):
        if isinstance(node, ast.Dict):
            for kk, vv in zip(node.keys, node.values):
                if isinstance(kk, ast.Constant) and isinstance(vv, ast.Name):
                    qfn[kk.value] = vv.id

    # (d) module changes through the import closure
    mods_changed = changed_modules(base)
    closure = import_closure()

    def query_modules(qname: str) -> set[str]:
        mods = set()
        for fn in helpers.get(qfn.get(qname, ""), set()):
            for direct in _imports_of(funcs_new[fn]):
                mods |= closure.get(direct, {direct})
        return mods

    for q in order:
        if q in affected:
            continue
        fns = helpers.get(qfn.get(q, ""), set())
        hit_fns = fns & changed_fns
        if hit_fns:
            affected.add(q)
            why[q] = f"entry function changed: {sorted(hit_fns)}"
            continue
        hit = query_modules(q) & mods_changed
        if hit:
            affected.add(q)
            why[q] = f"module changed: {sorted(hit)}"

    dbg = {"mods_changed": sorted(mods_changed), "why": why,
           "changed_fns": sorted(changed_fns),
           # the optimization-round regression hazards: a query that
           # DISAPPEARED from the registry, or that lost its oracle
           # twin, fails the driver's full-registry re-run outright
           "disappeared": sorted(old_queries - set(order)),
           "missing_oracle": sorted(
               q for q in order if q not in oracles_new
           )}
    return affected, order, dbg


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", default=None,
                    help="git ref to diff against (default: last commit "
                    "touching the newest CORRECTNESS_r*.json)")
    ap.add_argument("--window", type=int, default=BUILD_WINDOW,
                    help="slot-window size to enforce. Default 50 — "
                    "every driver CORRECTNESS artifact to date has "
                    "exactly 50 rows, so 50 is the verified contract "
                    "(VERDICT r13 'What's wrong #2'). Pass 0 for the "
                    "full declared registry (use only if a driver "
                    "artifact actually shows more than 50 rows). The "
                    "disappearance/missing-oracle hazards are always "
                    "enforced regardless.")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    base = args.base or find_base()
    affected, order, dbg = affected_queries(base, args.verbose)
    n_window = args.window or len(order)
    window = set(order[:n_window])
    print(f"base: {base[:12]}  changed modules: {len(dbg['mods_changed'])}  "
          f"affected queries: {len(affected)}")
    if args.verbose:
        for m in dbg["mods_changed"]:
            print(f"  changed: {m}")
        for q in sorted(affected):
            print(f"  affected: {q:24s} ({dbg['why'][q]})")
    # always-enforced regression hazards (any verification regime)
    disappeared = dbg.get("disappeared", [])
    missing_oracle = dbg.get("missing_oracle", [])
    if disappeared:
        print(f"\nREGISTRY REGRESSION — {len(disappeared)} quer"
              f"{'y' if len(disappeared) == 1 else 'ies'} declared at "
              f"base {base[:12]} no longer in queries():")
        for q in disappeared:
            print(f"  {q}")
        return 1
    if missing_oracle:
        print(f"\nORACLE REGRESSION — {len(missing_oracle)} declared "
              "quer"
              f"{'y has' if len(missing_oracle) == 1 else 'ies have'} "
              "no oracle_sql() entry:")
        for q in missing_oracle:
            print(f"  {q}")
        return 1
    violations = sorted(affected - window)
    if violations:
        print(f"\nWINDOW VIOLATION — {len(violations)} affected quer"
              f"{'y is' if len(violations) == 1 else 'ies are'} outside "
              f"slots 1-{n_window} of queries():")
        for q in violations:
            print(f"  {q}  ({dbg['why'][q]})")
        print(f"\nRotate them into the first {n_window} entries of "
              "__spark_entry__.queries() before the round ends.")
        return 1
    scope = (f"the {n_window}-slot window" if args.window
             else "the full declared registry (and none disappeared "
             "or lost an oracle)")
    print(f"OK — all affected queries are inside {scope}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
