"""Static broadcast-hint audit (VERDICT r11 finding 1 follow-through).

Rejects ``F.broadcast(x)`` call sites in the query registry where ``x``
derives from an SF-SCALING table by filter/projection ALONE — the shape
that made ``emb_1nn_label_consistency`` broadcast 10% of the embeddings
corpus: fine at sf0.01, an executor OOM at warehouse scale, because a
forced hint overrides every planner size check. ``dim_bcast``
(tables.py) is the sanctioned size-gated alternative; bounded
derivations (a global/grouped ``.agg`` or an explicit ``.limit``) are
allowed because their output cardinality does not follow the corpus.

Method: per-registry-function AST taint analysis over
``dataflow_example_spark/queries.py``.

- Taint sources: ``load(spark, sf_dir, "<t>")`` for every SF-scaling
  table (all TABLES except the constant-cardinality region/nation).
- Propagation: method chains (``.filter/.select/.withColumn/...``)
  and plain function wrappers (``valid_vectors(df)``, ``hash_sample(df,
  ...)``) keep the taint; simple ``x = <expr>`` assignments carry it
  through names.
- Bounding: ``.agg(...)`` and ``.limit(n)`` clear taint. ``.agg`` is a
  deliberate under-approximation — a groupBy over a scaling KEY still
  scales (the lineitem_basket_pairs marginals class), but that cannot
  be decided statically; that class is handled by routing such sites
  through ``dim_bcast`` (r12) and stays out of this rule's scope, which
  is exactly the "filter alone" shape VERDICT r11 prescribed.
- ``dim_bcast(...)`` is never flagged: it IS the gate.

False-negative bias is intentional (unknown names/parameters are
treated clean); the audit exists to make the one known-dangerous shape
impossible to reintroduce silently, not to prove the absence of every
oversized broadcast.

Exit 0 iff no violations. Run standalone or via tools/plan_audit.py
(which invokes main() as its final section).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dataflow_example_spark.tables import TABLES  # noqa: E402

SCALING = set(TABLES) - {"region", "nation"}

# Methods whose RESULT is cardinality-bounded regardless of the input's
# scale. (groupBy alone is not terminal — the .agg on top of it is what
# produces the frame; see module docstring for the scaling-key caveat.)
BOUNDING_METHODS = {"agg", "limit"}

# (function_name, lineno-independent site key) -> reason. Empty today:
# every registry broadcast of a scaling-table derivation is either
# bounded (.agg/.limit) or routed through dim_bcast.
ALLOWLIST: dict[tuple[str, str], str] = {}


def _is_load_call(node: ast.Call) -> str | None:
    """Return the table name if node is load(spark, sf_dir, "<t>")."""
    fn = node.func
    name = fn.id if isinstance(fn, ast.Name) else (
        fn.attr if isinstance(fn, ast.Attribute) else None
    )
    if name != "load":
        return None
    for arg in node.args:
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            if arg.value in TABLES:
                return arg.value
    return None


def _is_f_broadcast(node: ast.Call) -> bool:
    fn = node.func
    return (
        isinstance(fn, ast.Attribute)
        and fn.attr == "broadcast"
        and isinstance(fn.value, ast.Name)
        and fn.value.id == "F"
    )


class _Tainter(ast.NodeVisitor):
    """Single forward pass over one function body: tracks, per name, the
    set of scaling tables its frame derives from through unbounded ops."""

    def __init__(self, func_name: str):
        self.func = func_name
        self.env: dict[str, set[str]] = {}
        self.violations: list[tuple[int, set[str]]] = []

    # -- taint evaluation ------------------------------------------------
    def taint(self, node: ast.AST) -> set[str]:
        if isinstance(node, ast.Name):
            return self.env.get(node.id, set())
        if isinstance(node, ast.Call):
            t = _is_load_call(node)
            if t is not None:
                return {t} if t in SCALING else set()
            fn = node.func
            if isinstance(fn, ast.Attribute):
                if fn.attr in BOUNDING_METHODS:
                    return set()
                if fn.attr == "broadcast" and isinstance(
                    fn.value, ast.Name
                ) and fn.value.id == "F":
                    return self.taint(node.args[0]) if node.args else set()
                # method chain: receiver taint + frame-typed args
                # (join(other) unions both sides)
                out = self.taint(fn.value)
                for a in node.args:
                    out |= self.taint(a)
                return out
            if isinstance(fn, ast.Name):
                if fn.id == "dim_bcast":
                    return set()  # the sanctioned size gate
                # plain wrapper (valid_vectors, hash_sample, ...): taint
                # flows through its frame arguments
                out: set[str] = set()
                for a in node.args:
                    out |= self.taint(a)
                return out
            return set()
        if isinstance(node, ast.Attribute):
            return self.taint(node.value)
        if isinstance(node, (ast.Tuple, ast.List)):
            out: set[str] = set()
            for e in node.elts:
                out |= self.taint(e)
            return out
        return set()

    # -- statement walk ---------------------------------------------------
    def visit_Assign(self, node: ast.Assign) -> None:
        t = self.taint(node.value)
        for tgt in node.targets:
            if isinstance(tgt, ast.Name):
                self.env[tgt.id] = t
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call) -> None:
        if _is_f_broadcast(node) and node.args:
            t = self.taint(node.args[0])
            if t:
                key = (self.func, ",".join(sorted(t)))
                if key not in ALLOWLIST:
                    self.violations.append((node.lineno, t))
        self.generic_visit(node)

    # Nested defs get their OWN _Tainter pass via ast.walk in audit_file
    # (with a fresh env — parameters are untainted by design); the outer
    # pass must not also descend, or each inner violation is reported
    # twice and inner names are evaluated against the outer env.
    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        pass

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        pass


def audit_file(path: Path) -> list[str]:
    tree = ast.parse(path.read_text())
    fails: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            v = _Tainter(node.name)
            for stmt in node.body:
                v.visit(stmt)
            for lineno, tables in v.violations:
                fails.append(
                    f"{path.name}:{lineno} ({node.name}): F.broadcast of a "
                    f"filter-only derivation of SF-scaling {sorted(tables)} "
                    "— use dim_bcast (size gate) or bound it (.agg/.limit)"
                )
    return fails


def main() -> int:
    # Whole package, not just the registry: library modules mostly take
    # frames as parameters (parameters are untainted — see docstring),
    # but any INTERNAL load()-derived broadcast added later is caught.
    fails: list[str] = []
    pkg = REPO / "dataflow_example_spark"
    for path in sorted(pkg.rglob("*.py")):
        fails += audit_file(path)
    for f in fails:
        print(f"FAIL  {f}")
    n = len(fails)
    print(f"broadcast audit: {'OK — no unbounded scaling-table broadcasts' if not n else f'{n} violation(s)'}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
