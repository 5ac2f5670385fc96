"""Lint: every ``F.sum(<product>)`` must be overflow-annotated.

The spearman d² wrap (VERDICT r6 #1) showed the "products of two
table-scale BIGINTs need DECIMAL(38,0)" discipline wasn't mechanical:
the cast existed in gini/important_parts but was missed one file over,
and Spark's non-ANSI mode wraps int64 SILENTLY while DuckDB promotes
to HUGEINT — a latent engine divergence that no sf0.1 test sees.

This test makes the discipline mechanical (VERDICT r6 next-round #7):
every ``F.sum`` whose argument contains a multiplication must either

- carry a ``decimal(38,0)`` cast inside the summed expression (the
  exact-accumulator fix), or
- live in a function whose docstring states the overflow bound
  (matching OVERFLOW_WORDS — "overflow", "int64", "2^63", "wraps",
  "DECIMAL(38," or an explicit "bound:"), or
- appear in SUM_PRODUCT_ALLOWED with a written reason.

New unannotated sites fail here before they can ship.
"""

import ast
import pathlib
import re

OVERFLOW_WORDS = re.compile(
    r"(?i)(overflow|int64|2\^\d+|wraps|decimal\(38|hugeint|\bbound[s]?\b)"
)

# (file basename, function name) -> reason the product cannot wrap.
# Empty today: every current site either casts to DECIMAL(38,0) or
# states its bound in the docstring — prefer those; use this only for
# sites where neither fits, WITH the arithmetic written out.
SUM_PRODUCT_ALLOWED: dict[tuple[str, str], str] = {}


def _iter_sum_products():
    root = pathlib.Path(__file__).resolve().parents[1]
    files = sorted((root / "hbase_gis_spark").rglob("*.py"))
    files.append(root / "__spark_entry__.py")
    for path in files:
        src = path.read_text()
        tree = ast.parse(src)
        funcs = [
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]

        def enclosing(lineno):
            best = None
            for fn in funcs:
                if fn.lineno <= lineno <= (fn.end_lineno or fn.lineno):
                    if best is None or fn.lineno > best.lineno:
                        best = fn
            return best

        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "sum"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
                and any(
                    isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult)
                    for n in ast.walk(node.args[0])
                )
            ):
                seg = (ast.get_source_segment(src, node) or "").lower()
                fn = enclosing(node.lineno)
                yield path, node.lineno, seg, fn, ast.get_docstring(fn) if fn else None


def test_sum_of_products_are_overflow_annotated():
    offenders = []
    for path, lineno, seg, fn, doc in _iter_sum_products():
        if "decimal(38,0)" in seg:
            continue
        key = (path.name, fn.name if fn else "<module>")
        if key in SUM_PRODUCT_ALLOWED:
            continue
        if doc and OVERFLOW_WORDS.search(doc):
            continue
        offenders.append(f"{path.name}:{lineno} in {key[1]}")
    assert offenders == [], (
        "F.sum of a product without an overflow annotation — cast the "
        "accumulator to decimal(38,0), state the int64 bound in the "
        "function docstring, or add a reasoned SUM_PRODUCT_ALLOWED "
        f"entry: {offenders}"
    )
