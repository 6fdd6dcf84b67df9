"""Zero-dependency AST linter (the environment has no flake8/ruff/mypy; the
reference's `make style` runs flake8 + mypy — this enforces the highest-value
subset with the stdlib):

  F401  unused import
  E722  bare except
  B006  mutable default argument
  F811  redefinition of an imported name by a def/class
  F632  `is` comparison with a literal
  W291  trailing whitespace
  E501  line > 100 chars (matching the repo's prevailing style)

Exit 1 on any finding. `make style` runs this over the source trees.
"""

from __future__ import annotations

import ast
import pathlib
import sys

MAX_LINE = 100
ROOTS = ["kvpress_tpu", "evaluation", "tools", "examples", "tests",
         "bench.py", "__graft_entry__.py"]


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    out = []
    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            out.append(f"{path}:{i}: W291 trailing whitespace")
        if len(line) > MAX_LINE:
            out.append(f"{path}:{i}: E501 line too long ({len(line)} chars)")
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 {e.msg}"]

    imported: dict[str, tuple[int, ast.AST]] = {}
    used: set[str] = set()
    defined: dict[str, int] = {}

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = (node.lineno, node)
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = (node.lineno, node)
        elif isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            # pytest fixtures are consumed by argument NAME
            for a in node.args.args + node.args.kwonlyargs:
                used.add(a.arg)
            if node.name in imported and node.lineno > imported[node.name][0]:
                out.append(
                    f"{path}:{node.lineno}: F811 `{node.name}` shadows import"
                )
            defaults = list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]
            for d in defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    out.append(
                        f"{path}:{d.lineno}: B006 mutable default argument"
                    )
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None:
                out.append(f"{path}:{node.lineno}: E722 bare except")
        elif isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Is, ast.IsNot)) and isinstance(
                    comp, (ast.Constant,)
                ) and comp.value is not None and not isinstance(
                    comp.value, bool
                ):
                    out.append(
                        f"{path}:{node.lineno}: F632 `is` with a literal"
                    )

    # doctest/__all__ strings count as usage
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            if node.value in imported:
                used.add(node.value)

    for name, (lineno, _) in imported.items():
        if name not in used and name not in ("_", "annotations"):
            out.append(f"{path}:{lineno}: F401 `{name}` imported but unused")
    return out


def main(argv):
    targets = argv[1:] or ROOTS
    findings = []
    for t in targets:
        p = pathlib.Path(t)
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            findings.extend(check_file(f))
    for f in findings:
        print(f)
    if findings:
        print(f"\n{len(findings)} finding(s)")
        return 1
    print("lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
