"""Local lint gate: ruff when available, stdlib fallback otherwise.

CI (.github/workflows/ci.yml) runs real ruff; this script gives the same
gate on hermetic machines without it: byte-compiles every source file
(syntax errors) and AST-checks for the two ruff findings that have actually
bitten this repo — unused imports and accidental `print(` left in library
modules (CLI/tools/bench files are exempt; they print by design).

  python tools/lint.py
"""

from __future__ import annotations

import ast
import pathlib
import shutil
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
LIB = ROOT / "spectrogramgenai_tpu"
# modules whose job is user-facing output
PRINT_OK = {"cli", "serving", "utils"}


def ruff() -> int:
    return subprocess.call(["ruff", "check", str(ROOT)])


def fallback() -> int:
    failures = []
    for path in sorted(LIB.rglob("*.py")) + sorted((ROOT / "tests").glob("*.py")):
        src = path.read_text()
        try:
            tree = ast.parse(src, filename=str(path))
        except SyntaxError as e:
            failures.append(f"{path}: syntax error: {e}")
            continue
        if path.name != "__init__.py":  # re-export facades (ruff: per-file F401 ignore)
            failures.extend(_unused_imports(tree, src, path))
        rel = path.relative_to(ROOT)
        if rel.parts[0] == "spectrogramgenai_tpu" and rel.parts[1] not in PRINT_OK:
            failures.extend(_library_prints(tree, path))
    for f in failures:
        print(f)
    print(f"lint (fallback): {len(failures)} finding(s)")
    return 1 if failures else 0


def _unused_imports(tree: ast.Module, src: str, path: pathlib.Path) -> list[str]:
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                imported[(a.asname or a.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":  # compiler directive, never "used"
                continue
            for a in node.names:
                if a.name != "*":
                    imported[a.asname or a.name] = node.lineno
    used = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    used |= {n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)}
    # names re-exported via __all__ string literals count as used (NOT the
    # whole source text — that would include the import lines themselves and
    # make this check vacuous)
    used |= {c.value for c in ast.walk(tree)
             if isinstance(c, ast.Constant) and isinstance(c.value, str)}
    return [f"{path}:{line}: unused import '{name}'"
            for name, line in imported.items() if name not in used]


def _library_prints(tree: ast.Module, path: pathlib.Path) -> list[str]:
    out = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "print"):
            out.append(f"{path}:{node.lineno}: print() in library module")
    return out


if __name__ == "__main__":
    sys.exit(ruff() if shutil.which("ruff") else fallback())
