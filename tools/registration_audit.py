"""Registration-audit gate for ``__spark_entry__.py`` surgery.

The entry file is edited by textual insertion, and twice now a block
inserted between an ``@_q(...)`` decorator and its ``def`` has
silently re-wired a registration (r11: a stacked decorator shadowed a
query; r12: ``page_trend_events_spend`` served Cronbach output against
the Page oracle for 4 commits).  This is the cheap (<1s) AST check the
r12 verdict asked to make a GATE: run it after ANY edit to
``__spark_entry__.py``, before commit, alongside
``tools/oracle_type_audit.py``:

    python tools/registration_audit.py && \
        python tools/oracle_type_audit.py

Checks (pure AST — no Spark, no imports of the entry module):
  1. every ``@_q`` first argument is a string literal;
  2. registered names are globally unique (decorator + direct-call
     ``_q(name, sql)(fn)`` forms both counted);
  3. no function carries more than one ``@_q`` decorator (the exact
     page_trend failure shape: an insertion leaves the old decorator
     stacked on the new function);
  4. no ``q_``-prefixed top-level function lacks a ``_q`` decorator
     (the other half of the same failure: the original function left
     orphaned, its decorator stolen by the insert);
  5. every name in ``_DRIVER_PRIORITY`` / ``_FORCE_RECHECK`` is a
     registered query name (catches typos that silently drop a query
     from the driver window).

Exit 0 = clean, 1 = findings (printed one per line).
"""

from __future__ import annotations

import ast
import os
import sys

ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py")


def _q_name(call: ast.Call) -> str | None:
    """Registered name if `call` is `_q(<literal>, ...)`, else None."""
    fn = call.func
    if isinstance(fn, ast.Name) and fn.id == "_q" and call.args:
        arg = call.args[0]
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            return arg.value
        return ""  # _q with a non-literal first arg: finding
    return None


def audit(path: str = ENTRY) -> list[str]:
    tree = ast.parse(open(path).read(), filename=path)
    findings: list[str] = []
    names: dict[str, int] = {}  # registered name -> first lineno

    def register(name: str, lineno: int) -> None:
        if name in names:
            findings.append(
                f"line {lineno}: duplicate registration {name!r} "
                f"(first at line {names[name]})")
        else:
            names[name] = lineno

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            q_decs = []
            for dec in node.decorator_list:
                if isinstance(dec, ast.Call):
                    nm = _q_name(dec)
                    if nm == "":
                        findings.append(
                            f"line {dec.lineno}: @_q first arg on "
                            f"{node.name} is not a string literal")
                    elif nm is not None:
                        q_decs.append((nm, dec.lineno))
            for nm, ln in q_decs:
                register(nm, ln)
            if len(q_decs) > 1:
                findings.append(
                    f"line {node.lineno}: {node.name} carries "
                    f"{len(q_decs)} stacked @_q decorators "
                    f"({', '.join(repr(n) for n, _ in q_decs)}) — "
                    f"an insertion landed between a decorator and its def")
            if node.name.startswith("q_") and not q_decs and node.col_offset == 0:
                findings.append(
                    f"line {node.lineno}: top-level {node.name} has no "
                    f"@_q decorator — orphaned by an insertion?")
        elif isinstance(node, ast.Call):
            # direct-call form: _q("name", SQL)(fn)
            inner = node.func
            if isinstance(inner, ast.Call):
                nm = _q_name(inner)
                if nm:
                    register(nm, inner.lineno)

    # membership of the driver-steering lists
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
        if not any(t in ("_DRIVER_PRIORITY", "_FORCE_RECHECK") for t in targets):
            continue
        listname = targets[0]
        for elt in ast.walk(node.value):
            if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                if elt.value not in names:
                    findings.append(
                        f"line {elt.lineno}: {listname} names "
                        f"{elt.value!r} which is not a registered query")

    print(f"# registration_audit: {len(names)} registered names, "
          f"{len(findings)} findings", file=sys.stderr)
    return findings


def main() -> int:
    findings = audit(sys.argv[1] if len(sys.argv) > 1 else ENTRY)
    for f in findings:
        print(f)
    if not findings:
        print("REGISTRATION AUDIT CLEAN")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
