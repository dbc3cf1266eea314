"""One-shot codemod: replace round() with the cross-engine-stable
floor-form in all query modules (see cassowary_spark/exprs.py).

- Python side: F.round(X, n)  ->  srnd(X, n)   (+ import)
- SQL side:    round(X, n)    ->  floor((X) * 10^n.0 + 0.5) / 10^n.0
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

QUERY_DIR = Path(__file__).resolve().parent.parent / "cassowary_spark" / "queries"


def find_call(text: str, start: int) -> tuple[str, str, int]:
    """From index of '(' — return (expr, n, end_index_after_close)."""
    depth = 0
    i = start
    args_start = start + 1
    last_comma = None
    while i < len(text):
        ch = text[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        elif ch == "," and depth == 1:
            last_comma = i
        i += 1
    assert depth == 0, "unbalanced parens"
    assert last_comma is not None, text[start : i + 1]
    return text[args_start:last_comma].strip(), text[last_comma + 1 : i].strip(), i + 1


def sweep_sql(text: str) -> str:
    out = []
    pos = 0
    pat = re.compile(r"(?<![\w.])round\(")
    while True:
        m = pat.search(text, pos)
        if m is None:
            out.append(text[pos:])
            break
        expr, n, end = find_call(text, m.end() - 1)
        scale = f"{float(10 ** int(n)):.1f}"
        out.append(text[pos : m.start()])
        out.append(f"floor(({expr}) * {scale} + 0.5) / {scale}")
        pos = end
    return "".join(out)


def sweep_f_round(text: str) -> str:
    # F.round(X, n) -> srnd(X, n); same signature, so a name swap works.
    return text.replace("F.round(", "srnd(")


def main() -> None:
    for path in sorted(QUERY_DIR.glob("*.py")):
        if path.name in ("__init__.py", "udf.py"):  # udf.py handled by hand
            continue
        src = path.read_text()
        new = sweep_sql(sweep_f_round(src))
        if new == src:
            continue
        if "from cassowary_spark.exprs import srnd" not in new and "srnd(" in new:
            new = new.replace(
                "from cassowary_spark.registry import query",
                "from cassowary_spark.exprs import srnd\nfrom cassowary_spark.registry import query",
                1,
            )
        path.write_text(new)
        print(f"rewrote {path.name}")


if __name__ == "__main__":
    sys.exit(main())
