"""Regenerate the drift-prone counts in README.md / STATUS.md from the code
itself (round-2 VERDICT #10: three rounds of hand-edited count drift — the
counts now have ONE source of truth: queries()/oracle_sql(), the index
registry, and pytest collection).

Usage: python tools/sync_counts.py        # rewrites files in place
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from eoreader_spark import bands  # noqa: E402
from eoreader_spark.functions import indices  # noqa: E402


def counts() -> dict[str, int]:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_q = len(qs)
    n_oracle = sum(1 for k in qs if k in oracles)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=REPO,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    n_tests = int(m.group(1)) if m else -1
    return {
        "queries": n_q,
        "oracle": n_oracle,
        "rows_only": n_q - n_oracle,
        "indices": len(indices.INDEX_REGISTRY),
        "layouts": len(bands.LAYOUTS),
        "tests": n_tests,
    }


def sync(write: bool = True) -> dict[str, int]:
    c = counts()
    readme = (REPO / "README.md").read_text()
    readme = re.sub(
        r"— \d+ queries over `/root/testdata` \(\d+ with\n  value-exact DuckDB oracles, \d+ rows-only",
        f"— {c['queries']} queries over `/root/testdata` ({c['oracle']} with\n"
        f"  value-exact DuckDB oracles, {c['rows_only']} rows-only",
        readme,
    )
    readme = re.sub(
        r"python -m pytest tests/ -x -q          # \d+ tests",
        f"python -m pytest tests/ -x -q          # {c['tests']} tests",
        readme,
    )
    readme = re.sub(
        r"python tools/check_oracle.py           # driver-oracle gate: \d+ compared \+ \d+ rows-only",
        f"python tools/check_oracle.py           # driver-oracle gate: "
        f"{c['oracle']} compared + {c['rows_only']} rows-only",
        readme,
    )
    readme = re.sub(
        r"tag dispatch \(\d+ layouts:",
        f"tag dispatch ({c['layouts']} layouts:",
        readme,
    )
    status = (REPO / "STATUS.md").read_text()
    status = re.sub(
        r"spectral indices \(\d+ in registry",
        f"spectral indices ({c['indices']} in registry",
        status,
    )
    status = re.sub(r"\d+ layouts,", f"{c['layouts']} layouts,", status)
    if write:
        (REPO / "README.md").write_text(readme)
        (REPO / "STATUS.md").write_text(status)
    print(c)
    return c


if __name__ == "__main__":
    sync()
