"""Regenerate the README's measured-performance table from PERF.json.

PERF.json is the single source of truth — bench.py (serving),
tools/probe_train_perf.py (training) and main/run_demo.py --synthetic
--full-stack (demo) each record their measurement into it. This tool
splices the rendered table between the PERF:BEGIN/PERF:END markers in
README.md; tests/test_perf_docs.py fails when the committed README and the
rendered table disagree, so a stale perf claim cannot ship.

Usage: python tools/update_perf_docs.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

from pmce_tpu.utils import perf


def main() -> None:
    readme = _os.path.join(_os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        text = f.read()
    table = perf.render_readme_table()
    out = perf.splice_readme(text, table)
    with open(readme, "w") as f:
        f.write(out)
    print("README.md perf block regenerated from PERF.json")


if __name__ == "__main__":
    main()
