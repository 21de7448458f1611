"""CI contract for the plan-audit discipline (VERDICT r3 task #2):
every gate in ``queries()`` must have an explicit row in PLANS.md —
a new operator cannot ship without its exchange/join/pruning audit."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_plans_md_rows_cover_every_gate():
    import __spark_entry__ as entry

    names = set(entry.queries().keys())
    rows = set()
    for line in (REPO / "PLANS.md").read_text().splitlines():
        m = re.match(r"\|\s*([A-Za-z0-9_]+)\s*\|", line)
        if m:
            rows.add(m.group(1))
    missing = sorted(names - rows)
    assert not missing, (
        f"{len(missing)} gates lack a PLANS.md audit row: {missing[:10]}..."
    )
