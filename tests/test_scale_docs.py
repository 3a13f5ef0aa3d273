"""Pin the CLI's recommended health-gate thresholds to the MEASURED
drift trajectory (round-14, ADVICE + verdict prescription 5).

``make_training_data``'s ``--max-list-over-target`` /
``--max-rail-rate`` help text recommends concrete values derived from
the recorded post-extend trajectory (docs/SCALE_PROBE.md "Post-extend
health trajectory probe": a store built at sf0.1, then three
no-retrain corpus-sized appends).  These tests parse that recorded
table and assert the recommendation sits on the documented side of
every row: it PASSES the fresh build with margin and REFUSES by the
third drift batch.  If a re-probe moves the curve, these fail and the
recommendation must be revisited — the numbers cannot silently drift
apart from the prose citing them.

Spark-free (a docs-consistency gate, like tools/preflight.py's).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_training_data import (  # noqa: E402
    RECOMMENDED_MAX_LIST_OVER_TARGET,
    RECOMMENDED_MAX_RAIL_RATE,
)

_ROW = re.compile(r"^\|\s*(build|\+batch \d)\s*\|")


def _trajectory() -> dict[str, dict[str, float]]:
    """state -> {max_over_target, sq_at_rail_rate} from the recorded
    table in docs/SCALE_PROBE.md."""
    path = os.path.join(REPO, "docs", "SCALE_PROBE.md")
    header: list[str] = []
    rows: dict[str, dict[str, float]] = {}
    for line in open(path, encoding="utf-8"):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if cells and cells[0] == "state":
            header = cells
        elif header and _ROW.match(line):
            row = dict(zip(header, cells))
            rows[row["state"]] = {
                "max_over_target": float(row["max_over_target"]),
                "sq_at_rail_rate": float(row["sq_at_rail_rate"]),
            }
    assert {"build", "+batch 1", "+batch 2", "+batch 3"} <= set(rows), (
        "docs/SCALE_PROBE.md trajectory table not found or reshaped — "
        "update this parser AND re-derive the recommended thresholds"
    )
    return rows


def test_recommended_list_gate_passes_build_refuses_by_batch3():
    t = _trajectory()
    build = t["build"]["max_over_target"]
    assert build < RECOMMENDED_MAX_LIST_OVER_TARGET, (
        "recommended --max-list-over-target would refuse a FRESH "
        "build — useless as an operating threshold"
    )
    # documented margin: roughly build x 2 (not merely epsilon above)
    assert RECOMMENDED_MAX_LIST_OVER_TARGET >= build * 1.5
    assert t["+batch 3"]["max_over_target"] \
        > RECOMMENDED_MAX_LIST_OVER_TARGET, (
        "the recorded curve no longer crosses the recommended "
        "--max-list-over-target by drift batch 3 — re-derive it"
    )


def test_recommended_rail_gate_passes_build_refuses_by_batch3():
    t = _trajectory()
    build = t["build"]["sq_at_rail_rate"]
    assert build < RECOMMENDED_MAX_RAIL_RATE
    assert RECOMMENDED_MAX_RAIL_RATE >= build * 1.5
    assert t["+batch 3"]["sq_at_rail_rate"] > RECOMMENDED_MAX_RAIL_RATE


def test_help_text_cites_the_trajectory():
    """The flags' help must keep citing the trajectory doc and the
    recommended values — the operator-facing side of this pin."""
    import make_training_data as mtd

    src = open(mtd.__file__, encoding="utf-8").read()
    assert "SCALE_PROBE.md" in src
    # each constant appears beyond its definition (interpolated into
    # the --max-* help strings)
    assert src.count("RECOMMENDED_MAX_LIST_OVER_TARGET") >= 2
    assert src.count("RECOMMENDED_MAX_RAIL_RATE") >= 2
