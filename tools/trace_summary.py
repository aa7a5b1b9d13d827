"""Summarise an XProf trace (.xplane.pb) into a compact JSON table.

Usage: python tools/trace_summary.py <xplane.pb> [top_n]

Produces the per-HLO-op breakdown (self time, bound-by, FLOP rate) used
for the committed perf evidence in docs/PERF.md.
"""

import json
import sys


def summarise(path, top_n=25):
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in d["cols"]]
    idx = {c: k for k, c in enumerate(cols)}
    rows = sorted(
        (r["c"] for r in d["rows"]),
        key=lambda v: -v[idx["total_self_time"]]["v"],
    )
    total_us = sum(v[idx["total_self_time"]]["v"] for v in rows)
    out = {"total_ms": round(total_us / 1e3, 2), "ops": []}
    for v in rows[:top_n]:
        expr = v[idx["hlo_op_expression"]]["v"].replace("\n", " ")
        out["ops"].append(
            {
                "op": v[idx["hlo_op_name"]]["v"],
                "category": v[idx["category"]]["v"],
                "self_ms": round(v[idx["total_self_time"]]["v"] / 1e3, 2),
                "pct": round(v[idx["total_self_time_percent"]]["v"], 1),
                "gflops_per_s": round(v[idx["model_flop_rate"]]["v"] or 0),
                "bound_by": v[idx["bound_by"]]["v"],
                "shape": expr.split(" = ")[1].split(" ")[0] if " = " in expr else "",
            }
        )
    return out


if __name__ == "__main__":
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    print(json.dumps(summarise(sys.argv[1], top), indent=1))
