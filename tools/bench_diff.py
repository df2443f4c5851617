"""Per-query diff of two bench runs (VERDICT r11 task #2 protocol).

After each driver bench lands, the close MUST adjudicate the DRIVER
artifact, not the builder-local run: diff the new run's per-query
timings against the previous round's on the common subset, then
isolate-retime the top regressions on byte-identical code with
tools/retime.py before calling anything ambient.

Per-query timings live in bench_detail.json (the BENCH_rN.json stdout
line carries only totals + top-10). Older rounds' sidecars are in git
history, so both inputs accept either a file path or a git ref:

    python tools/bench_diff.py HEAD~1:bench_detail.json bench_detail.json
    python tools/bench_diff.py r11.json r12.json --top 10

Prints the common-subset ratio and the top-N regressions/improvements.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _load(src: str) -> dict:
    if ":" in src and not src.endswith(".json") or (
            ":" in src and not src.split(":", 1)[0].endswith(".json")
            and "/" not in src.split(":", 1)[0]):
        out = subprocess.run(["git", "show", src], capture_output=True,
                             text=True, check=True).stdout
        d = json.loads(out)
    else:
        with open(src) as f:
            d = json.load(f)
    # accept either a bench_detail sidecar or a BENCH_rN driver artifact
    if "queries" in d and isinstance(d["queries"], dict):
        q = d["queries"]
    elif "parsed" in d and d["parsed"]:
        q = d["parsed"].get("queries", {})
    else:
        raise SystemExit(f"{src}: no per-query timings found")
    return {k: float(v) for k, v in q.items()}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    old, new = _load(args[0]), _load(args[1])
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(f"common subset: {len(common)} queries, "
          f"{t_old:.1f}s -> {t_new:.1f}s = {t_new / t_old:.2f}x")
    if only_old:
        print(f"retired ({len(only_old)}): {', '.join(only_old[:8])}"
              + ("..." if len(only_old) > 8 else ""))
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new[:8])}"
              + ("..." if len(only_new) > 8 else ""))
    deltas = sorted(common, key=lambda k: new[k] - old[k])
    print(f"\ntop {top} regressions (new-old sec; isolate-retime these "
          "with tools/retime.py before calling them ambient):")
    for k in reversed(deltas[-top:]):
        if new[k] <= old[k]:
            break
        print(f"  {k:40s} {old[k]:7.2f} -> {new[k]:7.2f}  "
              f"(+{new[k] - old[k]:.2f}s, {new[k] / max(old[k], 1e-9):.2f}x)")
    print(f"\ntop {top} improvements:")
    for k in deltas[:top]:
        if new[k] >= old[k]:
            break
        print(f"  {k:40s} {old[k]:7.2f} -> {new[k]:7.2f}  "
              f"({new[k] - old[k]:.2f}s, {new[k] / max(old[k], 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
