"""Statement-coverage measurement with stdlib sys.monitoring (PEP 669).

The CI coverage gate runs pytest-cov (see .github/workflows/tests.yaml), but
this image has no pytest-cov — this tool produces the same statement-level
number locally so the CI threshold is calibrated against a real measurement,
not a guess. Usage:

    python benchmarks/measure_coverage.py [pytest args...]

Counts a line as executable if it appears in co_lines() of any code object
compiled from the package source (the same definition coverage.py uses before
branch analysis), and as covered if a LINE event fired for it. Writes a
per-file table and the total to stdout and COVERAGE.json.
"""
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(_ROOT, "gcm_filters_tpu")
# `python benchmarks/measure_coverage.py` puts benchmarks/ (not the repo
# root) on sys.path; the package and tests/conftest both live at the root
sys.path.insert(0, _ROOT)

hit = {}  # filename -> set of line numbers

TOOL = sys.monitoring.PROFILER_ID


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        hit.setdefault(fn, set()).add(line)
        return None
    return sys.monitoring.DISABLE


def main():
    sys.monitoring.use_tool_id(TOOL, "local-coverage")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["tests/", "-q"]
    code = pytest.main(args)

    sys.monitoring.set_events(TOOL, 0)

    # Executable lines: recursively collect co_lines() from compiled sources.
    def code_lines(co):
        lines = {ln for _, _, ln in co.co_lines() if ln is not None}
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                lines |= code_lines(const)
        return lines

    rows = []
    tot_exec = tot_hit = 0
    for root, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                src = fh.read()
            lines = code_lines(compile(src, path, "exec"))
            # module docstrings/constants compile to line events too; keep
            # the raw counts — consistent across files is what matters
            h = len(lines & hit.get(path, set()))
            rows.append((os.path.relpath(path, PKG), h, len(lines)))
            tot_exec += len(lines)
            tot_hit += h

    rows.sort(key=lambda r: r[1] / max(r[2], 1))
    print(f"\n{'file':<40} {'cov%':>6} {'miss':>5}")
    for name, h, n in rows:
        print(f"{name:<40} {100.0 * h / max(n, 1):>5.1f}% {n - h:>5}")
    pct = 100.0 * tot_hit / max(tot_exec, 1)
    print(f"\nTOTAL statement coverage: {pct:.1f}% "
          f"({tot_hit}/{tot_exec} lines)")
    with open(os.path.join(os.path.dirname(PKG), "COVERAGE.json"), "w") as fh:
        json.dump({"total_pct": round(pct, 1),
                   "files": {n: round(100.0 * h / max(e, 1), 1)
                             for n, h, e in rows}}, fh, indent=1)
    return code


if __name__ == "__main__":
    sys.exit(main())
