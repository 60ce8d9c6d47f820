"""CI-style correctness gate: one entry point, one machine-readable
output line.

Runs BOTH local proofs of the driver gate and prints a single compact
summary line (last line of stdout) so a bench/driver tail capture
retains machine-readable evidence of the builder's "ALL PASS" claims:

* ``tools/window_fidelity.py`` — the driver-replica check: the FIRST
  50 registry entries (DRIVER_WINDOW) on a VANILLA session, DuckDB
  value-hash compare;
* ``tools/check_oracle.py`` — every registered query on the tuned
  session, same compare.

Usage: python tools/ci_gate.py [sf_dir]
Output (final line):
  CI_GATE {"sf_dir": ..., "window_fidelity": "ALL_PASS",
           "oracle_all": "ALL_PASS", "elapsed_sec": N}
Exit 0 iff both sub-gates pass.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))


def _run(script: str, sf_dir: str) -> tuple[str, float]:
    """Run a gate script; classify by exit code (each script exits
    non-zero on any FAIL)."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(_TOOLS, script), sf_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    status = "ALL_PASS" if proc.returncode == 0 else "FAIL"
    if proc.returncode != 0:
        # surface the failing lines for debugging, off the final line
        for ln in proc.stdout.splitlines():
            if ln.startswith("FAIL"):
                print(f"  {script}: {ln}", file=sys.stderr)
    return status, round(time.time() - t0, 1)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wf, wf_s = _run("window_fidelity.py", sf_dir)
    oc, oc_s = _run("check_oracle.py", sf_dir)
    line = json.dumps(
        {
            "sf_dir": sf_dir,
            "window_fidelity": wf,
            "oracle_all": oc,
            "window_fidelity_sec": wf_s,
            "oracle_all_sec": oc_s,
        },
        separators=(",", ":"),
    )
    print(f"CI_GATE {line}")
    return 0 if wf == oc == "ALL_PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
