"""Close-gate: full oracle sweep under a half-hour-offset OS timezone.

Round-14's post-close audit, institutionalized (VERDICT r14 item 3):
the pinned session conf (`spark.sql.session.timeZone=UTC`) covers
Catalyst's session clock, but NOT the JVM default TZ, Python's
`time.tzname`, or DuckDB's `timezone` setting — all of which read the
OS environment at process start. `TZ=Asia/Kolkata` (UTC+05:30, a
half-hour offset that breaks any hour-granularity assumption) is the
adversarial choice. Because the JVM and DuckDB cache the default TZ at
startup, the sweep MUST run in a fresh subprocess — this wrapper
re-execs scripts/oracle_check.py with the TZ injected.

Usage: python scripts/tz_sweep.py [sf_dir] [query ...]
Defaults to the driver's correctness SF (/root/testdata/sf0.01) and
the full registry. Exit code is oracle_check's.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TZ = "Asia/Kolkata"


def main() -> None:
    args = sys.argv[1:]
    if not args:
        args = ["/root/testdata/sf0.01"]
    env = dict(os.environ, TZ=TZ)
    print(f"oracle sweep under TZ={TZ} (fresh process — JVM/DuckDB "
          f"read the OS TZ at startup)")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_check.py"),
         *args],
        env=env,
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
