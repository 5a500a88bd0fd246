"""Close-gate: full oracle sweep under a Turkish JVM default locale.

r15 companion to scripts/tz_sweep.py. Spark's plain ``lower()``/
``upper()`` read the JVM DEFAULT locale on their non-ASCII slow path
(the Turkish-I class: ``lower('CAFÉ IN')`` → ``'café ın'`` under
tr_TR). The engine is fixed two ways — plans route text lowering
through ``hashing.locale_free_lower_sql`` (ICU root, bare-session
safe) and ``get_spark`` pins ``-Duser.language=en`` into the JVM —
but THIS sweep drives the driver-gate scenario: a bare session
(oracle_check) whose JVM inherits the adversarial locale, over the
full registry. JAVA_TOOL_OPTIONS reaches the JVM at launch, which is
why the sweep must re-exec a fresh process.

Usage: python scripts/locale_sweep.py [sf_dir] [query ...]
Defaults to the driver's correctness SF (/root/testdata/sf0.01) and
the full registry. Exit code is oracle_check's.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCALE_OPTS = "-Duser.language=tr -Duser.country=TR"


def main() -> None:
    args = sys.argv[1:]
    if not args:
        args = ["/root/testdata/sf0.01"]
    env = dict(os.environ)
    env["JAVA_TOOL_OPTIONS"] = (
        env.get("JAVA_TOOL_OPTIONS", "") + " " + LOCALE_OPTS
    ).strip()
    print(f"oracle sweep under JVM locale tr_TR ({LOCALE_OPTS}; fresh "
          f"process — the JVM reads the default locale at startup)")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_check.py"),
         *args],
        env=env,
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
