"""Round-close gate runner: every close check, one command.

Institutionalizes the close protocol the round records have converged
on (SURVEY §2.10 round amendments). Runs, in order:

  1. full pytest            python -m pytest tests/ -q
                            (STREAMBENCH_FUZZ_FULL=1 — the full fuzz
                            profile is part of the close, not the
                            default dev loop)
  2. sf0.01 oracle sweep    scripts/oracle_check.py (driver SF, bare
                            session — the driver-gate simulation)
  3. sf0.1 oracle sweep     same, SPARK_GRAFT_ORACLE_MEM=8g (bench SF)
  4. universe closure       scripts/universe_fuzz.py (all universes)
  5. TZ sweep               scripts/tz_sweep.py (full registry,
                            Asia/Kolkata — OS-level TZ axis)
  6. locale sweep           scripts/locale_sweep.py (full registry,
                            tr_TR JVM locale — Turkish-I axis)
  7. extreme-value probe    scripts/extreme_value_probe.py (domain-cap
                            power-sum headroom)

Bench runs are NOT here: they need a hand-checked gauge (steal %,
stamps) and their artifacts are recorded with provenance — see
bench.py and the round records.

Each stage streams to its own log under --logdir (default
/tmp/close_r<N>/); a stage failure is recorded and the run CONTINUES
(a close needs the full picture, not the first red). Exit 0 only if
every stage passed.

Usage: python scripts/close_protocol.py [--logdir DIR] [--skip N,M]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def stages() -> list[tuple[str, list[str], dict[str, str]]]:
    py = sys.executable
    s = os.path.join(REPO, "scripts")
    return [
        ("pytest_full", [py, "-m", "pytest", os.path.join(REPO, "tests"),
                         "-q"], {"STREAMBENCH_FUZZ_FULL": "1"}),
        ("sweep_sf001", [py, os.path.join(s, "oracle_check.py"), SF001], {}),
        ("sweep_sf01", [py, os.path.join(s, "oracle_check.py"), SF01],
         {"SPARK_GRAFT_ORACLE_MEM": "8g"}),
        ("universes", [py, os.path.join(s, "universe_fuzz.py")], {}),
        ("tz_sweep", [py, os.path.join(s, "tz_sweep.py"), SF001], {}),
        ("locale_sweep", [py, os.path.join(s, "locale_sweep.py"), SF001], {}),
        ("extreme_probe", [py, os.path.join(s, "extreme_value_probe.py")], {}),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/close_protocol")
    ap.add_argument("--skip", default="",
                    help="comma-separated stage names to skip")
    args = ap.parse_args()
    skip = {x.strip() for x in args.skip.split(",") if x.strip()}
    os.makedirs(args.logdir, exist_ok=True)

    results: list[tuple[str, str, float]] = []
    for name, cmd, extra_env in stages():
        if name in skip:
            results.append((name, "SKIPPED", 0.0))
            print(f"== {name}: SKIPPED", flush=True)
            continue
        log = os.path.join(args.logdir, f"{name}.log")
        env = dict(os.environ, **extra_env)
        t0 = time.time()
        print(f"== {name}: running ({' '.join(cmd)}) -> {log}", flush=True)
        with open(log, "w") as fh:
            rc = subprocess.run(cmd, env=env, stdout=fh,
                                stderr=subprocess.STDOUT).returncode
        dt = time.time() - t0
        status = "PASS" if rc == 0 else f"FAIL(rc={rc})"
        results.append((name, status, dt))
        print(f"== {name}: {status} in {dt:.0f}s", flush=True)

    print("\n==== close protocol summary ====")
    for name, status, dt in results:
        print(f"  {name:15s} {status:12s} {dt:7.0f}s")
    n_fail = sum(1 for _, st, _ in results if st.startswith("FAIL"))
    print(f"{len(results) - n_fail}/{len(results)} stages green")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
