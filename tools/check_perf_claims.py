"""One source of truth for throughput claims (VERDICT r4 next #7).

Every number in README.md's performance table must match the committed
measurement artifacts within tolerance — the artifacts are the source of
truth, the prose quotes them:

  headline (exact)            -> newest BENCH_r*.json   (driver-recorded)
  fast mode (bf16)            -> BENCH_FAST.json        (bench.py, bf16)
  merged 3-angle (physics 2)  -> BENCH_CONFIGS.json     (per-config bench)

Package docstrings must not carry inlined "% faster" / "M cols/s"
claims at all (they drift silently; cite the artifact file instead).
docs/DESIGN.md is exempt: it is the dated measurement log, and
historical numbers there are records, not claims.

Run directly (exit 1 on drift) or via tests/test_perf_claims.py.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 0.10   # README rounds to ~N; artifacts re-measure with epoch drift


def _readme_value(readme: str, row_pattern: str) -> float:
    m = re.search(row_pattern + r"[^|]*\|\s*~([\d,]+)", readme)
    if not m:
        raise AssertionError(f"README row not found: {row_pattern}")
    return float(m.group(1).replace(",", ""))


def check() -> list:
    errors = []
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()

    def compare(label, claimed, artifact, measured):
        if measured <= 0 or abs(claimed - measured) / measured > TOL:
            errors.append(
                f"{label}: README claims ~{claimed:,.0f} but {artifact} "
                f"measured {measured:,.0f} (> {TOL:.0%} apart) — update "
                "the README from the artifact")

    # Headline exact mode: newest driver-recorded bench artifact.  The
    # driver wraps bench.py's JSON line in {"rc", "tail", ...}; parse the
    # metric line out of the tail.
    bench_files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not bench_files:
        # No driver-recorded artifact at all is the stronger variant of
        # the same silent-skip drift class — report it, don't skip.
        errors.append("no BENCH_r*.json artifact found: the README "
                      "headline row has no backing measurement")
    else:
        with open(bench_files[-1]) as f:
            rec = json.load(f)
        value = None
        for line in rec.get("tail", "").splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                value = json.loads(line).get("value")
        if value is None:
            # A BENCH_r*.json with no parseable metric line (failed or
            # truncated driver run) is reported as drift, NOT raised:
            # the remaining checks (fast row, configs, inlined claims)
            # must still run so one rerun surfaces every problem.
            errors.append(
                f"{os.path.basename(bench_files[-1])} has no parseable "
                "bench metric line (failed/truncated run?); the README "
                "headline cannot be verified against it")
        else:
            compare("headline exact",
                    _readme_value(readme, r"Fused Pallas mega-kernels"),
                    os.path.basename(bench_files[-1]), value)

    # Fast mode: dedicated 524k-batch artifact.
    fast_path = os.path.join(REPO, "BENCH_FAST.json")
    if os.path.exists(fast_path):
        with open(fast_path) as f:
            fast = json.load(f)
        compare("fast mode (bf16)",
                _readme_value(readme, r"bf16.*fast mode"),
                "BENCH_FAST.json", fast["value"])
    else:
        errors.append("BENCH_FAST.json missing: the README fast-mode row "
                      "has no backing artifact")

    # Merged 3-angle config.
    cfg_path = os.path.join(REPO, "BENCH_CONFIGS.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        compare("merged 3-angle",
                _readme_value(readme, r"physics index 2"),
                "BENCH_CONFIGS.json",
                cfg["configs"]["lw_fsck+sw_wide_3ang"])

    # No inlined perf claims on the user-facing surface (CLI drivers,
    # pipeline, package __init__) — those are what users read and they
    # drift silently.  ops/ internals are exempt: their numbers are
    # dated A/B measurement records tied to probe scripts (the same
    # class as docs/DESIGN.md), not throughput claims.
    surface = (glob.glob(os.path.join(REPO, "ecckd_tpu", "cli", "*.py"))
               + [os.path.join(REPO, "ecckd_tpu", "pipeline.py"),
                  os.path.join(REPO, "ecckd_tpu", "__init__.py")])
    for path in surface:
        with open(path) as f:
            src = f.read()
        for pat, what in ((r"~?\d+(?:\.\d+)?%\s+faster", "'% faster'"),
                          (r"~?\d+(?:\.\d+)?M\s+col(?:umn)?s?/s",
                           "'M cols/s'")):
            if re.search(pat, src):
                errors.append(
                    f"{os.path.relpath(path, REPO)} carries an inlined "
                    f"{what} claim; cite BENCH_CONFIGS.json / "
                    "BENCH_FAST.json instead")
    return errors


def main() -> int:
    errors = check()
    for e in errors:
        print(f"DRIFT: {e}", file=sys.stderr)
    if not errors:
        print("perf claims: OK (README matches artifacts; no inlined "
              "docstring claims)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
