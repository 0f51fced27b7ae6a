"""README throughput claims must match the committed measurement
artifacts, and package docstrings must carry no inlined perf numbers
(tools/check_perf_claims.py is the single checker; VERDICT r4 next #7).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import check_perf_claims  # noqa: E402


def test_no_perf_claim_drift():
    errors = check_perf_claims.check()
    assert not errors, "\n".join(errors)
