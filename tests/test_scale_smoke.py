"""CI guard for the production-scale smoke driver (scripts/scale_smoke.py):
the --small shapes run the same code path in seconds on the CPU mesh."""

import os
import sys


def test_scale_smoke_small():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import scale_smoke

    results = scale_smoke.main(["--small"])
    assert results["sskm_acc"][0] > 0.9
    lo, hi = results["consskm_sizes"]
    assert lo >= 30 and hi <= 2000
    assert results["topk_hit"] > 0.9
    assert results["voting_sacc"] > 0.9
    assert results["ub"] >= results["lb"] - 1e-9
