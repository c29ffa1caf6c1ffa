"""CI cover for the mechanized on-chip contracts (utils/contracts.py).

The contracts run for real inside every ``bench.py`` invocation on the TPU;
this test runs them in interpret mode on CPU so a logic/shape error in the
contract code itself (which would otherwise only surface in the driver's
bench run) is caught by the fast suite. Interpret mode bypasses the Mosaic
lowering, so this validates the contract HARNESS, not the lowering — the
lowering is what the on-chip run exists for.
"""

import pytest


@pytest.mark.slow
def test_fast_contracts_pass_in_interpret_mode():
    from rdmnet_tpu.utils.contracts import run_fast_contracts

    results = run_fast_contracts(interpret=True)
    assert set(results) >= {
        "pallas_knn_exact",
        "pallas_sinkhorn",
        "horn_pose_recovery",
        "approx_search_recall",
    }
    failing = {k: v for k, v in results.items() if v != "pass"}
    assert not failing, failing
