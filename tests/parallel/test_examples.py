"""The examples must actually run (single-process smoke)."""
import pathlib
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_multihost_pod_launch_example():
    ex_dir = str(pathlib.Path(__file__).resolve()
                 .parents[2] / "examples")
    sys.path.insert(0, ex_dir)
    try:
        import multihost_pod_launch
        state, res = multihost_pod_launch.main(
            global_batch=64, steps=4, window=2)
    finally:
        sys.path.remove(ex_dir)
    assert int(state.step) == 4
    assert np.isfinite(res["auc"])
    assert res["gauc_mode"] == "corpus"
