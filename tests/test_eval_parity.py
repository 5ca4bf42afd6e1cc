"""Eval metric suite + protocol parity vs reference eval_depthcrafter."""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

from eval_depthcrafter import metric as ref_metric  # noqa: E402
from eval_depthcrafter.eval import eval_single_by_data  # noqa: E402

from vdn.eval import metrics as M  # noqa: E402
from vdn.eval.protocol import eval_sequence  # noqa: E402


def _data(seed=0, t=6, h=20, w=24):
    rng = np.random.default_rng(seed)
    pred = (rng.random((t, h, w)) * 2 + 0.1).astype(np.float32)
    gt = (rng.random((t, h, w)) * 10 + 0.5).astype(np.float32)
    mask = rng.random((t, h, w)) > 0.15
    return pred, gt, mask


@pytest.mark.parametrize("name", list(M.EVAL_METRICS) + [
    "squared_relative_difference", "rmse_log", "log10", "i_rmse",
    "silog_rmse"])
def test_metric_matches(name):
    pred, gt, mask = _data(1)
    ref_fn = getattr(ref_metric, name)
    with torch.no_grad():
        r = float(ref_fn(torch.from_numpy(pred.copy()),
                         torch.from_numpy(gt.copy()),
                         torch.from_numpy(mask)))
    g = float(getattr(M, name)(pred.astype(np.float64),
                               gt.astype(np.float64), mask))
    np.testing.assert_allclose(g, r, rtol=1e-4)


@pytest.mark.parametrize("domain", ["depth", "disp"])
def test_protocol_matches(domain):
    rng = np.random.default_rng(2)
    pred_disp = (rng.random((5, 14, 18)) + 0.2).astype(np.float32)
    gt = (rng.random((5, 20, 24)) * 30 + 0.5).astype(np.float32)
    ref_vals = eval_single_by_data(pred_disp.copy(), gt.copy(),
                                   device="cpu", seq_len=5, domain=domain)
    got = eval_sequence(pred_disp, gt, seq_len=5, domain=domain)
    from eval_depthcrafter.eval import eval_metrics as ref_names
    for name, rv in zip(ref_names, ref_vals):
        np.testing.assert_allclose(got[name], rv, rtol=1e-3, atol=1e-6,
                                   err_msg=name)
