"""Composed parallelism modes on the 8-virtual-device CPU mesh (conftest):
dp x pp (two GPipe replicas covering the whole mesh) and the dp-sharded
contrastive global-batch step — the same checks the driver's
dryrun_multichip runs, kept in the suite so regressions surface in CI
rather than only in the round artifact."""

import sys
import os

import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (conftest CPU platform)")
    return devs[:8]


def test_dp_pp_composed_matches_dense_and_stays_synchronized(devices):
    loss, err = graft._dryrun_dp_pipeline_parallel(devices)
    assert err < 1e-4
    assert loss > 0


def test_contrastive_global_batch_sharded_loss_parity(devices):
    err = graft._dryrun_contrastive_global_batch(devices)
    assert err < 1e-5
