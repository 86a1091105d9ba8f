"""Metric parity tests.

Where the read-only reference checkout is available, its numpy metric
implementations serve as the oracle (loaded via importlib with stubbed
optional deps — we execute the reference for ground truth, we do not
copy it).  Otherwise those tests skip and property tests still run.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from prior_diffuse_tpu.data import synthetic
import prior_diffuse_tpu.metrics.composite  # noqa: F401
C = sys.modules['prior_diffuse_tpu.metrics.composite']
from prior_diffuse_tpu.metrics.stoi import stoi

REF_METRICS = "/root/reference/utils/metrics.py"


@pytest.fixture(scope="module")
def ref_metrics():
    if not os.path.exists(REF_METRICS):
        pytest.skip("reference checkout not available")
    for name, attrs in [
        ("pesq", {"pesq": lambda *a, **k: 0.0, "PesqError": Exception}),
        ("pystoi", {}),
        ("pystoi.stoi", {"stoi": lambda c, p, fs: stoi(c, p, fs)}),
        ("librosa", {}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("ref_metrics", REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    noisy, clean = synthetic.make_utterance(rng, 32000, snr_db=5.0)
    return clean.astype(np.float64), noisy.astype(np.float64)


def test_snr_seg_matches_reference(ref_metrics, pair):
    clean, deg = pair
    want = ref_metrics.SNRseg(clean, deg, 16000)
    got = C.snr_seg(clean, deg, 16000)
    assert got == pytest.approx(want, abs=1e-8)


def test_fw_snr_seg_matches_reference(ref_metrics, pair):
    clean, deg = pair
    want = ref_metrics.fwSNRseg(clean, deg, 16000)
    got = C.fw_snr_seg(clean, deg, 16000)
    assert got == pytest.approx(want, rel=1e-6)


def test_llr_matches_reference(ref_metrics, pair):
    clean, deg = pair
    want = ref_metrics.llr(clean, deg, 16000)
    got = C.llr(clean, deg, 16000)
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_wss_matches_reference(ref_metrics, pair):
    clean, deg = pair
    want = ref_metrics.wss(clean, deg, 16000)
    got = C.wss(clean, deg, 16000)
    assert got == pytest.approx(want, rel=1e-6)


def test_composite_regression_constants(pair):
    clean, deg = pair
    seg, pesq_mos, csig, cbak, covl, st = C.composite(clean, deg, 16000)
    # PESQ binding absent -> 0 contribution; scores still in [1,5]
    for v in (csig, cbak, covl):
        assert 1.0 <= v <= 5.0
    assert 0.0 <= st <= 1.0


def test_stoi_properties(pair):
    clean, deg = pair
    perfect = stoi(clean, clean, 16000)
    degraded = stoi(clean, deg, 16000)
    rng = np.random.default_rng(0)
    garbage = stoi(clean, rng.standard_normal(len(clean)), 16000)
    assert perfect > 0.99
    assert perfect > degraded > garbage


def test_compare_one_ordering(pair):
    clean, deg = pair
    csig, cbak, covl, pesq_mos, ssnr, st = C.compare_one(clean, deg, 16000)
    seg, p, cs, cb, co, s2 = C.composite(clean, deg, 16000)
    assert (csig, cbak, covl, pesq_mos, ssnr, st) == (cs, cb, co, p, seg, s2)
