"""Weight-transplant parity for GCRN (exercises the grouped-LSTM
bottleneck mapping: torch LSTM gate order/biases, the interleaving
group shuffle, and the c-major (C, F) flatten)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, REF)
    for name, attrs in [
        ("ptflops", {"get_model_complexity_info": None}),
        ("soundfile", {}), ("librosa", {}),
        ("pesq", {"pesq": None, "PesqError": Exception}),
        ("joblib", {"Parallel": None, "delayed": None}),
        ("pystoi", {}), ("pystoi.stoi", {"stoi": None}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    import torch

    torch.manual_seed(0)
    yield torch
    sys.path.remove(REF)


def _np(t):
    return t.detach().numpy()


def _c2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _ct2d(w):
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _lin(w):
    return np.asarray(w).T.copy()


def _glu_conv(tm):
    return {
        "conv1": {"kernel": _c2d(_np(tm.conv1.weight)), "bias": _np(tm.conv1.bias)},
        "conv2": {"kernel": _c2d(_np(tm.conv2.weight)), "bias": _np(tm.conv2.bias)},
    }


def _glu_convt(tm):
    return {
        "conv1": {"kernel": _ct2d(_np(tm.conv1.weight)), "bias": _np(tm.conv1.bias)},
        "conv2": {"kernel": _ct2d(_np(tm.conv2.weight)), "bias": _np(tm.conv2.bias)},
    }


def _lstm(tl):
    return {
        "w_ih": _lin(_np(tl.weight_ih_l0)),
        "w_hh": _lin(_np(tl.weight_hh_l0)),
        "b_ih": _np(tl.bias_ih_l0),
        "b_hh": _np(tl.bias_hh_l0),
    }


def _ln(tln):
    return {"LayerNorm_0": {"scale": _np(tln.weight), "bias": _np(tln.bias)}}


def _bn_p(tbn):
    return {"BatchNorm_0": {"scale": _np(tbn.weight), "bias": _np(tbn.bias)}}


def _bn_s(tbn):
    return {"BatchNorm_0": {"mean": _np(tbn.running_mean),
                            "var": _np(tbn.running_var)}}


def test_gcrn_transplant(torch_ref, rng):
    torch = torch_ref
    from model.gcrn import GCRN as TorchGCRN

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models import GCRN

    tm = TorchGCRN().eval()

    params = {}
    stats = {}
    for i in range(1, 6):
        params[f"conv{i}"] = _glu_conv(getattr(tm, f"conv{i}"))
        params[f"bn{i}"] = _bn_p(getattr(tm, f"bn{i}"))
        stats[f"bn{i}"] = _bn_s(getattr(tm, f"bn{i}"))
    params["glstm"] = {
        "lstm1_0": _lstm(tm.glstm.lstm_list1[0]),
        "lstm1_1": _lstm(tm.glstm.lstm_list1[1]),
        "lstm2_0": _lstm(tm.glstm.lstm_list2[0]),
        "lstm2_1": _lstm(tm.glstm.lstm_list2[1]),
        "ln1": _ln(tm.glstm.ln1),
        "ln2": _ln(tm.glstm.ln2),
    }
    for branch, sfx in [("dec_real", "1"), ("dec_imag", "2")]:
        sub = {}
        for i in range(5, 0, -1):
            sub[f"conv{i}_t"] = _glu_convt(getattr(tm, f"conv{i}_t_{sfx}"))
            sub[f"bn{i}_t"] = _bn_p(getattr(tm, f"bn{i}_t_{sfx}"))
        sub["fc"] = {
            "kernel": _lin(_np(getattr(tm, f"fc{sfx}").weight)),
            "bias": _np(getattr(tm, f"fc{sfx}").bias),
        }
        params[branch] = sub
        stats[branch] = {
            f"bn{i}_t": _bn_s(getattr(tm, f"bn{i}_t_{sfx}"))
            for i in range(5, 0, -1)
        }

    model = GCRN()
    x = rng.standard_normal((2, 7, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    import jax.tree_util as jtu

    got = {tuple(str(k.key) for k in p): v.shape
           for p, v in jtu.tree_flatten_with_path(variables["params"])[0]}
    want = {tuple(str(k.key) for k in p): np.asarray(v).shape
            for p, v in jtu.tree_flatten_with_path(params)[0]}
    assert got.keys() == want.keys(), (
        sorted(set(got) - set(want))[:5], sorted(set(want) - set(got))[:5])
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])

    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    out = model.apply(
        {"params": cast(params), "batch_stats": cast(stats)},
        jnp.asarray(x), train=False, mutable=False,
    )
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=3e-4, rtol=1e-3)
