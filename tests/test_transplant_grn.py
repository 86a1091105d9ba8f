"""Weight-transplant numerics parity for GRN (model/grn.py:8-72):
dilated conv front-end, the c-major (C, F) flatten, 18 GLU residual
blocks with the fused left/right gate convs, and the BatchNorm1d
mappings.  All torch parameters AND BatchNorm running statistics are
randomized first — fresh identity affines would hide wiring bugs."""

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
    return np.transpose(_np(w), (2, 3, 1, 0))


def _c1d(w):
    return np.transpose(_np(w), (2, 1, 0))


def _conv2(tc):
    return {"kernel": _c2d(tc.weight), "bias": _np(tc.bias)}


def _conv1(tc):
    return {"kernel": _c1d(tc.weight), "bias": _np(tc.bias)}


def _bn_p(tbn):
    return {"BatchNorm_0": {"scale": _np(tbn.weight), "bias": _np(tbn.bias)}}


def _bn_s(tbn):
    return {"BatchNorm_0": {"mean": _np(tbn.running_mean),
                            "var": _np(tbn.running_var)}}


def _glu(tm):
    return (
        {
            "in_conv": _conv1(tm.in_conv[0]),
            "in_bn": _bn_p(tm.in_conv[1]),
            "left_conv": _conv1(tm.left_conv[2]),
            "left_bn": _bn_p(tm.left_conv[3]),
            "right_conv": _conv1(tm.right_conv[2]),
            "right_bn": _bn_p(tm.right_conv[3]),
            "out_conv": _conv1(tm.out_conv[0]),
            "out_bn": _bn_p(tm.out_conv[1]),
        },
        {
            "in_bn": _bn_s(tm.in_conv[1]),
            "left_bn": _bn_s(tm.left_conv[3]),
            "right_bn": _bn_s(tm.right_conv[3]),
            "out_bn": _bn_s(tm.out_conv[1]),
        },
    )


def test_grn_transplant(torch_ref, rng):
    torch = torch_ref
    from model.grn import GRN as TorchGRN

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models import GRN

    tm = TorchGRN().eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.3, 0.3, generator=g)
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)

    params = {
        "dila1": _conv2(tm.dilaconv[0]),
        "dila2": _conv2(tm.dilaconv[2]),
        "dila3": _conv2(tm.dilaconv[4]),
        "dila4": _conv2(tm.dilaconv[6]),
        "conv1d_in": _conv1(tm.conv1d[0]),
        "bn_in": _bn_p(tm.conv1d[1]),
        "conv1d_3": _conv1(tm.conv1d_3[0]),
        "bn3": _bn_p(tm.conv1d_3[1]),
        "conv1d_4": _conv1(tm.conv1d_4[0]),
        "bn4": _bn_p(tm.conv1d_4[1]),
        "conv1d_5": _conv1(tm.conv1d_5[0]),
        "bn5": _bn_p(tm.conv1d_5[1]),
    }
    stats = {
        "bn_in": _bn_s(tm.conv1d[1]),
        "bn3": _bn_s(tm.conv1d_3[1]),
        "bn4": _bn_s(tm.conv1d_4[1]),
        "bn5": _bn_s(tm.conv1d_5[1]),
    }
    for gi in range(3):
        glus = getattr(tm, f"glus_{gi}")
        for i in range(6):
            p, s = _glu(glus[i])
            params[f"glu_{gi}_{i}"] = p
            stats[f"glu_{gi}_{i}"] = s

    model = GRN()
    x = rng.standard_normal((2, 9, 161)).astype(np.float32) * 0.5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    import jax.tree_util as jtu

    got = {tuple(str(k.key) for k in p): v.shape
           for p, v in jtu.tree_flatten_with_path(variables["params"])[0]}
    want = {tuple(str(k.key) for k in p): np.asarray(v).shape
            for p, v in jtu.tree_flatten_with_path(params)[0]}
    assert got.keys() == want.keys(), (
        sorted(set(got) - set(want))[:6], sorted(set(want) - set(got))[:6])
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])

    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    out = model.apply(
        {"params": cast(params), "batch_stats": cast(stats)},
        jnp.asarray(x), train=False, mutable=False,
    )
    with torch.no_grad():
        tout = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(),
                               atol=5e-4, rtol=2e-3)
