"""Weight-transplant numerics parity: load the reference torch models'
weights into our flax models and compare forward outputs.

This is the strongest structural-parity evidence: it fails unless every
layer's shape, connectivity, and arithmetic agree.  The reference
checkout (read-only) provides the oracle weights at test time; we map
tensors — we do not copy code.  Skipped when /root/reference is absent.

Conv weight conventions:
  torch Conv2d  [out, in, kh, kw]  -> flax HWIO  via transpose(2,3,1,0)
  torch Conv1d  [out, in, k]       -> flax       via transpose(2,1,0)
  torch ConvT2d [in, out, kh, kw]  -> our lhs-dilated conv kernel via
                 transpose(2,3,0,1) + spatial flip (the dilated-conv
                 formulation indexes the kernel reversed)
  torch Linear  [out, in]          -> flax kernel via .T
"""

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


def _c2d(w):  # torch Conv2d -> flax
    return np.transpose(w, (2, 3, 1, 0))


def _c1d(w):  # torch Conv1d -> flax
    return np.transpose(w, (2, 1, 0))


def _ct2d(w):  # torch ConvTranspose2d -> our ConvTranspose2d
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _lin(w):
    return np.asarray(w).T.copy()


def _np(t):
    return t.detach().numpy()


def _biconvglu(tm):  # torch BiConvGLU module -> our param subtree
    return {
        name: {"kernel": _c2d(_np(getattr(tm, attr).weight)),
               "bias": _np(getattr(tm, attr).bias)}
        for name, attr in [("conv1", "conv1"), ("l", "l"), ("l_conv", "l_conv"),
                           ("r", "r"), ("r_conv", "r_conv"), ("conv2", "conv2")]
    }


def _biconvtransglu(tm, time_cond=False):
    out = {
        name: {"kernel": _ct2d(_np(getattr(tm, attr).weight)),
               "bias": _np(getattr(tm, attr).bias)}
        for name, attr in [("conv1", "conv1"), ("l", "l"), ("l_conv", "l_conv"),
                           ("r", "r"), ("r_conv", "r_conv"), ("conv2", "conv2")]
    }
    if time_cond:
        out["tp"] = {"kernel": _lin(_np(tm.tp.weight)), "bias": _np(tm.tp.bias)}
    return out


def _bn_params(tbn):
    return {"BatchNorm_0": {"scale": _np(tbn.weight), "bias": _np(tbn.bias)}}


def _bn_stats(tbn):
    return {"BatchNorm_0": {"mean": _np(tbn.running_mean),
                            "var": _np(tbn.running_var)}}


def _residual(tm):
    return {
        "conv1": {"kernel": _c1d(_np(tm.conv1.weight)), "bias": _np(tm.conv1.bias)},
        "main_prelu": {"alpha": _np(tm.mainbranch[0].weight)},
        "main_bn": _bn_params(tm.mainbranch[1]),
        "main_conv": {"kernel": _c1d(_np(tm.mainbranch[2].weight)),
                      "bias": _np(tm.mainbranch[2].bias)},
        "mask_prelu": {"alpha": _np(tm.maskbranch[0].weight)},
        "mask_bn": _bn_params(tm.maskbranch[1]),
        "mask_conv": {"kernel": _c1d(_np(tm.maskbranch[2].weight)),
                      "bias": _np(tm.maskbranch[2].bias)},
        "out_prelu": {"alpha": _np(tm.conv2[0].weight)},
        "out_bn": _bn_params(tm.conv2[1]),
        "out_conv": {"kernel": _c1d(_np(tm.conv2[2].weight)),
                     "bias": _np(tm.conv2[2].bias)},
    }


def _residual_stats(tm):
    return {
        "main_bn": _bn_stats(tm.mainbranch[1]),
        "mask_bn": _bn_stats(tm.maskbranch[1]),
        "out_bn": _bn_stats(tm.conv2[1]),
    }


def _unet_core(tmodel, time_cond=False):
    """Map a torch DiffUNet/DiffUNet1 body onto our _UNetCore trees."""
    params = {"en": {}, "de_real": {}, "de_imag": {}}
    stats = {"en": {}, "de_real": {}, "de_imag": {}}
    for i in range(1, 6):
        params["en"][f"conv{i}"] = _biconvglu(getattr(tmodel.en, f"conv{i}"))
        en_seq = getattr(tmodel.en, f"en{i}")
        params["en"][f"bn{i}"] = _bn_params(en_seq[0])
        params["en"][f"prelu{i}"] = {"alpha": _np(en_seq[1].weight)}
        stats["en"][f"bn{i}"] = _bn_stats(en_seq[0])
        if time_cond:
            tp = getattr(tmodel.en, f"tp{i}")
            params["en"][f"tp{i}"] = {"kernel": _lin(_np(tp.weight)),
                                      "bias": _np(tp.bias)}
    for branch, tdec in [("de_real", tmodel.de_real), ("de_imag", tmodel.de_imag)]:
        for i in range(5, 0, -1):
            seq = getattr(tdec, f"de{i}")
            params[branch][f"de{i}"] = _biconvtransglu(seq[0], time_cond)
            if i > 1:
                params[branch][f"bn{i}"] = _bn_params(seq[2])
                params[branch][f"prelu{i}"] = {"alpha": _np(seq[3].weight)}
                stats[branch][f"bn{i}"] = _bn_stats(seq[2])
    for k in range(3):
        tcm = tmodel.TCMs[k]
        params[f"tcm{k + 1}"] = {
            f"residual{j}": _residual(getattr(tcm, f"residual{j}"))
            for j in range(1, 7)
        }
        stats[f"tcm{k + 1}"] = {
            f"residual{j}": _residual_stats(getattr(tcm, f"residual{j}"))
            for j in range(1, 7)
        }
    return params, stats


def _assert_tree_shapes(got, want, path=""):
    import jax

    g = {"/".join(str(x.key) for x in jax.tree_util.tree_flatten_with_path(got)[0][i][0]):
         got for i in range(0)}
    gl = jax.tree_util.tree_flatten_with_path(got)[0]
    wl = jax.tree_util.tree_flatten_with_path(want)[0]
    gkeys = {tuple(str(k) for k in p): v.shape for p, v in gl}
    wkeys = {tuple(str(k) for k in p): np.asarray(v).shape for p, v in wl}
    assert gkeys.keys() == wkeys.keys(), (
        f"param-tree keys differ:\nonly-ours: {sorted(set(gkeys) - set(wkeys))[:6]}"
        f"\nonly-torch: {sorted(set(wkeys) - set(gkeys))[:6]}"
    )
    for k in gkeys:
        assert gkeys[k] == wkeys[k], f"shape mismatch at {k}: {gkeys[k]} vs {wkeys[k]}"


def test_diffunet_transplant(torch_ref, rng):
    torch = torch_ref
    from model.diff import DiffUNet as TorchDiffUNet

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models import DiffUNet

    tmodel = TorchDiffUNet().eval()
    params_core, stats_core = _unet_core(tmodel, time_cond=False)

    model = DiffUNet()
    x = rng.standard_normal((2, 11, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want_params = {"core": params_core}
    want_stats = {"core": stats_core}
    _assert_tree_shapes(variables["params"], want_params)

    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    out = model.apply(
        {"params": cast(want_params), "batch_stats": cast(want_stats)},
        jnp.asarray(x), train=False, mutable=False,
    )
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=2e-4, rtol=1e-3)


def test_diffunet1_transplant(torch_ref, rng):
    torch = torch_ref
    from model.diff3 import DiffUNet1 as TorchDiffUNet1
    from utils.params import params as ref_params

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models import DiffUNet1

    tmodel = TorchDiffUNet1(ref_params).eval()
    params_core, stats_core = _unet_core(tmodel, time_cond=True)
    want_params = {
        "core": params_core,
        "preprocess": {"kernel": _c2d(_np(tmodel.preprocess.conv.weight)),
                       "bias": _np(tmodel.preprocess.conv.bias)},
        "time_embedding": {
            "proj1": {"kernel": _lin(_np(tmodel.time_embedding.projection1.weight)),
                      "bias": _np(tmodel.time_embedding.projection1.bias)},
            "proj2": {"kernel": _lin(_np(tmodel.time_embedding.projection2.weight)),
                      "bias": _np(tmodel.time_embedding.projection2.bias)},
        },
    }
    want_stats = {"core": stats_core}

    model = DiffUNet1()
    x = rng.standard_normal((2, 11, 161, 2)).astype(np.float32)
    xi = rng.standard_normal((2, 11, 161, 2)).astype(np.float32)
    tvec = np.asarray([3.7, 21.0], np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xi),
                           jnp.asarray(tvec))
    _assert_tree_shapes(variables["params"], want_params)

    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    out = model.apply(
        {"params": cast(want_params), "batch_stats": cast(want_stats)},
        jnp.asarray(x), jnp.asarray(xi), jnp.asarray(tvec),
        train=False, mutable=False,
    )
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(np.moveaxis(x, -1, 1)),
            torch.from_numpy(np.moveaxis(xi, -1, 1)),
            torch.from_numpy(tvec),
        )
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=2e-4, rtol=1e-3)
