"""Weight-transplant numerics parity for DB-AIAT (the hardest port).

Loads the reference torch models' weights into our flax models and
compares forward outputs.  Covers the risk spots the round-1 verdict
named: MultiheadAttention packed-qkv layout, bi-GRU gate order/bias
split, AHAM softmax axis, the sub-pixel (SPConvTranspose2d) channel
interleave, and the dual-branch interactive merge chain.

Two variants are transplanted:
* ``aia_complex_trans_ri`` (model/dbaiat.py:450-478) — the variant
  named in conf/dbaiat.yml;
* ``dual_aia_trans_merge_crm`` (model/dbaiat.py:373-413) — additionally
  exercises AIA_Transformer_merge, AHAM_ori and the masking decoder.

Every torch parameter is randomized before mapping (fresh norm affines
are identity and would hide scale/bias wiring bugs).
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


def _np(t):
    return t.detach().numpy()


def _c2d(w):  # torch Conv2d [out,in,kh,kw] -> flax HWIO
    return np.transpose(_np(w), (2, 3, 1, 0))


def _lin(w):  # torch Linear [out,in] -> flax [in,out]
    return np.asarray(_np(w)).T.copy()


def _randomize(torch, tm, seed=0):
    """Random params + norm stats: identity-initialized affines would
    mask transplant wiring bugs."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.3, 0.3, generator=g)


def _conv(tc):
    return {"kernel": _c2d(tc.weight), "bias": _np(tc.bias)}


def _lnf(tln):  # LayerNormOverF / torch LayerNorm(F): per-bin affine
    return {"scale": _np(tln.weight), "bias": _np(tln.bias)}


def _gn(tgn):  # GroupNorm(1, C)
    return {"scale": _np(tgn.weight), "bias": _np(tgn.bias)}


def _prelu(tp):
    return {"alpha": _np(tp.weight)}


def _ln(tln):  # our tl.LayerNorm wraps flax LayerNorm (auto-named)
    return {"LayerNorm_0": {"scale": _np(tln.weight), "bias": _np(tln.bias)}}


def _mha(tm):
    return {
        "w_in": _lin(tm.in_proj_weight),
        "b_in": _np(tm.in_proj_bias),
        "w_out": _lin(tm.out_proj.weight),
        "b_out": _np(tm.out_proj.bias),
    }


def _gru_bi(tg):
    return {
        "w_ih_fwd": _lin(tg.weight_ih_l0),
        "w_hh_fwd": _lin(tg.weight_hh_l0),
        "b_ih_fwd": _np(tg.bias_ih_l0),
        "b_hh_fwd": _np(tg.bias_hh_l0),
        "w_ih_bwd": _lin(tg.weight_ih_l0_reverse),
        "w_hh_bwd": _lin(tg.weight_hh_l0_reverse),
        "b_ih_bwd": _np(tg.bias_ih_l0_reverse),
        "b_hh_bwd": _np(tg.bias_hh_l0_reverse),
    }


def _tel(tm):  # TransformerEncoderLayer (model/dbaiat.py:41-88)
    return {
        "self_attn": _mha(tm.self_attn),
        "gru": _gru_bi(tm.gru),
        "linear2": {"kernel": _lin(tm.linear2.weight),
                    "bias": _np(tm.linear2.bias)},
        "norm1": _ln(tm.norm1),
        "norm2": _ln(tm.norm2),
        "norm3": _ln(tm.norm3),
    }


def _aia(tm, num_layers=4):  # AIA_Transformer[_merge]
    p = {
        "k1": _np(tm.k1),
        "k2": _np(tm.k2),
        "input": {"conv": _conv(tm.input[0]), "prelu": _prelu(tm.input[1])},
        "output": {"prelu": _prelu(tm.output[0]), "conv": _conv(tm.output[1])},
    }
    for i in range(num_layers):
        p[f"layer{i}"] = {
            "row_trans": _tel(tm.row_trans[i]),
            "col_trans": _tel(tm.col_trans[i]),
            "row_norm": _gn(tm.row_norm[i]),
            "col_norm": _gn(tm.col_norm[i]),
        }
    return p


def _aham(tm):
    return {"k3": _np(tm.k3), "conv1": _conv(tm.conv1)}


def _dense_block(tdb, depth=4):
    p = {}
    for i in range(1, depth + 1):
        p[f"conv{i}"] = _conv(getattr(tdb, f"conv{i}"))
        p[f"norm{i}"] = _lnf(getattr(tdb, f"norm{i}"))
        p[f"prelu{i}"] = _prelu(getattr(tdb, f"prelu{i}"))
    return p


def _dense_encoder(tm):
    return {
        "inp_conv": _conv(tm.inp_conv),
        "inp_norm": _lnf(tm.inp_norm),
        "inp_prelu": _prelu(tm.inp_prelu),
        "enc_dense1": _dense_block(tm.enc_dense1),
        "enc_conv1": _conv(tm.enc_conv1),
        "enc_norm1": _lnf(tm.enc_norm1),
        "enc_prelu1": _prelu(tm.enc_prelu1),
    }


def _dense_decoder(tm, masking=False):
    p = {
        "dec_dense1": _dense_block(tm.dec_dense1),
        "dec_conv1": {"conv": _conv(tm.dec_conv1.conv)},
        "dec_norm1": _lnf(tm.dec_norm1),
        "dec_prelu1": _prelu(tm.dec_prelu1),
        "out_conv": _conv(tm.out_conv),
    }
    if masking:
        p["mask1"] = _conv(tm.mask1[0])
        p["mask2"] = _conv(tm.mask2[0])
        p["maskconv"] = _conv(tm.maskconv)
    return p


def _assert_tree_match(variables_params, want):
    import jax.tree_util as jtu

    got = {tuple(str(k.key) for k in p): v.shape
           for p, v in jtu.tree_flatten_with_path(variables_params)[0]}
    wnt = {tuple(str(k.key) for k in p): np.asarray(v).shape
           for p, v in jtu.tree_flatten_with_path(want)[0]}
    assert got.keys() == wnt.keys(), (
        sorted(set(got) - set(wnt))[:6], sorted(set(wnt) - set(got))[:6])
    for k in got:
        assert got[k] == wnt[k], (k, got[k], wnt[k])


def test_aia_complex_trans_ri_transplant(torch_ref, rng):
    torch = torch_ref
    from model.dbaiat import aia_complex_trans_ri as TorchRI

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models.dbaiat import AiaComplexTransRI

    tm = TorchRI().eval()
    _randomize(torch, tm, seed=1)

    params = {
        "en_ri": _dense_encoder(tm.en_ri),
        "dual_trans": _aia(tm.dual_trans),
        "aham": _aham(tm.aham),
        "de1": _dense_decoder(tm.de1),
        "de2": _dense_decoder(tm.de2),
    }

    model = AiaComplexTransRI()
    x = rng.standard_normal((2, 7, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _assert_tree_match(variables["params"], params)

    cast = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = model.apply({"params": cast}, jnp.asarray(x), train=False,
                      mutable=False)
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=2e-3)


def test_dual_aia_trans_merge_crm_transplant(torch_ref, rng):
    torch = torch_ref
    from model.dbaiat import dual_aia_trans_merge_crm as TorchCRM

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models.dbaiat import DualAiaTransMergeCRM

    tm = TorchCRM().eval()
    _randomize(torch, tm, seed=2)

    params = {
        "en_ri": _dense_encoder(tm.en_ri),
        "en_mag": _dense_encoder(tm.en_mag),
        "aia_trans_merge": _aia(tm.aia_trans_merge),
        "aham": _aham(tm.aham),
        "aham_mag": _aham(tm.aham_mag),
        "de1": _dense_decoder(tm.de1),
        "de2": _dense_decoder(tm.de2),
        "de_mag_mask": _dense_decoder(tm.de_mag_mask, masking=True),
    }

    model = DualAiaTransMergeCRM()
    x = rng.standard_normal((2, 7, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _assert_tree_match(variables["params"], params)

    cast = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = model.apply({"params": cast}, jnp.asarray(x), train=False,
                      mutable=False)
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=2e-3)


def test_aia_complex_trans_mag_transplant(torch_ref, rng):
    """Magnitude-mask-only variant (model/dbaiat.py:416-447): pins the
    top-level wiring the other tests don't — mag/phase split, masking
    decoder routing, and mag*mask recombination under the noisy phase."""
    torch = torch_ref
    from model.dbaiat import aia_complex_trans_mag as TorchMag

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models.dbaiat import AiaComplexTransMag

    tm = TorchMag().eval()
    _randomize(torch, tm, seed=3)

    params = {
        "en_mag": _dense_encoder(tm.en_mag),
        "dual_trans_mag": _aia(tm.dual_trans_mag),
        "aham_mag": _aham(tm.aham_mag),
        "de_mag_mask": _dense_decoder(tm.de_mag_mask, masking=True),
    }

    model = AiaComplexTransMag()
    x = rng.standard_normal((2, 7, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _assert_tree_match(variables["params"], params)

    cast = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = model.apply({"params": cast}, jnp.asarray(x), train=False,
                      mutable=False)
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=2e-3)


def test_dual_aia_complex_trans_transplant(torch_ref, rng):
    """Independent dual-branch variant (model/dbaiat.py:333-370): pins
    the branch-averaging recombination (x_mag + pre_mag)/2 under the
    *complex-branch* phase — the wiring unique to this variant."""
    torch = torch_ref
    from model.dbaiat import dual_aia_complex_trans as TorchDual

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models.dbaiat import DualAiaComplexTrans

    tm = TorchDual().eval()
    _randomize(torch, tm, seed=4)

    params = {
        "en_ri": _dense_encoder(tm.en_ri),
        "en_mag": _dense_encoder(tm.en_mag),
        "dual_trans": _aia(tm.dual_trans),
        "aham": _aham(tm.aham),
        "dual_trans_mag": _aia(tm.dual_trans_mag),
        "aham_mag": _aham(tm.aham_mag),
        "de1": _dense_decoder(tm.de1),
        "de2": _dense_decoder(tm.de2),
        "de_mag_mask": _dense_decoder(tm.de_mag_mask, masking=True),
    }

    model = DualAiaComplexTrans()
    x = rng.standard_normal((2, 7, 161, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _assert_tree_match(variables["params"], params)

    cast = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = model.apply({"params": cast}, jnp.asarray(x), train=False,
                      mutable=False)
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    tout = np.moveaxis(tout.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=2e-3)
