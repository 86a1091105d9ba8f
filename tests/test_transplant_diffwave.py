"""Weight-transplant numerics parity for DiffWave (model/diff2.py:12-52).

The reference's own diffusion ``params`` lacks the fields DiffWave's
constructor needs (it would crash if routed to — SURVEY 2.3), so the
oracle instantiates the torch model with explicit DiffWave-paper
hyper-parameters matching our constructor defaults.  All parameters are
randomized first (the reference zero-inits its output projection, which
would otherwise hide output-head wiring bugs)."""

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
    for name, attrs in [("ptflops", {"get_model_complexity_info": None})]:
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


def _c1d(w):
    return np.transpose(_np(w), (2, 1, 0))


def _lin(w):
    return np.asarray(_np(w)).T.copy()


def _conv1(tc):
    return {"kernel": _c1d(tc.weight), "bias": _np(tc.bias)}


# Reference defect note: diff2's `_lerp_embedding` (model/diff2.py:83-88)
# mis-broadcasts for *batched* fractional t ((t - low_idx) [B] against
# [B, 128]) — it only executes for batch 1 (where [1] right-aligns), so
# the fractional-t oracle case runs at batch 1 and the integer case
# (table-lookup path) covers batching.
@pytest.mark.parametrize("t_vec,as_int", [([3, 21], True), ([3.7], False)])
def test_diffwave_transplant(torch_ref, rng, t_vec, as_int):
    torch = torch_ref
    from model.diff2 import DiffWave as TorchDiffWave

    import jax
    import jax.numpy as jnp

    from prior_diffuse_tpu.models import DiffWave

    layers, cycle, c = 6, 3, 16  # small config, same topology
    P = types.SimpleNamespace(
        residual_channels=c, residual_layers=layers,
        dilation_cycle_length=cycle, n_mels=80,
        noise_schedule=np.linspace(1e-4, 0.05, 50),
    )
    tm = TorchDiffWave(None, P).eval()
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.3, 0.3, generator=g)

    params = {
        "input_projection": _conv1(tm.input_projection),
        "diffusion_embedding": {
            "proj1": {"kernel": _lin(tm.diffusion_embedding.projection1.weight),
                      "bias": _np(tm.diffusion_embedding.projection1.bias)},
            "proj2": {"kernel": _lin(tm.diffusion_embedding.projection2.weight),
                      "bias": _np(tm.diffusion_embedding.projection2.bias)},
        },
        "skip_projection": _conv1(tm.skip_projection),
        "output_projection": _conv1(tm.output_projection),
    }
    for i, layer in enumerate(tm.residual_layers):
        params[f"res{i}"] = {
            "dilated_conv": _conv1(layer.dilated_conv),
            "diffusion_projection": {
                "kernel": _lin(layer.diffusion_projection.weight),
                "bias": _np(layer.diffusion_projection.bias),
            },
            "conditioner_projection": _conv1(layer.conditioner_projection),
            "output_projection": _conv1(layer.output_projection),
        }

    model = DiffWave(residual_channels=c, residual_layers=layers,
                     dilation_cycle_length=cycle, num_steps=50)
    b = len(t_vec)
    audio = rng.standard_normal((b, 800)).astype(np.float32)
    init = rng.standard_normal((b, 800)).astype(np.float32)
    tv = np.asarray(t_vec, np.int64 if as_int else np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                           jnp.asarray(init), jnp.asarray(tv))

    import jax.tree_util as jtu

    got = {tuple(str(k.key) for k in p): v.shape
           for p, v in jtu.tree_flatten_with_path(variables["params"])[0]}
    want = {tuple(str(k.key) for k in p): np.asarray(v).shape
            for p, v in jtu.tree_flatten_with_path(params)[0]}
    assert got.keys() == want.keys(), (
        sorted(set(got) - set(want))[:6], sorted(set(want) - set(got))[:6])
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])

    cast = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out = model.apply({"params": cast}, jnp.asarray(audio), jnp.asarray(init),
                      jnp.asarray(tv), mutable=False)
    with torch.no_grad():
        tout = tm(torch.from_numpy(audio), torch.from_numpy(init),
                  torch.from_numpy(tv))
    np.testing.assert_allclose(np.asarray(out), tout.numpy()[:, 0],
                               atol=3e-4, rtol=1e-3)
