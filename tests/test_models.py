"""Model-zoo structural parity tests.

Parameter-count oracles were measured by instantiating the reference's
torch models (sum of p.numel() over parameters; buffers excluded):

  GCRN                      9,771,340
  GRN                       3,131,731
  aia_complex_trans_ri      1,179,030
  dual_aia_trans_merge_crm  2,810,859
  dual_aia_complex_trans    2,085,935
  aia_complex_trans_mag       906,905
  DiffUNet                  1,662,565   (matches in-code comment)
  DiffUNet1                 2,780,273   (in-code comment 1,258,371 is stale)
  Nocon                     2,780,263

Shape oracle: every complex model maps [B, 2, 11, 161] -> same shape in
the reference; ours use [B, 11, 161, 2].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prior_diffuse_tpu import models as M


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _init(model, *args):
    variables = model.init(jax.random.PRNGKey(0), *args)
    return variables


B, T, F = 2, 11, 161
X = jnp.zeros((B, T, F, 2))
MAG = jnp.zeros((B, T, F))
TV = jnp.asarray([3.7, 1.2], jnp.float32)


@pytest.mark.parametrize(
    "name,expected",
    [
        ("GCRN", 9_771_340),
        ("DiffUNet", 1_662_565),
        ("aia_complex_trans_ri", 1_179_030),
        ("dual_aia_trans_merge_crm", 2_810_859),
        ("dual_aia_complex_trans", 2_085_935),
        ("aia_complex_trans_mag", 906_905),
    ],
)
def test_complex_model_params_and_shape(name, expected):
    from prior_diffuse_tpu.registry import MODELS

    model = MODELS.get(name)()
    variables = _init(model, X)
    assert n_params(variables["params"]) == expected
    out = model.apply(variables, X, mutable=False)
    assert out.shape == (B, T, F, 2)


def test_grn_params_and_shape():
    model = M.GRN()
    variables = _init(model, MAG)
    assert n_params(variables["params"]) == 3_131_731
    out = model.apply(variables, MAG, mutable=False)
    assert out.shape == (B, T, F)


def test_diffunet1_params_and_shape():
    model = M.DiffUNet1()
    variables = _init(model, X, X, TV)
    assert n_params(variables["params"]) == 2_780_273
    out = model.apply(variables, X, X, TV, mutable=False)
    assert out.shape == (B, T, F, 2)


def test_nocon_params_and_shape():
    model = M.Nocon()
    variables = _init(model, X, TV)
    assert n_params(variables["params"]) == 2_780_263
    out = model.apply(variables, X, TV, mutable=False)
    assert out.shape == (B, T, F, 2)


def test_diffunet1_integer_and_fractional_t(rng):
    model = M.DiffUNet1()
    x = jnp.asarray(rng.standard_normal((1, 5, 161, 2)).astype(np.float32))
    variables = _init(model, x, x, jnp.asarray([0.0]))
    out_f = model.apply(variables, x, x, jnp.asarray([3.0]), mutable=False)
    out_i = model.apply(variables, x, x, jnp.asarray([3], jnp.int32), mutable=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_i), atol=1e-5)
    # fractional t interpolates between neighbors
    out_mid = model.apply(variables, x, x, jnp.asarray([3.5]), mutable=False)
    assert not np.allclose(np.asarray(out_mid), np.asarray(out_i))


def test_diffwave_shape(rng):
    model = M.DiffWave(residual_layers=4)
    a = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    variables = _init(model, a, a, TV)
    out = model.apply(variables, a, a, TV, mutable=False)
    assert out.shape == (2, 800)


def test_batchnorm_updates_running_stats():
    model = M.GCRN()
    variables = _init(model, X)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, X + 1.0, train=True, mutable=["batch_stats"]
    )
    # at least one running mean moved
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
