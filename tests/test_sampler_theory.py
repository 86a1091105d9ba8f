"""Sampling-semantics theory, pinned to the *actual* sampler.

For a Gaussian residual ``r | cond ~ N(m, I)`` the eps-prediction
training optimum (minimizer of the reference's DDPM objective,
``trainer/complex_ddpm_trainer.py:707-733``) is available in closed
form:

    eps*(x_n, n) = sqrt(1 - abar_n) * (x_n - sqrt(abar_n) * m)

With the deterministic reverse chain the reference actually runs
(``new_sigma == 0``, SURVEY 2.9) every update becomes affine and the
whole chain telescopes exactly:

    out = sqrt(abar) * x_T + (1 - abar) * m,   abar = alpha_cum[-1]

(update x' = c1*(x - c2*eps*) = sqrt(alpha_n)*x + beta_n/sqrt(alpha_n)
 * sqrt(abar_n)*m; the x-coefficients multiply to sqrt(abar) and the
 m-coefficients telescope as sum(beta_n * abar_{n-1}) = 1 - abar.)

These tests pin that law and the capability-study corollaries
(docs/residual_capability_r3.md): with e_m = predictable residual
energy and e_u = 1 unpredictable,

    prior MSE              =  e_m + 1
    chain  (reference)     =  abar^2*e_m + abar + 1
    chain  (n_avg = N)     =  abar^2*e_m + abar/N + 1
    chain  (zero_init)     =  abar^2*e_m + 1   <=  prior MSE always

so at the training optimum the reference's sample semantics only wins
when e_m > abar/(1-abar^2) (~0.44 for the default fast schedule), the
n_avg extension shrinks the random penalty by 1/N, and the zero_init
extension is never worse than prior-only.

The ``predict="x0"`` parameterization adds a second exact law.  Its
per-step conversion ``eps = (x - sqrt(ab)*x0_hat)/sqrt(1 - ab)`` makes
the chain *identical* to the eps chain whenever the two nets are
inverses of each other (in particular at the shared training optimum).
But for a net that ignores ``x_t`` and emits a constant ``x0_hat = m``
— the conditional mean, i.e. exactly what the supervised
predictability probe learns, and the natural mean-collapsed state of an
under-trained conditional net — the chain telescopes to

    out = 0 * x_T + 1 * m        (exactly)

because the final (lowest-noise) step has ``1 - abar_0 = beta_0``, so
its x-coefficient ``c1*(1 - beta/(1 - abar))`` vanishes identically and
the step just emits ``x0_hat``.  A mean-collapsed x0 net therefore
yields the exact posterior-mean residual — chain MSE = e_u <= prior MSE
= e_m + e_u for every split, with no random-draw penalty, no n_avg
averaging, and no off-manifold zero_init input needed.  This is the law
that lets probe-level predictability (docs/residual_capability_r3.md
E8: val cos 0.23 that the eps chain never transfers) reach the output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prior_diffuse_tpu.config import DiffusionConfig
from prior_diffuse_tpu.diffusion import inference_schedule, reverse_sample

SCHED = inference_schedule(DiffusionConfig(), fast_sampling=True)
ABAR = float(SCHED.alpha_cum[-1])
A = np.sqrt(ABAR)  # coefficient on the initial draw x_T
B = 1.0 - ABAR  # coefficient on the predictable mean m


def optimal_model(m):
    """Closed-form training optimum for r ~ N(m, I) (eps prediction)."""
    t_grid = jnp.asarray(SCHED.T, jnp.float32)
    ac_grid = jnp.asarray(SCHED.alpha_cum, jnp.float32)

    def model_fn(x, t_vec):
        n = jnp.argmin(jnp.abs(t_grid - t_vec[0]))
        ac = ac_grid[n]
        return jnp.sqrt(1.0 - ac) * (x - jnp.sqrt(ac) * m)

    return model_fn


def test_affine_coefficients_telescope():
    """The host-side recursion over the schedule constants reproduces
    the closed forms A = sqrt(abar), B = 1 - abar."""
    a_coef, b_coef = 1.0, 0.0
    for n in range(SCHED.num_steps - 1, -1, -1):
        a_n = SCHED.c1[n] * (1.0 - SCHED.beta[n])
        b_n = SCHED.c1[n] * SCHED.beta[n] * np.sqrt(SCHED.alpha_cum[n])
        a_coef, b_coef = a_n * a_coef, a_n * b_coef + b_n
    assert a_coef == pytest.approx(A, rel=1e-12)
    assert b_coef == pytest.approx(B, rel=1e-12)


def test_optimal_chain_is_affine_in_xT_and_m():
    key = jax.random.PRNGKey(0)
    shape = (4, 8, 8, 2)
    m = jax.random.normal(jax.random.PRNGKey(1), shape)
    out = reverse_sample(optimal_model(m), key, None, shape, SCHED,
                         mode="conditional")
    # replicate the sampler's initial draw (sampler.py: split, normal)
    init_rng, _ = jax.random.split(key)
    x_t = jax.random.normal(init_rng, shape)
    expect = A * x_t + B * m
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-5)


def test_zero_init_emits_scaled_mean_exactly():
    shape = (2, 8, 8, 2)
    m = jax.random.normal(jax.random.PRNGKey(2), shape)
    out = reverse_sample(optimal_model(m), jax.random.PRNGKey(0), None,
                         shape, SCHED, mode="conditional", zero_init=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(B * m),
                               atol=2e-5)
    # and n_avg is irrelevant once the initial draw is fixed
    out8 = reverse_sample(optimal_model(m), jax.random.PRNGKey(0), None,
                          shape, SCHED, mode="conditional", zero_init=True,
                          n_avg=8)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out), atol=0)


def test_zero_init_deltamu_starts_at_x_init():
    """deltamu mode draws x_T ~ N(x_init, I); zero_init collapses that
    to exactly x_init (the mean), keeping the mode's no-final-add
    semantics."""
    shape = (2, 8, 8, 2)
    x_init = jax.random.normal(jax.random.PRNGKey(11), shape)
    m = jnp.zeros(shape)
    out = reverse_sample(optimal_model(m), jax.random.PRNGKey(0), x_init,
                         shape, SCHED, mode="deltamu", zero_init=True)
    # affine law with x_T := x_init and m = 0: out = A * x_init
    np.testing.assert_allclose(np.asarray(out), A * np.asarray(x_init),
                               atol=2e-5)


def _mses(e_m, key, n_avg=1, zero_init=False, n=16384):
    """Monte-Carlo prior/chain MSE for r = m + u, m~N(0,e_m), u~N(0,1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (n,)
    m = jnp.sqrt(e_m) * jax.random.normal(k1, shape)
    u = jax.random.normal(k2, shape)
    r = m + u
    out = reverse_sample(optimal_model(m), k3, None, shape, SCHED,
                         mode="conditional", n_avg=n_avg,
                         zero_init=zero_init)
    prior_mse = float(jnp.mean(r**2))  # prior leaves the whole residual
    chain_mse = float(jnp.mean((out - r) ** 2))
    return prior_mse, chain_mse


def test_reference_semantics_mse_floor_when_unpredictable():
    """e_m = 0: chain MSE = (1 + abar) x prior MSE — the deterministic
    sample chain is structurally harmful on unpredictable residuals."""
    prior, chain = _mses(0.0, jax.random.PRNGKey(3))
    assert chain / prior == pytest.approx(1.0 + ABAR, rel=0.05)
    assert chain > prior * 1.25


def test_reference_semantics_win_requires_predictability():
    # e_m = 1 > abar/(1-abar^2) ~ 0.44: the chain must win
    prior, chain = _mses(1.0, jax.random.PRNGKey(4))
    assert chain == pytest.approx(ABAR**2 + ABAR + 1.0, rel=0.05)
    assert chain < prior
    # e_m = 0.2 < 0.44: the chain must lose even at the optimum
    prior, chain = _mses(0.2, jax.random.PRNGKey(5))
    assert chain == pytest.approx(ABAR**2 * 0.2 + ABAR + 1.0, rel=0.05)
    assert chain > prior


def test_n_avg_shrinks_the_random_penalty():
    prior, chain = _mses(0.0, jax.random.PRNGKey(6), n_avg=8)
    assert chain == pytest.approx(1.0 + ABAR / 8, rel=0.05)
    assert chain < prior * 1.10  # near-harmless where n_avg=1 pays 1.376x


def test_zero_init_never_worse_than_prior():
    for e_m, key in [(0.0, 7), (0.2, 8), (1.0, 9)]:
        prior, chain = _mses(e_m, jax.random.PRNGKey(key), zero_init=True)
        assert chain == pytest.approx(ABAR**2 * e_m + 1.0, rel=0.05)
        assert chain <= prior * 1.02
    # and where reference semantics loses (e_m = 0.2), zero_init wins
    prior, chain = _mses(0.2, jax.random.PRNGKey(10), zero_init=True)
    assert chain < prior


def optimal_model_x0(m):
    """The x0-parameterized twin of :func:`optimal_model` — its exact
    inverse under the sampler's conversion, so the chains must match."""
    t_grid = jnp.asarray(SCHED.T, jnp.float32)
    ac_grid = jnp.asarray(SCHED.alpha_cum, jnp.float32)
    eps_fn = optimal_model(m)

    def model_fn(x, t_vec):
        n = jnp.argmin(jnp.abs(t_grid - t_vec[0]))
        ac = ac_grid[n]
        return (x - jnp.sqrt(1.0 - ac) * eps_fn(x, t_vec)) / jnp.sqrt(ac)

    return model_fn


def test_x0_chain_equals_eps_chain_at_the_optimum():
    """predict='x0' with the inverse net runs the *identical* chain —
    pins the conversion constants to the update's own schedule."""
    key = jax.random.PRNGKey(12)
    shape = (3, 8, 8, 2)
    m = jax.random.normal(jax.random.PRNGKey(13), shape)
    out_eps = reverse_sample(optimal_model(m), key, None, shape, SCHED,
                             mode="conditional")
    out_x0 = reverse_sample(optimal_model_x0(m), key, None, shape, SCHED,
                            mode="conditional", predict="x0")
    np.testing.assert_allclose(np.asarray(out_x0), np.asarray(out_eps),
                               atol=1e-5)


def test_x0_mean_collapsed_net_emits_posterior_mean_exactly():
    """A constant net x0_hat = m (what the supervised probe learns)
    telescopes to out = m exactly: the final step's x-coefficient is
    identically zero because 1 - abar_0 = beta_0."""
    shape = (2, 8, 8, 2)
    m = jax.random.normal(jax.random.PRNGKey(14), shape)
    const_net = lambda x, t: jnp.broadcast_to(m, x.shape)
    out_a = reverse_sample(const_net, jax.random.PRNGKey(0), None, shape,
                           SCHED, mode="conditional", predict="x0")
    out_b = reverse_sample(const_net, jax.random.PRNGKey(99), None, shape,
                           SCHED, mode="conditional", predict="x0")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(m), atol=1e-5)
    # the initial draw leaves no trace at all
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5)


def test_x0_mean_collapsed_chain_never_worse_than_prior():
    """MSE corollary: chain MSE = e_u for every predictable split —
    strictly below prior MSE = e_m + e_u whenever e_m > 0."""
    for e_m, seed in [(0.0, 15), (0.055, 16), (1.0, 17)]:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        n = 16384
        m = jnp.sqrt(e_m) * jax.random.normal(k1, (n,))
        u = jax.random.normal(k2, (n,))
        r = m + u
        const_net = lambda x, t: jnp.broadcast_to(m, x.shape)
        out = reverse_sample(const_net, k3, None, (n,), SCHED,
                             mode="conditional", predict="x0")
        prior_mse = float(jnp.mean(r**2))
        chain_mse = float(jnp.mean((out - r) ** 2))
        assert chain_mse == pytest.approx(1.0, rel=0.05)  # = e_u
        assert chain_mse <= prior_mse * 1.02
        if e_m > 0:
            assert chain_mse < prior_mse


def test_unroll_rolled_and_auto_identical():
    """Auto-unroll (sampler.py: unroll=0 fully unrolls schedules <= 8
    steps, keeps the rolled scan otherwise) is a codegen choice only —
    outputs must be bit-compatible across unroll settings, on both the
    6-step fast schedule (auto -> unrolled) and the 50-step full
    schedule (auto -> rolled, the branch no other test reaches now)."""
    shape = (2, 8, 8, 2)
    m = jax.random.normal(jax.random.PRNGKey(21), shape)
    full = inference_schedule(DiffusionConfig(), fast_sampling=False)
    assert full.num_steps > 8  # guards the rolled branch really runs
    for sched in (SCHED, full):
        outs = [
            reverse_sample(optimal_model_for(sched, m),
                           jax.random.PRNGKey(3), None, shape, sched,
                           mode="conditional", unroll=u)
            for u in (0, 1, sched.num_steps)
        ]
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(outs[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(outs[2]), atol=1e-6)


def optimal_model_for(sched, m):
    """optimal_model generalized to an arbitrary schedule."""
    t_grid = jnp.asarray(sched.T, jnp.float32)
    ac_grid = jnp.asarray(sched.alpha_cum, jnp.float32)

    def model_fn(x, t_vec):
        n = jnp.argmin(jnp.abs(t_grid - t_vec[0]))
        ac = ac_grid[n]
        return jnp.sqrt(1.0 - ac) * (x - jnp.sqrt(ac) * m)

    return model_fn


def _affine_leak_optimum(Es, Es2, e_m, e_u):
    """Per-noise-level least-squares optimum of x0_hat = w*x + b*m under
    the leak-drop training distribution x = sqrt(ab)*s*r + sqrt(1-ab)*eps
    with r = m + u, m ~ N(0, e_m), u ~ N(0, e_u), and signal scale s
    having the given first two moments (qsample.py leak_drop)."""
    sr2 = e_m + e_u
    ws, bs = [], []
    for ab in SCHED.alpha_cum:
        s_xx = ab * Es2 * sr2 + (1.0 - ab)
        s_xm = np.sqrt(ab) * Es * e_m
        c_x = np.sqrt(ab) * Es * sr2
        if e_m == 0.0:
            w, b = c_x / s_xx, 0.0
        else:
            w, b = np.linalg.solve(
                np.array([[s_xx, s_xm], [s_xm, e_m]]), [c_x, e_m]
            )
        ws.append(w)
        bs.append(b)
    return np.asarray(ws, np.float32), np.asarray(bs, np.float32)


def _leak_chain_mse(Es, Es2, e_m, e_u=1.0, n=65536, seed=30):
    ws, bs = _affine_leak_optimum(Es, Es2, e_m, e_u)
    t_grid = jnp.asarray(SCHED.T, jnp.float32)
    wj, bj = jnp.asarray(ws), jnp.asarray(bs)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    m = jnp.sqrt(e_m) * jax.random.normal(k1, (n,))
    u = jnp.sqrt(e_u) * jax.random.normal(k2, (n,))
    r = m + u

    def net(x, t_vec):
        i = jnp.argmin(jnp.abs(t_grid - t_vec[0]))
        return wj[i] * x + bj[i] * m

    out = reverse_sample(net, k3, None, (n,), SCHED, mode="conditional",
                         predict="x0")
    return float(jnp.mean(r**2)), float(jnp.mean((out - r) ** 2))


def test_leak_drop_hard_p1_optimum_dominates_prior_and_reference():
    """x0_leak_drop=1.0 (hard drop): the training optimum has w = 0,
    b = 1 — a posterior-mean regressor — and the unchanged sampler
    emits it exactly, so chain MSE = e_u, strictly below BOTH the prior
    (e_m + e_u) and the reference-semantics chain
    (abar^2*e_m + abar + e_u) whenever e_m > 0.  This is the law the
    DiffusionConfig.x0_leak_drop extension rides."""
    # hard drop p=1: s = 0 always -> E[s] = E[s^2] = 0
    ws, bs = _affine_leak_optimum(0.0, 0.0, e_m=0.2, e_u=1.0)
    np.testing.assert_allclose(ws, 0.0, atol=1e-12)
    np.testing.assert_allclose(bs, 1.0, atol=1e-12)
    for e_m in (0.055, 0.2, 1.0):
        prior, chain = _leak_chain_mse(0.0, 0.0, e_m)
        assert chain == pytest.approx(1.0, rel=0.05)  # = e_u
        assert chain < prior
        ref_chain = ABAR**2 * e_m + ABAR + 1.0
        assert chain < ref_chain
    # e_m = 0.2 is a regime where reference semantics LOSES to the
    # prior (test_reference_semantics_win_requires_predictability) but
    # the leak-drop chain still wins — capability the reference lacks.


def test_leak_drop_soft_attenuation_is_miscalibrated():
    """Why the drop is hard: the sampler's conversion
    eps = (x - sqrt(ab)*x0_hat)/sqrt(1-ab) assumes x0_hat estimates the
    signal at FULL scale.  The affine optimum under soft U[0,1)
    attenuation (E[s]=1/2, E[s^2]=1/3) is shrunk against that
    convention and its chain runs WORSE than the prior — soft
    attenuation would be a footgun, hence qsample.py zeroes."""
    for e_m in (0.2, 1.0):
        prior, chain = _leak_chain_mse(0.5, 1.0 / 3.0, e_m)
        assert chain > prior * 1.2


def test_leak_drop_zero_moments_recover_reference_optimum():
    """p=0 (s=1 surely): the affine optimum's chain matches the closed
    form of the shared eps/x0 training optimum — abar^2*e_m + abar +
    e_u — i.e. leak_drop off really is reference semantics."""
    for e_m in (0.2, 1.0):
        prior, chain = _leak_chain_mse(1.0, 1.0, e_m)
        assert chain == pytest.approx(ABAR**2 * e_m + ABAR + 1.0, rel=0.05)
