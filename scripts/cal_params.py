"""Parameter counts for every registered model (working replacement for
the reference's broken ``scripts/calParamsNum.py``, which imports an
absent ``guided_diffusion`` package).

Usage: python scripts/cal_params.py
"""


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import prior_diffuse_tpu.models  # noqa: F401
    from prior_diffuse_tpu.registry import MODELS

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 5, 161, 2))
    mag = jnp.zeros((1, 5, 161))
    t = jnp.zeros((1,))
    wav = jnp.zeros((1, 800))
    for name in MODELS:
        ctor = MODELS.get(name)
        model = ctor()
        try:
            if name == "GRN":
                variables = model.init(key, mag)
            elif name == "DiffUNet1":
                variables = model.init(key, x, x, t)
            elif name == "Nocon":
                variables = model.init(key, x, t)
            elif name == "DiffWave":
                variables = model.init(key, wav, wav, t)
            else:
                variables = model.init(key, x)
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
            print(f"{name:28s} {n:>12,d} params")
        except Exception as e:  # keep going: this is a report, not a test
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
