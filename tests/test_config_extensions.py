"""The opt-in diffusion extensions must be reachable from the user
config surface (YAML -> DiffusionConfig) and default to exact
reference semantics when absent."""

from prior_diffuse_tpu.config import DiffusionConfig, experiment_from_dict


def test_yaml_defaults_are_reference_semantics():
    exp = experiment_from_dict({"train": {"batch_size": 3}})
    d = exp.diffusion
    assert d.cond_noisy is False
    assert d.train_t_fast is False
    assert d.n_avg == 1
    assert d.zero_init is False
    assert d.predict == "eps"
    assert d.x0_leak_drop == 0.0
    assert d.scale_c == 11.0
    assert d.gamma0_override == 0.2


def test_yaml_routes_extension_knobs():
    exp = experiment_from_dict(
        {"diffusion": {"n_avg": 8, "cond_noisy": True, "train_t_fast": True,
                       "zero_init": True, "predict": "x0",
                       "x0_leak_drop": 0.5}}
    )
    assert exp.diffusion.n_avg == 8
    assert exp.diffusion.predict == "x0"
    assert exp.diffusion.x0_leak_drop == 0.5
    assert exp.diffusion.zero_init is True
    assert exp.diffusion.cond_noisy is True
    assert exp.diffusion.train_t_fast is True
    # untouched knobs keep reference values
    assert exp.diffusion.num_steps == len(DiffusionConfig().noise_schedule)


def test_yaml_ignores_unknown_keys():
    exp = experiment_from_dict({"diffusion": {"not_a_knob": 1}})
    assert exp.diffusion == DiffusionConfig()
