from g4s_tpu.models.deepmd.descriptor import DescriptorSpec, env_mat, compute_stats  # noqa: F401
from g4s_tpu.models.deepmd.model import (  # noqa: F401
    ModelSpec, init_params, total_energy, energy_force_virial,
)
from g4s_tpu.models.deepmd.data import DataSystem, load_system  # noqa: F401
from g4s_tpu.models.deepmd.train import (  # noqa: F401
    Trainer, LossConfig, LRConfig, make_dp_train_step,
)
from g4s_tpu.models.deepmd.freeze import freeze, load_frozen  # noqa: F401

WATER_SPEC = ModelSpec(
    DescriptorSpec(rcut=6.0, rcut_smth=0.5, sel=(46, 92), ntypes=2),
    embed_neurons=(25, 50, 100), axis_neuron=16,
    fit_neurons=(240, 240, 240))
from g4s_tpu.models.deepmd.infer import DeepPot, calc_model_devi  # noqa: F401
