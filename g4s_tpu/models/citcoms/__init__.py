from g4s_tpu.models.citcoms.config import (  # noqa: F401
    CitcomConfig, load_config, parse_flat_config, config_from_table,
)
from g4s_tpu.models.citcoms.mesh import (  # noqa: F401
    RegionalMesh, build_regional_mesh, initial_temperature,
)
from g4s_tpu.models.citcoms.driver import CitcomModel, State  # noqa: F401
