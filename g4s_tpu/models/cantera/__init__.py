from g4s_tpu.models.cantera.mech import Mechanism, load_mechanism, R_GAS, P_REF  # noqa: F401
from g4s_tpu.models.cantera.kinetics import (  # noqa: F401
    build_kinetics, net_production_rates, rates_of_progress,
    forward_rate_constants, equilibrium_constants,
)
from g4s_tpu.models.cantera.thermo import (  # noqa: F401
    GasState, cp0_R, h0_RT, s0_R, rk_mix, rk_molar_volume, rk_pressure,
    pr_mix, pr_molar_volume, pr_pressure, pr_departures,
)
from g4s_tpu.models.cantera.reactor import (  # noqa: F401
    IdealGasConstPressureReactor, IdealGasConstVolumeReactor,
)
from g4s_tpu.models.cantera.network import (  # noqa: F401
    ReactorNet, Reservoir, Wall, MassFlowController, Valve,
)
from g4s_tpu.models.cantera.shock_tube import (  # noqa: F401
    ShockTubeBenchmark, ignition_delay, stoich_mixture, NTC_TEMPERATURES,
)
from g4s_tpu.models.cantera.equilibrium import equilibrate_tp  # noqa: F401
from g4s_tpu.models.cantera.solution_array import SolutionArray  # noqa: F401
from g4s_tpu.models.cantera.transport import (  # noqa: F401
    load_transport, mixture_viscosity, thermal_conductivity,
    mixture_diffusion_coeffs,
)
from g4s_tpu.models.cantera.surface import (  # noqa: F401
    InterfaceKinetics, SurfacePhase, load_interface,
    net_production_rates_interface, advance_coverages)
from g4s_tpu.models.cantera.electrolyte import (  # noqa: F401
    DebyeHuckelPhase, load_debye_huckel,
    molality_activity_coefficients, ionic_strength)
