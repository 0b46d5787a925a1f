from g4s_tpu.parallel.mesh import make_mesh, device_mesh_shape  # noqa: F401
from g4s_tpu.parallel.halo import (  # noqa: F401
    halo_exchange_add, halo_exchange_axis, halo_copy_ghost,
)
from g4s_tpu.parallel.collectives import pdot, pnorm2, pmax, pmin, psum_scalar  # noqa: F401
