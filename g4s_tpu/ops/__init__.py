from g4s_tpu.ops.segment import segment_sum, sorted_segment_sum  # noqa: F401
from g4s_tpu.ops.blas2 import gemv, symv, trmv, spmv_packed, pack_symmetric  # noqa: F401
from g4s_tpu.ops.spmv import (  # noqa: F401
    spmv_ell, spmv_sell, spmv_csr, spmv_dia, spmv, spmv_dense_rows,
)
from g4s_tpu.ops.spgemm import (  # noqa: F401
    spgemm, spgemm_plan, spgemm_flops, SpGEMMPlan,
)
from g4s_tpu.ops.spgemm_esc import (  # noqa: F401
    ESCPlan, EscFamily, esc_numeric, esc_plan, esc_plan_device_family,
    spgemm_esc, spgemm_esc_col,
)
from g4s_tpu.ops.spgemm_block import (  # noqa: F401
    BlockPlan, block_cover, block_numeric, block_plan, spgemm_block,
)
