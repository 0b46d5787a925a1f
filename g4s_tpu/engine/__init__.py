from g4s_tpu.engine.semiring import Semiring, PLUS_TIMES, MIN_PLUS, MAX_PLUS, OR_AND  # noqa: F401
from g4s_tpu.engine.dispatch import mxv, vxm, mxm, reduce_vector, Graph, build_graph  # noqa: F401
from g4s_tpu.engine.gas import gather_apply, spmm_dense  # noqa: F401
from g4s_tpu.engine.matmul import dense_matmul  # noqa: F401
from g4s_tpu.engine.operator import (  # noqa: F401
    OperatorGraph, apply_operator, build_operator, register_operator_variant)
