#!/bin/sh
# The <10-minute smoke tier: kernel/core correctness only (sparse
# containers + IO, segment/shift/route primitives, SpMV variants incl.
# Pallas layouts on CPU-interpret, ESC SpGEMM incl. the device plan,
# engine dispatch, collectives on the virtual 8-device mesh, core
# cantera thermo/kinetics, deepmd descriptors).
#
# Tiers:
#   tests/smoke.sh                                   ~8 min, this list
#   pytest tests/ -m "not slow and not isolated"     ~35 min mid tier
#   pytest tests/ -q                                 full suite (everything;
#       the isolated df64/exchanger compiles run via subprocess wrappers)
set -e
cd "$(dirname "$0")/.."
JAX_PLATFORMS=cpu exec python -m pytest -q \
    tests/test_sparse.py tests/test_ops.py tests/test_shifts.py \
    tests/test_route.py tests/test_banded.py tests/test_stream_spmv.py \
    tests/test_spgemm_esc.py tests/test_parallel.py \
    tests/test_cantera.py::TestMechanism tests/test_cantera.py::TestThermo tests/test_cantera.py::TestKinetics \
    tests/test_cantera.py::TestNasa9 \
    tests/test_deepmd.py::TestDescriptor \
    -m "not slow and not isolated" "$@"
