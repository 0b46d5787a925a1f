"""The C embedding API (runtime/native/capi.c) — the role of Cantera's
clib and DeePMD's api_c/api_cc native surfaces: a plain-C program links
libg4s_capi.so and evaluates models without touching Python source."""

import os
import shutil
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end tier; smoke = -m 'not slow and not isolated'

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

C_MAIN = r"""
#include <stdio.h>
extern int g4s_init(const char*);
extern int g4s_deeppot_load(const char*);
extern int g4s_deeppot_eval(int, int, const double*, const double*,
                            const int*, double*, double*, double*);
int main(int argc, char** argv) {
  if (g4s_init(argv[1])) return 1;
  int h = g4s_deeppot_load(argv[2]);
  if (h < 0) return 2;
  enum { N = 6 };
  double coord[N * 3] = {0,0,0, 0.96,0,0, -0.24,0.93,0,
                         4,4,4, 4.96,4,4, 3.76,4.93,4};
  double box[9] = {8,0,0, 0,8,0, 0,0,8};
  int types[N] = {0,1,1,0,1,1};
  double e, f[N * 3], v[9];
  if (g4s_deeppot_eval(h, N, coord, box, types, &e, f, v)) return 3;
  printf("CAPI_OK e=%.8f f0=%.8f\n", e, f[0]);
  return 0;
}
"""


@pytest.mark.slow
def test_c_program_evaluates_deeppot(tmp_path):
    gcc = shutil.which("gcc") or shutil.which("cc")
    pycfg = shutil.which("python3-config")
    if gcc is None or pycfg is None:
        pytest.skip("no C toolchain")

    # a tiny frozen model
    from g4s_tpu.models.deepmd import WATER_SPEC, init_params
    from g4s_tpu.models.deepmd.freeze import freeze
    import jax
    params = init_params(jax.random.PRNGKey(0), WATER_SPEC,
                         dtype=jnp.float32)
    frozen = tmp_path / "tiny_frozen.npz"
    freeze(params, WATER_SPEC, str(frozen))

    inc = subprocess.run([pycfg, "--includes"], capture_output=True,
                         text=True, check=True).stdout.split()
    ld = subprocess.run([pycfg, "--ldflags", "--embed"], capture_output=True,
                        text=True, check=True).stdout.split()
    so = tmp_path / "libg4s_capi.so"
    subprocess.run([gcc, "-shared", "-fPIC",
                    os.path.join(REPO, "g4s_tpu", "runtime", "native",
                                 "capi.c"),
                    "-o", str(so)] + inc + ld, check=True,
                   capture_output=True)
    main_c = tmp_path / "main.c"
    main_c.write_text(C_MAIN)
    exe = tmp_path / "capi_test"
    subprocess.run([gcc, str(main_c), "-o", str(exe),
                    f"-L{tmp_path}", "-lg4s_capi"] + ld, check=True,
                   capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=str(tmp_path))
    out = subprocess.run([str(exe), REPO, str(frozen)], env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("CAPI_OK")]
    assert line, out.stdout
    e = float(line[0].split("e=")[1].split()[0])
    assert np.isfinite(e)

    # oracle: the same model through the Python API gives the same energy
    from g4s_tpu.models.deepmd.freeze import load_frozen
    from g4s_tpu.models.deepmd.infer import DeepPot
    pot = DeepPot(str(frozen))
    coord = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
                      [4, 4, 4], [4.96, 4, 4], [3.76, 4.93, 4]])
    e_py, _, _ = pot.eval(coord, np.eye(3) * 8.0,
                          np.array([0, 1, 1, 0, 1, 1], np.int32))
    np.testing.assert_allclose(e, float(np.asarray(e_py)), rtol=1e-6)


C_MD_MAIN = r"""
#include <stdio.h>
extern int g4s_init(const char*);
extern int g4s_deeppot_load(const char*);
extern int g4s_deeppot_eval(int, int, const double*, const double*,
                            const int*, double*, double*, double*);
/* The MD-engine embedding pattern of the reference's LAMMPS/GROMACS
 * plugins (source/lmp/pair_deepmd.cpp:388 compute, source/gmx): the
 * engine owns positions/velocities and calls the potential once per
 * step for forces. Velocity Verlet, unit masses. */
int main(int argc, char** argv) {
  if (g4s_init(argv[1])) return 1;
  int h = g4s_deeppot_load(argv[2]);
  if (h < 0) return 2;
  enum { N = 6, STEPS = 5 };
  double x[N * 3] = {0,0,0, 0.96,0,0, -0.24,0.93,0,
                     4,4,4, 4.96,4,4, 3.76,4.93,4};
  double vel[N * 3] = {0};
  double box[9] = {8,0,0, 0,8,0, 0,0,8};
  int types[N] = {0,1,1,0,1,1};
  double e, f[N * 3], fnew[N * 3], v[9];
  double dt = 0.0005;
  if (g4s_deeppot_eval(h, N, x, box, types, &e, f, v)) return 3;
  for (int s = 0; s < STEPS; ++s) {
    for (int i = 0; i < N * 3; ++i)
      x[i] += vel[i] * dt + 0.5 * f[i] * dt * dt;
    if (g4s_deeppot_eval(h, N, x, box, types, &e, fnew, v)) return 4;
    for (int i = 0; i < N * 3; ++i) {
      vel[i] += 0.5 * (f[i] + fnew[i]) * dt;
      f[i] = fnew[i];
    }
  }
  printf("CAPI_MD_OK e=%.10f x0=%.10f x7=%.10f\n", e, x[0], x[7]);
  return 0;
}
"""


@pytest.mark.slow
def test_c_md_engine_embedding(tmp_path):
    """An MD engine written in C drives the potential step-by-step
    through the C API (the pair_deepmd.cpp / gmx plugin call pattern);
    the trajectory must match the identical integrator in Python."""
    gcc = shutil.which("gcc") or shutil.which("cc")
    pycfg = shutil.which("python3-config")
    if gcc is None or pycfg is None:
        pytest.skip("no C toolchain")

    from g4s_tpu.models.deepmd import WATER_SPEC, init_params
    from g4s_tpu.models.deepmd.freeze import freeze
    import jax
    params = init_params(jax.random.PRNGKey(0), WATER_SPEC,
                         dtype=jnp.float32)
    frozen = tmp_path / "tiny_frozen.npz"
    freeze(params, WATER_SPEC, str(frozen))

    inc = subprocess.run([pycfg, "--includes"], capture_output=True,
                         text=True, check=True).stdout.split()
    ld = subprocess.run([pycfg, "--ldflags", "--embed"], capture_output=True,
                        text=True, check=True).stdout.split()
    so = tmp_path / "libg4s_capi.so"
    subprocess.run([gcc, "-shared", "-fPIC",
                    os.path.join(REPO, "g4s_tpu", "runtime", "native",
                                 "capi.c"),
                    "-o", str(so)] + inc + ld, check=True,
                   capture_output=True)
    main_c = tmp_path / "md_main.c"
    main_c.write_text(C_MD_MAIN)
    exe = tmp_path / "capi_md"
    subprocess.run([gcc, str(main_c), "-o", str(exe),
                    f"-L{tmp_path}", "-lg4s_capi"] + ld, check=True,
                   capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=str(tmp_path))
    out = subprocess.run([str(exe), REPO, str(frozen)], env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines()
            if l.startswith("CAPI_MD_OK")]
    assert line, out.stdout
    e_c = float(line[0].split("e=")[1].split()[0])
    x0_c = float(line[0].split("x0=")[1].split()[0])
    x7_c = float(line[0].split("x7=")[1].split()[0])

    # oracle: identical velocity Verlet in Python
    from g4s_tpu.models.deepmd.infer import DeepPot
    pot = DeepPot(str(frozen))
    x = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
                  [4, 4, 4], [4.96, 4, 4], [3.76, 4.93, 4]], np.float64)
    vel = np.zeros_like(x)
    box = np.eye(3) * 8.0
    types = np.array([0, 1, 1, 0, 1, 1], np.int32)
    dt = 0.0005
    e, f, _ = pot.eval(x, box, types)
    f = np.asarray(f, np.float64)
    for _ in range(5):
        x = x + vel * dt + 0.5 * f * dt * dt
        e, fn, _ = pot.eval(x, box, types)
        fn = np.asarray(fn, np.float64)
        vel = vel + 0.5 * (f + fn) * dt
        f = fn
    assert x0_c == pytest.approx(x[0, 0], rel=1e-6, abs=1e-10)
    assert x7_c == pytest.approx(x[2, 1], rel=1e-6, abs=1e-10)
    assert e_c == pytest.approx(float(np.asarray(e)), rel=1e-6)


F_MAIN = r"""
program fcapi_test
  use g4s_capi
  use iso_c_binding, only: c_int, c_double
  implicit none
  character(len=4096) :: repo, frozen
  integer(c_int) :: h, rc
  real(c_double) :: coord(18), box(9), energy, force(18), virial(9)
  integer(c_int) :: types(6)
  call get_command_argument(1, repo)
  call get_command_argument(2, frozen)
  if (g4s_init(repo) /= 0) stop 1
  h = g4s_deeppot_load(frozen)
  if (h < 0) stop 2
  coord = (/ 0.d0,0.d0,0.d0, 0.96d0,0.d0,0.d0, -0.24d0,0.93d0,0.d0, &
             4.d0,4.d0,4.d0, 4.96d0,4.d0,4.d0, 3.76d0,4.93d0,4.d0 /)
  box = (/ 8.d0,0.d0,0.d0, 0.d0,8.d0,0.d0, 0.d0,0.d0,8.d0 /)
  types = (/ 0_c_int,1_c_int,1_c_int,0_c_int,1_c_int,1_c_int /)
  rc = g4s_deeppot_eval(h, 6_c_int, coord, box, types, energy, force, &
                        virial)
  if (rc /= 0) stop 3
  write(*,'(A,F0.8)') 'FCAPI_OK e=', energy
end program fcapi_test
"""


@pytest.mark.slow
def test_fortran_binding(tmp_path):
    """A Fortran program evaluates a frozen potential through the
    ISO_C_BINDING module (g4s_capi.f90) — the role of the reference's
    Fortran surface (cantera src/fortran interfaces over clib). Skips
    where gfortran is absent (it is not in the CI image)."""
    gcc = shutil.which("gcc") or shutil.which("cc")
    gfortran = shutil.which("gfortran")
    pycfg = shutil.which("python3-config")
    if gcc is None or gfortran is None or pycfg is None:
        pytest.skip("no Fortran toolchain")

    from g4s_tpu.models.deepmd import WATER_SPEC, init_params
    from g4s_tpu.models.deepmd.freeze import freeze
    import jax
    params = init_params(jax.random.PRNGKey(0), WATER_SPEC,
                         dtype=jnp.float32)
    frozen = tmp_path / "tiny_frozen.npz"
    freeze(params, WATER_SPEC, str(frozen))

    inc = subprocess.run([pycfg, "--includes"], capture_output=True,
                         text=True, check=True).stdout.split()
    ld = subprocess.run([pycfg, "--ldflags", "--embed"], capture_output=True,
                        text=True, check=True).stdout.split()
    so = tmp_path / "libg4s_capi.so"
    native = os.path.join(REPO, "g4s_tpu", "runtime", "native")
    subprocess.run([gcc, "-shared", "-fPIC",
                    os.path.join(native, "capi.c"),
                    "-o", str(so)] + inc + ld, check=True,
                   capture_output=True)
    main_f = tmp_path / "main.f90"
    main_f.write_text(F_MAIN)
    exe = tmp_path / "fcapi_test"
    subprocess.run([gfortran, os.path.join(native, "g4s_capi.f90"),
                    str(main_f), "-o", str(exe), f"-J{tmp_path}",
                    f"-L{tmp_path}", "-lg4s_capi"] + ld, check=True,
                   capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=str(tmp_path))
    out = subprocess.run([str(exe), REPO, str(frozen)], env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("FCAPI_OK")]
    assert line, out.stdout
    e = float(line[0].split("e=")[1].split()[0])

    from g4s_tpu.models.deepmd.infer import DeepPot
    pot = DeepPot(str(frozen))
    coord = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
                      [4, 4, 4], [4.96, 4, 4], [3.76, 4.93, 4]])
    e_py, _, _ = pot.eval(coord, np.eye(3) * 8.0,
                          np.array([0, 1, 1, 0, 1, 1], np.int32))
    np.testing.assert_allclose(e, float(np.asarray(e_py)), rtol=1e-6)
