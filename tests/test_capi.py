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


C_GMX_MAIN = r"""
/* External-host demo in the GROMACS plugin calling pattern
 * (source/gmx/src/gmx_plugin.cpp + patches/2020.2/.../sim_util.cpp.patch):
 * the ENGINE owns the atoms, integrator and force array in its own units;
 * the plugin is init'ed from a json config naming graph/type/index files,
 * and each step the engine
 *   1. gathers its DP subset through dindex, converting nm -> A
 *      (x / c_dp2gmx),
 *   2. calls the potential (positions in, forces out),
 *   3. scatter-ADDS the forces back through dindex with f_dp2gmx * lambda,
 *   4. accumulates the energy term with e_dp2gmx * lambda.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
extern int g4s_init(const char*);
extern int g4s_deeppot_load(const char*);
extern int g4s_deeppot_eval(int, int, const double*, const double*,
                            const int*, double*, double*, double*);

static const double c_dp2gmx = 0.1;           /* A -> nm   */
static const double e_dp2gmx = 96.48533132;   /* eV -> kJ/mol */
static const double f_dp2gmx = 964.8533132;   /* eV/A -> kJ/mol/nm */

static char* json_str(const char* buf, const char* key, char* out) {
  const char* p = strstr(buf, key);
  if (!p) return NULL;
  p = strchr(p + strlen(key), ':');
  p = strchr(p, '"') + 1;
  const char* q = strchr(p, '"');
  memcpy(out, p, q - p);
  out[q - p] = 0;
  return out;
}

static double json_num(const char* buf, const char* key, double dflt) {
  const char* p = strstr(buf, key);
  if (!p) return dflt;
  return atof(strchr(p + strlen(key), ':') + 1);
}

static int read_ints(const char* path, int* out, int max) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  int n = 0;
  while (n < max && fscanf(f, "%d", &out[n]) == 1) n++;
  fclose(f);
  return n;
}

enum { ENG_N = 8, DP_N = 6 };

int main(int argc, char** argv) {
  /* argv: repo json_file */
  char jbuf[4096], graph[1024], typef[1024], idxf[1024];
  FILE* jf = fopen(argv[2], "r");
  if (!jf) return 1;
  size_t nb = fread(jbuf, 1, sizeof jbuf - 1, jf);
  jbuf[nb] = 0;
  fclose(jf);
  if (!json_str(jbuf, "graph_file", graph) ||
      !json_str(jbuf, "type_file", typef) ||
      !json_str(jbuf, "index_file", idxf)) return 1;
  double lmd = json_num(jbuf, "lambda", 1.0);

  int dtype[DP_N], dindex[DP_N];
  if (read_ints(typef, dtype, DP_N) != DP_N) return 2;
  if (read_ints(idxf, dindex, DP_N) != DP_N) return 2;

  if (g4s_init(argv[1])) return 3;
  int h = g4s_deeppot_load(graph);
  if (h < 0) return 4;

  /* engine state: 8 atoms in nm (two waters the plugin sees through
   * dindex + two engine-only atoms it must not touch) */
  double x[ENG_N * 3] = {
      0.00, 0.00, 0.00,  0.096, 0.00, 0.00,  -0.024, 0.093, 0.00,
      0.40, 0.40, 0.40,  0.496, 0.40, 0.40,   0.376, 0.493, 0.40,
      0.20, 0.20, 0.70,  0.70,  0.20, 0.20};
  double vel[ENG_N * 3] = {0};
  double box_gmx[9] = {0.8, 0, 0, 0, 0.8, 0, 0, 0, 0.8};
  double dt = 0.0005;

  double dcoord[DP_N * 3], dbox[9], dforce[DP_N * 3], dvirial[9], dener;
  double f_eng[ENG_N * 3];
  double epot = 0.0;
  for (int step = 0; step < 4; step++) {
    memset(f_eng, 0, sizeof f_eng);
    for (int i = 0; i < DP_N; i++)
      for (int j = 0; j < 3; j++)
        dcoord[i * 3 + j] = x[dindex[i] * 3 + j] / c_dp2gmx;
    for (int i = 0; i < 9; i++) dbox[i] = box_gmx[i] / c_dp2gmx;
    if (g4s_deeppot_eval(h, DP_N, dcoord, dbox, dtype, &dener, dforce,
                         dvirial)) return 5;
    for (int i = 0; i < DP_N; i++)
      for (int j = 0; j < 3; j++)
        f_eng[dindex[i] * 3 + j] += dforce[i * 3 + j] * f_dp2gmx * lmd;
    epot = dener * e_dp2gmx * lmd;
    for (int i = 0; i < ENG_N * 3; i++) {  /* engine leapfrog, unit mass */
      vel[i] += f_eng[i] * dt;
      x[i] += vel[i] * dt;
    }
  }
  printf("GMX_PATTERN_OK epot=%.10f x0=%.12f x20=%.12f xfree=%.12f\n",
         epot, x[0], x[dindex[5] * 3 + 2], x[6 * 3]);
  return 0;
}
"""


@pytest.mark.slow
def test_c_gmx_plugin_pattern(tmp_path):
    """A C host owning the MD loop drives the potential per step in the
    exact GROMACS-plugin protocol (init-from-json with type/index files,
    dindex gather, c/e/f_dp2gmx unit conversions, lambda-scaled force
    scatter-add — gmx_plugin.cpp:20-108, sim_util.cpp.patch:46-92); the
    trajectory must match an identical Python-side engine."""
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

    # plugin config triple, as the reference's init_from_json reads it
    (tmp_path / "type.raw").write_text("0 1 1 0 1 1\n")
    (tmp_path / "index.raw").write_text("0 1 2 3 4 5\n")
    lmd = 0.8
    (tmp_path / "dp.json").write_text(
        '{"graph_file": "%s", "type_file": "%s", "index_file": "%s", '
        '"lambda": %s, "pbc": true}'
        % (frozen, tmp_path / "type.raw", tmp_path / "index.raw", lmd))

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
    main_c = tmp_path / "gmx_main.c"
    main_c.write_text(C_GMX_MAIN)
    exe = tmp_path / "capi_gmx"
    subprocess.run([gcc, str(main_c), "-o", str(exe),
                    f"-L{tmp_path}", "-lg4s_capi"] + ld, check=True,
                   capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=str(tmp_path))
    out = subprocess.run([str(exe), REPO, str(tmp_path / "dp.json")],
                         env=env, capture_output=True, text=True,
                         timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines()
            if l.startswith("GMX_PATTERN_OK")]
    assert line, out.stdout
    vals = {kv.split("=")[0]: float(kv.split("=")[1])
            for kv in line[0].split()[1:]}

    # oracle: identical engine-side arithmetic in Python
    from g4s_tpu.models.deepmd.infer import DeepPot
    pot = DeepPot(str(frozen))
    c_dp2gmx, e_dp2gmx, f_dp2gmx = 0.1, 96.48533132, 964.8533132
    x = np.array([[0, 0, 0], [0.096, 0, 0], [-0.024, 0.093, 0],
                  [0.4, 0.4, 0.4], [0.496, 0.4, 0.4], [0.376, 0.493, 0.4],
                  [0.2, 0.2, 0.7], [0.7, 0.2, 0.2]], np.float64)
    vel = np.zeros_like(x)
    dindex = np.arange(6)
    types = np.array([0, 1, 1, 0, 1, 1], np.int32)
    box = np.eye(3) * 0.8
    dt = 0.0005
    epot = 0.0
    for _ in range(4):
        f_eng = np.zeros_like(x)
        e, f, _ = pot.eval(x[dindex] / c_dp2gmx, box / c_dp2gmx, types)
        f_eng[dindex] += np.asarray(f, np.float64) * f_dp2gmx * lmd
        epot = float(np.asarray(e)) * e_dp2gmx * lmd
        vel += f_eng * dt
        x += vel * dt
    assert vals["epot"] == pytest.approx(epot, rel=1e-6)
    assert vals["x0"] == pytest.approx(x[0, 0], rel=1e-6, abs=1e-12)
    assert vals["x20"] == pytest.approx(x[5, 2], rel=1e-6, abs=1e-12)
    # the engine-only atom never receives plugin forces
    assert vals["xfree"] == pytest.approx(0.2, abs=1e-15)


@pytest.mark.slow
def test_swig_binding(tmp_path):
    """SWIG-generated binding over the C API (the source/swig/deepmd.i
    role): `swig -python` generates the wrapper, it compiles against
    capi.c, and the generated module evaluates the potential with
    results matching the native DeepPot — proving the .i file serves
    any SWIG target language."""
    gcc = shutil.which("gcc") or shutil.which("cc")
    pycfg = shutil.which("python3-config")
    swig = shutil.which("swig")
    if gcc is None or pycfg is None or swig is None:
        pytest.skip("no swig/C toolchain")

    from g4s_tpu.models.deepmd import WATER_SPEC, init_params
    from g4s_tpu.models.deepmd.freeze import freeze
    import jax
    params = init_params(jax.random.PRNGKey(0), WATER_SPEC,
                         dtype=jnp.float32)
    frozen = tmp_path / "tiny_frozen.npz"
    freeze(params, WATER_SPEC, str(frozen))

    native = os.path.join(REPO, "g4s_tpu", "runtime", "native")
    subprocess.run([swig, "-python", "-outdir", str(tmp_path),
                    "-o", str(tmp_path / "g4s_wrap.c"),
                    os.path.join(native, "g4s.i")],
                   check=True, capture_output=True)
    inc = subprocess.run([pycfg, "--includes"], capture_output=True,
                         text=True, check=True).stdout.split()
    ld = subprocess.run([pycfg, "--ldflags", "--embed"],
                        capture_output=True, text=True,
                        check=True).stdout.split()
    subprocess.run([gcc, "-shared", "-fPIC",
                    str(tmp_path / "g4s_wrap.c"),
                    os.path.join(native, "capi.c"),
                    "-o", str(tmp_path / "_g4s_capi.so")] + inc + ld,
                   check=True, capture_output=True)

    # drive the GENERATED module in-process: g4s_init's Py_Initialize
    # is a no-op inside the live interpreter, so the embedded API and
    # the host interpreter share one runtime (the deepmd.i usage shape)
    sys.path.insert(0, str(tmp_path))
    try:
        import g4s_capi as g
        assert g.g4s_init(REPO) == 0
        h = g.g4s_deeppot_load(str(frozen))
        assert h >= 0
        coords = [0, 0, 0, 0.96, 0, 0, -0.24, 0.93, 0,
                  4, 4, 4, 4.96, 4, 4, 3.76, 4.93, 4]
        ca = g.DoubleArray(18)
        for i, v in enumerate(coords):
            ca[i] = v
        ba = g.DoubleArray(9)
        for i, v in enumerate([8, 0, 0, 0, 8, 0, 0, 0, 8]):
            ba[i] = v
        ta = g.IntArray(6)
        for i, v in enumerate([0, 1, 1, 0, 1, 1]):
            ta[i] = v
        fa = g.DoubleArray(18)
        va = g.DoubleArray(9)
        rc, e = g.g4s_deeppot_eval(h, 6, ca, ba, ta, fa, va)
        assert rc == 0

        from g4s_tpu.models.deepmd.infer import DeepPot
        pot = DeepPot(str(frozen))
        x = np.asarray(coords, np.float64).reshape(6, 3)
        e_ref, f_ref, _ = pot.eval(x, np.eye(3) * 8.0,
                                   np.array([0, 1, 1, 0, 1, 1],
                                            np.int32))
        assert e == pytest.approx(float(np.asarray(e_ref)), rel=1e-6)
        f_ref = np.asarray(f_ref, np.float64).reshape(-1)
        for i in range(18):
            assert fa[i] == pytest.approx(f_ref[i], rel=1e-5,
                                          abs=1e-10)
    finally:
        sys.path.remove(str(tmp_path))


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
