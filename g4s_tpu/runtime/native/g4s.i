/* SWIG interface over the g4s C embedding API — the role of the
 * reference's source/swig/deepmd.i (a language-agnostic binding layer
 * over the native inference surface; their module wraps the C++ hpp
 * API with std::vector templates, ours wraps the plain-C API with
 * carrays, which every SWIG target language supports).
 *
 * Generate + build (any SWIG target; the python target is exercised
 * end-to-end in tests/test_capi.py::test_swig_binding):
 *   swig -python g4s.i
 *   cc -shared -fPIC g4s_wrap.c capi.c -o _g4s_capi.so \
 *      $(python3-config --includes --ldflags --embed)
 */
%module g4s_capi

%{
extern int  g4s_init(const char* repo_path);
extern int  g4s_deeppot_load(const char* frozen_npz);
extern int  g4s_deeppot_eval(int handle, int natoms, const double* coord,
                             const double* box, const int* types,
                             double* energy, double* force,
                             double* virial);
extern int  g4s_ignition_delay(const char* mech_yaml, const char* phase,
                               double T0, double P0, double* tau);
extern void g4s_finalize(void);
%}

%include "carrays.i"
%include "typemaps.i"
%array_class(double, DoubleArray);
%array_class(int, IntArray);

%apply double *OUTPUT { double* energy };
%apply double *OUTPUT { double* tau };

extern int  g4s_init(const char* repo_path);
extern int  g4s_deeppot_load(const char* frozen_npz);
extern int  g4s_deeppot_eval(int handle, int natoms,
                             const double* coord, const double* box,
                             const int* types, double* energy,
                             double* force, double* virial);
extern int  g4s_ignition_delay(const char* mech_yaml, const char* phase,
                               double T0, double P0, double* tau);
extern void g4s_finalize(void);
