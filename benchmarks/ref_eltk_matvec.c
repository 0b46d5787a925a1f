/* Single-core CPU re-timing of the CitcomS hot loop, used to pin the
 * Cookbook2 reference baseline with a measurement instead of a guess.
 *
 * The reference per-CG-iteration cost is one element-by-element stiffness
 * matvec: for each of nel elements, gather the 24 local velocity dofs via
 * the IEN incidence, multiply by the dense 24x24 elt_k block, and
 * scatter-add into the global vector (e_assemble_del2_u,
 * citcoms/lib/Element_calculations.c:475-509, routed through the G4S
 * spmm_dense engine with the gather/apply callbacks at :453-473).
 * Cookbook2 runs nproc 1x1x1 (examples/Cookbook2/cookbook2:3-4), so a
 * single-core measurement is the honest reference rate.
 *
 * Build: cc -O3 -march=native -o ref_eltk_matvec ref_eltk_matvec.c
 * Output: one line "<ms_per_sweep> <gflops>"
 */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#define ENDS 8
#define LOC 24

static double now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv) {
    int elx = 32, ely = 32, elz = 8;   /* cookbook2: 33x33x9 nodes */
    int reps = argc > 1 ? atoi(argv[1]) : 50;
    int nel = elx * ely * elz;
    int nox = elx + 1, noy = ely + 1, noz = elz + 1;
    int nno = nox * noy * noz;

    int *ien = malloc((size_t)nel * ENDS * sizeof(int));
    double *elt_k = malloc((size_t)nel * LOC * LOC * sizeof(double));
    double *u = malloc((size_t)nno * 3 * sizeof(double));
    double *au = malloc((size_t)nno * 3 * sizeof(double));
    if (!ien || !elt_k || !u || !au) return 1;

    /* trilinear-hex incidence, same layout as construct_ien */
    int e = 0;
    for (int i = 0; i < elx; i++)
        for (int j = 0; j < ely; j++)
            for (int k = 0; k < elz; k++, e++) {
                int n0 = (i * noy + j) * noz + k;
                int off[ENDS] = {0, noy * noz, noy * noz + noz, noz,
                                 1, noy * noz + 1, noy * noz + noz + 1,
                                 noz + 1};
                for (int a = 0; a < ENDS; a++)
                    ien[e * ENDS + a] = n0 + off[a];
            }
    srand(7);
    for (size_t i = 0; i < (size_t)nel * LOC * LOC; i++)
        elt_k[i] = (double)rand() / RAND_MAX - 0.5;
    for (int i = 0; i < nno * 3; i++)
        u[i] = (double)rand() / RAND_MAX;

    double best = 1e30;
    for (int r = 0; r < reps; r++) {
        double t0 = now();
        for (int i = 0; i < nno * 3; i++) au[i] = 0.0;
        for (int el = 0; el < nel; el++) {
            double ul[LOC], al[LOC];
            const int *iel = ien + el * ENDS;
            for (int a = 0; a < ENDS; a++)
                for (int d = 0; d < 3; d++)
                    ul[a * 3 + d] = u[iel[a] * 3 + d];   /* gather */
            const double *k = elt_k + (size_t)el * LOC * LOC;
            for (int p = 0; p < LOC; p++) {              /* 24x24 matvec */
                double s = 0.0;
                for (int q = 0; q < LOC; q++)
                    s += k[p * LOC + q] * ul[q];
                al[p] = s;
            }
            for (int a = 0; a < ENDS; a++)               /* scatter-add */
                for (int d = 0; d < 3; d++)
                    au[iel[a] * 3 + d] += al[a * 3 + d];
        }
        double dt = now() - t0;
        if (dt < best) best = dt;
    }
    double flops = 2.0 * (double)nel * LOC * LOC;
    /* keep au live */
    volatile double sink = au[0];
    (void)sink;
    printf("%.6f %.3f\n", best * 1e3, flops / best / 1e9);
    return 0;
}
