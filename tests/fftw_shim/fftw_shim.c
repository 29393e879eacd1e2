/* Radix-2 DIT implementation of the shim API in fftw3.h (this
 * directory). Unnormalized, FFTW sign convention. */
#include "fftw3.h"

#include <assert.h>
#include <math.h>
#include <stdlib.h>
#include <string.h>

struct fftwf_plan_s {
    int n;
    int sign;
    fftwf_complex *in, *out;
    unsigned *rev;      /* bit-reversal permutation */
    float *tw;          /* twiddles per stage, packed (re, im) */
};

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in,
                             fftwf_complex *out, int sign,
                             unsigned flags) {
    (void)flags;
    assert(n > 0 && (n & (n - 1)) == 0 && "shim: power-of-two only");
    struct fftwf_plan_s *p = malloc(sizeof(*p));
    p->n = n;
    p->sign = sign;
    p->in = in;
    p->out = out;
    p->rev = malloc(sizeof(unsigned) * n);
    int lg = 0;
    while ((1 << lg) < n) ++lg;
    for (int i = 0; i < n; ++i) {
        unsigned r = 0;
        for (int b = 0; b < lg; ++b) r |= ((i >> b) & 1u) << (lg - 1 - b);
        p->rev[i] = r;
    }
    /* One twiddle table of length n/2 for the full transform:
     * w_k = exp(sign * 2*pi*i * k / n), stage s uses stride n/(2m). */
    p->tw = malloc(sizeof(float) * n);          /* n/2 complex */
    for (int k = 0; k < n / 2; ++k) {
        double a = sign * 2.0 * M_PI * k / n;
        p->tw[2 * k] = (float)cos(a);
        p->tw[2 * k + 1] = (float)sin(a);
    }
    return p;
}

void fftwf_execute(fftwf_plan p) {
    int n = p->n;
    fftwf_complex *out = p->out;
    /* Bit-reversed copy (in != out in leanmlmrx; handle aliasing via
     * a temp if they ever alias). */
    if (p->in == p->out) {
        fftwf_complex *tmp = malloc(sizeof(fftwf_complex) * n);
        memcpy(tmp, p->in, sizeof(fftwf_complex) * n);
        for (int i = 0; i < n; ++i) {
            out[p->rev[i]][0] = tmp[i][0];
            out[p->rev[i]][1] = tmp[i][1];
        }
        free(tmp);
    } else {
        for (int i = 0; i < n; ++i) {
            out[p->rev[i]][0] = p->in[i][0];
            out[p->rev[i]][1] = p->in[i][1];
        }
    }
    for (int m = 1; m < n; m <<= 1) {
        int stride = n / (2 * m);           /* twiddle stride */
        for (int k = 0; k < n; k += 2 * m) {
            for (int j = 0; j < m; ++j) {
                float wr = p->tw[2 * j * stride];
                float wi = p->tw[2 * j * stride + 1];
                float ur = out[k + j][0], ui = out[k + j][1];
                float vr = out[k + j + m][0], vi = out[k + j + m][1];
                float tr = vr * wr - vi * wi;
                float ti = vr * wi + vi * wr;
                out[k + j][0] = ur + tr;
                out[k + j][1] = ui + ti;
                out[k + j + m][0] = ur - tr;
                out[k + j + m][1] = ui - ti;
            }
        }
    }
}

void fftwf_destroy_plan(fftwf_plan p) {
    free(p->rev);
    free(p->tw);
    free(p);
}
