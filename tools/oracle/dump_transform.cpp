// Golden-fixture generator: runs the reference transform/quant functions on
// deterministic pseudorandom inputs and dumps results as raw int32 LE.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include "quantizationTransform.h"
// internal fns not exposed in reference headers:
void forwardTransform4x4(int r[4][4], int d[4][4]);
void forwardTransformDCLumaIntra(int f[4][4], int c[4][4]);
void forwardTransformDCChroma(int f[2][2], int c[2][2]);
void quantisationResidualBlock(int d[4][4], int c[4][4], int qP, bool Intra, bool Intra16x16OrChroma);
void quantisationLumaDCIntra(int f[4][4], int qP, int c[4][4]);
void quantisationChromaDC(int f[2][2], int qP, int c[2][2], bool Intra);
void scaleResidualBlock(int c[4][4], int d[4][4], int qP, bool intra16x16OrChroma);
void inverseTransform4x4(int d[4][4], int r[4][4]);
// internal fns not exposed in headers:
void forwardTransform4x4(int r[4][4], int d[4][4]);
void forwardTransformDCLumaIntra(int f[4][4], int c[4][4]);
void forwardTransformDCChroma(int f[2][2], int c[2][2]);
void quantisationResidualBlock(int d[4][4], int c[4][4], int qP, bool Intra, bool Intra16x16OrChroma);
void quantisationLumaDCIntra(int f[4][4], int qP, int c[4][4]);
void quantisationChromaDC(int f[2][2], int qP, int c[2][2], bool Intra);
void scaleResidualBlock(int c[4][4], int d[4][4], int qP, bool intra16x16OrChroma);
void inverseTransform4x4(int d[4][4], int r[4][4]);
#include "scaleTransform.h"
#include "h264_globals.h"
#include "headers_and_parameter_sets.h"
static unsigned long long s = 0x123456789abcdefULL;
static int nextrand(int lo, int hi) { // xorshift64
  s ^= s << 13; s ^= s >> 7; s ^= s << 17;
  return lo + (int)(s % (unsigned long long)(hi - lo + 1));
}
int main() {
  FILE* f = fopen("transform_golden.bin", "wb");
  const int NB = 64;
  // section 1: forward 4x4 + quant at QPs {0,8,14,23,24,28,35,36,40,51}, inverse roundtrip
  int qps[10] = {0,8,14,23,24,28,35,36,40,51};
  for (int b = 0; b < NB; b++) {
    int r[4][4], d[4][4];
    for (int i=0;i<4;i++) for (int j=0;j<4;j++) r[i][j] = nextrand(-255, 255);
    fwrite(r, 4, 16, f);
    forwardTransform4x4(r, d);
    fwrite(d, 4, 16, f);
    for (int q = 0; q < 10; q++) {
      int c[4][4], cq[4][4], dd[4][4], rr[4][4];
      quantisationResidualBlock(d, c, qps[q], false, false);
      fwrite(c, 4, 16, f);
      quantisationResidualBlock(d, cq, qps[q], true, true);
      fwrite(cq, 4, 16, f);
      // inverse on quantized (non-DC-bypass variant)
      scaleResidualBlock(c, dd, qps[q], false);
      fwrite(dd, 4, 16, f);
      inverseTransform4x4(dd, rr);
      fwrite(rr, 4, 16, f);
    }
  }
  // section 2: DC luma fwd+quant+inv
  for (int b = 0; b < NB; b++) {
    int dc[4][4], fdc[4][4];
    for (int i=0;i<4;i++) for (int j=0;j<4;j++) dc[i][j] = nextrand(-2000, 2000);
    fwrite(dc, 4, 16, f);
    forwardTransformDCLumaIntra(dc, fdc);
    fwrite(fdc, 4, 16, f);
    for (int q = 0; q < 10; q++) {
      int c[4][4], inv[4][4];
      quantisationLumaDCIntra(fdc, qps[q], c);
      fwrite(c, 4, 16, f);
      InverseDCLumaIntra(8, qps[q], c, inv);
      fwrite(inv, 4, 16, f);
    }
  }
  // section 3: DC chroma fwd+quant+inv
  for (int b = 0; b < NB; b++) {
    int dc[2][2], fdc[2][2];
    for (int i=0;i<2;i++) for (int j=0;j<2;j++) dc[i][j] = nextrand(-2000, 2000);
    fwrite(dc, 4, 4, f);
    forwardTransformDCChroma(dc, fdc);
    fwrite(fdc, 4, 4, f);
    for (int q = 0; q < 10; q++) {
      int c[2][2], inv[2][2];
      quantisationChromaDC(fdc, qps[q], c, true);
      fwrite(c, 4, 4, f);
      InverseDCChroma(8, qps[q], c, inv);
      fwrite(inv, 4, 4, f);
    }
  }
  fclose(f);
  printf("ok\n");
  return 0;
}
