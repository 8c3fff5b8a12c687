// Reads N 4x4 int32 blocks + qp from argv, applies reference fwd+quant+deq+inv, writes to stdout.
#include <cstdio>
#include <cstdlib>
void forwardTransform4x4(int r[4][4], int d[4][4]);
void quantisationResidualBlock(int d[4][4], int c[4][4], int qP, bool Intra, bool Intra16x16OrChroma);
void scaleResidualBlock(int c[4][4], int d[4][4], int qP, bool intra16x16OrChroma);
void inverseTransform4x4(int d[4][4], int r[4][4]);
int main(int argc, char** argv) {
  int qp = atoi(argv[1]);
  int r[4][4], d[4][4], c[4][4], dd[4][4], rr[4][4];
  while (fread(r, 4, 16, stdin) == 16) {
    forwardTransform4x4(r, d);
    quantisationResidualBlock(d, c, qp, false, false);
    scaleResidualBlock(c, dd, qp, false);
    inverseTransform4x4(dd, rr);
    fwrite(c, 4, 16, stdout);
    fwrite(rr, 4, 16, stdout);
  }
  return 0;
}
