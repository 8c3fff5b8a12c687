// Oracle driver: replicates fer_h264.cpp decode() flow with a plain main.
#include <string>
#include <cstdio>
#include "nal.h"
#include "fileIO.h"
#include "rbsp_decoding.h"
#include "rbsp_IO.h"
#include "h264_globals.h"
#include "residual_tables.h"
#include "ref_frames.h"
#include "expgolomb.h"
extern FILE* stream;
extern FILE* yuvoutput;
int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s in.264 out.y4m [max_nals]\n", argv[0]); return 1; }
  long max_nals = argc > 3 ? atol(argv[3]) : -1;
  stream = fopen(argv[1], "rb");
  yuvoutput = fopen(argv[2], "wb");
  if (!stream || !yuvoutput) { perror("open"); return 1; }
  generate_residual_level_tables();
  InitNAL();
  NALunit nu;
  nu.rbsp_byte = new unsigned char[500000];
  unsigned long int ptr = 0;
  long n = 0;
  while (1) {
    getNAL(&ptr, nu);
    if (nu.NumBytesInRBSP == 0) break;
    RBSP_decode(nu);
    if (max_nals > 0 && ++n >= max_nals) break;
  }
  CloseNAL();
  fclose(stream);
  fclose(yuvoutput);
  return 0;
}
